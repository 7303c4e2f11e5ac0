"""Neutral-style matplotlib helpers (reference ``quimb/utils_plot.py``:
``plot_multi_series_zoom``)."""

from .utils import default_to_neutral_style


@default_to_neutral_style
def plot_multi_series_zoom(
    data, zoom="auto", zoom_max=100, figsize=(8, 5), **kwargs
):
    """Plot possibly multiple series with an inset zoom of the tail
    (used e.g. for optimization/convergence histories)."""
    import matplotlib.pyplot as plt

    if isinstance(data, dict):
        series = data
    elif isinstance(data, (list, tuple)) and data and not hasattr(
        data[0], "__len__"
    ):
        series = {"series": data}
    else:
        series = {f"s{i}": s for i, s in enumerate(data)}

    fig, ax = plt.subplots(figsize=figsize)
    for label, ys in series.items():
        ax.plot(ys, label=label, **kwargs)
    n = max(len(ys) for ys in series.values())
    if zoom is not None:
        if zoom == "auto":
            zoom = min(zoom_max, n // 2) or 1
        axins = ax.inset_axes([0.5, 0.5, 0.45, 0.45])
        for label, ys in series.items():
            axins.plot(range(len(ys) - zoom, len(ys)), ys[-zoom:])
    if len(series) > 1:
        ax.legend()
    return fig, ax


__all__ = ["plot_multi_series_zoom"]
