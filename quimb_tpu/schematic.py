"""Schematic drawing toolkit (reference ``quimb/schematic.py``): a small
matplotlib helper for hand-drawing tensor diagrams in 2D or
pseudo-3D, used by docs and ``Tensor.draw``-style illustrations."""

import math

import numpy as np


class Drawing:
    """An incremental matplotlib figure for diagrams
    (reference ``Drawing`` schematic.py)."""

    def __init__(self, background=None, drawcolor="#333333",
                 figsize=(6, 6), ax=None, **kwargs):
        import matplotlib.pyplot as plt

        if ax is None:
            self.fig, self.ax = plt.subplots(figsize=figsize)
        else:
            self.fig, self.ax = ax.figure, ax
        self.ax.set_aspect("equal")
        self.ax.axis("off")
        if background:
            self.fig.patch.set_facecolor(background)
        self.drawcolor = drawcolor

    def _coo(self, coo):
        """Project 2D or pseudo-3D coordinates into the plane."""
        coo = tuple(coo)
        if len(coo) == 2:
            return coo
        x, y, z = coo
        # isometric-ish projection
        return (x - 0.5 * z, y - 0.25 * z)

    def circle(self, coo, radius=0.25, color=None, label=None,
               **kwargs):
        import matplotlib.patches as mpatches

        xy = self._coo(coo)
        c = mpatches.Circle(
            xy, radius, facecolor=color or "#eeeeee",
            edgecolor=self.drawcolor, zorder=3, **kwargs,
        )
        self.ax.add_patch(c)
        if label:
            self.text(coo, label)
        self._autoscale(xy, radius)
        return c

    def dot(self, coo, radius=0.05, color=None, **kwargs):
        return self.circle(coo, radius=radius,
                           color=color or self.drawcolor, **kwargs)

    def square(self, coo, size=0.4, color=None, label=None, **kwargs):
        import matplotlib.patches as mpatches

        x, y = self._coo(coo)
        s = mpatches.Rectangle(
            (x - size / 2, y - size / 2), size, size,
            facecolor=color or "#eeeeee", edgecolor=self.drawcolor,
            zorder=3, **kwargs,
        )
        self.ax.add_patch(s)
        if label:
            self.text(coo, label)
        self._autoscale((x, y), size)
        return s

    def line(self, cooa, coob, color=None, linewidth=1.5, zorder=1,
             **kwargs):
        xa, ya = self._coo(cooa)
        xb, yb = self._coo(coob)
        (ln,) = self.ax.plot(
            [xa, xb], [ya, yb], color=color or self.drawcolor,
            lw=linewidth, zorder=zorder, **kwargs,
        )
        self._autoscale((xa, ya), 0)
        self._autoscale((xb, yb), 0)
        return ln

    def curve(self, coos, color=None, linewidth=1.5, zorder=1,
              **kwargs):
        pts = np.array([self._coo(c) for c in coos])
        (ln,) = self.ax.plot(
            pts[:, 0], pts[:, 1], color=color or self.drawcolor,
            lw=linewidth, zorder=zorder, **kwargs,
        )
        for p in pts:
            self._autoscale(tuple(p), 0)
        return ln

    def arrow(self, cooa, coob, color=None, **kwargs):
        xa, ya = self._coo(cooa)
        xb, yb = self._coo(coob)
        self.ax.annotate(
            "", xy=(xb, yb), xytext=(xa, ya),
            arrowprops={"arrowstyle": "->",
                        "color": color or self.drawcolor},
        )

    def text(self, coo, text, fontsize=10, color=None, **kwargs):
        x, y = self._coo(coo)
        self.ax.text(
            x, y, text, ha="center", va="center", fontsize=fontsize,
            color=color or self.drawcolor, zorder=4, **kwargs,
        )

    def cube(self, coo, size=0.5, color="#dddddd", **kwargs):
        """A pseudo-3D cube at 3D coordinate ``coo``."""
        x, y, z = coo
        h = size / 2
        corners = [
            (x - h, y - h, z - h), (x + h, y - h, z - h),
            (x + h, y + h, z - h), (x - h, y + h, z - h),
            (x - h, y - h, z + h), (x + h, y - h, z + h),
            (x + h, y + h, z + h), (x - h, y + h, z + h),
        ]
        for (a, b) in [
            (0, 1), (1, 2), (2, 3), (3, 0),
            (4, 5), (5, 6), (6, 7), (7, 4),
            (0, 4), (1, 5), (2, 6), (3, 7),
        ]:
            self.line(corners[a], corners[b], color=color, **kwargs)

    def _autoscale(self, xy, pad):
        self.ax.update_datalim(
            [(xy[0] - pad, xy[1] - pad), (xy[0] + pad, xy[1] + pad)]
        )
        self.ax.autoscale_view()


__all__ = ["Drawing"]
