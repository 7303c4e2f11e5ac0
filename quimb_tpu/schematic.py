"""Schematic drawing toolkit (reference ``quimb/schematic.py``,
2599 LoC): an incremental matplotlib helper for hand-drawing tensor
diagrams in 2D or pseudo-3D, used by docs and
``Tensor.draw``-style illustrations.

Supports: circles/ellipses/dots, squares/rectangles/cubes, polygons,
lines/offset (curved) lines/arrows/arcs, text with rotation, markers,
hulls around groups of points (``patch_around``), deterministic
hash-based coloring, and a configurable axonometric 3D->2D
projection (reference ``axonometric_project`` schematic.py)."""

import colorsys
import hashlib
import math

import numpy as np


def hash_to_color(s, hue_range=(0.0, 1.0), sat=0.5, val=0.85):
    """Deterministic string -> RGB color (reference
    ``hash_to_color`` schematic.py)."""
    h = int.from_bytes(
        hashlib.sha1(str(s).encode()).digest()[:4], "big"
    ) / 2**32
    lo, hi = hue_range
    return colorsys.hsv_to_rgb(lo + h * (hi - lo), sat, val)


def axonometric_project(x, y, z, a=50, b=12):
    """Project 3D -> 2D with an axonometric projection at angles
    ``a`` (degrees, x-axis recede) and ``b`` (y-axis recede)
    (reference ``axonometric_project`` schematic.py)."""
    ar, br = math.radians(a), math.radians(b)
    return (
        x * math.cos(ar) - y * math.cos(br),
        z + x * math.sin(ar) + y * math.sin(br),
    )


class Drawing:
    """An incremental matplotlib figure for diagrams
    (reference ``Drawing`` schematic.py). 3-tuples given as
    coordinates are axonometrically projected with the drawing's
    ``(a, b)`` angle presets."""

    def __init__(self, background=None, drawcolor="#333333",
                 figsize=(6, 6), ax=None, a=50, b=12, **kwargs):
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
        self.proj_a = a
        self.proj_b = b

    def _coo(self, coo):
        """Project 2D or pseudo-3D coordinates into the plane."""
        coo = tuple(coo)
        if len(coo) == 2:
            return coo
        x, y, z = coo
        return axonometric_project(x, y, z, self.proj_a, self.proj_b)

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

    def ellipse(self, coo, width=0.5, height=0.3, angle=0.0,
                color=None, label=None, **kwargs):
        """An ellipse patch (reference schematic ellipse shapes)."""
        import matplotlib.patches as mpatches

        xy = self._coo(coo)
        e = mpatches.Ellipse(
            xy, width, height, angle=angle,
            facecolor=color or "#eeeeee", edgecolor=self.drawcolor,
            zorder=3, **kwargs,
        )
        self.ax.add_patch(e)
        if label:
            self.text(coo, label)
        self._autoscale(xy, max(width, height) / 2)
        return e

    def rectangle(self, cooa, coob, color=None, label=None,
                  radius=0.0, **kwargs):
        """A (possibly rounded) rectangle spanning opposite corners
        ``cooa`` -> ``coob`` (reference ``rectangle``
        schematic.py)."""
        import matplotlib.patches as mpatches

        xa, ya = self._coo(cooa)
        xb, yb = self._coo(coob)
        x0, y0 = min(xa, xb), min(ya, yb)
        w, h = abs(xb - xa), abs(yb - ya)
        if radius > 0:
            r = mpatches.FancyBboxPatch(
                (x0, y0), w, h,
                boxstyle=f"round,pad=0,rounding_size={radius}",
                facecolor=color or "#eeeeee",
                edgecolor=self.drawcolor, zorder=2.5, **kwargs,
            )
        else:
            r = mpatches.Rectangle(
                (x0, y0), w, h, facecolor=color or "#eeeeee",
                edgecolor=self.drawcolor, zorder=2.5, **kwargs,
            )
        self.ax.add_patch(r)
        if label:
            self.text(((x0 + w / 2), (y0 + h / 2)), label)
        self._autoscale((x0, y0), 0)
        self._autoscale((x0 + w, y0 + h), 0)
        return r

    def shape(self, coos, color=None, closed=True, **kwargs):
        """An arbitrary filled polygon through ``coos`` (reference
        ``shape`` schematic.py)."""
        import matplotlib.patches as mpatches

        pts = np.array([self._coo(c) for c in coos])
        p = mpatches.Polygon(
            pts, closed=closed, facecolor=color or "#eeeeee",
            edgecolor=self.drawcolor, zorder=2.5, **kwargs,
        )
        self.ax.add_patch(p)
        for pt in pts:
            self._autoscale(tuple(pt), 0)
        return p

    polygon = shape

    def line_offset(self, cooa, coob, offset=0.2, color=None,
                    linewidth=1.5, zorder=1, **kwargs):
        """A quadratic-bezier curved line from ``cooa`` to ``coob``
        bowed sideways by ``offset`` (reference ``line_offset``
        schematic.py) — used for parallel multi-bonds."""
        xa, ya = self._coo(cooa)
        xb, yb = self._coo(coob)
        mx, my = (xa + xb) / 2, (ya + yb) / 2
        dx, dy = xb - xa, yb - ya
        nrm = math.hypot(dx, dy) or 1.0
        cx, cy = mx - offset * dy / nrm, my + offset * dx / nrm
        ts = np.linspace(0, 1, 30)
        xs = (1 - ts) ** 2 * xa + 2 * (1 - ts) * ts * cx + ts**2 * xb
        ys = (1 - ts) ** 2 * ya + 2 * (1 - ts) * ts * cy + ts**2 * yb
        (ln,) = self.ax.plot(
            xs, ys, color=color or self.drawcolor, lw=linewidth,
            zorder=zorder, **kwargs,
        )
        self._autoscale((xa, ya), 0)
        self._autoscale((xb, yb), 0)
        return ln

    def curve_arc(self, coo, radius=0.5, theta1=0.0, theta2=90.0,
                  color=None, linewidth=1.5, **kwargs):
        """A circular arc centred at ``coo`` (reference arc
        primitives)."""
        import matplotlib.patches as mpatches

        xy = self._coo(coo)
        arc = mpatches.Arc(
            xy, 2 * radius, 2 * radius, theta1=theta1, theta2=theta2,
            edgecolor=color or self.drawcolor, lw=linewidth,
            zorder=1, **kwargs,
        )
        self.ax.add_patch(arc)
        self._autoscale(xy, radius)
        return arc

    def marker(self, coo, marker="x", color=None, size=60, **kwargs):
        """A single matplotlib marker at ``coo``."""
        x, y = self._coo(coo)
        out = self.ax.scatter(
            [x], [y], marker=marker, c=[color or self.drawcolor],
            s=size, zorder=3.5, **kwargs,
        )
        self._autoscale((x, y), 0.1)
        return out

    def patch_around(self, coos, radius=0.3, color=None, alpha=0.25,
                     **kwargs):
        """A soft convex-hull blob around a set of points (reference
        ``patch_around`` schematic.py — highlights a cluster/region
        of a diagram)."""
        import matplotlib.patches as mpatches

        pts = np.array([self._coo(c) for c in coos], dtype=float)
        center = pts.mean(axis=0)
        # expand each point radially then take the convex hull by angle
        expanded = []
        for p in pts:
            d = p - center
            nrm = np.hypot(*d) or 1.0
            for th in np.linspace(0, 2 * np.pi, 12, endpoint=False):
                expanded.append(
                    p + radius * np.array([np.cos(th), np.sin(th)])
                )
        expanded = np.array(expanded)
        # gift-wrap by angle around the centroid (adequate for blobs)
        c2 = expanded.mean(axis=0)
        angs = np.arctan2(expanded[:, 1] - c2[1],
                          expanded[:, 0] - c2[0])
        rads = np.hypot(expanded[:, 0] - c2[0], expanded[:, 1] - c2[1])
        nbins = 40
        hull = []
        for k in range(nbins):
            m = (angs >= -np.pi + 2 * np.pi * k / nbins) & (
                angs < -np.pi + 2 * np.pi * (k + 1) / nbins
            )
            if m.any():
                j = np.argmax(np.where(m, rads, -np.inf))
                hull.append(expanded[j])
        p = mpatches.Polygon(
            np.array(hull), closed=True,
            facecolor=color or "#8899dd", edgecolor="none",
            alpha=alpha, zorder=0.5, **kwargs,
        )
        self.ax.add_patch(p)
        for pt in pts:
            self._autoscale(tuple(pt), radius)
        return p

    def label_ax(self, x, y, text, fontsize=12, **kwargs):
        """Text in axes-fraction coordinates (reference
        ``label_ax``)."""
        return self.ax.text(
            x, y, text, transform=self.ax.transAxes,
            fontsize=fontsize, color=self.drawcolor, **kwargs,
        )

    def cube(self, coo, size=0.5, color="#dddddd", fill=True,
             **kwargs):
        """A pseudo-3D cube at 3D coordinate ``coo``: filled visible
        faces (top, front, right) shaded by orientation when
        ``fill``, else a wireframe (reference cube schematic)."""
        x, y, z = coo
        h = size / 2
        c000 = (x - h, y - h, z - h)
        c100 = (x + h, y - h, z - h)
        c110 = (x + h, y + h, z - h)
        c010 = (x - h, y + h, z - h)
        c001 = (x - h, y - h, z + h)
        c101 = (x + h, y - h, z + h)
        c111 = (x + h, y + h, z + h)
        c011 = (x - h, y + h, z + h)
        if fill:
            import matplotlib.colors as mcolors

            base = np.array(mcolors.to_rgb(color))
            # top, front, right with decreasing brightness
            for face, shade in (
                ((c001, c101, c111, c011), 1.0),
                ((c000, c100, c101, c001), 0.8),
                ((c100, c110, c111, c101), 0.65),
            ):
                self.shape(face, color=tuple(base * shade), **kwargs)
        else:
            for (p, q) in [
                (c000, c100), (c100, c110), (c110, c010), (c010, c000),
                (c001, c101), (c101, c111), (c111, c011), (c011, c001),
                (c000, c001), (c100, c101), (c110, c111), (c010, c011),
            ]:
                self.line(p, q, color=color, **kwargs)

    def _autoscale(self, xy, pad):
        self.ax.update_datalim(
            [(xy[0] - pad, xy[1] - pad), (xy[0] + pad, xy[1] + pad)]
        )
        self.ax.autoscale_view()


__all__ = ["Drawing", "axonometric_project", "hash_to_color"]
