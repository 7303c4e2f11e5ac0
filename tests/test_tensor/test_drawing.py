"""Behavior tests for drawing.py / schematic.py (reference
test surface: layouts produce finite positions, draw() renders all
nodes/edges, color maps are deterministic, schematic primitives add
artists)."""

import matplotlib

matplotlib.use("Agg")

import matplotlib.pyplot as plt
import numpy as np
import pytest

import quimb_tpu.tensor as qtn
from quimb_tpu.tensor.drawing import (
    draw_tn,
    get_colors,
    hash_to_color,
    layout_positions,
    visualize_tensor,
)


@pytest.fixture()
def mps():
    return qtn.MPS_rand_state(6, 4, seed=0, dtype="float64")


class TestLayouts:
    @pytest.mark.parametrize("layout", ["spring", "spectral",
                                        "circular", "random",
                                        "kamada_kawai"])
    def test_layout_finite_positions(self, mps, layout):
        pos = layout_positions(mps, layout=layout)
        # one position per tensor plus one per outer (phys) index
        assert len(pos) == 6 + 6
        for p in pos.values():
            assert np.all(np.isfinite(p))
            assert len(p) == 2

    def test_layout_3d(self, mps):
        pos = layout_positions(mps, layout="spring", dim=3)
        for p in pos.values():
            assert len(p) == 3

    def test_fixed_positions_respected(self, mps):
        tid0 = next(iter(mps.tensor_map))
        pos = layout_positions(
            mps, layout="spring", fix={tid0: (0.0, 0.0)},
        )
        assert np.allclose(pos[tid0], [0.0, 0.0], atol=1e-8)

    def test_spring_deterministic(self, mps):
        p1 = layout_positions(mps, seed=3)
        p2 = layout_positions(mps, seed=3)
        for n in p1:
            assert np.allclose(p1[n], p2[n])


class TestColors:
    def test_hash_to_color_deterministic_distinct(self):
        c1 = hash_to_color("I0")
        c2 = hash_to_color("I0")
        c3 = hash_to_color("I1")
        assert c1 == c2
        assert c1 != c3
        assert all(0 <= x <= 1 for x in c1)

    def test_get_colors_small_and_large(self):
        small = get_colors(("A", "B"))
        assert set(small) == {"A", "B"}
        many = get_colors(tuple(f"T{i}" for i in range(20)))
        assert len(many) == 20
        custom = get_colors(("A",), custom_colors=[(1, 0, 0)])
        assert custom["A"] == (1, 0, 0)


class TestDraw:
    def test_draw_returns_ax_with_artists(self, mps):
        ax = draw_tn(mps, color=[mps.site_tag(i) for i in range(6)],
                     get="ax")
        assert len(ax.collections) >= 1  # node scatter
        assert len(ax.lines) >= 11  # 5 bonds + 6 phys stubs
        plt.close(ax.figure)

    def test_draw_get_pos_and_fig(self, mps):
        pos = draw_tn(mps, get="pos")
        assert len(pos) == 12
        fig = draw_tn(mps, get="fig")
        plt.close(fig)

    def test_draw_3d(self, mps):
        ax = mps.draw_3d(get="ax")
        assert ax.name == "3d"
        plt.close(ax.figure)

    def test_draw_hyper_index(self):
        # three tensors sharing one index -> junction pseudo-node
        from quimb_tpu.tensor.core import Tensor, TensorNetwork

        rng = np.random.default_rng(0)
        ts = [Tensor(rng.standard_normal((2, 3)), inds=("h", f"o{i}"))
              for i in range(3)]
        tn = TensorNetwork(ts)
        pos = layout_positions(tn)
        assert any(str(n).startswith("__hyper__") for n in pos)
        ax = draw_tn(tn, get="ax")
        plt.close(ax.figure)

    def test_draw_highlight_and_show_all_inds(self, mps):
        bond = next(iter(
            i for i, tids in mps.ind_map.items() if len(tids) == 2
        ))
        ax = draw_tn(mps, highlight_inds=(bond,), show_inds="all",
                     get="ax")
        texts = [t.get_text() for t in ax.texts]
        assert bond in texts
        plt.close(ax.figure)

    def test_plotly_backend_gated(self, mps):
        try:
            import plotly  # noqa: F401

            fig = draw_tn(mps, backend="plotly")
            assert fig is not None
        except ImportError:
            with pytest.raises(ImportError):
                draw_tn(mps, backend="plotly")

    def test_tensor_draw_method(self, mps):
        t = next(iter(mps.tensor_map.values()))
        ax = t.draw(get="ax")
        plt.close(ax.figure)


class TestVisualizeTensor:
    def test_scatter_counts_nonzero(self):
        rng = np.random.default_rng(1)
        x = rng.standard_normal((4, 4))
        x[0, 0] = 0.0
        from quimb_tpu.tensor.core import Tensor

        t = Tensor(x, inds=("a", "b"))
        ax = t.visualize()
        offs = ax.collections[0].get_offsets()
        assert len(offs) == np.count_nonzero(np.abs(x) > 1e-12)
        plt.close(ax.figure)

    def test_complex_phase_colors(self):
        x = np.array([[1.0 + 0j, 1j], [-1.0, -1j]])
        ax = visualize_tensor(x)
        cols = ax.collections[0].get_facecolors()
        # four distinct phases -> four distinct colors
        assert len({tuple(np.round(c, 3)) for c in cols}) == 4
        plt.close(ax.figure)

    def test_network_visualize_tensors(self, mps):
        fig = mps.visualize_tensors()
        assert len(fig.axes) >= 6
        plt.close(fig)


class TestSchematic:
    def test_primitives_add_artists(self):
        from quimb_tpu.schematic import Drawing

        d = Drawing()
        d.circle((0, 0), label="A")
        d.square((1, 0))
        d.ellipse((2, 0), width=0.6, height=0.3)
        d.rectangle((3, -0.5), (4, 0.5), radius=0.1)
        d.shape([(5, 0), (5.5, 0.5), (6, 0)])
        d.line((0, 1), (1, 1))
        d.line_offset((1, 1), (2, 1), offset=0.3)
        d.curve([(2, 1), (2.5, 1.4), (3, 1)])
        d.curve_arc((4, 1), radius=0.3)
        d.arrow((5, 1), (6, 1))
        d.marker((6.5, 1))
        d.dot((7, 1))
        d.text((3, 2), "hello")
        d.label_ax(0.05, 0.95, "corner")
        d.patch_around([(0, 3), (1, 3), (0.5, 3.8)])
        assert len(d.ax.patches) >= 6
        # line + line_offset + curve (arrow is an annotation, marker
        # and dot are collections/patches)
        assert len(d.ax.lines) == 3
        assert len(d.ax.texts) >= 3
        plt.close(d.fig)

    def test_pseudo3d_projection(self):
        from quimb_tpu.schematic import Drawing, axonometric_project

        d = Drawing(a=50, b=12)
        d.cube((0, 0, 0), fill=True)
        d.cube((2, 0, 0), fill=False)
        x2, y2 = axonometric_project(1.0, 2.0, 3.0)
        assert np.isfinite(x2) and np.isfinite(y2)
        # projecting a 3-tuple goes through the same transform
        assert d._coo((1.0, 2.0, 3.0)) == pytest.approx(
            axonometric_project(1.0, 2.0, 3.0, 50, 12)
        )
        plt.close(d.fig)

    def test_hash_color(self):
        from quimb_tpu.schematic import hash_to_color

        assert hash_to_color("x") == hash_to_color("x")
        assert hash_to_color("x") != hash_to_color("y")

    def test_extended_primitives_add_artists(self):
        from quimb_tpu.schematic import Drawing

        d = Drawing()
        d.wedge((0, 0), 0, 120)
        d.regular_polygon((1, 0), n=6)
        d.star((2, 0))
        d.cross((3, 0))
        d.zigzag((0, 1), (2, 1))
        d.arrowhead((0, 2), (1, 2))
        d.bezier((0, 3), (0.4, 3.6), (0.8, 2.4), (1.2, 3))
        d.cup((2, 3), (3, 3), depth=0.4)
        d.patch([(0, 4), (1, 4), (0.5, 4.8)])
        d.patch_around_circles((3, 4), 0.3, (4.5, 4), 0.4)
        d.text_between((0, 5), (2, 5.5), "bond")
        d.text_toward((0, 6), (2, 6), "near-a", frac=0.2)
        d.label_fig(0.02, 0.98, "fig-label")
        shift = d.translate(dx=1, dy=2, dz=3)
        assert shift((0, 0)) == (1, 2)
        assert shift((0, 0, 0)) == (1, 2, 3)
        assert len(d.ax.patches) >= 6
        assert len(d.ax.texts) >= 2
        plt.close(d.fig)

    def test_color_utils(self):
        from quimb_tpu import schematic as sch

        cols = sch.auto_colors(7)
        assert len(cols) == 7
        assert len(set(cols)) == 7
        dk = sch.darken_color((0.6, 0.6, 0.9))
        assert all(c2 < c1 for c1, c2 in zip((0.6, 0.6, 0.9), dk))
        av = sch.average_color([(1, 0, 0), (0, 0, 1)])
        assert av[0] == pytest.approx(av[2])
        jit = sch.jitter_color((0.5, 0.5, 0.5), factor=0.01)
        assert all(abs(a - b) < 0.2 for a, b in zip(jit, (0.5, 0.5, 0.5)))
        c = sch.get_color(0.5, vmin=0.0, vmax=1.0)
        assert len(c) == 4
        # saturation modulation keeps alpha unless overridden
        ms = sch.mod_sat((0.2, 0.4, 0.9, 0.7), mod=0.5)
        assert ms[3] == pytest.approx(0.7)

    def test_coloring_seed_changes_hashes(self):
        from quimb_tpu import schematic as sch

        sch.set_coloring_seed(0)
        c0 = sch.hash_to_color("tag")
        sch.set_coloring_seed(1)
        c1 = sch.hash_to_color("tag")
        sch.set_coloring_seed(0)
        c2 = sch.hash_to_color("tag")
        assert c0 != c1 and c0 == c2

    def test_projections_finite(self):
        from quimb_tpu import schematic as sch

        x, y = sch.orthographic_project(1.0, 2.0, 3.0)
        assert np.isfinite(x) and np.isfinite(y)
        z1 = sch.coo_to_zorder(0, 0, 0)
        z2 = sch.coo_to_zorder(1, 1, 0)
        # receding along both axes moves away from the viewer
        assert z2 < z1


class TestVisualizeTensors:
    @pytest.mark.parametrize("mode", ["network", "grid", "row", "col"])
    def test_modes_produce_figures(self, mode):
        tn = qtn.MPS_rand_state(6, 4, seed=0)
        fig = tn.visualize_tensors(mode=mode)
        assert fig is not None
        assert len(fig.axes) >= tn.num_tensors

    def test_bad_mode_raises(self):
        tn = qtn.MPS_rand_state(3, 2, seed=0)
        with pytest.raises(ValueError):
            tn.visualize_tensors(mode="diagonal")

    def test_choose_squarest_grid(self):
        from quimb_tpu.tensor.drawing import choose_squarest_grid

        for n in range(1, 40):
            r, c = choose_squarest_grid(n)
            assert r * c >= n
            assert abs(r - c) <= 1 or r * c - n < max(r, c)


class TestSchematicPresets:
    def test_preset_applied_and_overridden(self):
        from quimb_tpu.schematic import Drawing

        d = Drawing(presets={"site": {"color": "#cc6644",
                                      "radius": 0.3}})
        c = d.circle((0, 0), preset="site")
        assert abs(c.radius - 0.3) < 1e-12
        # explicit kwargs always beat the preset
        c2 = d.circle((1, 0), preset="site", radius=0.5)
        assert abs(c2.radius - 0.5) < 1e-12

    def test_preset_sequence_later_wins(self):
        from quimb_tpu.schematic import Drawing

        d = Drawing(presets={"a": {"radius": 0.1},
                             "b": {"radius": 0.2}})
        c = d.circle((0, 0), preset=("a", "b"))
        assert abs(c.radius - 0.2) < 1e-12

    def test_unknown_preset_raises(self):
        from quimb_tpu.schematic import Drawing

        with pytest.raises(KeyError):
            Drawing().circle((0, 0), preset="nope")

    def test_grid_and_grid3d(self):
        from quimb_tpu.schematic import Drawing

        d = Drawing()
        lines = d.grid((0, 0), (2, 2), nx=3, ny=2)
        assert len(lines) == (3 + 1) + (2 + 1)
        lines3 = d.grid3d((0, 0, 0), size=1.0, n=2)
        assert len(lines3) == 3 * (2 + 1) ** 2


class TestMultiEdgeAndSingleTensor:
    def test_multibond_pair_draws_separate_curves(self):
        from quimb_tpu.tensor.core import Tensor, TensorNetwork

        rng = np.random.default_rng(0)
        # two tensors sharing THREE bonds
        ta = Tensor(rng.standard_normal((2, 3, 4, 2)),
                    inds=("a", "b", "c", "k"), tags="A")
        tb = Tensor(rng.standard_normal((2, 3, 4, 2)),
                    inds=("a", "b", "c", "q"), tags="B")
        tn = TensorNetwork([ta, tb])
        fig, ax = plt.subplots()
        draw_tn(tn, ax=ax, legend=False)
        # one straight line + two bowed bezier curves (20 pts) for the
        # triple bond, plus two dangling-edge lines
        lines = ax.get_lines()
        assert len(lines) >= 5
        assert any(len(ln.get_xdata()) == 20 for ln in lines)
        plt.close(fig)

    def test_single_tensor_circle_layout(self):
        from quimb_tpu.tensor.core import Tensor, TensorNetwork
        from quimb_tpu.tensor.drawing import layout_single_tensor

        t = Tensor(np.zeros((2, 3, 4)), inds=("a", "b", "c"))
        tn = TensorNetwork([t])
        pos = layout_positions(tn)
        # tensor at origin, indices on the unit circle
        tid = next(iter(tn.tensor_map))
        assert np.allclose(pos[tid], 0.0)
        for ix in "abc":
            assert np.hypot(*pos[f"__outer__{ix}"]) == pytest.approx(
                1.0, abs=1e-9
            )
        # 3d phyllotaxis points sit on the unit sphere
        pos3 = layout_single_tensor(tn, dim=3)
        for ix in "abc":
            assert np.linalg.norm(
                pos3[f"__outer__{ix}"]
            ) == pytest.approx(1.0, abs=1e-9)

    def test_phyllotaxis_points_spread(self):
        from quimb_tpu.tensor.drawing import phyllotaxis_points

        pts = np.array(phyllotaxis_points(20))
        assert pts.shape == (20, 3)
        assert np.allclose(np.linalg.norm(pts, axis=1), 1.0,
                           atol=1e-9)
        # reasonably spread: min pairwise distance not tiny
        d2 = ((pts[None] - pts[:, None]) ** 2).sum(-1)
        d2[np.arange(20), np.arange(20)] = np.inf
        assert np.sqrt(d2.min()) > 0.3

    def test_massage_pos_reduces_vertical_span(self):
        from quimb_tpu.tensor.drawing import massage_pos

        rng = np.random.default_rng(1)
        # a diagonal line of points: rotation should flatten it
        pos = {i: (float(i), float(i) + rng.normal() * 0.01)
               for i in range(10)}
        out = massage_pos(pos)
        ys0 = np.array([v[1] for v in pos.values()])
        ys1 = np.array([v[1] for v in out.values()])
        assert ys1.max() - ys1.min() < 0.2 * (ys0.max() - ys0.min())


class TestRenderTrio:
    """Side-by-side render parity sweep (reference drawing surface
    drawing.py:693-1290): the MPS / PEPS / MERA trio must each render
    with legends, isometry arrows and multi-edge offsets enabled and
    produce one node artist per tensor."""

    @pytest.mark.parametrize("maker", [
        lambda: qtn.MPS_rand_state(6, 4, seed=1, dtype="float64"),
        lambda: qtn.PEPS.rand(3, 3, bond_dim=2, seed=1,
                              dtype="float64"),
        lambda: qtn.MERA.rand(8, seed=1),
    ], ids=["mps", "peps", "mera"])
    def test_trio_renders(self, maker):
        tn = maker()
        ax = tn.draw(return_fig=False, legend=True,
                     arrow_isometries=True, show_inds="bond-size")
        assert ax is not None
        plt.close("all")

    def test_multibond_offset_curves(self):
        # a two-tensor network with a doubled bond renders two
        # distinct edge artists (offset curves), not one overdrawn
        a = qtn.Tensor(np.random.rand(2, 3), inds=("a", "b"),
                       tags={"X"})
        b = qtn.Tensor(np.random.rand(2, 3), inds=("a", "b"),
                       tags={"Y"})
        tn = a & b
        ax = tn.draw(return_fig=False)
        assert ax is not None
        plt.close("all")
