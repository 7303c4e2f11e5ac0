"""Core Tensor / TensorNetwork behavior tests (subset of reference
tests/test_tensor/test_tensor_core.py strategy)."""

import numpy as np
import pytest

import quimb_tpu.tensor as qtn
from quimb_tpu.tensor.core import Tensor, TensorNetwork


def rt(shape, inds, tags=None, seed=0):
    rng = np.random.default_rng(seed)
    return Tensor(rng.standard_normal(shape), inds=inds, tags=tags)


class TestTensor:
    def test_construct_and_props(self):
        t = rt((2, 3, 4), "abc", tags="T")
        assert t.shape == (2, 3, 4)
        assert t.inds == ("a", "b", "c")
        assert "T" in t.tags
        assert t.ind_size("b") == 3
        assert t.size == 24

    def test_transpose(self):
        t = rt((2, 3, 4), "abc")
        t2 = t.transpose("c", "a", "b")
        assert t2.shape == (4, 2, 3)
        assert np.allclose(
            np.asarray(t2.data), np.transpose(np.asarray(t.data), (2, 0, 1))
        )
        with pytest.raises(ValueError):
            t.transpose("a", "b")

    def test_contract_matmul(self):
        a = rt((3, 4), ("i", "j"), seed=1)
        b = rt((4, 5), ("j", "k"), seed=2)
        c = a @ b
        assert c.inds == ("i", "k")
        assert np.allclose(c.data, np.asarray(a.data) @ np.asarray(b.data))

    def test_fuse_unfuse_roundtrip(self):
        t = rt((2, 3, 4, 5), "abcd")
        f = t.fuse({"x": ("b", "c")})
        assert f.inds == ("x", "a", "d")
        assert f.shape == (12, 2, 5)
        u = f.unfuse({"x": ("b", "c")}, {"x": (3, 4)})
        assert set(u.inds) == set("abcd")
        assert np.allclose(
            u.transpose("a", "b", "c", "d").data, t.data
        )

    def test_arith(self):
        a = rt((3, 4), ("i", "j"), seed=1)
        b = rt((4, 3), ("j", "i"), seed=2)
        c = a + b
        assert np.allclose(
            c.data,
            np.asarray(a.data) + np.asarray(b.data).T,
        )
        d = 2 * a - a
        assert np.allclose(d.data, a.data)

    def test_split_modes(self):
        t = rt((4, 5, 6), "abc", seed=3)
        tn = t.split(left_inds=("a",))
        assert isinstance(tn, TensorNetwork)
        assert tn.num_tensors == 2
        assert np.allclose(
            tn.contract(output_inds=("a", "b", "c")).data, t.data,
            atol=1e-10,
        )
        l, s, r = t.split(left_inds=("a", "c"), absorb=None,
                          get="tensors")
        assert s.inds[0] in l.inds and s.inds[0] in r.inds

    def test_isometrize(self):
        t = rt((6, 2, 3), "abc", seed=4)
        ti = t.isometrize(left_inds=("a",), method="qr")
        m = np.asarray(ti.transpose("a", "b", "c").data).reshape(6, 6)
        assert np.allclose(m.conj().T @ m, np.eye(6), atol=1e-10)

    def test_trace(self):
        t = rt((3, 3, 4), "aab".replace("a", "a", 1), seed=5)
        t = Tensor(np.asarray(t.data), inds=("a", "b", "c"))
        tr = t.trace("a", "b")
        assert tr.inds == ("c",)
        assert np.allclose(
            tr.data, np.trace(np.asarray(t.data), axis1=0, axis2=1)
        )


class TestTensorNetwork:
    def test_maps(self):
        a = rt((2, 3), ("i", "j"), tags="A", seed=1)
        b = rt((3, 4), ("j", "k"), tags="B", seed=2)
        c = rt((4, 2), ("k", "i"), tags=("C", "odd"), seed=3)
        tn = TensorNetwork([a, b, c])
        assert tn.num_tensors == 3
        assert set(tn.outer_inds()) == set()
        assert set(tn.inner_inds()) == {"i", "j", "k"}
        assert tn.ind_size("j") == 3
        t = tn["A"]
        assert t.tags == {"A"} or "A" in t.tags

    def test_contract_ring(self):
        ts = []
        rng = np.random.default_rng(0)
        arrays = [rng.standard_normal((3, 3)) for _ in range(4)]
        inds = [("a", "b"), ("b", "c"), ("c", "d"), ("d", "a")]
        tn = TensorNetwork(
            [Tensor(x, i) for x, i in zip(arrays, inds)]
        )
        expected = np.einsum("ab,bc,cd,da->", *arrays)
        assert np.allclose(tn.contract(...), expected)
        assert np.allclose(tn ^ ..., expected)

    def test_select_and_partition(self):
        a = rt((2, 3), ("i", "j"), tags=("A", "x"), seed=1)
        b = rt((3, 4), ("j", "k"), tags=("B", "x"), seed=2)
        c = rt((4, 2), ("k", "i"), tags="C", seed=3)
        tn = TensorNetwork([a, b, c])
        sub = tn.select("x", which="any")
        assert sub.num_tensors == 2
        rest, tagged = tn.partition("x")
        assert rest.num_tensors == 1
        assert tagged.num_tensors == 2

    def test_virtual_views_propagate(self):
        a = rt((2, 3), ("i", "j"), tags="A", seed=1)
        b = rt((3, 2), ("j", "i"), tags="B", seed=2)
        tn = TensorNetwork([a, b], virtual=True)
        before = float(tn.contract(...))
        # modify a's data in place: the TN sees it
        a.modify(apply=lambda d: 2 * d)
        after = float(tn.contract(...))
        assert np.allclose(after, 2 * before)

    def test_reindex_retag(self):
        a = rt((2, 3), ("i", "j"), tags="A", seed=1)
        tn = TensorNetwork([a])
        tn2 = tn.reindex({"i": "x"})
        assert "x" in tn2.ind_map and "i" not in tn2.ind_map
        # original untouched
        assert "i" in tn.ind_map
        tn3 = tn.retag({"A": "Z"})
        assert "Z" in tn3.tag_map

    def test_compress_between(self):
        rng = np.random.default_rng(1)
        # low-rank pair: compression should be lossless at rank
        x = rng.standard_normal((8, 3))
        y = rng.standard_normal((3, 8))
        big = x @ y
        u, s, vh = np.linalg.svd(big)
        a = Tensor(u[:, :8] * s[:8] ** 0.5, ("i", "b"), tags="A")
        b = Tensor((vh[:8, :].T * s[:8] ** 0.5).T, ("b", "j"), tags="B")
        tn = TensorNetwork([a, b], virtual=True)
        before = np.asarray(tn.contract(output_inds=("i", "j")).data)
        tn.compress_between("A", "B", max_bond=3)
        assert tn["A"].ind_size(
            next(iter(qtn.bonds(tn["A"], tn["B"])))
        ) == 3
        after = np.asarray(tn.contract(output_inds=("i", "j")).data)
        assert np.allclose(before, after, atol=1e-10)

    def test_canonize_between(self):
        a = rt((4, 6), ("i", "b"), tags="A", seed=3)
        b = rt((6, 4), ("b", "j"), tags="B", seed=4)
        tn = TensorNetwork([a, b], virtual=True)
        before = np.asarray(tn.contract(output_inds=("i", "j")).data)
        tn.canonize_between("A", "B")
        # A should now be isometric
        ta = tn["A"]
        m = np.asarray(ta.transpose("i", *[
            ix for ix in ta.inds if ix != "i"
        ]).data)
        assert np.allclose(m.conj().T @ m, np.eye(m.shape[1]), atol=1e-10)
        after = np.asarray(tn.contract(output_inds=("i", "j")).data)
        assert np.allclose(before, after, atol=1e-10)

    def test_equalize_norms_exponent(self):
        a = rt((2, 3), ("i", "j"), seed=1)
        b = rt((3, 2), ("j", "k"), seed=2)
        tn = TensorNetwork([a, b])
        val0 = np.asarray(tn.contract(output_inds=("i", "k")).data)
        tn.equalize_norms_()
        assert tn.exponent != 0.0
        tn.distribute_exponent()
        val1 = np.asarray(tn.contract(output_inds=("i", "k")).data)
        assert np.allclose(val0, val1, atol=1e-10)

    def test_pickle_roundtrip(self):
        import pickle

        a = rt((2, 3), ("i", "j"), tags="A", seed=1)
        b = rt((3, 2), ("j", "k"), tags="B", seed=2)
        tn = TensorNetwork([a, b])
        s = pickle.dumps(tn)
        tn2 = pickle.loads(s)
        assert tn2.num_tensors == 2
        assert np.allclose(
            np.asarray(tn.contract(output_inds=("i", "k")).data),
            np.asarray(tn2.contract(output_inds=("i", "k")).data),
        )

    def test_isel_cut_iter(self):
        a = rt((2, 3), ("i", "j"), seed=1)
        b = rt((3, 2), ("j", "k"), seed=2)
        tn = TensorNetwork([a, b])
        full = np.asarray(tn.contract(output_inds=("i", "k")).data)
        # summing sliced contractions over j reproduces the full one
        total = 0
        for tn_s in tn.cut_iter("j"):
            total = total + np.asarray(
                tn_s.contract(output_inds=("i", "k")).data
            )
        assert np.allclose(total, full, atol=1e-10)

    def test_geometry_hash(self):
        a = rt((2, 3), ("i", "j"), seed=1)
        b = rt((3, 2), ("j", "k"), seed=2)
        tn1 = TensorNetwork([a, b])
        tn2 = TensorNetwork([
            rt((2, 3), ("x", "y"), seed=5), rt((3, 2), ("y", "z"), seed=6)
        ])
        assert tn1.geometry_hash() == tn2.geometry_hash()
        tn3 = TensorNetwork([
            rt((2, 4), ("x", "y"), seed=5), rt((4, 2), ("y", "z"), seed=6)
        ])
        assert tn1.geometry_hash() != tn3.geometry_hash()


class TestContractCompressed:
    def test_ising_2d_matches_exact(self):
        import quimb_tpu.tensor as full

        beta = 0.4
        tn = full.TN2D_classical_ising_partition_function(5, 5, beta)
        z_exact = float(tn.contract())
        z_comp = float(tn.contract_compressed(max_bond=8))
        assert abs(z_comp - z_exact) / z_exact < 1e-6

    @pytest.mark.slow
    def test_peps_norm_truncating(self):
        import quimb_tpu.tensor as full

        peps = full.PEPS_rand(5, 5, 3, seed=0, dtype="float64")
        norm = peps.make_norm()
        z_exact = float(np.real(np.asarray(norm.contract())))
        # heavily truncating: should still approximate well
        z8 = float(np.real(np.asarray(
            norm.contract_compressed(max_bond=9)
        )))
        assert abs(z8 - z_exact) / abs(z_exact) < 0.05
        # and the original network is untouched
        assert norm.num_tensors == 50


class TestMethodParityLayer:
    def test_reference_tn_methods_covered(self):
        """Nearly every public reference TensorNetwork/Tensor method
        exists here (SURVEY §2 C15/C18 parity)."""
        import ast
        import os

        ref_path = "/root/reference/quimb/tensor/tensor_core.py"
        if not os.path.exists(ref_path):
            import pytest

            pytest.skip("reference not mounted")

        def methods_of(path, clsname):
            out = set()
            for node in ast.walk(ast.parse(open(path).read())):
                if isinstance(node, ast.ClassDef) and \
                        node.name == clsname:
                    for n in node.body:
                        if isinstance(n, ast.FunctionDef) and \
                                not n.name.startswith("_"):
                            out.add(n.name)
            return out

        for cls, ours in (
            ("TensorNetwork", TensorNetwork),
            ("Tensor", Tensor),
        ):
            missing = sorted(
                m for m in methods_of(ref_path, cls)
                if not hasattr(ours, m)
            )
            assert not missing, (cls, missing)

    def test_gauge_family_value_preserving(self):
        import quimb_tpu.tensor as full

        tn = full.TN2D_rand(3, 3, 2, seed=2)
        z = float(tn.contract())
        for method in ("canonize", "bp", "random"):
            tn2 = tn.gauge_all(method=method)
            assert abs(float(tn2.contract()) - z) / abs(z) < 1e-6, \
                method
        # with a gauges dict supplied the network is left in Vidal
        # form (reference convention: returns tn only, caller owns
        # the gauges)
        gauges = {}
        tn3 = tn.gauge_all_simple(max_iterations=4, gauges=gauges)
        with tn3.gauge_simple_temp(gauges):
            z3 = float(tn3.contract())
        assert abs(z3 - z) / abs(z) < 1e-6

    def test_contract_around_preserves_value(self):
        import quimb_tpu.tensor as full

        tn = full.TN2D_rand(4, 4, 2, seed=3)
        z = float(tn.contract())
        env = tn.contract_around("I1,1", max_bond=16)
        assert any(
            "I1,1" in t.tags for t in env.tensor_map.values()
        )
        assert abs(float(env.contract()) - z) / abs(z) < 1e-6

    def test_tensor_extras(self):
        import quimb_tpu.tensor as full

        t = full.rand_tensor((3, 4, 5), ["a", "b", "c"], seed=0)
        sv = np.asarray(t.singular_values(["a"]))
        s = np.linalg.svd(
            np.asarray(t.data).reshape(3, 20), compute_uv=False
        )
        assert np.allclose(sorted(sv)[::-1], s, atol=1e-10)
        t3 = full.Tensor(
            np.arange(9.0).reshape(3, 3), inds=("x", "x")
        )
        assert np.allclose(
            np.asarray(t3.collapse_repeated().data), [0, 4, 8]
        )
        t6 = full.rand_tensor((4,), ["k"], seed=4)
        x = np.asarray(t6.new_ind_pair_diag("k", "k1", "k2").data)
        assert np.allclose(np.diag(x), np.asarray(t6.data))

    def test_insert_compressor_between_regions(self):
        import quimb_tpu.tensor as full

        p = full.MPS_rand_state(6, 10, seed=10, dtype="float64")
        v = np.asarray(p.to_dense()).ravel()
        pc = p.insert_compressor_between_regions(
            ("I0", "I1", "I2"), ("I3", "I4", "I5"), max_bond=6
        )
        vc = np.asarray(pc.to_dense()).ravel()
        f = abs(np.vdot(vc, v)) / (
            np.linalg.norm(vc) * np.linalg.norm(v)
        )
        assert f > 0.99
