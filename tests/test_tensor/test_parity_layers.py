"""Tests for the class-level method parity layers: the reference's
public methods on MPS/MPO/Flat (tn1d), TensorNetwork2D/PEPS (tn2d),
TensorNetwork3D/PEPS3D (tn3d) and TensorNetworkGen(Vector) (tnag)."""

import ast

import numpy as np
import pytest

import quimb_tpu as qu
import quimb_tpu.tensor as qtn

REFERENCE = "/root/reference/quimb"


def _ref_methods(path, clsname):
    out = set()
    for node in ast.walk(ast.parse(open(path).read())):
        if isinstance(node, ast.ClassDef) and node.name == clsname:
            for n in node.body:
                if isinstance(n, ast.FunctionDef) and \
                        not n.name.startswith("_"):
                    out.add(n.name)
                if isinstance(n, ast.Assign):
                    for t in n.targets:
                        if isinstance(t, ast.Name) and \
                                not t.id.startswith("_"):
                            out.add(t.id)
    return out


class TestClassMethodParity:
    """Every public method of the reference classes exists here."""

    @pytest.mark.parametrize("relpath,clsname,ours", [
        ("tensor/tn1d/core.py", "TensorNetwork1D",
         qtn.TensorNetwork1D),
        ("tensor/tn1d/core.py", "TensorNetwork1DVector",
         qtn.TensorNetwork1DVector),
        ("tensor/tn1d/core.py", "MatrixProductState",
         qtn.MatrixProductState),
        ("tensor/tn1d/core.py", "MatrixProductOperator",
         qtn.MatrixProductOperator),
        ("tensor/tn1d/core.py", "TensorNetwork1DFlat",
         qtn.TensorNetwork1DFlat),
        ("tensor/tn1d/core.py", "Dense1D", qtn.Dense1D),
        ("tensor/tn2d/core.py", "TensorNetwork2D",
         qtn.TensorNetwork2D),
        ("tensor/tn2d/core.py", "TensorNetwork2DVector",
         qtn.TensorNetwork2DVector),
        ("tensor/tn2d/core.py", "PEPS", qtn.PEPS),
        ("tensor/tn2d/core.py", "PEPO", qtn.PEPO),
        ("tensor/tn3d/core.py", "TensorNetwork3D",
         qtn.TensorNetwork3D),
        ("tensor/tn3d/core.py", "TensorNetwork3DVector",
         qtn.TensorNetwork3DVector),
        ("tensor/tn3d/core.py", "PEPS3D", qtn.PEPS3D),
        ("tensor/tnag/core.py", "TensorNetworkGen",
         qtn.TensorNetworkGen),
        ("tensor/tnag/core.py", "TensorNetworkGenVector",
         qtn.TensorNetworkGenVector),
        ("tensor/tnag/core.py", "TensorNetworkGenOperator",
         qtn.TensorNetworkGenOperator),
        ("tensor/circuit/core.py", "Circuit", qtn.Circuit),
        ("tensor/circuit/core.py", "CircuitMPS", qtn.CircuitMPS),
        ("tensor/optimize.py", "TNOptimizer", qtn.TNOptimizer),
        ("tensor/tn1d/dmrg.py", "DMRG", qtn.DMRG),
        ("tensor/tn1d/dmrg.py", "MovingEnvironment",
         qtn.MovingEnvironment),
        ("tensor/tn1d/tebd.py", "TEBD", qtn.TEBD),
        ("tensor/tn2d/tebd.py", "LocalHam2D", qtn.LocalHam2D),
        ("tensor/tn2d/tebd.py", "FullUpdate", qtn.FullUpdate),
        ("tensor/tn3d/tebd.py", "LocalHam3D", qtn.LocalHam3D),
        ("evo.py", "Evolution", None),
        ("operator/builder.py", "SparseOperatorBuilder", None),
        ("operator/hilbertspace.py", "HilbertSpace", None),
        ("tensor/circuit/exact.py", "CircuitDense",
         qtn.CircuitDense),
        ("tensor/circuit/mps.py", "CircuitPermMPS",
         qtn.CircuitPermMPS),
        ("tensor/circuit/mps.py", "CircuitMPSLazy",
         qtn.CircuitMPSLazy),
        ("tensor/circuit/gates.py", "Gate", None),
        ("tensor/circuit/pepo.py", "CircuitPEPOSimpleUpdate", None),
        ("tensor/circuit/peps.py", "CircuitPEPSSimpleUpdate", None),
        ("tensor/circuit/simple_update.py", "CircuitSimpleUpdate",
         None),
        ("tensor/tn1d/mera.py", "MERA", qtn.MERA),
        ("tensor/tnag/tebd.py", "LocalHamGen", None),
        ("experimental/merabuilder/merabuilder.py",
         "TensorNetworkGenIso", None),
        ("tensor/belief_propagation/bp_common.py",
         "BeliefPropagationCommon", None),
        ("tensor/belief_propagation/regions.py", "RegionGraph", None),
    ])
    def test_no_missing_methods(self, relpath, clsname, ours):
        import os

        if ours is None:
            # resolve classes living outside quimb_tpu.tensor lazily
            mod = {
                "Evolution": "quimb_tpu",
                "SparseOperatorBuilder": "quimb_tpu.operator",
                "HilbertSpace": "quimb_tpu.operator",
                "Gate": "quimb_tpu.tensor.circuit",
                "CircuitPEPOSimpleUpdate": "quimb_tpu.tensor.circuit",
                "CircuitPEPSSimpleUpdate": "quimb_tpu.tensor.circuit",
                "CircuitSimpleUpdate": "quimb_tpu.tensor.circuit",
                "LocalHamGen": "quimb_tpu.tensor.tnag.tebd",
                "TensorNetworkGenIso":
                    "quimb_tpu.experimental.merabuilder",
                "BeliefPropagationCommon":
                    "quimb_tpu.tensor.belief_propagation",
                "RegionGraph":
                    "quimb_tpu.tensor.belief_propagation",
            }[clsname]
            import importlib

            ours = getattr(importlib.import_module(mod), clsname)
        path = os.path.join(REFERENCE, relpath)
        if not os.path.exists(path):
            pytest.skip("reference not available")
        missing = sorted(
            m for m in _ref_methods(path, clsname)
            if not hasattr(ours, m)
        )
        assert not missing, f"{clsname} missing: {missing}"


class Test1DParity:
    def test_mpo_from_dense_roundtrip(self):
        H = qu.ham_heis(4, sparse=False)
        mpo = qtn.MatrixProductOperator.from_dense(
            np.asarray(H), dims=2
        )
        assert mpo.L == 4
        Hb = np.asarray(mpo.to_dense())
        assert np.allclose(Hb, np.asarray(H), atol=1e-10)

    def test_swap_site_to_permutes(self):
        psi = qtn.MPS_rand_state(5, 4, seed=0, dtype="float64")
        d0 = np.asarray(psi.to_dense()).reshape([2] * 5)
        psi2 = psi.swap_site_to(0, 3)
        d1 = np.asarray(psi2.to_dense()).reshape([2] * 5)
        # site 0 moved to position 3: (1, 2, 3, 0, 4)
        assert np.allclose(d1, np.transpose(d0, (1, 2, 3, 0, 4)),
                           atol=1e-8)

    def test_gate_with_mpo_matches_dense(self):
        psi = qtn.MPS_rand_state(4, 3, seed=1, dtype="float64")
        mpo = qtn.MPO_ham_heis(4)
        out = psi.gate_with_mpo(mpo, max_bond=16)
        dd = np.asarray(mpo.to_dense()) @ np.asarray(psi.to_dense())
        assert np.allclose(np.asarray(out.to_dense()), dd, atol=1e-8)

    def test_logneg_subsys(self):
        psi = qtn.MPS_rand_state(6, 4, seed=2, dtype="float64")
        psi.normalize()
        ln = psi.logneg_subsys(range(0, 2), range(2, 4))
        pd = qu.qu(np.asarray(psi.to_dense()))
        expect = qu.logneg_subsys(pd, [2] * 6, range(0, 2),
                                  range(2, 4))
        assert ln == pytest.approx(expect, rel=1e-6, abs=1e-8)

    def test_partial_trace_to_mpo(self):
        psi = qtn.MPS_rand_state(5, 3, seed=3, dtype="float64")
        psi.normalize()
        rho = psi.partial_trace_to_mpo(keep=(1, 2))
        rd = np.asarray(rho.to_dense())
        assert np.trace(rd) == pytest.approx(1.0, rel=1e-8)
        full = qu.qu(np.asarray(psi.to_dense()))
        rex = np.asarray(qu.ptr(full, [2] * 5, (1, 2)))
        assert np.allclose(rd, rex, atol=1e-8)


class Test2DParity:
    @pytest.fixture
    def norm2d(self):
        peps = qtn.PEPS.rand(3, 3, 2, seed=4, dtype="float64")
        norm = peps.make_norm()
        return norm, norm.contract(...)

    @pytest.mark.parametrize("d", ["xmin", "xmax", "ymin", "ymax"])
    def test_directional_boundary(self, norm2d, d):
        norm, exact = norm2d
        tn = norm.contract_boundary_from(d, max_bond=None, cutoff=0.0)
        assert tn.contract(...) == pytest.approx(exact, rel=1e-8)

    def test_plaquette_environments_exact(self, norm2d):
        norm, exact = norm2d
        envs = norm.compute_plaquette_environments(
            x_bsz=2, y_bsz=2, max_bond=None, cutoff=0.0
        )
        ((i0, j0), _), env = next(iter(envs.items()))
        plaq = norm.select_any(tuple(
            norm.site_tag(i0 + di, j0 + dj)
            for di in range(2) for dj in range(2)
        ))
        val = (env | plaq).contract(...)
        assert val == pytest.approx(exact, rel=1e-6)

    def test_canonize_row_value_preserving(self, norm2d):
        norm, exact = norm2d
        tn = norm.copy()
        tn.canonize_row(1, sweep="right")
        assert tn.contract(...) == pytest.approx(exact, rel=1e-8)

    def test_peps_constructors_and_sum(self):
        a = qtn.PEPS.rand(2, 3, 2, seed=5, dtype="float64")
        b = qtn.PEPS.rand(2, 3, 2, seed=6, dtype="float64")
        c = a.add_PEPS(b)
        da = np.asarray(a.to_dense())
        db = np.asarray(b.to_dense())
        dc = np.asarray(c.to_dense())
        assert np.allclose(dc, da + db, atol=1e-8)
        v = qtn.PEPS.vacuum(2, 2)
        dv = np.asarray(v.to_dense()).ravel()
        assert dv[0] == pytest.approx(1.0)
        assert np.allclose(dv[1:], 0.0)


class Test3DParity:
    @pytest.fixture
    def norm3d(self):
        peps = qtn.PEPS3D.rand(3, 2, 2, bond_dim=2, seed=7,
                               dtype="float64")
        norm = peps.make_norm()
        return norm, norm.contract(...)

    def test_boundary_exact(self, norm3d):
        norm, exact = norm3d
        v = norm.contract_boundary(max_bond=None, cutoff=0.0)
        assert v == pytest.approx(exact, rel=1e-8)

    def test_sequenced_and_ctmrg_hotrg(self, norm3d):
        norm, exact = norm3d
        for v in (
            norm.contract_boundary(max_bond=32, sequence=("xmin",
                                                          "ymin",
                                                          "zmin")),
            norm.contract_ctmrg(max_bond=32),
            norm.contract_hotrg(max_bond=32),
            norm.contract_peps_sweep(max_bond=32),
            norm.contract_simple_sweep(max_bond=32),
        ):
            assert v == pytest.approx(exact, rel=0.05)

    def test_plane_ops_value_preserving(self, norm3d):
        norm, exact = norm3d
        tn = norm.copy()
        tn.canonize_plane(xrange=(0, 2), yrange=(0, 1),
                          zrange=(0, 1))
        tn.compress_plane(xrange=(0, 2), yrange=(0, 1),
                          zrange=(0, 1), max_bond=16)
        assert tn.contract(...) == pytest.approx(exact, rel=1e-6)

    def test_flatten_and_coarse_grain(self, norm3d):
        norm, exact = norm3d
        fl = norm.flatten()
        for c in fl.gen_site_coos():
            assert len(fl.tag_map.get(fl.site_tag(*c), ())) <= 1
        assert fl.contract(...) == pytest.approx(exact, rel=1e-8)
        cg = norm.coarse_grain_hotrg("x", max_bond=32)
        assert cg.Lx == 2
        assert cg.contract(...) == pytest.approx(exact, rel=1e-6)

    def test_coo_helpers(self):
        peps = qtn.PEPS3D.rand(3, 3, 2, bond_dim=2, seed=8)
        assert peps.valid_coo((0, 0, 0))
        assert not peps.valid_coo((3, 0, 0))
        assert peps.has_site((2, 2, 1))
        assert not peps.has_site((9, 9, 9))
        assert peps.get_ranges_present() == ((0, 2), (0, 2), (0, 1))
        assert not peps.is_cyclic_x()
        assert peps.x_tags == ("X0", "X1", "X2")
        prs = list(peps.gen_pairs(xrange=(0, 1), yrange=(0, 1),
                                  zrange=(0, 0)))
        assert ((0, 0, 0), (1, 0, 0)) in prs
        assert len(list(peps.gen_bond_coos())) == 33


class TestAGGenParity:
    @pytest.fixture
    def tn(self):
        return qtn.TN_from_edges_rand(
            [(0, 1), (1, 2), (2, 3), (3, 0), (1, 3)], D=3, seed=7,
            dtype="float64",
        )

    def test_neighbor_and_bond_maps(self, tn):
        nmap = tn.get_site_neighbor_map()
        assert sorted(nmap[1]) == [0, 2, 3]
        bonds = sorted(tuple(sorted(b)) for b in tn.gen_bond_coos())
        assert bonds == [(0, 1), (0, 3), (1, 2), (1, 3), (2, 3)]

    def test_gloops_sites(self, tn):
        gl = set(tn.gen_gloops_sites(max_size=4))
        assert (0, 1, 3) in gl
        lg = tn.get_local_gloops(where=(0, 1), gloops=4)
        assert all({0, 1}.issubset(g) for g in lg)
        ls = tn.get_local_sloops(where=(0, 1), sloops=4)
        assert all({0, 1}.issubset(lp) for lp in ls)

    def test_retag_select_flatten(self, tn):
        exact = tn.contract(...)
        t2 = tn.retag_all("S{}")
        assert "S0" in t2.tag_map and t2.site_tag_id == "S{}"
        t3 = tn.copy()
        t3.site_tag_id = "Q{}"
        assert "Q2" in t3.tag_map
        assert tn.select_sites((0, 1)).num_tensors == 2
        assert list(tn.filter_valid_site_tags(["I0", "XX", "I3"])) \
            == ["I0", "I3"]
        fl = tn.flatten()
        assert fl.contract(...) == pytest.approx(exact, rel=1e-10)

    def test_gauge_all_simple_bounded_and_exact(self):
        # multi-layer networks overflow f64 unless the gauges are
        # renormalized with the scale tracked in the exponent
        norm = qtn.PEPS3D.rand(3, 3, 2, bond_dim=2, seed=1,
                               dtype="float64").make_norm()
        exact = norm.contract(...)
        g = norm.copy()
        gauges = {}
        g.gauge_all_simple_(max_iterations=10, gauges=gauges)
        gmax = max(float(np.max(np.asarray(v)))
                   for v in gauges.values())
        assert gmax < 10.0
        g.gauge_simple_insert(gauges)
        assert g.contract(...) == pytest.approx(exact, rel=1e-6)

    def test_normalize_simple_on_gen(self, tn):
        g = tn.copy()
        gauges = {}
        g.gauge_all_simple_(gauges=gauges)
        g.normalize_simple(gauges)


def _rand_gen_op(sites, edges, D=2, d=2, seed=0):
    rng = np.random.default_rng(seed)
    bonds = {tuple(sorted(e)): qtn.rand_uuid() for e in edges}
    ts = []
    for s in sites:
        inds = [bonds[tuple(sorted(e))] for e in edges if s in e]
        inds += [f"k{s}", f"b{s}"]
        shape = [D] * (len(inds) - 2) + [d, d]
        ts.append(qtn.Tensor(rng.normal(size=shape), inds=inds,
                             tags=[f"I{s}"]))
    tn = qtn.TensorNetwork(ts)
    return tn.view_as_(
        qtn.TensorNetworkGenOperator, sites=tuple(sites),
        site_tag_id="I{}", upper_ind_id="k{}", lower_ind_id="b{}",
    )


class TestAGOperatorParity:
    @pytest.fixture
    def ops(self):
        sites = (0, 1, 2)
        edges = [(0, 1), (1, 2), (0, 2)]
        A = _rand_gen_op(sites, edges, seed=1)
        U = _rand_gen_op(sites, edges, seed=2)
        return A, U, np.asarray(A.to_dense()), np.asarray(U.to_dense())

    def test_apply_and_lazy_gates(self, ops):
        A, U, dA, dU = ops
        assert np.allclose(np.asarray(A.apply(U).to_dense()),
                           dA @ dU, atol=1e-10)
        assert np.allclose(np.asarray(A.dot(U).to_dense()),
                           dA @ dU, atol=1e-10)
        assert np.allclose(
            np.asarray(A.gate_upper_with_op_lazy(U).to_dense()),
            dU @ dA, atol=1e-10)
        assert np.allclose(
            np.asarray(A.gate_lower_with_op_lazy(U).to_dense()),
            dA @ dU, atol=1e-10)
        assert np.allclose(
            np.asarray(A.gate_sandwich_with_op_lazy(U).to_dense()),
            dU @ dA @ dU.conj().T, atol=1e-10)

    def test_dense_gates(self, ops):
        A, U, dA, dU = ops
        G = np.random.default_rng(3).normal(size=(2, 2))
        G0 = np.kron(G, np.eye(4))
        assert np.allclose(
            np.asarray(A.gate_upper(G, 0).to_dense()),
            G0 @ dA, atol=1e-10)
        assert np.allclose(
            np.asarray(A.gate_lower(G, 0).to_dense()),
            dA @ G0.T, atol=1e-10)
        assert np.allclose(
            np.asarray(A.gate(G, 0).to_dense()),
            G0 @ dA @ G0.conj().T, atol=1e-10)

    def test_partial_transpose(self, ops):
        A, U, dA, dU = ops
        dX = np.asarray(A.partial_transpose([0]).to_dense())
        pt = dA.reshape([2] * 6).transpose(3, 1, 2, 0, 4, 5)
        assert np.allclose(dX, pt.reshape(8, 8), atol=1e-12)

    def test_inds_properties(self, ops):
        A, *_ = ops
        assert A.upper_inds == ("k0", "k1", "k2")
        assert A.lower_inds_present == ("b0", "b1", "b2")
        assert A.phys_dim() == 2


class TestMorePEPOAndDense1D:
    def test_pepo_rand_herm_zeros_add(self):
        W = qtn.PEPO.rand(2, 3, 2, seed=3, dtype="float64")
        dW = np.asarray(W.to_dense())
        assert dW.shape == (64, 64)
        Wh = qtn.PEPO.rand_herm(2, 2, 2, seed=4, dtype="float64")
        dWh = np.asarray(Wh.to_dense())
        assert np.allclose(dWh, dWh.conj().T)
        assert np.allclose(
            np.asarray(qtn.PEPO.zeros(2, 2, 2).to_dense()), 0)
        S = W.add_PEPO(W)
        assert np.allclose(np.asarray(S.to_dense()), 2 * dW,
                           atol=1e-10)

    def test_dense1d_rand(self):
        d = qtn.Dense1D.rand(4, seed=1)
        assert d.L == 4
        assert abs(complex(d.H @ d)) == pytest.approx(1.0)

    def test_1d_environments(self):
        psi = qtn.MPS_rand_state(5, 3, seed=0, dtype="float64")
        norm = psi.make_norm()
        n2 = float(psi.H @ psi)
        le = norm.compute_left_environments()
        re = norm.compute_right_environments()
        v = (norm.select(norm.site_tag(2)) | le[2].copy()
             | re[2].copy()).contract(...)
        assert v == pytest.approx(n2, rel=1e-10)

    def test_peps3d_partial_trace_and_expec(self):
        import quimb_tpu as _qu

        p3 = qtn.PEPS3D.rand(2, 2, 2, bond_dim=2, seed=5,
                             dtype="float64")
        psi_d = np.asarray(p3.to_dense()).ravel()
        psi_d = psi_d / np.linalg.norm(psi_d)
        rex = np.asarray(_qu.ptr(_qu.qu(psi_d.reshape(-1, 1)),
                                 [2] * 8, [0]))
        rho = np.asarray(p3.partial_trace([(0, 0, 0)]))
        assert np.allclose(rho, rex, atol=1e-10)
        Gz = np.diag([1.0, -1.0])
        ev = p3.compute_local_expectation(
            {((0, 0, 0),): Gz}, max_bond=64, cutoff=0.0)
        evd = float(psi_d.conj() @ np.kron(Gz, np.eye(128)) @ psi_d)
        assert float(ev) == pytest.approx(evd, abs=0.05)

    def test_tnoptimizer_vectorized(self):
        from quimb_tpu.tensor.optimize import Vectorizer

        psi = qtn.MPS_rand_state(4, 3, seed=0, dtype="float64")
        tno = qtn.TNOptimizer(psi, loss_fn=lambda t: t.H @ t,
                              progbar=False)
        assert tno.d > 0
        vec = Vectorizer(tno.params)
        x0 = vec.pack(tno.params)
        v = tno.vectorized_value(x0)
        assert v == pytest.approx(float(psi.H @ psi), rel=1e-8)
        hp = tno.vectorized_hessp(x0, np.ones_like(x0))
        assert np.isfinite(hp).all()
