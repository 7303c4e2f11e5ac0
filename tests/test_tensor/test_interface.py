"""Behavior tests for the interface/pack layer (C41: reference
``quimb/tensor/interface.py`` pack/unpack + the TPU build's native
pytree registration, which lets whole TensorNetworks flow through
``jax.jit``/``jax.grad`` directly)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import quimb_tpu.tensor as qtn
from quimb_tpu.tensor.interface import pack, unpack


class TestPackUnpack:
    def test_roundtrip_tensor(self):
        t = qtn.Tensor(
            np.random.default_rng(0).normal(size=(3, 4)),
            inds=("a", "b"), tags={"X"},
        )
        params, skeleton = pack(t)
        t2 = unpack(params, skeleton)
        assert t2.inds == t.inds
        assert t2.tags == t.tags
        assert np.allclose(np.asarray(t2.data), np.asarray(t.data))

    def test_roundtrip_network(self):
        mps = qtn.MPS_rand_state(6, 5, seed=1, dtype="float64")
        params, skeleton = pack(mps)
        assert isinstance(params, dict) and len(params) == 6
        mps2 = unpack(params, skeleton)
        assert type(mps2) is type(mps)
        assert mps2.distance_normalized(mps) < 1e-12

    def test_params_are_raw_arrays(self):
        mps = qtn.MPS_rand_state(4, 3, seed=2)
        params, _ = pack(mps)
        for v in params.values():
            assert hasattr(v, "shape") and not isinstance(v, qtn.Tensor)

    def test_modified_params_change_state(self):
        mps = qtn.MPS_rand_state(4, 3, seed=3, dtype="float64")
        params, skeleton = pack(mps)
        params = {k: 2.0 * v for k, v in params.items()}
        mps2 = unpack(params, skeleton)
        n1 = abs(complex(mps @ mps.H))
        n2 = abs(complex(mps2 @ mps2.H))
        # norm^2 scales by 4^nsites
        assert n2 / n1 == pytest.approx(4.0**4, rel=1e-8)


class TestNativePytree:
    def test_jit_over_network(self):
        mps = qtn.MPS_rand_state(5, 4, seed=4, dtype="float64")

        @jax.jit
        def norm2(tn):
            return (tn @ tn.H).real

        got = float(norm2(mps))
        want = float((mps @ mps.H).real)
        assert got == pytest.approx(want, rel=1e-10)

    def test_grad_through_network(self):
        target = qtn.MPS_rand_state(5, 4, seed=5, dtype="float64")
        psi = qtn.MPS_rand_state(5, 4, seed=6, dtype="float64")

        def neg_overlap(tn):
            return -((tn @ target.H).real ** 2) / (tn @ tn.H).real

        g = jax.grad(neg_overlap)(psi)
        # gradient comes back as a TN of the same structure
        assert g.num_tensors == psi.num_tensors
        # gradient step must improve the (normalized) overlap
        lr = 0.1
        stepped = psi.copy()
        for ts, tg in zip(
            stepped.tensor_map.values(), g.tensor_map.values()
        ):
            ts.modify(data=ts.data - lr * tg.transpose(*ts.inds).data)
        assert neg_overlap(stepped) < neg_overlap(psi)

    def test_tree_flatten_roundtrip(self):
        mps = qtn.MPS_rand_state(4, 3, seed=7, dtype="float64")
        leaves, treedef = jax.tree_util.tree_flatten(mps)
        assert len(leaves) == 4
        mps2 = jax.tree_util.tree_unflatten(treedef, leaves)
        assert type(mps2) is type(mps)
        assert mps2.distance_normalized(mps) < 1e-12
        for t1, t2 in zip(
            mps.tensor_map.values(), mps2.tensor_map.values()
        ):
            assert t1.inds == t2.inds
            assert t1.tags == t2.tags

    def test_vmap_over_stacked_params(self):
        """vmap a TN-consuming function over a batch of parameter
        pytrees — the sliced-contraction/VMC batching pattern."""
        mps = qtn.MPS_rand_state(4, 3, seed=8, dtype="float64")
        params, skeleton = pack(mps)
        B = 5
        rng = np.random.default_rng(9)
        batched = {
            k: jnp.asarray(
                rng.normal(size=(B, *np.shape(v))), dtype="float64"
            )
            for k, v in params.items()
        }

        def norm2_from_params(p):
            tn = unpack(p, skeleton)
            return (tn @ tn.H).real

        out = jax.vmap(norm2_from_params)(batched)
        assert out.shape == (B,)
        one = norm2_from_params(
            {k: v[2] for k, v in batched.items()}
        )
        assert float(out[2]) == pytest.approx(float(one), rel=1e-9)
