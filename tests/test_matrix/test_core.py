"""LocalTermsHam: gather-free local-terms device matvec."""

import jax.numpy as jnp
import numpy as np


class TestLocalTermsHam:
    def test_matvec_matches_ell_and_dense(self):
        import quimb_tpu as qu
        from quimb_tpu.core import (
            LocalTermsHam, SparseHam, device_operator,
        )

        N = 8
        H = qu.ham_heis(N, sparse=True, b=0.3)
        assert hasattr(H, "_quimb_tpu_local_terms")
        Hop = device_operator(H)
        assert isinstance(Hop, LocalTermsHam)
        ell = SparseHam(H)
        rng = np.random.default_rng(0)
        v = jnp.asarray(rng.normal(size=2**N))
        r_lt = np.asarray(Hop @ v)
        r_ell = np.asarray(ell @ v)
        assert np.allclose(r_lt, r_ell, atol=1e-5)
        # dense reference
        Hd = np.asarray(qu.ham_heis(N, b=0.3))
        r_d = (Hd @ np.asarray(v).astype(complex)).real
        assert np.allclose(r_lt, r_d, atol=1e-5)

    def test_groundenergy_via_local_terms(self):
        import quimb_tpu as qu

        N = 10
        H = qu.ham_heis(N, sparse=True)
        e0 = float(qu.groundenergy(H))
        import scipy.sparse.linalg as spla

        e_ref = float(spla.eigsh(H, k=1, which="SA")[0][0])
        assert abs(e0 - e_ref) < 1e-5

    def test_nonadjacent_and_single_site_terms(self):
        from quimb_tpu.core import LocalTermsHam

        rng = np.random.default_rng(1)
        dims = (2, 2, 2, 2)
        z = np.diag([1.0, -1.0])
        x = np.array([[0, 1.0], [1.0, 0]])
        terms = {
            (0, 2): np.kron(z, z) * 0.7,
            (1,): x * 0.3,
            (1, 3): np.kron(x, x) * 0.2,
        }
        Hop = LocalTermsHam(dims, terms)
        v = jnp.asarray(rng.normal(size=16))
        got = np.asarray(Hop @ v)
        # dense construction
        import quimb_tpu as qu
        want = np.zeros((16, 16))
        want += np.asarray(qu.ikron([0.7 * z, z], dims, (0, 2))).real
        want += np.asarray(qu.ikron([0.3 * x], dims, (1,))).real
        want += np.asarray(qu.ikron([0.2 * x, x], dims, (1, 3))).real
        assert np.allclose(got, want @ np.asarray(v), atol=1e-5)
