"""Serial-chain cut prototypes (VERDICT r2 item 3c), A/B'd on the
real TPU at the chi=256 production shapes:

1. tridiag ground pair: jnp.linalg.eigh(8x8) [1.28 ms measured] vs
   shifted power iteration by repeated squaring (5 tiny matmuls).
2. rank-k subspace split of a (512, 512) theta: the production
   split_truncated_subspace [6.4 ms, contains a (k+8) eigh] vs
   variants without the Rayleigh-Ritz eigh and with cholesky-QR
   orthogonalization.

Each timed as a dependent chain with scalar fetch (tunnel-safe), each
also scored for *accuracy*: Ritz-pair residual, and truncation error
vs the optimal rank-k error.

Usage: python -u scripts/_cutprof.py [chi]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

from quimb_tpu.ops import decomp  # noqa: E402
from quimb_tpu.linalg.lanczos import _tridiag_eigh  # noqa: E402

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "cutprof_results.json")


def timeit(fn, *args, iters=32, reps=3):
    @jax.jit
    def chain(s0, *a):
        def body(i, s):
            a0 = a[0] * (1.0 + 1e-12 * s)
            out = fn(a0, *a[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.mean(jnp.abs(
                jnp.reshape(leaf, (-1,))[:1].astype(jnp.float32)))
        return jax.lax.fori_loop(0, iters, body, s0)

    float(chain(jnp.float32(1.0), *args))
    ts = []
    for rep in range(reps):
        s0 = jnp.float32(2.0 + rep)
        t0 = time.perf_counter()
        float(chain(s0, *args))
        ts.append((time.perf_counter() - t0) / iters)
    return sorted(ts)[len(ts) // 2]


def tridiag_ground_power(alpha, beta, squarings=5, refine=2):
    """Ground Ritz pair of the (ncv, ncv) symmetric tridiagonal via
    shifted power iteration with repeated squaring — no eigh."""
    m = alpha.shape[0]
    T = (
        jnp.diag(alpha)
        + jnp.diag(beta[: m - 1], 1)
        + jnp.diag(beta[: m - 1], -1)
    )
    # Gershgorin upper bound: lam_max <= max_i(a_i + |b_i| + |b_i-1|)
    babs = jnp.abs(beta[: m - 1])
    row = jnp.abs(alpha) + jnp.pad(babs, (0, 1)) + jnp.pad(babs, (1, 0))
    sig = jnp.max(row) * (1 + 1e-6) + 1e-30
    M = sig * jnp.eye(m, dtype=T.dtype) - T
    # M^(2^squarings), Frobenius-normalized each squaring
    def sq(i, M):
        M = M @ M
        return M / jnp.linalg.norm(M)
    M = jax.lax.fori_loop(0, squarings, sq, M / jnp.linalg.norm(M))
    v = M @ jnp.ones((m,), dtype=T.dtype)
    v = v / jnp.linalg.norm(v)
    Mr = sig * jnp.eye(m, dtype=T.dtype) - T
    def rf(i, v):
        v = Mr @ v
        return v / jnp.linalg.norm(v)
    v = jax.lax.fori_loop(0, refine, rf, v)
    lam = v @ (T @ v)
    return lam, v


def main():
    chi = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    d = 2
    ncv = 8
    f32 = jnp.float32
    res = {"chi": chi, "device": jax.devices()[0].device_kind}

    # ---------- tridiag ground pair ----------
    key = jax.random.PRNGKey(1)
    alpha = jax.random.normal(key, (ncv,), f32)
    beta = jnp.abs(jax.random.normal(
        jax.random.PRNGKey(2), (ncv,), f32)) * 0.5

    @jax.jit
    def via_eigh(alpha, beta):
        w, S = _tridiag_eigh(alpha, beta)
        return w[0], S[:, 0]

    @jax.jit
    def via_power(alpha, beta):
        return tridiag_ground_power(alpha, beta)

    t_e = timeit(via_eigh, alpha, beta)
    t_p = timeit(via_power, alpha, beta)

    # accuracy over many random tridiagonals
    lam_errs, vec_errs = [], []
    for i in range(50):
        a = np.random.default_rng(i).standard_normal(ncv).astype("f")
        b = (np.random.default_rng(100 + i).standard_normal(ncv)
             * 0.5).astype("f")
        T = (np.diag(a) + np.diag(b[:-1], 1) + np.diag(b[:-1], -1))
        w_np, S_np = np.linalg.eigh(T.astype("d"))
        lam_p, v_p = via_power(jnp.asarray(a), jnp.asarray(b))
        lam_p = float(lam_p)
        v_p = np.asarray(v_p).astype("d")
        lam_errs.append(abs(lam_p - w_np[0]) / max(abs(w_np[0]), 1e-12))
        vec_errs.append(1.0 - abs(v_p @ S_np[:, 0]))
    res["tridiag"] = {
        "eigh_ms": round(t_e * 1e3, 3),
        "power_ms": round(t_p * 1e3, 3),
        "power_lam_relerr_median": float(np.median(lam_errs)),
        "power_lam_relerr_max": float(np.max(lam_errs)),
        "power_vec_err_median": float(np.median(vec_errs)),
        "power_vec_err_max": float(np.max(vec_errs)),
    }
    print("tridiag:", json.dumps(res["tridiag"]), flush=True)
    with open(RESULTS, "w") as f:
        json.dump(res, f, indent=1)

    # ---------- rank-k subspace split ----------
    m = chi * d
    k = chi
    # DMRG-like theta: rapidly decaying spectrum
    rng = np.random.default_rng(0)
    U0, _ = np.linalg.qr(rng.standard_normal((m, m)))
    V0, _ = np.linalg.qr(rng.standard_normal((m, m)))
    s0 = np.exp(-np.arange(m) / 40.0)
    X = (U0 * s0) @ V0.T
    x = jnp.asarray(X.astype("f"))
    # optimal rank-k error
    err_opt = float(np.sqrt((s0[k:] ** 2).sum()))

    def quality(U):
        U = np.asarray(U).astype("d")
        resid = X - U @ (U.T @ X)
        return float(np.linalg.norm(resid))

    variants = {}

    @jax.jit
    def v_prod(x):
        U, _, VH, _ = decomp.split_truncated_subspace(
            x, max_bond=k, absorb="right")
        return U, VH

    variants["production(iters=2,os=8,eigh)"] = v_prod

    def subspace_noeig(x, iters, oversample, chol):
        G = x @ decomp.dag(x)
        kk = k + oversample
        om = jax.random.normal(
            jax.random.PRNGKey(0), (m, kk), f32)
        V = om
        for it in range(iters):
            Y = G @ V
            if chol:
                g = decomp.dag(Y) @ Y
                g = g + (jnp.finfo(f32).eps * jnp.trace(g)) * jnp.eye(
                    kk, dtype=f32)
                c = jnp.linalg.cholesky(g)
                V = jax.scipy.linalg.solve_triangular(
                    c, decomp.dag(Y), lower=True)
                V = decomp.dag(V)
            else:
                Q, _ = decomp.safe_qr(Y)
                V = Q[:, :kk]
        V = V[:, :k]
        U = V
        VH = decomp.dag(V) @ x
        return U, VH

    for iters in (1, 2):
        for chol in (False, True):
            name = f"noeig(iters={iters},{'cholqr' if chol else 'qr'})"
            variants[name] = jax.jit(functools_partial(
                subspace_noeig, iters=iters, oversample=0, chol=chol))

    for name, fn in variants.items():
        t = timeit(fn, x)
        U, VH = fn(x)
        q = quality(U)
        variants_res = res.setdefault("split", {})
        variants_res[name] = {
            "ms": round(t * 1e3, 3),
            "trunc_err": round(q, 6),
            "err_vs_optimal": round(q / err_opt, 4),
        }
        print(name, variants_res[name], flush=True)
        with open(RESULTS, "w") as f:
            json.dump(res, f, indent=1)


def functools_partial(fn, **kw):
    import functools

    return functools.partial(fn, **kw)


if __name__ == "__main__":
    main()
