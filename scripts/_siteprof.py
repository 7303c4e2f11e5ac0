"""Per-site serial-chain roofline (VERDICT r2 item 3b): decompose the
~8 ms/site of the chi=256 fused DMRG sweep into its compiled stages,
each timed as a dependent chain on the real TPU:

  - full _local_solve_2site (ncv=8, restarts=2 — production config)
  - _lanczos_basis alone (the matvec chain + reorthogonalization)
  - a bare ncv-matvec chain (no reorth/alpha/beta bookkeeping)
  - _tridiag_eigh alone (8x8 eigh — fixed-latency suspect)
  - _split_2site with the production svd:sub method
  - tall QR vs cholesky-QR at the split's (chi*d, k) panel size
  - _env_step_right alone

Prints stage medians in ms and writes scripts/siteprof_results.json.
Usage: python -u scripts/_siteprof.py [chi] [w]
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from quimb_tpu.tensor.tn1d import dmrg as D  # noqa: E402
from quimb_tpu.linalg.lanczos import (  # noqa: E402
    _lanczos_basis, _tridiag_eigh,
)
from quimb_tpu.ops import decomp  # noqa: E402

RESULTS = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                       "siteprof_results.json")


def timeit(fn, *args, iters=32, reps=3):
    """Median wall seconds per call of ``fn(*args)``, measured as a
    dependent ``fori_loop`` chain inside ONE jitted program: a carried
    scalar perturbs the first argument each iteration, so the remote
    tunnel cannot dedup/cache identical calls, and per-call dispatch
    is amortized away (the tunnel's eager round-trip is ~1 ms — larger
    than most of these stages)."""

    @jax.jit
    def chain(s0, *a):
        def body(i, s):
            a0 = a[0] * (1.0 + 1e-12 * s)
            out = fn(a0, *a[1:])
            leaf = jax.tree_util.tree_leaves(out)[0]
            return jnp.mean(jnp.abs(
                jnp.reshape(leaf, (-1,))[:1].astype(jnp.float32)))
        return jax.lax.fori_loop(0, iters, body, s0)

    float(chain(jnp.float32(1.0), *args))  # compile + fetch
    ts = []
    for rep in range(reps):
        # distinct s0 per rep (identical requests are result-cached by
        # the remote tunnel) and a scalar FETCH to force completion
        # (block_until_ready alone does not round-trip the tunnel)
        s0 = jnp.float32(2.0 + rep)
        t0 = time.perf_counter()
        float(chain(s0, *args))
        ts.append((time.perf_counter() - t0) / iters)
    return sorted(ts)[len(ts) // 2]


def main():
    chi = int(sys.argv[1]) if len(sys.argv) > 1 else 256
    w = int(sys.argv[2]) if len(sys.argv) > 2 else 5
    d = 2
    ncv, restarts = 8, 2
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 8)
    f32 = jnp.float32

    L = jax.random.normal(ks[0], (chi, w, chi), f32) * 0.1
    R = jax.random.normal(ks[1], (chi, w, chi), f32) * 0.1
    W1 = jax.random.normal(ks[2], (w, w, d, d), f32) * 0.1
    W2 = jax.random.normal(ks[3], (w, w, d, d), f32) * 0.1
    # symmetrize the effective operator enough for Lanczos stability:
    # use W + W^T in the physical legs
    W1 = W1 + jnp.transpose(W1, (0, 1, 3, 2))
    W2 = W2 + jnp.transpose(W2, (0, 1, 3, 2))
    theta0 = jax.random.normal(ks[4], (chi, d, d, chi), f32)

    res = {"chi": chi, "w": w, "ncv": ncv, "restarts": restarts,
           "device": jax.devices()[0].device_kind, "stages_ms": {}}
    S = res["stages_ms"]

    def rec(name, dt):
        S[name] = round(dt * 1e3, 3)
        print(f"{name}: {dt*1e3:.3f} ms", flush=True)
        with open(RESULTS, "w") as f:
            json.dump(res, f, indent=1)

    # --- full local solve (the production per-site eigensolve)
    solve = jax.jit(lambda L, W1, W2, R, th: D._local_solve_2site(
        L, W1, W2, R, th, ncv=ncv, restarts=restarts))
    rec("local_solve_2site", timeit(solve, L, W1, W2, R, theta0))

    # --- lanczos basis only (one restart's worth)
    LW1 = D._fuse_lw(L, W1)
    W2R = D._fuse_wr(W2, R)

    @jax.jit
    def lanczos_only(LW1, W2R, th):
        def mv(x):
            return D._heff_matvec_2site(LW1, W2R, x)
        V, a, b = _lanczos_basis(mv, th, ncv)
        return V[0], a, b

    rec("lanczos_basis(1 restart)",
        timeit(lanczos_only, LW1, W2R, theta0))

    # --- bare matvec chain (ncv dependent matvecs, no bookkeeping)
    @jax.jit
    def matvec_chain(LW1, W2R, th):
        def body(i, x):
            y = D._heff_matvec_2site(LW1, W2R, x)
            return y / jnp.linalg.norm(jnp.reshape(y, (-1,)))
        return jax.lax.fori_loop(0, ncv, body, th)

    rec("matvec_chain(ncv)", timeit(matvec_chain, LW1, W2R, theta0))

    # --- tridiag eigh alone (the 8x8 eigh inside each restart)
    alpha = jax.random.normal(ks[5], (ncv,), f32)
    beta = jax.random.normal(ks[6], (ncv,), f32) * 0.1

    @jax.jit
    def tde(alpha, beta):
        wv, Sv = _tridiag_eigh(alpha, beta)
        return wv[0], Sv[:, 0]

    rec("tridiag_eigh(8x8)", timeit(tde, alpha, beta))

    # --- the production split
    split = jax.jit(lambda th: D._split_2site(
        th, max_bond=chi, cutoff=0.0, absorb="right",
        method="svd:sub0"))
    rec("split_2site(svd:sub0)", timeit(split, theta0))

    split2 = jax.jit(lambda th: D._split_2site(
        th, max_bond=chi, cutoff=0.0, absorb="right",
        method="svd:sub"))
    rec("split_2site(svd:sub)", timeit(split2, theta0))

    # --- tall QR vs cholesky-QR at the split's panel size
    k = min(chi + 8, chi * d)
    panel = jax.random.normal(ks[7], (chi * d, k), f32)

    @jax.jit
    def tall_qr(p):
        q, r = jnp.linalg.qr(p)
        return q[:, :1]

    rec(f"tall_qr({chi*d}x{k})", timeit(tall_qr, panel))

    @jax.jit
    def chol_qr(p):
        g = p.T @ p
        g = g + 1e-6 * jnp.trace(g) / k * jnp.eye(k, dtype=p.dtype)
        c = jnp.linalg.cholesky(g)
        q = jax.scipy.linalg.solve_triangular(
            c, p.T, lower=True).T
        return q[:, :1]

    rec(f"cholesky_qr({chi*d}x{k})", timeit(chol_qr, panel))

    @jax.jit
    def small_eigh(p):
        g = p.T @ p
        wv, v = jnp.linalg.eigh(g)
        return wv[0], v[:, 0]

    rec(f"eigh({k}x{k})", timeit(small_eigh, panel))

    # --- environment absorption
    A = jax.random.normal(key, (chi, d, chi), f32)
    env = jax.jit(lambda Lv, Av, Wv: D._env_step_right(
        Lv, jnp.conj(Av), Wv, Av))
    rec("env_step_right", timeit(env, L, A, W1))

    # --- overlap norm (the variational normalization added r3)
    on = jax.jit(D._overlap_norm_2site)
    rec("overlap_norm_2site", timeit(on, L, R, theta0))

    print(json.dumps(res, indent=1))


if __name__ == "__main__":
    main()
