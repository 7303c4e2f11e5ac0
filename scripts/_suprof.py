"""Microbenchmark the fused-SU hot ops on the current device: the
batched tiny SVD (the suspected TPU bottleneck), batched QR, eigh, and
a matmul-only subspace split candidate. Then one full _su_evolve step.

Usage: python scripts/_suprof.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, reps=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    from quimb_tpu.ops.decomp import safe_qr, safe_svd

    Lx, nj, D, p = 16, 8, 3, 2
    kA = p * D
    key = jax.random.PRNGKey(0)
    M = jax.random.normal(key, (Lx, nj, kA * p, p * kA), jnp.float32)
    A27 = jax.random.normal(key, (Lx, nj, D**3, p * D), jnp.float32)

    f_svd = jax.jit(lambda m: safe_svd(m))
    f_qr = jax.jit(lambda m: safe_qr(m))
    f_eigh = jax.jit(lambda m: jnp.linalg.eigh(
        jnp.einsum("...ij,...kj->...ik", m, m)))

    def subsplit(m):
        # matmul-only rank-D split: G = m m^T, subspace iteration with
        # unrolled modified Gram-Schmidt orthonormalization
        G = jnp.einsum("...ij,...kj->...ik", m, m)
        Q = G[..., :, :D]
        for _ in range(3):
            Y = jnp.einsum("...ik,...kj->...ij", G, Q)
            cols = []
            for c in range(D):
                v = Y[..., :, c]
                for u in cols:
                    v = v - u * jnp.sum(u * v, axis=-1, keepdims=True)
                v = v / jnp.maximum(
                    jnp.linalg.norm(v, axis=-1, keepdims=True), 1e-30)
                cols.append(v)
            Q = jnp.stack(cols, axis=-1)
        B = jnp.einsum("...ki,...kj->...ij", Q, m)   # (D, n)
        s = jnp.linalg.norm(B, axis=-1)
        V = B / jnp.maximum(s[..., None], 1e-30)
        return Q, s, V

    f_sub = jax.jit(subsplit)

    print(f"device: {jax.devices()[0]}", flush=True)
    print(f"svd  {M.shape}: {timeit(f_svd, M)*1e3:.2f} ms", flush=True)
    print(f"eigh {M.shape}: {timeit(f_eigh, M)*1e3:.2f} ms", flush=True)
    print(f"qr   {A27.shape}: {timeit(f_qr, A27)*1e3:.2f} ms", flush=True)
    print(f"sub  {M.shape}: {timeit(f_sub, M)*1e3:.2f} ms", flush=True)

    # accuracy of subsplit vs svd on SU-like (decaying) spectra
    U0, s0, V0 = np.linalg.svd(np.asarray(M[0, 0]))
    s_dec = s0 * np.exp(-np.arange(len(s0)))
    Mdec = (U0 * s_dec) @ V0
    Mdecb = jnp.tile(jnp.asarray(Mdec, jnp.float32)[None, None],
                     (1, 1, 1, 1))
    Q, s, V = f_sub(Mdecb)
    err_sub = np.linalg.norm(
        np.asarray(Mdec) - np.asarray(Q[0, 0]) @ (np.asarray(s[0, 0])[:, None] * np.asarray(V[0, 0])))
    u, sv, vt = np.linalg.svd(Mdec)
    err_opt = np.linalg.norm(
        Mdec - (u[:, :D] * sv[:D]) @ vt[:D])
    print(f"rank-{D} resid: subsplit {err_sub:.3e} vs optimal "
          f"{err_opt:.3e}", flush=True)

    # full fused step
    from quimb_tpu.tensor.tn2d import su_fused as sf
    import quimb_tpu.tensor as qtn
    L = 16
    psi0 = qtn.PEPS.rand(L, L, bond_dim=D, seed=42)
    ham = qtn.ham_2d_heis(L, L)
    su = qtn.SimpleUpdate(psi0, ham, D=D, compute_energy_every=None,
                          compute_energy_final=False)
    t0 = time.perf_counter()
    su.evolve(1, tau=0.1)
    print(f"evolve(1) incl compile: {time.perf_counter()-t0:.1f}s",
          flush=True)
    t0 = time.perf_counter()
    su.evolve(4, tau=0.1)
    print(f"evolve(4) warm: {(time.perf_counter()-t0)/4:.2f} s/step",
          flush=True)


if __name__ == "__main__":
    main()
