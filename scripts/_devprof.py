"""True device-time microbenchmarks through the high-latency tunnel:
run K dependency-chained iterations inside ONE compiled call, sync
once, subtract the measured empty-call floor, divide by K."""
import time
import functools
import jax, jax.numpy as jnp
import numpy as np
import quimb_tpu  # config side effects

rng = np.random.default_rng(0)
f32 = np.float32


def fetch(x):
    return float(jnp.real(jnp.sum(x)))


def dev_time(label, body, x0, iters=40, reps=5, flops=None):
    """body: x -> x (same shape/dtype), chained `iters` times."""

    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(x, n):
        def f(i, x):
            return body(x)
        return jax.lax.fori_loop(0, n, f, x)

    # warm both variants (compile)
    fetch(chain(x0, 1))
    fetch(chain(x0, iters))
    t1s, tns = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); fetch(chain(x0, 1))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); fetch(chain(x0, iters))
        tns.append(time.perf_counter() - t0)
    t1 = np.median(t1s); tn = np.median(tns)
    per = (tn - t1) / (iters - 1)
    extra = f"  ({flops/per/1e12:.2f} TF/s)" if flops and per > 0 \
        else ""
    print(f"{label:42s} {per*1e3:8.3f} ms/op{extra}", flush=True)
    return per


chi, d, w = 256, 2, 5
M = jnp.asarray(rng.standard_normal((512, 512)).astype(f32))
G = M @ M.T + 512 * jnp.eye(512, dtype=jnp.float32)
G = G / jnp.linalg.norm(G)
fetch(G)

# LAPACK-style primitives: wrap to keep x->x chaining
dev_time("eigh 512", lambda X: jnp.linalg.eigh(X)[1] @ X, G)
dev_time("eigh 256",
         lambda X: jnp.linalg.eigh(X)[1] @ X, G[:256, :256])
dev_time("eigh 16", lambda X: jnp.linalg.eigh(X)[1] @ X, G[:16, :16])
dev_time("qr 512x512", lambda X: jnp.linalg.qr(X)[0] + X, G)
dev_time("qr 512x256 (tall)",
         lambda X: jnp.linalg.qr(X)[0] + X, M[:, :256] / 30)
dev_time("cholesky 256",
         lambda X: jnp.linalg.cholesky(X) @ X, G[:256, :256])
dev_time("triangular_solve 256x512",
         lambda X: jax.scipy.linalg.solve_triangular(
             G[:256, :256] + jnp.eye(256), X, lower=True) * 1e-3,
         M[:256, :] / 30)
dev_time("matmul 512x512x512",
         lambda X: (X @ X) * 1e-2, G, flops=2 * 512**3)
dev_time("matmul 2048^3",
         lambda X: (X @ X) / jnp.linalg.norm(X @ X),
         jnp.asarray(rng.standard_normal((2048, 2048)).astype(f32)),
         iters=20, flops=2 * 2048**3)

# the DMRG kernels
from quimb_tpu.tensor.tn1d import dmrg as D

L = jnp.asarray(rng.standard_normal((chi, w, chi)).astype(f32) / chi)
R = jnp.asarray(rng.standard_normal((chi, w, chi)).astype(f32) / chi)
W1 = jnp.asarray(rng.standard_normal((w, w, d, d)).astype(f32))
W2 = jnp.asarray(rng.standard_normal((w, w, d, d)).astype(f32))
th = jnp.asarray(
    rng.standard_normal((chi, d, d, chi)).astype(f32) / 500)
LW1 = D._fuse_lw(L, W1)
W2R = D._fuse_wr(W2, R)
mv_flops = 2 * (512 * 2560 * 512 + 512 * 512 * 2560)
dev_time("heff matvec deep-K",
         lambda x: D._heff_matvec_2site(LW1, W2R, x) /
         jnp.linalg.norm(x), th, flops=mv_flops)
dev_time("local_solve_2site (8mv+tridiag)",
         lambda x: D._local_solve_2site(
             L, W1, W2, R, x, ncv=8, restarts=1)[1], th,
         flops=8 * mv_flops)
dev_time("split_2site svd:eig",
         lambda x: D._split_2site(
             x, max_bond=chi, cutoff=0.0, absorb="right",
             method="svd:eig")[0].reshape(chi, d, d, chi) + x, th)
dev_time("env_step_right",
         lambda E: D._env_step_right(
             E / jnp.linalg.norm(E), jnp.conj(
                 jnp.asarray(rng.standard_normal(
                     (chi, d, chi)).astype(f32) / 20)),
             W1, jnp.asarray(rng.standard_normal(
                 (chi, d, chi)).astype(f32) / 20)), L)
