"""A/B device timings: matvec orderings, split methods, safe_qr."""
import time
import functools
import jax, jax.numpy as jnp
import numpy as np
import quimb_tpu
from quimb_tpu.tensor.tn1d import dmrg as D
from quimb_tpu.ops import decomp


def fetch(x):
    return float(jnp.real(jnp.sum(x)))


def dev_time(label, body, x0, iters=40, reps=5):
    @functools.partial(jax.jit, static_argnames=("n",))
    def chain(x, n):
        return jax.lax.fori_loop(0, n, lambda i, x: body(x), x)

    fetch(chain(x0, 1)); fetch(chain(x0, iters))
    t1s, tns = [], []
    for _ in range(reps):
        t0 = time.perf_counter(); fetch(chain(x0, 1))
        t1s.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); fetch(chain(x0, iters))
        tns.append(time.perf_counter() - t0)
    per = (np.median(tns) - np.median(t1s)) / (iters - 1)
    print(f"{label:44s} {per*1e3:8.3f} ms/op", flush=True)
    return per


chi, d, w = 256, 2, 5
rng = np.random.default_rng(0)
f32 = np.float32
L = jnp.asarray(rng.standard_normal((chi, w, chi)).astype(f32) / chi)
R = jnp.asarray(rng.standard_normal((chi, w, chi)).astype(f32) / chi)
W1 = jnp.asarray(rng.standard_normal((w, w, d, d)).astype(f32))
W2 = jnp.asarray(rng.standard_normal((w, w, d, d)).astype(f32))
th = jnp.asarray(
    rng.standard_normal((chi, d, d, chi)).astype(f32) / 500)


# --- W12 (round-1) ordering, inline for A/B -------------------------
def _fuse_w12(W1, W2):
    return jnp.einsum("wxup,xyvq->wyuvpq", W1, W2)


def _mv_w12(L, W12, R, theta):
    T = jnp.einsum("awk,kpqr->awpqr", L, theta)
    T = jnp.einsum("awpqr,wyuvpq->ayuvr", T, W12)
    return jnp.einsum("ayuvr,byr->auvb", T, R)


@functools.partial(jax.jit, static_argnames=("ncv", "restarts"))
def _solve_w12(L, W1, W2, R, theta0, ncv, restarts):
    from quimb_tpu.linalg.lanczos import _lanczos_basis, _tridiag_eigh
    W12 = _fuse_w12(W1, W2)
    mv = lambda th: _mv_w12(L, W12, R, th)
    v = theta0 / jnp.linalg.norm(jnp.reshape(theta0, (-1,)))
    for _ in range(restarts):
        V, alpha, beta = _lanczos_basis(mv, v, ncv)
        wv, S = _tridiag_eigh(alpha, beta)
        lam = wv[0]
        coeff = S[:, 0].astype(V.dtype)
        vflat = coeff @ V
        v = jnp.reshape(vflat / jnp.linalg.norm(vflat), theta0.shape)
    return lam, v


LW1 = D._fuse_lw(L, W1)
W2R = D._fuse_wr(W2, R)
W12 = _fuse_w12(W1, W2)
dev_time("matvec deep-K",
         lambda x: D._heff_matvec_2site(LW1, W2R, x) /
         jnp.linalg.norm(x), th)
dev_time("matvec W12",
         lambda x: _mv_w12(L, W12, R, x) / jnp.linalg.norm(x), th)
dev_time("solve deep-K (8mv)",
         lambda x: D._local_solve_2site(
             L, W1, W2, R, x, ncv=8, restarts=1)[1], th)
dev_time("solve W12 (8mv)",
         lambda x: _solve_w12(L, W1, W2, R, x, ncv=8, restarts=1)[1],
         th)

mat = jnp.reshape(th, (chi * d, d * chi))
dev_time("safe_qr 512x256",
         lambda x: decomp.safe_qr(x[:, :chi])[0] @ mat[:chi, :] + x,
         mat)
def split_roundtrip(x, m):
    A1, A2, _ = D._split_2site(
        x, max_bond=chi, cutoff=0.0, absorb="right", method=m)
    return jnp.einsum("kpc,cqr->kpqr", A1, A2)


for method in ("svd:eig", "svd:sub", "svd:sub0"):
    dev_time(f"split_2site {method}",
             lambda x, m=method: split_roundtrip(x, m), th)
