"""Component-level TPU timings for the DMRG L=128 chi=256 sweep."""
import time
import jax, jax.numpy as jnp
import numpy as np
import quimb_tpu  # config side effects
from quimb_tpu.tensor.tn1d import dmrg as D

chi, d, w, n_sites = 256, 2, 5, 110
rng = np.random.default_rng(0)
f32 = np.float32
L = jnp.asarray(rng.standard_normal((chi, w, chi)).astype(f32) / chi)
R = jnp.asarray(rng.standard_normal((chi, w, chi)).astype(f32) / chi)
W1 = jnp.asarray(rng.standard_normal((w, w, d, d)).astype(f32))
W2 = jnp.asarray(rng.standard_normal((w, w, d, d)).astype(f32))
th = jnp.asarray(rng.standard_normal((chi, d, d, chi)).astype(f32))
A = jnp.asarray(rng.standard_normal((chi, d, chi)).astype(f32) / 20)
m512 = jnp.reshape(th, (chi * d, d * chi))


def _sync(out):
    """block_until_ready is a no-op through the axon tunnel — the only
    real barrier is fetching a value, which waits on the whole
    dependency chain."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(jnp.real(jnp.sum(leaf)))


def bench(label, fn, *args, n=20, flops=None, **kw):
    out = fn(*args, **kw)
    _sync(out)
    ts = []
    for _ in range(n):
        t0 = time.perf_counter()
        out = fn(*args, **kw)
        _sync(out)
        ts.append(time.perf_counter() - t0)
    med = float(np.median(ts)) * 1e3
    extra = f"  ({flops/np.median(ts)/1e12:.2f} TF/s)" if flops else ""
    print(f"{label:38s} {med:8.3f} ms{extra}", flush=True)
    return out


jit = jax.jit

mv_flops = 2 * (512 * 2560 * 512 + 512 * 512 * 2560)
LW1 = D._fuse_lw(L, W1)
W2R = D._fuse_wr(W2, R)
bench("matvec deep-K (1x)", jit(D._heff_matvec_2site), LW1, W2R, th,
      flops=mv_flops)

bench("local_solve_2site (8 mv)",
      lambda: D._local_solve_2site(L, W1, W2, R, th, ncv=8,
                                   restarts=1), flops=8 * mv_flops)

bench("split_2site svd:eig",
      lambda: D._split_2site(th, max_bond=chi, cutoff=0.0,
                             absorb="right", method="svd:eig"))

gram = jit(lambda x: x @ x.T)
g = gram(m512)
bench("gram 512", gram, m512, flops=2 * 512**3)
bench("eigh 512", jit(jnp.linalg.eigh), g)
bench("qr 512x512", jit(jnp.linalg.qr), m512)
bench("env_step_right", jit(D._env_step_right), L, jnp.conj(A), W1, A)
bench("right_canonize_step", jit(D._right_canonize_step), A, A)

# the full fused bulk sweep, standalone
lenv0 = jnp.asarray(
    rng.standard_normal((chi, w, chi)).astype(f32) / chi)
A0 = jnp.asarray(rng.standard_normal((chi, d, chi)).astype(f32) / 20)
Anexts = jnp.asarray(
    rng.standard_normal((n_sites, chi, d, chi)).astype(f32) / 20)
W1s = jnp.broadcast_to(W1, (n_sites, w, w, d, d))
W2s = jnp.broadcast_to(W2, (n_sites, w, w, d, d))
renvs = jnp.asarray(
    rng.standard_normal((n_sites, chi, w, chi)).astype(f32) / chi)

def bulk():
    return D._bulk_sweep_right(
        lenv0, A0, Anexts, W1s, W2s, renvs,
        jnp.asarray(0.0, jnp.float32), ncv=8, restarts=1,
        max_bond=chi, method="svd:eig")

bench("bulk_sweep_right (110 sites)", bulk, n=5)
