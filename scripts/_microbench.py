import time
import jax, jax.numpy as jnp
import numpy as np
import quimb_tpu  # config side effects
from quimb_tpu.tensor.tn1d.dmrg import (
    _local_solve_2site, _split_2site, _env_step_right,
    _right_canonize_step)
from quimb_tpu.ops import decomp

chi, d, w = 256, 2, 5
rng = np.random.default_rng(0)
f32 = np.float32
L = jnp.asarray(rng.standard_normal((chi, w, chi)).astype(f32) / chi)
R = jnp.asarray(rng.standard_normal((chi, w, chi)).astype(f32) / chi)
W1 = jnp.asarray(rng.standard_normal((w, w, d, d)).astype(f32))
W2 = jnp.asarray(rng.standard_normal((w, w, d, d)).astype(f32))
th = jnp.asarray(rng.standard_normal((chi, d, d, chi)).astype(f32))
A = jnp.asarray(rng.standard_normal((chi, d, chi)).astype(f32) / 20)

def bench(fn, *args, n=30, **kw):
    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n * 1e3

t_solve = bench(_local_solve_2site, L, W1, W2, R, th, ncv=8, restarts=1)
t_split = bench(_split_2site, th, max_bond=chi, cutoff=0.0, absorb="right", method="svd:eig")
t_env = bench(_env_step_right, L, jnp.conj(A), W1, A)
t_canon = bench(_right_canonize_step, A, A)

# split components: gram, eigh alone
@jax.jit
def gram(x):
    m = jnp.reshape(x, (chi * d, d * chi))
    return m @ m.T
@jax.jit
def eigh_(g):
    return jnp.linalg.eigh(g)
@jax.jit
def qr_(m):
    return jnp.linalg.qr(m)
g = gram(th)
m512 = jnp.reshape(th, (chi * d, d * chi))
t_gram = bench(gram, th)
t_eigh = bench(eigh_, g)
t_qr = bench(qr_, m512)

print(f"local_solve_2site (8 matvecs): {t_solve:.2f} ms")
print(f"split_2site (svd:eig):         {t_split:.2f} ms")
print(f"env_step_right:                {t_env:.3f} ms")
print(f"right_canonize_step (LQ):      {t_canon:.2f} ms")
print(f"  gram 512:                    {t_gram:.3f} ms")
print(f"  eigh 512:                    {t_eigh:.2f} ms")
print(f"  qr 512 (single):             {t_qr:.2f} ms")
tot = t_solve + t_split + t_env + t_canon
print(f"per-site total: {tot:.2f} ms -> x126 = {tot*126/1000:.2f} s/sweep")
