import time
import jax, jax.numpy as jnp
import numpy as np
import quimb_tpu.tensor as qtn
from quimb_tpu.tensor.tn1d import dmrg as D

L, CHI = 128, 256
H = qtn.MPO_ham_heis(L); H.astype_("float32")
p0 = qtn.MPS_rand_state(L, 32, seed=42, dtype="float32")
dm = qtn.DMRG2(H, bond_dims=CHI, cutoffs=0.0, p0=p0)
for mb in (64, 128, 256, 256, 256):
    en = dm.sweep("R", max_bond=mb, cutoff=0.0)
jax.block_until_ready(dm._A[0])
print("warmed:", en, flush=True)

def t(label, fn, *a, **k):
    t0 = time.perf_counter()
    out = fn(*a, **k)
    jax.block_until_ready(jax.tree_util.tree_leaves(
        [x for x in (out, dm._A[0], dm._A[-1]) if x is not None]))
    dt = time.perf_counter() - t0
    print(f"  {label}: {dt*1e3:.1f} ms", flush=True)
    return out

for rep in range(3):
    print(f"rep {rep}:", flush=True)
    t("right_canonize_all", dm._right_canonize_all)
    renv = t("build_right_envs(bulk)", dm._build_right_envs, return_bulk_stack=True)
    t0 = time.perf_counter()
    en = dm._sweep_right(256, 0.0)
    jax.block_until_ready(dm._A[0])
    print(f"  full _sweep_right (incl envs): {(time.perf_counter()-t0)*1e3:.1f} ms E={en:.6f}", flush=True)
