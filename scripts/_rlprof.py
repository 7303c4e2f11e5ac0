import time
import jax
import quimb_tpu.tensor as qtn

L, CHI = 128, 256
H = qtn.MPO_ham_heis(L); H.astype_("float32")
p0 = qtn.MPS_rand_state(L, 32, seed=42, dtype="float32")
dm = qtn.DMRG2(H, bond_dims=CHI, cutoffs=0.0, p0=p0)
for mb in (64, 128, 256, 256, 256):
    t0=time.perf_counter()
    en = dm.sweep("R", max_bond=mb, cutoff=0.0)
    print("warm R", mb, f"{time.perf_counter()-t0:.1f}s", flush=True)
t0=time.perf_counter()
en = dm.sweep("L", max_bond=CHI, cutoff=0.0, canonize=False)
jax.block_until_ready(dm._A[0])
print("warm L", f"{time.perf_counter()-t0:.1f}s", flush=True)

# timed: alternating
for rep in range(3):
    t0=time.perf_counter()
    en = dm.sweep("R", max_bond=CHI, cutoff=0.0, canonize=False)
    jax.block_until_ready(dm._A[0]); tr=time.perf_counter()-t0
    t0=time.perf_counter()
    en = dm.sweep("L", max_bond=CHI, cutoff=0.0, canonize=False)
    jax.block_until_ready(dm._A[0]); tl=time.perf_counter()-t0
    print(f"rep{rep}: R={tr*1e3:.0f}ms L={tl*1e3:.0f}ms", flush=True)
