"""Steady-state Lanczos-budget experiment: after warmup convergence,
does ncv=4 keep the energy while cutting the serial matvec chain?"""
import time
import jax
import quimb_tpu.tensor as qtn

L, CHI = 128, 256
H = qtn.MPO_ham_heis(L); H.astype_("float32")
p0 = qtn.MPS_rand_state(L, 32, seed=42, dtype="float32")
dm = qtn.DMRG2(H, bond_dims=CHI, cutoffs=0.0, p0=p0)
for mb in (64, 128, 256, 256, 256):
    t0 = time.perf_counter()
    en = dm.sweep("R", max_bond=mb, cutoff=0.0)
    print(f"warm R {mb}: {time.perf_counter()-t0:.1f}s {en:.6f}",
          flush=True)
en = dm.sweep("L", max_bond=CHI, cutoff=0.0, canonize=False)
jax.block_until_ready(dm._A[0])
print("warm L done", flush=True)

for tag in ("ncv8", "ncv4"):
    if tag == "ncv4":
        dm.opts["local_eig_ncv"] = 2
        dm.opts["local_eig_ncv_floor"] = 4
    ts = []
    for k in range(4):
        t0 = time.perf_counter()
        en = dm.sweep("R" if k % 2 == 0 else "L", max_bond=CHI,
                      cutoff=0.0, canonize=False)
        jax.block_until_ready(dm._A[0])
        ts.append(time.perf_counter() - t0)
    print(tag, " ".join(f"{x*1e3:.0f}ms" for x in ts),
          f"en={en:.8f}", flush=True)
