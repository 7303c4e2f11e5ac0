"""Profile ParallelDMRG configs at the north-star config on the
current default device. Caches the serially-converged warm state in
/tmp/parprof_state.npz so repeated invocations skip the ~5 min serial
warmup.

Usage: python scripts/_parprof.py "S,INNER,NCV[,OV]" ["S,INNER,NCV"...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))

import numpy as np

L = int(os.environ.get("BENCH_L", 128))
CHI = int(os.environ.get("BENCH_CHI", 256))
CACHE = f"/tmp/parprof_state_L{L}_chi{CHI}.npz"


def f64_energy(Ms_host, Ws_host):
    """f64 host energy <psi|H|psi>/<psi|psi> of a padded stack."""
    Ms = Ms_host.astype(np.float64)
    Ws = Ws_host.astype(np.float64)
    chi, w = Ms.shape[1], Ws.shape[1]
    env = np.zeros((chi, w, chi)); env[0, 0, 0] = 1.0
    nrm = np.zeros((chi, chi)); nrm[0, 0] = 1.0
    for j in range(Ms.shape[0]):
        A = Ms[j]
        T = np.einsum("bwk,kdx->bwdx", env, A)
        T = np.einsum("bwdx,wyud->byux", T, Ws[j])
        env = np.einsum("byux,bua->ayx", T, np.conj(A))
        T2 = np.einsum("ak,kdx->adx", nrm, A)
        nrm = np.einsum("adx,ady->yx", T2, np.conj(A))
        # rescale both by the norm trace to avoid drift
        s = max(np.trace(nrm).real, 1e-300)
        env = env / s
        nrm = nrm / s
    return float(env[0, 0, 0].real / nrm[0, 0].real)


def main():
    import jax
    import quimb_tpu.tensor as qtn
    from quimb_tpu.tensor.tn1d.dmrg_parallel import (
        ParallelDMRG, mpo_to_padded_stack,
    )
    from quimb_tpu.ops.backend import to_device, to_host

    on_tpu = jax.default_backend() not in ("cpu", "gpu")
    dtype = "float32" if on_tpu else "float32"

    H = qtn.MPO_ham_heis(L)
    H.astype_(dtype)
    Ws_host = np.asarray(mpo_to_padded_stack(H))

    if os.path.exists(CACHE):
        Ms0 = np.load(CACHE)["Ms"]
        print(f"[parprof] loaded cached warm state {CACHE}", flush=True)
        e0 = f64_energy(Ms0, Ws_host)
        print(f"[parprof] cached state f64 energy: {e0:.9f}", flush=True)
        psi = None
    else:
        p0 = qtn.MPS_rand_state(L, min(32, CHI), seed=42, dtype=dtype)
        dmrg = qtn.DMRG2(H, bond_dims=CHI, cutoffs=0.0, p0=p0)
        schedule = []
        b = 64
        while b < CHI:
            schedule.append(b)
            b *= 2
        schedule += [CHI] * 3
        for mb in schedule:
            tw = time.perf_counter()
            en = dmrg.sweep("R", max_bond=mb, cutoff=0.0)
            print(f"[parprof] warmup mb={mb}: "
                  f"{time.perf_counter()-tw:.1f}s en={en:.6f}",
                  flush=True)
        # settle with alternating sweeps
        for k in range(3):
            en = dmrg.sweep("L" if k % 2 == 0 else "R", max_bond=CHI,
                            cutoff=0.0, canonize=False)
        print(f"[parprof] serial settled en={en:.8f}", flush=True)
        psi = dmrg.state
        from quimb_tpu.tensor.tn1d.dmrg_parallel import mps_to_stack
        Ms0 = np.asarray(to_host(mps_to_stack(psi, CHI)))
        np.savez(CACHE, Ms=Ms0)
        e0 = f64_energy(Ms0, Ws_host)
        print(f"[parprof] warm state f64 energy: {e0:.9f}", flush=True)

    # configs
    cfgs = []
    for a in sys.argv[1:]:
        parts = [int(x) for x in a.split(",")]
        while len(parts) < 4:
            parts.append(0 if len(parts) == 3 else 8)
        cfgs.append(tuple(parts))
    if not cfgs:
        cfgs = [(8, 1, 8, 0), (16, 1, 8, 0), (16, 2, 8, 0)]

    # a 'like' MPS for ParallelDMRG construction
    like = qtn.MPS_rand_state(L, 2, seed=1, dtype=dtype)
    # expand 'like' bonds to hold the stack (stack_to_mps trims)
    from quimb_tpu.tensor.tn1d.dmrg_jacobi import stack_to_mps
    psi_like = stack_to_mps(to_device(Ms0.astype(dtype)), _grow(like, CHI))

    for (S, INNER, NCV, OV) in cfgs:
        try:
            pd = ParallelDMRG(psi_like, H, max_bond=CHI, n_segments=S,
                              ncv=NCV, inner_passes=INNER, oversample=OV)
            pd.Ms = to_device(Ms0.astype(dtype))
            tw = time.perf_counter()
            pd.sweep(); pd.sweep()
            jax.block_until_ready(pd.Ms)
            t_compile = time.perf_counter() - tw
            NS = 4
            t0 = time.perf_counter()
            for _ in range(NS):
                en = pd.sweep()
            jax.block_until_ready(pd.Ms)
            dt = (time.perf_counter() - t0) / NS
            ef = f64_energy(np.asarray(to_host(pd.Ms)), Ws_host)
            m = L // S
            nbond = S * (m - 1)
            halfsweeps = 2 * INNER + 1
            print(f"[parprof] S={S} inner={INNER} ncv={NCV} ov={OV}: "
                  f"{dt:.3f}s/sweep (compile {t_compile:.0f}s) "
                  f"updates/sweep={halfsweeps * nbond} "
                  f"ritz={en:.8f} f64_energy={ef:.9f}", flush=True)
        except Exception as e:
            print(f"[parprof] S={S},{INNER},{NCV} failed: {e!r}",
                  flush=True)


def _grow(like, chi):
    return like


if __name__ == "__main__":
    main()
