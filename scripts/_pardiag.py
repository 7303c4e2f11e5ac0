"""TPU diagnostics for the parallel DMRG engine invariants, using the
cached warm state from scripts/_parprof.py.

Checks: B/A canonicity error, seam mixed-form energies, R_seg vs Rpre
consistency after a real inner phase, null-update write-back energy.

Usage: python scripts/_pardiag.py [S]
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


def main():
    import jax
    import jax.numpy as jnp
    import quimb_tpu.tensor as qtn
    from quimb_tpu.tensor.tn1d import dmrg_parallel as dp
    from quimb_tpu.tensor.tn1d.dmrg_parallel import (
        mpo_to_padded_stack, bond_rank_masks,
    )
    from quimb_tpu.ops.backend import to_device, to_host
    from quimb_tpu.ops import decomp

    S = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    m = L // S

    H = qtn.MPO_ham_heis(L)
    H.astype_("float32")
    Ws_host = np.asarray(mpo_to_padded_stack(H))
    Ws = to_device(Ws_host.astype(np.float32))
    Ms = to_device(np.load(CACHE)["Ms"].astype(np.float32))
    masks = to_device(bond_rank_masks(L, CHI, 2))

    t0 = time.perf_counter()
    Bstack, renvs = dp._canonize_right_and_renvs(Ms, Ws, masks)
    jax.block_until_ready(Bstack)
    print(f"reverse scan: {time.perf_counter()-t0:.2f}s", flush=True)
    t0 = time.perf_counter()
    Astack, lenvs, Rpre = dp._canonize_left_and_lenvs(Bstack, Ws, masks)
    jax.block_until_ready(Astack)
    print(f"forward scan: {time.perf_counter()-t0:.2f}s", flush=True)

    # canonicity at a few sites
    for j in (1, 5, L // 2, L - 2):
        B = Bstack[j]
        errB = float(jnp.linalg.norm(
            jnp.einsum("kdr,mdr->km", B, jnp.conj(B))
            - jnp.diag(masks[j])))
        A = Astack[j]
        errA = float(jnp.linalg.norm(
            jnp.einsum("adr,ads->rs", jnp.conj(A), A)
            - jnp.diag(masks[j + 1])))
        print(f"site {j}: B_rc_err={errB:.2e} A_lc_err={errA:.2e}",
              flush=True)

    # seam mixed energies
    @jax.jit
    def seam_energy(R, B, Lb, Rb, W):
        M0 = jnp.einsum("ab,bdr->adr", R, B)
        T = jnp.einsum("bwk,kdx->bwdx", Lb, M0)
        T = jnp.einsum("bwdx,wyud->byux", T, W)
        T = jnp.einsum("byux,bua->ayx", T, jnp.conj(M0))
        return jnp.real(jnp.einsum("ayx,ayx->", T, Rb))

    for ai in range(m, L, m):
        e = seam_energy(Rpre[ai], Bstack[ai], lenvs[ai - 1],
                        renvs[ai + 1], Ws[ai])
        print(f"seam a={ai}: E_mixed={float(e):.6f}", flush=True)

    # real inner phase + seam gauge consistency
    starts = tuple(range(0, L - m + 1, m))
    a = jnp.asarray(starts)
    idx = a[:, None] + jnp.arange(m)[None, :]
    segB, segW = Bstack[idx], Ws[idx]
    bidx = a[:, None] + jnp.arange(1, m)[None, :]
    seg_bm = jnp.swapaxes(masks.astype(Ms.dtype)[bidx], 0, 1)
    w = Ws.shape[1]
    lenv0 = jnp.zeros((CHI, w, CHI), Ms.dtype).at[0, 0, 0].set(1.0)
    Lb = jnp.where((a == 0)[:, None, None, None], lenv0[None],
                   lenvs[jnp.maximum(a - 1, 0)])
    renvN = jnp.zeros_like(lenv0).at[0, 0, 0].set(1.0)
    Rb = jnp.where((a + m == L)[:, None, None, None], renvN[None],
                   renvs[jnp.minimum(a + m, L - 1)])
    M0 = jnp.einsum("nab,nbdr->nadr", Rpre[a], segB[:, 0])
    t0 = time.perf_counter()
    Arest, Mlast, ens = dp._segment_inner(
        M0, segB[:, 1:], segW, Lb, Rb, seg_bm, m=m, ncv=8,
        max_bond=CHI, inner_passes=1)
    jax.block_until_ready(Mlast)
    print(f"inner phase: {time.perf_counter()-t0:.2f}s "
          f"(incl compile)", flush=True)
    print("ens[-1]:", np.asarray(ens[-1]), flush=True)

    matl = jnp.reshape(Mlast, (-1, CHI * 2, CHI))
    Qs, _, Rs = decomp.qr_stabilized(matl)
    Rs_h = np.asarray(to_host(Rs))
    Rpre_h = np.asarray(to_host(Rpre))
    for s in range(S - 1):
        aim = starts[s] + m
        d = np.linalg.norm(Rs_h[s] - Rpre_h[aim])
        print(f"seg {s}: |R_seg - Rpre[{aim}]| = {d:.4f}", flush=True)


if __name__ == "__main__":
    main()
