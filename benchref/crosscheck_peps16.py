"""Cross-check the peps16 energy: run quimb_tpu's SimpleUpdate at the
driver protocol (on CPU), then evaluate the SAME state with both
quimb_tpu's estimator and the reference's compute_local_expectation
(f64, vendor stubs). Separates 'our SU converges to a different
(possibly better) state' from 'our estimator is biased'.

Usage: python benchref/crosscheck_peps16.py [L] [D] [chi] [nits]
"""

import json
import os
import sys
import time

_HERE = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, os.path.dirname(_HERE))

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")


def main():
    L = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    D = int(sys.argv[2]) if len(sys.argv) > 2 else 3
    chi = int(sys.argv[3]) if len(sys.argv) > 3 else 32
    nits = int(sys.argv[4]) if len(sys.argv) > 4 else 30

    import jax
    jax.config.update("jax_default_device", jax.devices("cpu")[0])
    jax.config.update("jax_enable_x64", False)
    import numpy as np
    import quimb_tpu.tensor as qtn

    psi0 = qtn.PEPS.rand(L, L, bond_dim=D, seed=42)
    ham = qtn.ham_2d_heis(L, L)
    su = qtn.SimpleUpdate(psi0, ham, D=D, compute_energy_every=None,
                          compute_energy_final=False)
    t0 = time.perf_counter()
    for tau in (0.3, 0.1, 0.03):
        su.evolve(nits, tau=tau)
        print(f"[xcheck] tau={tau} done t={time.perf_counter()-t0:.0f}s",
              flush=True)
    psi = su.get_state()

    e_ours = psi.compute_local_expectation(
        ham.terms, max_bond=chi, normalized=True,
    )
    print(json.dumps({"ours_energy_per_site": float(np.real(e_ours)) / L**2}),
          flush=True)

    # hand the same arrays to the reference implementation (f64)
    arrays = {}
    for i in range(L):
        for j in range(L):
            t = psi[psi.site_tag(i, j)]
            # index order: reference PEPS.rand order is (up, right,
            # down, left, phys) pruned at edges; build by named inds
            arrays[(i, j)] = (tuple(t.inds), np.asarray(t.data,
                                                        dtype=np.float64))

    sys.path.insert(0, os.path.join(_HERE, "_vendor"))
    sys.path.insert(0, "/root/reference")
    import quimb.tensor as rqtn

    ref = rqtn.PEPS.rand(L, L, bond_dim=D, seed=0)
    # rebuild the reference PEPS with our arrays: map our bond names
    # to the reference's by geometry
    for i in range(L):
        for j in range(L):
            rt = ref[ref.site_tag(i, j)]
            inds, data = arrays[(i, j)]
            # both label physical ind by site; match bonds by
            # neighbour direction using our TN's shared-index lookup
            t_ours_inds = inds
            # order our data to (neighbors in reference's ind order)
            # reference tensor inds: bonds to neighbors + phys ind
            # (same geometry) — build mapping by neighbor identity
            our_t = psi[psi.site_tag(i, j)]
            order = []
            for rix in rt.inds:
                if rix == ref.site_ind(i, j):
                    order.append(psi.site_ind(i, j))
                    continue
                # which neighbour does rix connect to?
                for (di, dj) in ((1, 0), (-1, 0), (0, 1), (0, -1)):
                    ni, nj = i + di, j + dj
                    if not (0 <= ni < L and 0 <= nj < L):
                        continue
                    rnt = ref[ref.site_tag(ni, nj)]
                    if rix in rnt.inds:
                        # matching bond in ours
                        ont = psi[psi.site_tag(ni, nj)]
                        shared = [ix for ix in our_t.inds
                                  if ix in ont.inds]
                        order.append(shared[0])
                        break
            arr = np.asarray(our_t.transpose(*order).data,
                             dtype=np.float64)
            rt.modify(data=arr)

    e_ref = ref.compute_local_expectation(
        {k: np.asarray(v, dtype=np.float64) for k, v in ham.terms.items()},
        max_bond=chi, normalized=True, contract_optimize="greedy",
    )
    print(json.dumps({
        "ours_energy_per_site": float(np.real(e_ours)) / L**2,
        "reference_estimator_on_our_state": float(e_ref) / L**2,
    }), flush=True)


if __name__ == "__main__":
    main()
