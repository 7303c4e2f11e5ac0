"""Chi-scaling series for the MFU story (VERDICT r2 item 3a):

1. measured device matmul ceiling (big square f32 matmuls at highest
   and default precision) — the practical peak to report % against;
2. DMRG2 steady-state sweep time + executed TFLOP/s at L=128 for each
   chi in argv (default 256 512 1024), same protocol as bench.py
   (ramp warmup, then timed canonize-free alternating R/L sweeps);
3. eager sandwich-matvec kernel A/B (Pallas vs XLA einsum) at the
   matching (chi, w) sizes, w in {5, 8, 12, 16} (VERDICT item 9).

Writes results incrementally to scripts/chiscale_results.json and
prints them as it goes (the tunnel can wedge; don't lose data).

Usage: python -u scripts/_chiscale.py [chi ...]
Env: CHISCALE_SWEEPS (default 4), QUIMB_TPU_PALLAS (for the sweep A/B
run this in two processes).
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))))
os.environ["BENCH_FORCE_CPU"] = "1"  # skip bench.py's import probe
import bench  # noqa: E402  (flop counters)
del os.environ["BENCH_FORCE_CPU"]

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import quimb_tpu.tensor as qtn  # noqa: E402
from quimb_tpu.ops import pallas_kernels as pk  # noqa: E402

RESULTS_PATH = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                            "chiscale_results.json")


def _save(results):
    with open(RESULTS_PATH, "w") as f:
        json.dump(results, f, indent=1)


def _timeit_chain(step, x0, *ops, iters=16, reps=3):
    """Median seconds per iteration of a jitted dependent chain
    ``x <- step(x, *ops)``: the data dependence defeats any result
    caching in the remote tunnel, and the scalar fetch forces
    completion. ``ops`` are threaded as arguments (NOT closed over —
    closure constants get baked into the program and oversize the
    remote-compile request). Retries on transient tunnel errors."""

    @jax.jit
    def chain(x, *o):
        return jax.lax.fori_loop(
            0, iters, lambda i, v: step(v, *o), x)

    for attempt in range(3):
        try:
            out = chain(x0, *ops)
            float(jnp.sum(jnp.abs(out[..., :1])))
            ts = []
            for _ in range(reps):
                t0 = time.perf_counter()
                out = chain(x0, *ops)
                float(jnp.sum(jnp.abs(out[..., :1])))
                ts.append((time.perf_counter() - t0) / iters)
            return sorted(ts)[len(ts) // 2]
        except Exception as e:  # transient tunnel wedge
            print(f"[retry {attempt}] {type(e).__name__}: "
                  f"{str(e)[:100]}", flush=True)
            time.sleep(30)
    raise RuntimeError("chain timing failed after retries")


def matmul_ceiling(results):
    """Measured big-matmul TFLOP/s at both precisions, via a
    dependent chain of square matmuls."""
    n = 8192
    key = jax.random.PRNGKey(0)
    a = jax.random.normal(key, (n, n), jnp.float32)
    b = jax.random.normal(jax.random.PRNGKey(1), (n, n), jnp.float32)
    out = {}
    for prec in ("highest", "default"):
        def step(x, b, _prec=prec):
            y = jax.lax.dot_general(
                x, b, (((1,), (0,)), ((), ())), precision=_prec)
            return y * (1.0 / n)
        dt = _timeit_chain(step, a, b)
        out[prec] = round(2 * n**3 / dt / 1e12, 2)
        print(f"[ceiling] {n}x{n} f32 {prec}: {out[prec]} TFLOP/s",
              flush=True)
    results["matmul_ceiling_tflops"] = out
    _save(results)
    return out


def sweep_series(chis, results):
    L = 128
    nsweep = int(os.environ.get("CHISCALE_SWEEPS", 4))
    results.setdefault("sweeps", {})
    for CHI in chis:
        H = qtn.MPO_ham_heis(L)
        H.astype_("float32")
        p0 = qtn.MPS_rand_state(L, 32, seed=42, dtype="float32")
        dm = qtn.DMRG2(H, bond_dims=CHI, cutoffs=0.0, p0=p0)
        schedule = []
        b = 64
        while b < CHI:
            schedule.append(b)
            b *= 2
        schedule += [CHI] * 3
        for mb in schedule:
            tw = time.perf_counter()
            en = dm.sweep("R", max_bond=mb, cutoff=0.0)
            print(f"[chi={CHI}] warmup mb={mb}: "
                  f"{time.perf_counter()-tw:.1f}s en={en:.6f}",
                  flush=True)
        en = dm.sweep("L", max_bond=CHI, cutoff=0.0, canonize=False)
        jax.block_until_ready(dm._A[0])

        ncv = max(dm.opts["local_eig_ncv"] * 2, 8)
        n_matvec = ncv * dm.opts["local_eig_restarts"]
        d = dm.phys_dim
        total_flops = 0
        for i in range(L - 1):
            cl = dm._A[i].shape[0]
            cm = dm._A[i].shape[2]
            cr = dm._A[i + 1].shape[2]
            w = dm._W[i].shape[1]
            total_flops += n_matvec * bench.flops_2site_matvec(
                cl, cm, cr, d, w)
            total_flops += bench.flops_fuse_lwr(cl, cr, d, w)
            total_flops += bench.flops_eig_split(cl * d, d * cr)
            total_flops += bench.flops_env_step(cl, cr, d, w)

        ts = []
        for k in range(nsweep):
            t0 = time.perf_counter()
            en = dm.sweep("R" if k % 2 == 0 else "L", max_bond=CHI,
                          cutoff=0.0, canonize=False)
            jax.block_until_ready(dm._A[0])
            ts.append(time.perf_counter() - t0)
        dt = sorted(ts)[len(ts) // 2]
        tf = total_flops / dt / 1e12
        row = {
            "L": L, "chi": CHI,
            "sweep_seconds_each": [round(t, 3) for t in ts],
            "sweep_seconds_median": round(dt, 3),
            "executed_tflops": round(tf, 3),
            "per_site_ms": round(dt / (L - 1) * 1e3, 2),
            "energy": float(en),
            "pallas": pk.pallas_enabled(),
        }
        results["sweeps"][
            f"chi{CHI}_pallas{int(pk.pallas_enabled())}"] = row
        print(f"[chi={CHI}] {row}", flush=True)
        _save(results)
        del dm, H, p0


def kernel_ab(chis, results):
    """Eager sandwich matvec: Pallas grid kernel vs einsum, per
    (chi, w)."""
    d = 2
    results.setdefault("kernel_ab", {})

    for CHI in chis:
        M = K1 = K2 = N = CHI * d
        for w in (5, 8, 12, 16):
            key = jax.random.PRNGKey(0)
            a = jax.random.normal(key, (w, M, K1), jnp.float32)
            th = jax.random.normal(jax.random.PRNGKey(1), (K1, K2),
                                   jnp.float32)
            b = jax.random.normal(jax.random.PRNGKey(2), (w, K2, N),
                                  jnp.float32)
            flops = 2 * w * (M * K1 * K2 + M * K2 * N)
            row = {"flops": flops}

            # Lanczos-like dependent chain: th <- normalize(matvec(th))
            def step_pl(th, a, b):
                y = pk.sandwich_matvec(a, th, b)
                return y / jnp.linalg.norm(y)

            def step_ein(th, a, b):
                y = jnp.einsum("xmk,kl,xln->mn", a, th, b)
                return y / jnp.linalg.norm(y)

            if pk.sandwich_fits_vmem(w, M, K1, K2, N):
                try:
                    dt = _timeit_chain(step_pl, th, a, b)
                    row["pallas_ms"] = round(dt * 1e3, 3)
                    row["pallas_tflops"] = round(flops / dt / 1e12, 2)
                except RuntimeError as e:
                    row["pallas_error"] = str(e)[:120]
            dt = _timeit_chain(step_ein, th, a, b)
            row["einsum_ms"] = round(dt * 1e3, 3)
            row["einsum_tflops"] = round(flops / dt / 1e12, 2)
            results["kernel_ab"][f"chi{CHI}_w{w}"] = row
            print(f"[kernel chi={CHI} w={w}] {row}", flush=True)
            _save(results)


def main():
    chis = [int(x) for x in sys.argv[1:]] or [256, 512, 1024]
    results = {}
    if os.path.exists(RESULTS_PATH):
        with open(RESULTS_PATH) as f:
            results = json.load(f)
    results["device"] = jax.devices()[0].device_kind
    print("device:", jax.devices(), flush=True)
    if "matmul_ceiling_tflops" not in results:
        matmul_ceiling(results)
    if not os.environ.get("CHISCALE_SKIP_KERNEL_AB"):
        kernel_ab(chis, results)
    sweep_series(chis, results)
    print(json.dumps(results, indent=1))


if __name__ == "__main__":
    main()
