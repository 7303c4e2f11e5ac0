"""Pallas TPU kernels for the hot contraction primitives.

The single hottest primitive in the library (SURVEY §2 native table,
§3.1) is the DMRG/TEBD effective-Hamiltonian matvec: with the
environment-MPO fusions precomputed it is a *sandwich* product

    out = sum_x  A[x] @ theta @ B[x]

over the MPO virtual index ``x`` (reference executes this as
``TNLinearOperator._matvec`` einsum chains, tensor_core.py:12085).
XLA evaluates it as two back-to-back batched matmuls, materializing
the ``(w, M, K2)`` intermediate in HBM between them, and dispatches
two kernels per Lanczos step. The Pallas kernel below keeps the whole
sandwich in VMEM: one launch, no HBM intermediate — on the
latency-bound single-chip path (remote tunnel) kernel-launch count is
as important as bytes.

The kernel is only selected when the operands fit the VMEM budget and
the dtype is MXU-friendly (f32/bf16); otherwise the caller's einsum
path runs. Gate with ``QUIMB_TPU_PALLAS=0`` to disable entirely.
"""

import functools
import os

import jax
import jax.numpy as jnp

try:  # pallas is part of jax, but keep the import soft for safety
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    HAS_PALLAS = True
except Exception:  # pragma: no cover
    HAS_PALLAS = False

# VMEM is ~16MB/core; leave headroom for double buffering of the
# output and compiler temporaries
_VMEM_BUDGET = 14 * 1024 * 1024


def pallas_enabled():
    # default-on: the grid-streamed kernel is A/B-validated on the real
    # chip at the production χ=256 config (0.26 ms vs 1.28 ms for the
    # einsum sandwich, rel err 2e-7 vs the highest-precision path —
    # docs/performance.md). QUIMB_TPU_PALLAS=0 disables.
    return HAS_PALLAS and os.environ.get("QUIMB_TPU_PALLAS", "1") != "0"


def _on_tpu_backend():
    """True when computations actually land on a TPU-like device.

    Checks the *pinned default device* first: on this image the TPU
    plugin force-registers itself even in CPU test runs, so
    ``jax.default_backend()`` alone would misreport (the test conftest
    pins ``jax_default_device`` to CPU rather than unregistering it).
    """
    try:
        dev = jax.config.jax_default_device
        if dev is not None:
            return dev.platform not in ("cpu", "gpu", "cuda", "rocm")
        return jax.default_backend() not in ("cpu", "gpu", "cuda",
                                             "rocm")
    except Exception:  # pragma: no cover
        return False


def _sandwich_kernel(a_ref, th_ref, b_ref, out_ref, acc_ref):
    """One grid step of ``out = sum_x a[x] @ th @ b[x]``.

    The grid runs over the MPO bond ``x`` (sequential on TPU), so only
    one ``(M, K1)`` / ``(K2, N)`` slab pair is VMEM-resident at a time
    — Mosaic double-buffers the next pair in from HBM while the MXU
    works. Holding all ``w`` slabs at once (the previous design) blows
    the 16 MB scoped-VMEM limit at the χ=256 production sizes.

    Partial sums accumulate in an f32 VMEM scratch (``acc_ref``) and
    are cast to the output dtype exactly once on the last grid step —
    with bf16 inputs/outputs, round-tripping the accumulator through
    ``out_ref`` every step would lose the single-rounding guarantee.
    """
    x = pl.program_id(0)
    t = jnp.dot(a_ref[0], th_ref[...],
                preferred_element_type=jnp.float32)
    contrib = jnp.dot(t, b_ref[0],
                      preferred_element_type=jnp.float32)

    @pl.when(x == 0)
    def _init():
        acc_ref[...] = contrib

    @pl.when(x != 0)
    def _accum():
        acc_ref[...] += contrib

    @pl.when(x == pl.num_programs(0) - 1)
    def _store():
        out_ref[...] = acc_ref[...].astype(out_ref.dtype)


def _vmem_bytes(w, M, K1, K2, N, itemsize):
    # per-grid-step footprint: one a-slab + one b-slab (x2 for Mosaic
    # double buffering of the streamed inputs), resident th, the
    # double-buffered out block, the f32 (M, K2) dot intermediate and
    # (M, N) contribution, and the f32 accumulator scratch. Mosaic's
    # scoped-VMEM accounting measured 17.5M for (w=5, M=K1=1024,
    # K2=N=256, f32) — a model that omits the intermediates/out
    # double-buffer passes that shape and OOMs at compile time.
    return itemsize * (
        2 * M * K1 + K1 * K2 + 2 * K2 * N + 2 * M * N
    ) + 4 * (M * K2 + 2 * M * N)


def _hbm_bytes(w, M, K1, K2, N, itemsize):
    # total HBM traffic over the whole grid: every a/b slab streamed
    # once, theta read once, output written once (the accumulator
    # lives in VMEM scratch)
    return itemsize * (w * (M * K1 + K2 * N) + K1 * K2 + M * N)


def sandwich_fits_vmem(w, M, K1, K2, N, itemsize=4):
    return _vmem_bytes(w, M, K1, K2, N, itemsize) <= _VMEM_BUDGET


@functools.partial(jax.jit, static_argnames=("interpret",))
def sandwich_matvec(a, theta, b, interpret=False):
    """``sum_x a[x] @ theta @ b[x]`` as one fused Pallas kernel.

    Parameters
    ----------
    a : (w, M, K1)
    theta : (K1, K2)
    b : (w, K2, N)

    Returns (M, N). Caller is responsible for checking
    :func:`sandwich_fits_vmem` and dtype suitability.
    """
    w, M, K1 = a.shape
    K2, N = theta.shape[1], b.shape[2]
    return pl.pallas_call(
        _sandwich_kernel,
        grid=(w,),
        out_shape=jax.ShapeDtypeStruct((M, N), theta.dtype),
        in_specs=[
            pl.BlockSpec((1, M, K1), lambda x: (x, 0, 0)),
            pl.BlockSpec((K1, K2), lambda x: (0, 0)),
            pl.BlockSpec((1, K2, N), lambda x: (x, 0, 0)),
        ],
        out_specs=pl.BlockSpec((M, N), lambda x: (0, 0)),
        scratch_shapes=[pltpu.VMEM((M, N), jnp.float32)],
        cost_estimate=pl.CostEstimate(
            flops=2 * w * (M * K1 * K2 + M * K2 * N),
            bytes_accessed=_hbm_bytes(
                w, M, K1, K2, N, theta.dtype.itemsize
            ),
            transcendentals=0,
        ),
        interpret=interpret,
    )(a, theta, b)


def sandwich_matvec_reference(a, theta, b):
    """Pure-XLA evaluation of the same sandwich (used as fallback and
    in tests): batched matmuls with an explicit x-sum."""
    return jnp.einsum("xmk,kl,xln->mn", a, theta, b)


def use_sandwich_kernel(dtype, w, M, K1, K2, N):
    """Whether the fused kernel should run for this matvec: pallas on,
    real TPU backend, MXU dtype, and everything fits in VMEM."""
    if not pallas_enabled() or not _on_tpu_backend():
        return False
    if jnp.dtype(dtype).kind == "c":
        return False
    # sub-MXU problems (edge sites, tiny chi) gain nothing and risk
    # Mosaic sub-tile layouts — leave them on the fused-einsum path
    if min(M, K1, K2, N) < 128:
        return False
    return sandwich_fits_vmem(
        w, M, K1, K2, N, jnp.dtype(dtype).itemsize
    )
