"""Array-level matrix decompositions with truncation — the S0 kernel layer.

This is the TPU-native re-design of the reference split engine
(``quimb/tensor/decomp.py``: ``array_split`` decomp.py:34, driver registry
decomp.py:444, ``svd_truncated`` decomp.py:761, truncation semantics
decomp.py:654-760, isometrize family decomp.py:2851-2958).

Design (TPU-first):

- every decomposition runs as a jitted XLA program with **static shapes**;
  jax's jit cache plays the role the reference's numba dispatch plays.
- *dynamic* truncation (``cutoff``) is resolved in two modes:

  1. **eager mode** (this module's public drivers): the kept rank ``n_chi``
     is computed on device and pulled back as a host int, then factors are
     sliced — one extra device→host scalar sync per split, matching the
     reference's eager semantics exactly (variable output shapes).
  2. **static mode** (``svd_truncated_masked``): fully jit-compatible —
     factors keep the static shape ``min(max_bond, k)`` and singular values
     beyond the dynamically-surviving rank are *zero-masked*, with the
     effective rank returned. This is what jitted DMRG/TEBD inner loops use.

- absorb modes and cutoff modes replicate the reference exactly
  (``'abs'/'rel'/'sum2'/'rsum2'/'sum1'/'rsum1'``; absorb
  ``'both'/'left'/'right'/None`` + partial-factor modes).
"""

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import on_tpu

# --------------------------------------------------------------------------
# backend-quirk shims
#
# The XLA:TPU backend (v5e) only reliably compiles *square* Householder
# QR / SVD programs, and `cumsum` lowers to an extremely slow
# reduce-window. We therefore:
#   - reduce rectangular QR/SVD to square ones by zero-padding (for QR
#     this is exact: x = Q[:, :n] @ R[:n, :n]; for SVD the extra singular
#     values are exact zeros and are sliced off),
#   - compute inclusive prefix sums of the (tiny, <= chi) singular-value
#     vectors as a lower-triangular matmul, which maps onto the MXU and
#     compiles instantly.
# On CPU/GPU the direct rectangular primitives are used.
# --------------------------------------------------------------------------


def _use_square_shims():
    return on_tpu()


def cumsum_last(x):
    """Inclusive prefix-sum along the last axis, TPU-safe."""
    if not _use_square_shims():
        return jnp.cumsum(x, axis=-1)
    n = x.shape[-1]
    tri = jnp.tril(jnp.ones((n, n), dtype=x.dtype))
    return jnp.einsum("...i,ji->...j", x, tri)


def _tpu_qr2(x):
    """Square QR with a reorthogonalization pass. The TPU QR kernel
    loses orthogonality catastrophically on (near-)rank-deficient
    inputs — observed ``max|Q^T Q - I| = 39`` on an exactly
    rank-38/256 DMRG site matrix (masked truncation keeps bonds padded
    with exact zero directions, so such inputs are *routine*). A
    second QR of ``Q`` restores ``~eps`` orthogonality since ``Q`` is
    always well-conditioned, while ``x = Q (R2 R)`` is preserved."""
    Q, R = jnp.linalg.qr(x)
    Q, R2 = jnp.linalg.qr(Q)
    return Q, R2 @ R


@jax.jit
def safe_qr(x):
    """QR of (batch of) matrices, routing rectangular inputs through a
    zero-padded square QR on TPU (with a reorthogonalization pass —
    see :func:`_tpu_qr2`). Jitted: *eager* factorizations of complex
    arrays are UNIMPLEMENTED on the TPU backend, compiled they work
    (docs/tpu_architecture.md)."""
    m, n = x.shape[-2:]
    if not _use_square_shims():
        return jnp.linalg.qr(x)
    if m == n:
        return _tpu_qr2(x)
    if m > n:
        # tall: zero-pad columns; x = Q[:, :n] @ R[:n, :n] exactly
        pads = [(0, 0)] * (x.ndim - 2) + [(0, 0), (0, m - n)]
        Q, R = _tpu_qr2(jnp.pad(x, pads))
        return Q[..., :, :n], R[..., :n, :n]
    else:
        # wide: square QR of the first m columns, then project the rest
        # (this is exactly how blocked LAPACK geqrf proceeds)
        Q, R1 = _tpu_qr2(x[..., :, :m])
        R2 = dag(Q) @ x[..., :, m:]
        return Q, jnp.concatenate([R1, R2], axis=-1)


@jax.jit
def safe_eigh(x):
    """Hermitian eigendecomposition (square — no shim needed). Jitted
    so eager complex inputs work on the TPU backend."""
    return jnp.linalg.eigh(x)


@jax.jit
def safe_svd(x):
    """Thin SVD of (batch of) matrices, routing rectangular inputs
    through a zero-padded square SVD on TPU. Jitted so eager complex
    inputs work on the TPU backend."""
    m, n = x.shape[-2:]
    if m == n or not _use_square_shims():
        return jnp.linalg.svd(x, full_matrices=False)
    k = min(m, n)
    d = max(m, n)
    pads = [(0, 0)] * (x.ndim - 2) + [(0, d - m), (0, d - n)]
    U, s, VH = jnp.linalg.svd(jnp.pad(x, pads), full_matrices=False)
    return U[..., :m, :k], s[..., :k], VH[..., :k, :n]

# --------------------------------------------------------------------------
# mode maps (mirroring reference decomp.py numeric codes)
# --------------------------------------------------------------------------

CUTOFF_MODE_MAP = {
    "abs": 1, 1: 1,
    "rel": 2, 2: 2,
    "sum2": 3, 3: 3,
    "rsum2": 4, 4: 4,
    "sum1": 5, 5: 5,
    "rsum1": 6, 6: 6,
}

# power used when ``renorm=True`` for each cutoff mode
RENORM_LOOKUP = {3: 2, 4: 2, 5: 1, 6: 1}

_ABSORB_ALIASES = {
    None: None, "U,s,VH": None,
    "both": "both", "Usq,sqVH": "both", 0: "both",
    "left": "left", "Us,VH": "left", -1: "left",
    "right": "right", "U,sVH": "right", 1: "right",
    "lorthog": "lorthog", "U": "lorthog",
    "rorthog": "rorthog", "VH": "rorthog",
    "lfactor": "lfactor", "Us": "lfactor",
    "rfactor": "rfactor", "sVH": "rfactor",
    "lsqrt": "lsqrt", "Usq": "lsqrt",
    "rsqrt": "rsqrt", "sqVH": "rsqrt",
    "s": "s", "svals": "s",
}


def parse_absorb(absorb):
    try:
        return _ABSORB_ALIASES[absorb]
    except KeyError:
        raise ValueError(f"Invalid absorb mode: {absorb!r}")


def parse_cutoff_mode(cutoff_mode):
    try:
        return CUTOFF_MODE_MAP[cutoff_mode]
    except KeyError:
        raise ValueError(f"Invalid cutoff mode: {cutoff_mode!r}")


# --------------------------------------------------------------------------
# small jitted helpers
# --------------------------------------------------------------------------


def dag(x):
    """Hermitian conjugate of (batch of) matrices."""
    return jnp.conj(jnp.swapaxes(x, -2, -1))


def rdmul(x, d):
    """Multiply columns of ``x`` by vector ``d`` (x @ diag(d))."""
    return x * d[..., None, :].astype(x.dtype)


def ldmul(d, x):
    """Multiply rows of ``x`` by vector ``d`` (diag(d) @ x)."""
    return x * d[..., :, None].astype(x.dtype)


def rddiv(x, d):
    return x / d[..., None, :].astype(x.dtype)


def lddiv(d, x):
    return x / d[..., :, None].astype(x.dtype)


def sgn(x):
    """Phase-like sign: x / |x|, with sgn(0) = 1."""
    x0 = jnp.where(x == 0, 1.0, x)
    return jnp.where(x == 0, jnp.ones_like(x), x0 / jnp.abs(x0))


@functools.partial(jax.jit, static_argnames=("cutoff_mode",))
def _nchi_kernel(sabs, cutoff, cutoff_mode):
    """Number of singular values to keep under ``cutoff`` — device-side.

    Mirrors the reference cumulative-spectrum logic
    (decomp.py:684-722) exactly. ``sabs`` may be batched; the max over
    batch entries is taken.
    """
    if cutoff_mode == 1:  # abs
        n_chi = jnp.sum(sabs > cutoff, axis=-1)
    elif cutoff_mode == 2:  # rel
        n_chi = jnp.sum(sabs > cutoff * sabs[..., 0:1], axis=-1)
    else:
        if cutoff_mode in (3, 4):
            sp = sabs * sabs
        else:
            sp = sabs
        csp = cumsum_last(sp)
        tot = csp[..., -1:]
        if cutoff_mode in (4, 6):
            above = csp < tot * (1 - cutoff)
        else:
            above = csp < tot - cutoff
        n_chi = jnp.sum(above, axis=-1) + 1
    return jnp.max(n_chi)


@functools.partial(jax.jit, static_argnames=("pow",))
def _renorm_factor_kernel(sabs, n_chi_idx, pow):
    """Renormalization factor ``(sum(s**pow) / sum(s_kept**pow))**(1/pow)``,
    with kept = first ``n_chi_idx+1`` values (reference decomp.py:739-741,
    :869-895)."""
    sp = sabs**pow
    csp = cumsum_last(sp)
    tot = csp[..., -1]
    kept = jnp.take_along_axis(
        csp, jnp.broadcast_to(n_chi_idx, csp.shape[:-1])[..., None], axis=-1
    )[..., 0]
    return (tot / kept) ** (1.0 / pow)


def _resolve_nchi(sabs, cutoff, cutoff_mode, max_bond, renorm):
    """Resolve the number of singular values to keep. Returns host int."""
    d = sabs.shape[-1]
    if (cutoff is not None and cutoff > 0.0) or (renorm and renorm > 0):
        from .backend import to_host

        # route the scalar sync through the retrying transfer shim —
        # the tunnel sporadically fails one-off small transfers
        n_chi = int(to_host(_nchi_kernel(
            sabs, jnp.asarray(cutoff if cutoff else 0.0, sabs.dtype),
            cutoff_mode)))
        n_chi = max(n_chi, 1)
        if max_bond and max_bond > 0:
            n_chi = min(n_chi, max_bond)
    elif max_bond and max_bond > 0:
        n_chi = min(max_bond, d)
    else:
        n_chi = d
    return n_chi


def _trim_and_renorm(
    U, s, VH,
    cutoff=-1.0,
    cutoff_mode=4,
    max_bond=-1,
    absorb="both",
    renorm=0,
    use_abs=False,
    info=None,
):
    """Truncate, renormalize and absorb an SVD-like result.

    The reference equivalent is ``_trim_and_renorm_svd_result``
    decomp.py:654. Here the rank decision syncs one scalar to host; all
    array work stays on device.
    """
    cutoff_mode = parse_cutoff_mode(cutoff_mode)
    absorb = parse_absorb(absorb)
    sabs = jnp.abs(s) if use_abs else s
    d = s.shape[-1]

    if (
        on_tpu()
        and info is None
        and not use_abs
        and max_bond is not None and max_bond > 0
        and ((cutoff is not None and cutoff > 0.0) or (renorm and renorm > 0))
    ):
        # TPU path: resolving the surviving rank under ``cutoff`` is a
        # device->host scalar sync *per split* — a round trip through
        # the remote tunnel inside every hot loop (the round-3 peps16
        # timeout). Instead keep the static shape min(max_bond, d) and
        # zero-mask values failing the cutoff entirely on device:
        # numerically identical downstream, no sync, jit-stable shapes.
        rn = (RENORM_LOOKUP.get(cutoff_mode, 2) if renorm is True
              else int(renorm or 0))
        return _trim_mask_kernel(
            U, s, VH, jnp.asarray(cutoff if cutoff else 0.0, s.dtype),
            max_bond=int(max_bond), cutoff_mode=cutoff_mode, renorm=rn,
            absorb=absorb,
        )

    n_chi = _resolve_nchi(sabs, cutoff, cutoff_mode, max_bond, renorm)

    if n_chi < d:
        if renorm:
            pow = RENORM_LOOKUP.get(cutoff_mode, 2) if renorm is True else int(renorm)
            f = _renorm_factor_kernel(sabs, jnp.asarray(n_chi - 1), pow)
            s = s[..., :n_chi] * f[..., None]
        else:
            s = s[..., :n_chi]
        if info is not None and "error" in info:
            info["error"] = float(
                jnp.sqrt(jnp.sum(sabs[..., n_chi:] ** 2, axis=-1))
            )
        U = U[..., :, :n_chi]
        VH = VH[..., :n_chi, :]
    elif info is not None and "error" in info:
        info["error"] = 0.0

    return _do_absorb(U, s, VH, absorb)


def _do_absorb(U, s, VH, absorb):
    """Absorb singular values per mode; unrequested factors are ``None``
    (reference decomp.py:587-621)."""
    if absorb is None:
        return U, s, VH
    if absorb == "both":
        sq = jnp.sqrt(s)
        return rdmul(U, sq), None, ldmul(sq, VH)
    if absorb == "right":
        return U, None, ldmul(s, VH)
    if absorb == "left":
        return rdmul(U, s), None, VH
    if absorb == "rfactor":
        return None, None, ldmul(s, VH)
    if absorb == "lfactor":
        return rdmul(U, s), None, None
    if absorb == "lorthog":
        return U, None, None
    if absorb == "rorthog":
        return None, None, VH
    if absorb == "lsqrt":
        return rdmul(U, jnp.sqrt(s)), None, None
    if absorb == "rsqrt":
        return None, None, ldmul(jnp.sqrt(s), VH)
    if absorb == "s":
        return None, s, None
    raise ValueError(f"Invalid absorb mode: {absorb}")


# --------------------------------------------------------------------------
# driver registry (reference register_split_driver decomp.py:444)
# --------------------------------------------------------------------------

_SPLIT_DRIVERS = {}
_FULL_SPLIT_OPTS = frozenset(
    ("cutoff", "cutoff_mode", "max_bond", "absorb", "renorm", "info")
)
_DRIVER_OPTS = {}


def register_split_driver(name, accepts=_FULL_SPLIT_OPTS):
    """Register a function as a split driver for ``array_split``."""

    def _register(fn):
        _SPLIT_DRIVERS[name] = fn
        _DRIVER_OPTS[name] = frozenset(accepts)
        return fn

    return _register


def array_split(
    x,
    method="svd",
    absorb="auto",
    max_bond=None,
    cutoff=1e-10,
    cutoff_mode="rsum2",
    renorm=None,
    info=None,
    **kwargs,
):
    """Split a 2D (batch of) array(s) into left/right factors.

    The main array-level entry point, dispatching on ``method``
    (reference ``array_split`` decomp.py:34). Returns ``(left, s, right)``
    with ``None`` placeholders depending on ``absorb``.
    """
    if method == "auto":
        truncating = (max_bond is not None and max_bond > 0) or (
            cutoff is not None and cutoff > 0
        )
        if absorb in ("auto", "both", None) or truncating:
            method = "svd"
        elif absorb == "right":
            method = "qr"
        elif absorb == "left":
            method = "lq"
        else:
            method = "svd"

    if method == "lq":
        method = "qr"
        if absorb in ("auto", None):
            absorb = "left"

    if absorb == "auto":
        absorb = {"qr": "right", "qr:cholesky": "right",
                  "polar_right": "right", "polar_left": "left",
                  "cholesky": "both", "lu": "both"}.get(method, "both")

    fn = _SPLIT_DRIVERS[method]
    accepts = _DRIVER_OPTS[method]

    opts = dict(kwargs)
    if "absorb" in accepts:
        opts["absorb"] = parse_absorb(absorb)
    if "max_bond" in accepts:
        opts["max_bond"] = -1 if max_bond is None else int(max_bond)
    if "cutoff" in accepts:
        opts["cutoff"] = -1.0 if cutoff is None else float(cutoff)
    if "cutoff_mode" in accepts:
        opts["cutoff_mode"] = parse_cutoff_mode(cutoff_mode)
    if "renorm" in accepts:
        if renorm is True:
            opts["renorm"] = RENORM_LOOKUP.get(parse_cutoff_mode(cutoff_mode), 0)
        else:
            opts["renorm"] = 0 if renorm is None else int(renorm)
    if "info" in accepts:
        opts["info"] = info

    if isinstance(x, np.ndarray) and x.dtype != object and \
            method in ("svd", "qr"):
        from .contraction import get_contract_backend

        if get_contract_backend() == "numpy":
            # setup-time host phase (circuit building, simplification
            # rewrites under the numpy contract backend): split the
            # tiny host tensors with numpy so the graph surgery never
            # dispatches through the device
            return _array_split_host(x, method, **opts)

    # to_device rather than bare asarray: implicit device_put of
    # complex HOST arrays is UNIMPLEMENTED through the TPU tunnel
    from .backend import to_device

    return fn(to_device(x), **opts)


def _sgn_host(x):
    return np.where(x == 0, np.ones_like(x), x / np.abs(x))


def _nchi_host(sabs, cutoff, cutoff_mode):
    """Host mirror of ``_nchi_kernel`` (same cumulative-spectrum
    semantics, reference decomp.py:684-722)."""
    if cutoff_mode == 1:  # abs
        n_chi = np.sum(sabs > cutoff, axis=-1)
    elif cutoff_mode == 2:  # rel
        n_chi = np.sum(sabs > cutoff * sabs[..., 0:1], axis=-1)
    else:
        sp = sabs * sabs if cutoff_mode in (3, 4) else sabs
        csp = np.cumsum(sp, axis=-1)
        tot = csp[..., -1:]
        if cutoff_mode in (4, 6):
            above = csp < tot * (1 - cutoff)
        else:
            above = csp < tot - cutoff
        n_chi = np.sum(above, axis=-1) + 1
    return int(np.max(n_chi))


def _do_absorb_host(U, s, VH, absorb):
    if absorb is None:
        return U, s, VH
    if absorb == "both":
        sq = np.sqrt(s)
        return U * sq[..., None, :], None, sq[..., :, None] * VH
    if absorb == "right":
        return U, None, s[..., :, None] * VH
    if absorb == "left":
        return U * s[..., None, :], None, VH
    if absorb == "rfactor":
        return None, None, s[..., :, None] * VH
    if absorb == "lfactor":
        return U * s[..., None, :], None, None
    if absorb == "lorthog":
        return U, None, None
    if absorb == "rorthog":
        return None, None, VH
    if absorb == "lsqrt":
        return U * np.sqrt(s)[..., None, :], None, None
    if absorb == "rsqrt":
        return None, None, np.sqrt(s)[..., :, None] * VH
    if absorb == "s":
        return None, s, None
    raise ValueError(f"Invalid absorb mode: {absorb}")


def _array_split_host(x, method, absorb="both", max_bond=-1, cutoff=-1.0,
                      cutoff_mode=4, renorm=0, info=None):
    """Numpy split drivers matching the device drivers' semantics
    exactly, for host-resident setup-time tensors."""
    if method == "qr":
        if absorb == "left":
            # LQ via QR of the transpose, sign-stabilized like
            # ``lq_stabilized``
            Qt, Rt = np.linalg.qr(np.swapaxes(x, -2, -1))
            sg = _sgn_host(np.diagonal(Rt, axis1=-2, axis2=-1))
            Qt = Qt * sg[..., None, :]
            Rt = Rt * np.conj(sg)[..., :, None]
            return np.swapaxes(Rt, -2, -1), None, np.swapaxes(Qt, -2, -1)
        Q, R = np.linalg.qr(x)
        sg = _sgn_host(np.diagonal(R, axis1=-2, axis2=-1))
        Q = Q * sg[..., None, :]
        R = R * np.conj(sg)[..., :, None]
        return Q, None, R

    # svd
    U, s, VH = np.linalg.svd(x, full_matrices=False)
    d = s.shape[-1]
    if (cutoff is not None and cutoff > 0.0) or (renorm and renorm > 0):
        n_chi = max(_nchi_host(s, cutoff if cutoff else 0.0, cutoff_mode), 1)
        if max_bond and max_bond > 0:
            n_chi = min(n_chi, max_bond)
    elif max_bond and max_bond > 0:
        n_chi = min(max_bond, d)
    else:
        n_chi = d
    if n_chi < d:
        if info is not None and "error" in info:
            info["error"] = float(
                np.sqrt(np.sum(s[..., n_chi:] ** 2, axis=-1))
            )
        if renorm:
            pw = RENORM_LOOKUP.get(cutoff_mode, 2) if renorm is True \
                else int(renorm)
            sp = s**pw
            csp = np.cumsum(sp, axis=-1)
            f = (csp[..., -1] / csp[..., n_chi - 1]) ** (1.0 / pw)
            s = s[..., :n_chi] * f[..., None]
        else:
            s = s[..., :n_chi]
        U = U[..., :, :n_chi]
        VH = VH[..., :n_chi, :]
    elif info is not None and "error" in info:
        info["error"] = 0.0
    return _do_absorb_host(U, s, VH, absorb)


# --------------------------------------------------------------------------
# SVD drivers
# --------------------------------------------------------------------------


@functools.partial(jax.jit)
def _svd_kernel(x):
    return safe_svd(x)


# ---------------------------------------------------------------------------
# host (numpy) fast paths — when the operand is already a host ndarray
# (setup-time graph rewrites, boundary-MPS compressions at small chi,
# circuit marginals) LAPACK direct beats an eager XLA dispatch (and a
# compile per fresh shape) by orders of magnitude. Device arrays never
# come through here, so the jitted TPU kernels are untouched.
# ---------------------------------------------------------------------------


def _np_nchi(sabs, cutoff, cutoff_mode, max_bond, renorm):
    """Host replica of ``_nchi_kernel`` + max_bond clamp."""
    d = sabs.shape[-1]
    if (cutoff is not None and cutoff > 0.0) or (renorm and renorm > 0):
        co = cutoff if cutoff else 0.0
        if cutoff_mode == 1:  # abs
            n_chi = np.sum(sabs > co, axis=-1)
        elif cutoff_mode == 2:  # rel
            n_chi = np.sum(sabs > co * sabs[..., 0:1], axis=-1)
        else:
            sp = sabs * sabs if cutoff_mode in (3, 4) else sabs
            csp = np.cumsum(sp, axis=-1)
            tot = csp[..., -1:]
            if cutoff_mode in (4, 6):
                above = csp < tot * (1 - co)
            else:
                above = csp < tot - co
            n_chi = np.sum(above, axis=-1) + 1
        n_chi = max(int(np.max(n_chi)), 1)
        if max_bond and max_bond > 0:
            n_chi = min(n_chi, max_bond)
    elif max_bond and max_bond > 0:
        n_chi = min(max_bond, d)
    else:
        n_chi = d
    return n_chi


def _np_absorb(U, s, VH, absorb):
    if absorb is None:
        return U, s, VH
    if absorb == "both":
        sq = np.sqrt(s)
        return U * sq[..., None, :], None, VH * sq[..., :, None]
    if absorb == "right":
        return U, None, VH * s[..., :, None]
    if absorb == "left":
        return U * s[..., None, :], None, VH
    if absorb == "rfactor":
        return None, None, VH * s[..., :, None]
    if absorb == "lfactor":
        return U * s[..., None, :], None, None
    if absorb == "lorthog":
        return U, None, None
    if absorb == "rorthog":
        return None, None, VH
    if absorb == "lsqrt":
        return U * np.sqrt(s)[..., None, :], None, None
    if absorb == "rsqrt":
        return None, None, VH * np.sqrt(s)[..., :, None]
    if absorb == "s":
        return None, s, None
    raise ValueError(f"Invalid absorb mode: {absorb}")


def _np_svd_truncated(x, cutoff, cutoff_mode, max_bond, absorb, renorm,
                      info):
    cutoff_mode = parse_cutoff_mode(cutoff_mode)
    absorb = parse_absorb(absorb)
    try:
        U, s, VH = np.linalg.svd(x, full_matrices=False)
    except np.linalg.LinAlgError:
        # rare gesdd failure: fall back to the (gesvd-like) slower path
        U, s, VH = np.linalg.svd(
            x + np.finfo(x.real.dtype).eps, full_matrices=False
        )
    n_chi = _np_nchi(s, cutoff, cutoff_mode, max_bond, renorm)
    d = s.shape[-1]
    if info is not None and "error" in info:
        info["error"] = (
            float(np.sqrt(np.sum(s[..., n_chi:] ** 2, axis=-1).max()))
            if n_chi < d else 0.0
        )
    if n_chi < d:
        if renorm:
            pw = (RENORM_LOOKUP.get(cutoff_mode, 2) if renorm is True
                  else int(renorm))
            sp = s ** pw
            csp = np.cumsum(sp, axis=-1)
            f = (csp[..., -1] / csp[..., n_chi - 1]) ** (1.0 / pw)
            s = s[..., :n_chi] * f[..., None]
        else:
            s = s[..., :n_chi]
        U = U[..., :, :n_chi]
        VH = VH[..., :n_chi, :]
    return _np_absorb(U, s, VH, absorb)


@register_split_driver("svd")
def svd_truncated(
    x, cutoff=-1.0, cutoff_mode=4, max_bond=-1, absorb="both", renorm=0,
    info=None,
):
    """Truncated SVD (reference ``svd_truncated`` decomp.py:761)."""
    if isinstance(x, np.ndarray):
        return _np_svd_truncated(
            x, cutoff, cutoff_mode, max_bond, absorb, renorm, info
        )
    U, s, VH = _svd_kernel(x)
    return _trim_and_renorm(
        U, s, VH, cutoff=cutoff, cutoff_mode=cutoff_mode, max_bond=max_bond,
        absorb=absorb, renorm=renorm, info=info,
    )


@functools.partial(jax.jit, static_argnames=("gram_side",))
def _svd_via_eig_kernel(x, gram_side):
    """SVD via hermitian eigendecomposition of the Gram matrix
    (reference ``svd_via_eig_truncated`` decomp.py:1294). Faster than
    direct SVD on TPU (eigh maps better to the MXU), small precision loss.
    """
    if gram_side == "left":
        # x x† is (m, m)
        G = x @ dag(x)
        w, U = jnp.linalg.eigh(G)
        w = w[..., ::-1]
        U = U[..., ::-1]
        s = jnp.sqrt(jnp.clip(w, 0.0, None))
        safe = jnp.where(s > 0, s, 1.0)
        VH = lddiv(safe, dag(U) @ x)
    else:
        G = dag(x) @ x
        w, V = jnp.linalg.eigh(G)
        w = w[..., ::-1]
        V = V[..., ::-1]
        s = jnp.sqrt(jnp.clip(w, 0.0, None))
        safe = jnp.where(s > 0, s, 1.0)
        U = rddiv(x @ V, safe)
        VH = dag(V)
    return U, s, VH


@register_split_driver("svd:eig")
def svd_via_eig_truncated(
    x, cutoff=-1.0, cutoff_mode=4, max_bond=-1, absorb="both", renorm=0,
    info=None,
):
    m, n = x.shape[-2:]
    U, s, VH = _svd_via_eig_kernel(x, "left" if m <= n else "right")
    return _trim_and_renorm(
        U, s, VH, cutoff=cutoff, cutoff_mode=cutoff_mode, max_bond=max_bond,
        absorb=absorb, renorm=renorm, info=info,
    )


_RAND_KEY = [jax.random.PRNGKey(np.random.SeedSequence().entropy % (2**63))]


def _next_key():
    _RAND_KEY[0], sub = jax.random.split(_RAND_KEY[0])
    return sub


@functools.partial(jax.jit, static_argnames=("k", "q"))
def _rand_range_finder(x, key, k, q):
    """Randomized range finder: Q spans approx top-k column space of x.
    Power iterations ``q`` with QR re-orthogonalization. All matmuls —
    MXU friendly."""
    m, n = x.shape[-2:]
    dtype = x.dtype
    G = jax.random.normal(key, (*x.shape[:-2], n, k), dtype=
                          jnp.float64 if dtype == jnp.complex128 else
                          jnp.float32 if dtype == jnp.complex64 else dtype
                          ).astype(dtype)
    Y = x @ G
    Q, _ = safe_qr(Y)
    for _ in range(q):
        Z = dag(x) @ Q
        Z, _ = safe_qr(Z)
        Y = x @ Z
        Q, _ = safe_qr(Y)
    return Q


@register_split_driver("svd:rand", accepts=_FULL_SPLIT_OPTS | {"q", "p"})
def svd_rand_truncated(
    x, cutoff=-1.0, cutoff_mode=4, max_bond=-1, absorb="both", renorm=0,
    info=None, q=2, p=10,
):
    """Randomized truncated SVD (reference ``svd_rand`` decomp.py:1619 /
    ``rsvd`` rand_linalg.py:398). Only beneficial with ``max_bond``."""
    m, n = x.shape[-2:]
    if max_bond is None or max_bond <= 0:
        return svd_truncated(x, cutoff, cutoff_mode, -1, absorb, renorm, info)
    k = min(max_bond + p, m, n)
    Q = _rand_range_finder(x, _next_key(), k, q)
    B = dag(Q) @ x
    Ub, s, VH = _svd_kernel(B)
    U = Q @ Ub
    return _trim_and_renorm(
        U, s, VH, cutoff=cutoff, cutoff_mode=cutoff_mode, max_bond=max_bond,
        absorb=absorb, renorm=renorm, info=info,
    )


# aliases for the reference's iterative sparse drivers — on TPU dense
# decompositions of the (always dense) arrays are both simpler and faster
register_split_driver("svds")(svd_rand_truncated)
register_split_driver("isvd", accepts=_FULL_SPLIT_OPTS | {"q", "p"})(
    svd_rand_truncated
)
register_split_driver("rsvd", accepts=_FULL_SPLIT_OPTS | {"q", "p"})(
    svd_rand_truncated
)


# --------------------------------------------------------------------------
# QR / LQ drivers
# --------------------------------------------------------------------------


@jax.jit
def _qr_stab_kernel(x):
    Q, R = safe_qr(x)
    rd = jnp.diagonal(R, axis1=-2, axis2=-1)
    s = sgn(rd)
    Q = Q * s[..., None, :]
    R = R * jnp.conj(s)[..., :, None]
    return Q, R


def _np_sgn(x):
    x0 = np.where(x == 0, 1.0, x)
    return np.where(x == 0, np.ones_like(x), x0 / np.abs(x0))


def qr_stabilized(x):
    """QR with R's diagonal made real-positive (reference
    ``qr_stabilized`` decomp.py:1985). Returns ``(Q, None, R)``."""
    if isinstance(x, np.ndarray):
        Q, R = np.linalg.qr(x)
        rd = np.diagonal(R, axis1=-2, axis2=-1)
        sg = _np_sgn(rd)
        return Q * sg[..., None, :], None, R * np.conj(sg)[..., :, None]
    Q, R = _qr_stab_kernel(x)
    return Q, None, R


@register_split_driver("qr", accepts=("absorb",))
def qr_driver(x, absorb="right"):
    Q, _, R = qr_stabilized(x)
    if absorb == "left":
        # LQ decomposition via QR of the transpose
        L, _, Qr = lq_stabilized(x)
        return L, None, Qr
    return Q, None, R


@jax.jit
def _lq_stab_kernel(x):
    Qt, Rt = safe_qr(jnp.swapaxes(x, -2, -1))
    rd = jnp.diagonal(Rt, axis1=-2, axis2=-1)
    s = sgn(rd)
    Qt = Qt * s[..., None, :]
    Rt = Rt * jnp.conj(s)[..., :, None]
    return jnp.swapaxes(Rt, -2, -1), jnp.swapaxes(Qt, -2, -1)


def lq_stabilized(x):
    """LQ decomposition ``x = L @ Q`` with ``Q`` row-isometric and ``L``'s
    diagonal real-positive. Returns ``(L, None, Q)``."""
    if isinstance(x, np.ndarray):
        Qt, Rt = np.linalg.qr(np.swapaxes(x, -2, -1))
        rd = np.diagonal(Rt, axis1=-2, axis2=-1)
        sg = _np_sgn(rd)
        Qt = Qt * sg[..., None, :]
        Rt = Rt * np.conj(sg)[..., :, None]
        return np.swapaxes(Rt, -2, -1), None, np.swapaxes(Qt, -2, -1)
    L, Q = _lq_stab_kernel(x)
    return L, None, Q


@jax.jit
def _qr_cholesky_kernel(x):
    """Cholesky-QR: Q = x R^-1 with R = chol(x†x)† — a single gram matmul +
    small cholesky + triangular solve; much faster than Householder QR on
    TPU (reference notes the same for GPU, decomp.py:2289)."""
    G = dag(x) @ x
    # regularize for rank safety
    eps = jnp.finfo(x.real.dtype).eps
    tr = jnp.trace(G, axis1=-2, axis2=-1).real
    G = G + (eps * tr)[..., None, None] * jnp.eye(G.shape[-1], dtype=G.dtype)
    L = jnp.linalg.cholesky(G)
    R = dag(L)
    Q = jax.scipy.linalg.solve_triangular(L, dag(x), lower=True)
    return dag(Q), R


@register_split_driver("qr:cholesky", accepts=())
def qr_cholesky(x):
    Q, R = _qr_cholesky_kernel(x)
    return Q, None, R


# --------------------------------------------------------------------------
# hermitian / positive drivers
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("positive",))
def _eigh_kernel(x, positive):
    s, U = jnp.linalg.eigh(x)
    if not positive:
        idx = jnp.argsort(-jnp.abs(s), axis=-1)
        s = jnp.take_along_axis(s, idx, axis=-1)
        U = jnp.take_along_axis(U, idx[..., None, :], axis=-1)
    else:
        s = s[..., ::-1]
        U = U[..., ::-1]
    return s, U


@register_split_driver(
    "eigh", accepts=_FULL_SPLIT_OPTS | {"positive", "shift"}
)
def eigh_truncated(
    x, cutoff=-1.0, cutoff_mode=4, max_bond=-1, absorb="both", renorm=0,
    info=None, positive=0, shift=False,
):
    """SVD-like split via hermitian eigendecomposition; ``x`` must be
    hermitian (reference ``eigh_truncated`` decomp.py:1829)."""
    if shift:
        rel = jnp.finfo(x.real.dtype).eps if shift is True else float(shift)
        tr = jnp.trace(x, axis1=-2, axis2=-1)
        x = x + (rel * tr)[..., None, None] * jnp.eye(
            x.shape[-1], dtype=x.dtype
        )
    s, U = _eigh_kernel(x, bool(positive))
    if positive and absorb in ("both", "lsqrt", "rsqrt"):
        s = jnp.clip(s, 0.0, None)
    VH = dag(U)
    return _trim_and_renorm(
        U, s, VH, cutoff=cutoff, cutoff_mode=cutoff_mode, max_bond=max_bond,
        absorb=absorb, renorm=renorm, use_abs=not positive, info=info,
    )


register_split_driver("eigsh", accepts=_FULL_SPLIT_OPTS | {"positive", "shift"})(
    eigh_truncated
)


@register_split_driver("cholesky", accepts=())
def cholesky_split(x):
    """x = L @ L†, for positive-definite hermitian x."""
    L = jnp.linalg.cholesky(x)
    return L, None, dag(L)


# --------------------------------------------------------------------------
# polar and LU drivers
# --------------------------------------------------------------------------


@jax.jit
def _polar_kernel(x):
    U, s, VH = safe_svd(x)
    W = U @ VH
    return W, U, s, VH


@register_split_driver("polar_right", accepts=())
def polar_right(x):
    """Polar decomposition x = W @ P (W isometric, P positive hermitian)."""
    W, U, s, VH = _polar_kernel(x)
    P = dag(VH) @ ldmul(s, VH)
    return W, None, P


@register_split_driver("polar_left", accepts=())
def polar_left(x):
    """Polar decomposition x = P @ W."""
    W, U, s, VH = _polar_kernel(x)
    P = rdmul(U, s) @ dag(U)
    return P, None, W


@register_split_driver("lu", accepts=("cutoff", "cutoff_mode"))
def lu_truncated(x, cutoff=-1.0, cutoff_mode=4):
    """LU split x = (P L) U, optionally trimming jointly-small
    columns/rows (reference ``lu_truncated`` decomp.py:2545 — supports
    sparsity rather than rank-optimality; only abs/rel cutoffs)."""
    PL, U = jax.scipy.linalg.lu(x, permute_l=True)
    if cutoff > 0.0:
        sl = jnp.linalg.norm(PL, axis=-2)
        su = jnp.linalg.norm(U, axis=-1)
        if cutoff_mode == 1:
            keep = np.asarray((sl * su) > cutoff)
        elif cutoff_mode == 2:
            ss = sl * su
            keep = np.asarray(ss > cutoff * jnp.max(ss))
        else:
            raise ValueError(
                "lu_truncated only supports cutoff modes 'abs' and 'rel'"
            )
        (idx,) = np.nonzero(keep)
        PL = PL[..., :, idx]
        U = U[..., idx, :]
    return PL, None, U


# --------------------------------------------------------------------------
# fully-static, in-jit truncated SVD (the DMRG/TEBD hot-loop primitive)
# --------------------------------------------------------------------------


@functools.partial(
    jax.jit, static_argnames=("max_bond", "cutoff_mode", "renorm", "absorb")
)
def svd_truncated_masked(
    x, max_bond, cutoff=0.0, cutoff_mode=4, renorm=0, absorb="both"
):
    """Jit-static truncated SVD: output shapes depend only on ``max_bond``.

    Singular values failing the ``cutoff`` criterion are **zero-masked**
    rather than dropped, so the result can live inside ``jax.jit`` /
    ``lax.scan`` bodies with no host sync. Returns ``(U, s, VH, rank)``
    where factors have bond size ``k = min(max_bond, min(m, n))`` and
    ``rank <= k`` counts surviving values.
    """
    U, s, VH = safe_svd(x)
    return _truncate_mask_absorb(
        U, s, VH, max_bond=max_bond, cutoff=cutoff,
        cutoff_mode=cutoff_mode, renorm=renorm, absorb=absorb,
    )


@functools.partial(
    jax.jit,
    static_argnames=("max_bond", "cutoff_mode", "renorm", "absorb"),
)
def svd_truncated_masked_eig(
    x, max_bond, cutoff=0.0, cutoff_mode=4, renorm=0, absorb="both"
):
    """Like :func:`svd_truncated_masked` but via a hermitian
    eigendecomposition of the gram matrix (reference ``svd:eig``
    driver decomp.py:1294) — substantially faster than Jacobi SVD on
    TPU. The gram side is chosen so the factor that must stay
    isometric comes *exactly* from the eigh (the other side is
    recovered by division and immediately rescaled by ``s``, so its
    small-singular-value noise is suppressed)."""
    eps = jnp.finfo(x.dtype).eps

    if absorb == "left":
        # VH must be exactly isometric
        G = dag(x) @ x
        el, V = safe_eigh(G)
        el = el[..., ::-1]
        V = V[..., :, ::-1]
        s = jnp.sqrt(jnp.clip(el, 0.0, None))
        s_safe = jnp.where(s > eps, s, 1.0)
        U = (x @ V) / s_safe[..., None, :]
        VH = dag(V)
    else:
        # U must be exactly isometric (absorb 'right'/'both'/None)
        G = x @ dag(x)
        el, U = safe_eigh(G)
        el = el[..., ::-1]
        U = U[..., :, ::-1]
        s = jnp.sqrt(jnp.clip(el, 0.0, None))
        s_safe = jnp.where(s > eps, s, 1.0)
        VH = (dag(U) @ x) / s_safe[..., :, None]
    # the gram side can exceed the true rank side — cap at min(m, n)
    # so shapes match the plain-SVD driver exactly
    kmax = min(x.shape[-2], x.shape[-1])
    U = U[..., :, :kmax]
    s = s[..., :kmax]
    VH = VH[..., :kmax, :]
    return _truncate_mask_absorb(
        U, s, VH, max_bond=max_bond, cutoff=cutoff,
        cutoff_mode=cutoff_mode, renorm=renorm, absorb=absorb,
    )


def _subspace_basis(G, k, iters, dtype):
    """Orthonormal basis (m, k) of the dominant-k eigenspace of the
    PSD matrix ``G`` by randomized subspace iteration: each round is
    one (m, m, k) matmul + one tall QR — all MXU-friendly, no
    full-size eigh. Convergence per non-dominant direction is
    ~(lam_{k+1}/lam_j)^iters, ample for the rapidly decaying
    Schmidt spectra these truncations consume. Callers oversample
    (k = wanted rank + padding) and Rayleigh-Ritz back down, the
    standard Halko-Martinsson-Tropp accuracy recipe."""
    m = G.shape[-1]
    om = jax.random.normal(
        jax.random.PRNGKey(0), (*G.shape[:-2], m, k),
        dtype=jnp.real(G).dtype,
    ).astype(dtype)
    V = om
    for _ in range(max(iters, 1)):
        Q, _ = safe_qr(G @ V)
        V = Q[..., :, :k]
    return V


@functools.partial(
    jax.jit,
    static_argnames=("max_bond", "cutoff_mode", "renorm", "absorb",
                     "iters", "oversample"),
)
def svd_truncated_masked_subspace(
    x, max_bond, cutoff=0.0, cutoff_mode=4, renorm=0, absorb="both",
    iters=2, oversample=8,
):
    """Truncated SVD via randomized subspace iteration plus a
    ``max_bond``-sized Rayleigh-Ritz step (role of the reference's
    ``svd:`` rank-truncating drivers, decomp.py:1294; algorithm of
    Halko-Martinsson-Tropp randomized SVD as in reference
    ``rand_linalg.rsvd``). The full-size eigh of the ``svd:eig``
    driver — 7.6 ms at 512x512 on TPU v5e, the single most expensive
    kernel in a DMRG sweep — is replaced by matmuls + tall QR
    (~0.5 ms) + an eigh of size ``max_bond`` only. Semantics
    (cutoff masking, absorb, renorm) match
    :func:`svd_truncated_masked_eig`; accuracy differs only in the
    split of near-degenerate directions straddling the cut, which is
    variationally immaterial."""
    m, n = x.shape[-2:]
    kmax = min(m, n)
    k = min(max_bond, kmax) if (max_bond and max_bond > 0) else kmax
    if k >= kmax:
        # no rank reduction to exploit — the full-size path is needed
        return svd_truncated_masked_eig(
            x, max_bond=max_bond, cutoff=cutoff,
            cutoff_mode=cutoff_mode, renorm=renorm, absorb=absorb,
        )
    eps = jnp.finfo(x.dtype).eps
    # iterate an oversampled basis; the Rayleigh-Ritz step below plus
    # the final max_bond=k slice discard the padding directions
    kp = min(k + max(oversample, 0), kmax)

    if absorb == "left":
        # dominant row space; VH = dag(basis) stays exactly isometric
        G = dag(x) @ x
        Vr = _subspace_basis(G, kp, iters, x.dtype)
        B = x @ Vr                                   # (m, kp)
        el, W = safe_eigh(dag(B) @ B)                # (kp, kp)
        el = el[..., ::-1]
        W = W[..., :, ::-1]
        s = jnp.sqrt(jnp.clip(el, 0.0, None))
        s_safe = jnp.where(s > eps, s, 1.0)
        U = (B @ W) / s_safe[..., None, :]
        VH = dag(Vr @ W)
    else:
        # dominant column space; U = basis stays exactly isometric
        G = x @ dag(x)
        V = _subspace_basis(G, kp, iters, x.dtype)
        B = dag(V) @ x                               # (kp, n)
        el, W = safe_eigh(B @ dag(B))                # (kp, kp)
        el = el[..., ::-1]
        W = W[..., :, ::-1]
        s = jnp.sqrt(jnp.clip(el, 0.0, None))
        s_safe = jnp.where(s > eps, s, 1.0)
        U = V @ W
        VH = (dag(W) @ B) / s_safe[..., :, None]
    return _truncate_mask_absorb(
        U, s, VH, max_bond=k, cutoff=cutoff,
        cutoff_mode=cutoff_mode, renorm=renorm, absorb=absorb,
    )


@functools.partial(
    jax.jit,
    static_argnames=("max_bond", "absorb", "iters", "oversample"),
)
def split_truncated_subspace(x, max_bond, absorb="right", iters=2,
                             oversample=8):
    """Rank-``max_bond`` orthogonal split with NO cutoff masking:
    ``x ~= U @ VH`` where the isometric factor is an orthonormal basis
    of the dominant subspace (oversampled iteration + a small
    Rayleigh-Ritz rotation to discard the padding directions — the
    rotation costs one (k+p)-sized eigh, still nothing like a
    full-size factorization). This is the cheapest near-optimal
    2-site DMRG truncation — the best rank-k projection only needs
    the subspace, not individual singular values, and the bond basis
    is pure gauge. Returns ``(U, None, VH, rank)`` matching the
    masked drivers' layout."""
    m, n = x.shape[-2:]
    kmax = min(m, n)
    k = min(max_bond, kmax) if (max_bond and max_bond > 0) else kmax
    if k >= kmax:
        return svd_truncated_masked_eig(
            x, max_bond=k, cutoff=0.0, absorb=absorb,
        )
    kp = min(k + max(oversample, 0), kmax)
    if absorb == "left":
        G = dag(x) @ x
        Vr = _subspace_basis(G, kp, iters, x.dtype)
        if kp > k:
            B = x @ Vr                               # (m, kp)
            _, W = safe_eigh(dag(B) @ B)             # (kp, kp)
            Vr = Vr @ W[..., :, ::-1][..., :, :k]
        U = x @ Vr
        VH = dag(Vr)
    else:
        G = x @ dag(x)
        V = _subspace_basis(G, kp, iters, x.dtype)
        if kp > k:
            B = dag(V) @ x                           # (kp, n)
            _, W = safe_eigh(B @ dag(B))             # (kp, kp)
            V = V @ W[..., :, ::-1][..., :, :k]
        U = V
        VH = dag(V) @ x
    return U, None, VH, jnp.asarray(k, jnp.int32)


@functools.partial(
    jax.jit,
    static_argnames=("max_bond", "cutoff_mode", "renorm", "absorb"),
)
def _trim_mask_kernel(U, s, VH, cutoff, max_bond, cutoff_mode, renorm,
                      absorb):
    """One compiled program for the TPU no-sync truncation trailer:
    static-shape slice to ``min(max_bond, d)``, cutoff applied by
    zero-masking, then the absorb arithmetic — all on device. Returns
    the same ``(left, s|None, right)`` triple as ``_do_absorb``."""
    Um, sm, VHm, _ = _truncate_mask_absorb(
        U, s, VH, max_bond=max_bond, cutoff=cutoff,
        cutoff_mode=cutoff_mode, renorm=renorm, absorb=None,
    )
    return _do_absorb(Um, sm, VHm, absorb)


def _truncate_mask_absorb(U, s, VH, max_bond, cutoff, cutoff_mode,
                          renorm, absorb):
    if max_bond is None or max_bond <= 0:
        k = s.shape[-1]
    else:
        k = min(max_bond, s.shape[-1])
    U = U[..., :, :k]
    VH = VH[..., :k, :]
    skept = s[..., :k]

    if cutoff_mode in (3, 4):
        sp = s * s
    else:
        sp = s
    csp = cumsum_last(sp)
    tot = csp[..., -1:]
    # exclusive prefix sums: value i is kept if the sum *before* it has
    # not yet crossed the threshold (reference counts `above + 1`,
    # decomp.py:715)
    csp_exc = csp - sp

    idx = jnp.arange(k)
    if cutoff_mode == 1:
        mask = skept > cutoff
    elif cutoff_mode == 2:
        mask = skept > cutoff * skept[..., 0:1]
    elif cutoff_mode in (4, 6):
        mask = csp_exc[..., :k] < tot * (1 - cutoff)
    else:
        mask = csp_exc[..., :k] < tot - cutoff
    # always keep at least one value
    mask = jnp.logical_or(mask, idx == 0)
    rank = jnp.sum(mask, axis=-1)

    s_out = jnp.where(mask, skept, 0.0)
    if renorm:
        pow = 2 if cutoff_mode in (3, 4) else 1
        kept_norm = jnp.sum(jnp.where(mask, sp[..., :k], 0.0), axis=-1)
        f = (tot[..., 0] / kept_norm) ** (1.0 / pow)
        s_out = s_out * f[..., None]

    mU = mask[..., None, :].astype(U.dtype)
    mV = mask[..., :, None].astype(VH.dtype)
    if absorb == "both":
        sq = jnp.sqrt(s_out)
        return rdmul(U, sq) * mU, s_out, ldmul(sq, VH) * mV, rank
    elif absorb == "left":
        return rdmul(U, s_out) * mU, s_out, VH * mV, rank
    elif absorb == "right":
        return U * mU, s_out, ldmul(s_out, VH) * mV, rank
    else:
        return U * mU, s_out, VH * mV, rank


# --------------------------------------------------------------------------
# isometrization (reference decomp.py:2851-2958)
# --------------------------------------------------------------------------


@jax.jit
def isometrize_qr(x):
    """Isometrize via QR with positive-diagonal convention."""
    Q, R = safe_qr(x)
    rd = jnp.diagonal(R, axis1=-2, axis2=-1)
    return Q * sgn(rd)[..., None, :]


@jax.jit
def isometrize_svd(x):
    U, _, VH = safe_svd(x)
    return U @ VH


@jax.jit
def isometrize_exp(x):
    """U = expm(X - X†) with rectangular x zero-completed first."""
    m, n = x.shape[-2:]
    d = max(m, n)
    pads = [(0, 0)] * (x.ndim - 2) + [(0, d - m), (0, d - n)]
    xp = jnp.pad(x, pads)
    A = xp - dag(xp)
    Q = jax.scipy.linalg.expm(A)
    return Q[..., :m, :n]


@jax.jit
def isometrize_cayley(x):
    """Cayley transform of (X - X†)/2, zero-completed to square."""
    m, n = x.shape[-2:]
    d = max(m, n)
    pads = [(0, 0)] * (x.ndim - 2) + [(0, d - m), (0, d - n)]
    xp = jnp.pad(x, pads)
    A = (xp - dag(xp)) / 2.0
    Id = jnp.eye(d, dtype=x.dtype)
    Q = jnp.linalg.solve(Id - A, Id + A)
    return Q[..., :m, :n]


@jax.jit
def isometrize_mgs(A):
    """Modified Gram-Schmidt, expressed via stabilized QR (numerically the
    same projector sequence; fully on-device)."""
    return isometrize_qr(A)


@jax.jit
def isometrize_householder(X):
    """Householder-product isometrization (used for torch parity; on jax
    we construct the product from the strictly-lower triangle of X)."""
    X = jnp.tril(X, -1)
    tau = 2.0 / (1.0 + jnp.sum(jnp.conj(X) * X, axis=-2))
    return jax.lax.linalg.householder_product(X, tau.astype(X.dtype))


_ISOMETRIZE_METHODS = {
    "qr": isometrize_qr,
    "svd": isometrize_svd,
    "mgs": isometrize_mgs,
    "exp": isometrize_exp,
    "cayley": isometrize_cayley,
    "householder": isometrize_householder,
}


def isometrize(x, method="qr"):
    """Project ``x`` into isometric form using ``method``."""
    return _ISOMETRIZE_METHODS[method](jnp.asarray(x))


# --------------------------------------------------------------------------
# reduced factors & oblique projectors (reference decomp.py:3012,3100,3202)
# — used by reduce-split gating, full-bond compression and cluster update
# --------------------------------------------------------------------------


@functools.partial(jax.jit, static_argnames=("right",))
def squared_op_to_reduced_factor(x2, right=True):
    """Given the square of an operator ``x2 = x† x`` (or ``x x†``),
    compute a reduced factor ``R`` such that ``R† R = x2`` (right) or
    ``R R† = x2`` (left)."""
    s2, W = jnp.linalg.eigh(x2)
    s = jnp.sqrt(jnp.clip(s2, 0.0, None))
    if right:
        return ldmul(s, dag(W))
    else:
        return rdmul(W, s)


def compute_oblique_projectors(
    Rl, Rr, max_bond, cutoff, absorb="both", cutoff_mode=4, **split_opts
):
    """Compute oblique projectors ``Pl``, ``Pr`` for a bond given the left
    and right reduced factors, such that inserting ``Pl @ Pr`` compresses
    the bond to ``max_bond`` (reference decomp.py:3202)."""
    max_bond = -1 if max_bond is None else max_bond
    U, s, VH = svd_truncated(
        Rl @ Rr, cutoff=cutoff, cutoff_mode=cutoff_mode, max_bond=max_bond,
        absorb=None, **split_opts,
    )
    sqs = jnp.sqrt(s)
    safe = jnp.where(sqs > 0, sqs, 1.0)
    Pl = Rr @ rddiv(dag(VH), safe)
    Pr = lddiv(safe, dag(U)) @ Rl
    return Pl, Pr


def similarity_compress(X, max_bond, renorm=False, method="eigh"):
    """Find ``(Cl, Cr)`` compressing a square bond-environment operator
    ``X`` to ``max_bond`` via a similarity transform: ``Cr @ X @ Cl``
    acts on the compressed bond, with ``Cl @ Cr`` the (possibly
    oblique) projector to insert into the network (reference
    ``similarity_compress`` decomp.py:2836; methods eigh/svd/biorthog).
    """
    X = jnp.asarray(X)
    if X.shape[-1] <= max_bond:
        d = X.shape[-1]
        eye = jnp.eye(d, dtype=X.dtype)
        return eye, eye
    if method == "eigh":
        H = (X + dag(X)) / 2
        el, ev = safe_eigh(H)
        sel = jnp.argsort(-jnp.abs(el))[:max_bond]
        Cl = ev[:, sel]
        Cr = dag(Cl)
    elif method == "svd":
        U, _, _ = safe_svd(X)
        Cl = U[:, :max_bond]
        Cr = dag(Cl)
    elif method == "biorthog":
        # oblique variant: use both left and right leading invariant
        # subspaces of X (general eig is host-only)
        import numpy as np
        import scipy.linalg as sla

        Xh = np.asarray(X)
        el, vl, vr = sla.eig(Xh, left=True, right=True)
        sel = np.argsort(-np.abs(el))[:max_bond]
        Cl_ = vr[:, sel]
        Cr_ = vl[:, sel].conj().T
        # bi-orthonormalize: Cr @ Cl = I
        M = Cr_ @ Cl_
        Cr_ = np.linalg.solve(M, Cr_)
        if np.iscomplexobj(Xh) or np.abs(np.imag(Cl_)).max() > 1e-12:
            Cl, Cr = jnp.asarray(Cl_), jnp.asarray(Cr_)
        else:
            Cl = jnp.asarray(np.real(Cl_))
            Cr = jnp.asarray(np.real(Cr_))
    else:
        raise ValueError(f"unknown similarity_compress method {method}")
    if renorm:
        tr_old = jnp.trace(X)
        tr_new = jnp.trace(Cr @ (X @ Cl))
        Cl = Cl * (tr_old / tr_new)
    return Cl, Cr


def estimate_rank(x, eps=1e-10, k_start=16, k_max=None, q=2):
    """Estimate the numerical rank of ``x`` at relative singular-value
    threshold ``eps`` by adaptive randomized range sketching (reference
    ``estimate_rank`` rand_linalg.py:302): double the sketch size until
    the smallest captured singular value drops below ``eps * s_max``.
    """
    m, n = x.shape[-2:]
    full = min(m, n)
    if k_max is None:
        k_max = full
    k = min(k_start, full)
    while True:
        Q = _rand_range_finder(x, _next_key(), k, q)
        B = dag(Q) @ x
        s = _svd_kernel(B)[1]
        s0 = s[0]
        below = s < eps * s0
        if bool(jnp.any(below)):
            return int(jnp.argmax(below))
        if k >= k_max:
            return int(full if k >= full else k)
        k = min(2 * k, k_max, full)
