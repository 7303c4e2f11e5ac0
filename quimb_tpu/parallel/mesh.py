"""Device-mesh distributed kernels.

Replaces the reference's MPI/PETSc/SLEPc layer (``slepc_linalg.py``
row-slab decomposition :105-237, ``mpi_launcher.py`` pools,
``approx_spectral_function(mpi=True)`` :696):

- operators are sharded over a 1D mesh axis ``'d'`` in contiguous row
  slabs exactly like ``slice_sparse_matrix_to_components``;
- the halo exchange is an ``all_gather`` over ICI inside ``shard_map``;
- embarrassing parallelism (SLQ probes, contraction slices) shards the
  batch axis and lets each device run its share of one batched XLA
  program.
"""

import functools
import itertools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def distributed_init(**kwargs):
    """Initialize multi-host jax (DCN). No-op in single-process runs
    (the reference's `quimb-mpi-python` launcher becomes this call)."""
    try:
        jax.distributed.initialize(**kwargs)
    except (RuntimeError, ValueError):
        pass


def get_mesh(n=None, axis_name="d", devices=None):
    """A 1D device mesh over ``n`` devices (defaults to all devices of
    the default backend; falls back to the CPU device pool)."""
    if devices is None:
        devices = jax.devices()
        if n is not None and len(devices) < n:
            devices = jax.devices("cpu")
    if n is not None:
        devices = devices[:n]
    return Mesh(np.array(devices), (axis_name,))


class ShardedSparseHam:
    """Sparse hermitian operator in contiguous row slabs across a mesh
    (the PETSc-Mat analogue, slepc_linalg.py:105).

    Entries are bucketed by owner row-slab and stored in ELL format
    (every local row padded to the global max nnz-per-row), giving a
    fully static sharded matvec with no scatter:
    ``y_local = sum(vals_local * x_gathered[cols_local], axis=-1)``
    — XLA lowers scatter-adds on TPU to a serialized loop, while the
    gather + dense row-reduce is purely bandwidth-bound.
    """

    def __init__(self, H, mesh=None, dtype=None):
        import scipy.sparse as sp

        from ..config import get_default_dtype

        if mesh is None:
            mesh = get_mesh()
        self.mesh = mesh
        self.axis = mesh.axis_names[0]
        nd = mesh.devices.size

        Hc = H.tocoo() if sp.issparse(H) else sp.coo_matrix(
            np.asarray(H))
        if dtype is None:
            dtype = get_default_dtype()
            if np.iscomplexobj(Hc.data) and np.allclose(
                Hc.data.imag, 0
            ):
                Hc = Hc.copy()
                Hc.data = Hc.data.real
                dtype = {"complex128": "float64",
                         "complex64": "float32"}.get(str(dtype), dtype)
        self.dtype = np.dtype(str(dtype))
        n = Hc.shape[0]
        # pad n to a multiple of nd
        self.n = n
        self.n_pad = -(-n // nd) * nd
        self.rows_per = self.n_pad // nd

        # ELL: pad every row to the global max nnz-per-row so each
        # shard holds a static (rows_per, kmax) block
        counts = np.bincount(Hc.row, minlength=self.n_pad)
        kmax = max(int(counts.max()) if Hc.nnz else 1, 1)
        nnz = max(int(Hc.nnz), 1)
        # skew guard (mirrors SparseHam's 4x-nnz guard in core.py): a
        # single dense-ish row would inflate plain ELL storage to
        # n_pad*kmax ~ O(n^2). Chunk heavy rows into virtual rows of
        # width <= kcap and fold partial sums back with a per-slab
        # segment_sum, bounding device storage to ~4x nnz.
        kcap = kmax
        if self.n_pad * kmax > 4 * nnz:
            kcap = max(-(-4 * nnz // self.n_pad), 1)
        self._kcap = kcap

        order = np.argsort(Hc.row, kind="stable")
        r = Hc.row[order].astype(np.int64)
        c = Hc.col[order].astype(np.int32)
        v = Hc.data[order]
        if np.iscomplexobj(v) and not np.issubdtype(
            self.dtype, np.complexfloating
        ):
            v = v.real
        starts = np.zeros(self.n_pad + 1, np.int64)
        np.cumsum(counts, out=starts[1:])
        pos = np.arange(len(r), dtype=np.int64) - starts[r]

        axis = self.axis
        shard = NamedSharding(mesh, P(self.axis, None, None))
        self.shape = (n, n)

        if kcap == kmax:
            # plain ELL: one virtual row per row
            cols2 = np.zeros((self.n_pad, kmax), np.int32)
            vals2 = np.zeros((self.n_pad, kmax), dtype=self.dtype)
            cols2[r, pos] = c
            vals2[r, pos] = v
            C = cols2.reshape(nd, self.rows_per, kmax)
            V = vals2.reshape(nd, self.rows_per, kmax)
            self.C = jax.device_put(C, shard)
            self.V = jax.device_put(V, shard)
            self._S = None

            def _mv_local(C, V, x_shard):
                # gather the full vector over the mesh (ICI all_gather)
                x_full = jax.lax.all_gather(
                    x_shard, axis, axis=0, tiled=True
                )
                src = jnp.take(x_full, C[0], axis=0)  # (rows_per, kmax)
                return jnp.sum(V[0] * src, axis=-1)

            self._mv_sharded = jax.jit(jax.shard_map(
                _mv_local,
                mesh=mesh,
                in_specs=(P(axis, None, None), P(axis, None, None),
                          P(axis)),
                out_specs=P(axis),
            ))
        else:
            # chunked ELL: row i owns ceil(count_i / kcap) virtual rows
            # of width kcap, all within i's owner slab; every slab is
            # padded to the max virtual-row count so shapes are static
            vchunk = pos // kcap          # chunk index within the row
            vpos = pos - vchunk * kcap    # position within the chunk
            nchunks = np.maximum(-(-counts // kcap), 1)  # per row
            vstarts = np.zeros(self.n_pad + 1, np.int64)
            np.cumsum(nchunks, out=vstarts[1:])
            # virtual rows per slab, padded to the max across slabs
            slab_edges = vstarts[:: self.rows_per]
            vrows_slab = np.diff(
                np.concatenate([slab_edges, [vstarts[-1]]])
            )[:nd]
            vper = int(vrows_slab.max())
            # local virtual-row index of entry = global vrow - slab base
            gvrow = vstarts[r] + vchunk
            slab_of = r // self.rows_per
            lvrow = gvrow - slab_edges[slab_of]
            cols2 = np.zeros((nd, vper, kcap), np.int32)
            vals2 = np.zeros((nd, vper, kcap), dtype=self.dtype)
            cols2[slab_of, lvrow, vpos] = c
            vals2[slab_of, lvrow, vpos] = v
            # local true-row of each virtual row (padding rows fold
            # into row 0 with zero values — harmless)
            seg = np.zeros((nd, vper), np.int32)
            rows_all = np.arange(self.n_pad)
            gv = np.repeat(rows_all % self.rows_per, nchunks)
            for d in range(nd):
                sl = gv[slab_edges[d]:slab_edges[d] + vrows_slab[d]]
                seg[d, : len(sl)] = sl
            self.C = jax.device_put(cols2, shard)
            self.V = jax.device_put(vals2, shard)
            self._S = jax.device_put(
                seg, NamedSharding(mesh, P(self.axis, None))
            )
            rows_per = self.rows_per

            def _mv_local_chunked(C, V, S, x_shard):
                x_full = jax.lax.all_gather(
                    x_shard, axis, axis=0, tiled=True
                )
                src = jnp.take(x_full, C[0], axis=0)  # (vper, kcap)
                partial = jnp.sum(V[0] * src, axis=-1)
                return jax.ops.segment_sum(
                    partial, S[0], num_segments=rows_per
                )

            self._mv_sharded_chunked = jax.jit(jax.shard_map(
                _mv_local_chunked,
                mesh=mesh,
                in_specs=(P(axis, None, None), P(axis, None, None),
                          P(axis, None), P(axis)),
                out_specs=P(axis),
            ))
            self._mv_sharded = lambda C, V, x: \
                self._mv_sharded_chunked(C, V, self._S, x)

    def shard_vector(self, x):
        """Place (and zero-pad) a vector row-sharded over the mesh."""
        x = np.asarray(x).reshape(-1)
        if x.size < self.n_pad:
            x = np.pad(x, (0, self.n_pad - x.size))
        return jax.device_put(
            jnp.asarray(x, dtype=self.dtype.name
                        if not np.iscomplexobj(x) else x.dtype),
            NamedSharding(self.mesh, P(self.axis)),
        )

    def matvec(self, x):
        """Sharded matvec; accepts and returns mesh-sharded vectors."""
        return self._mv_sharded(self.C, self.V, x)

    def __matmul__(self, x):
        if np.shape(x)[0] != self.n_pad:
            x = self.shard_vector(x)
        return self.matvec(x)

    def to_host(self, y):
        return np.asarray(y)[: self.n]


def eigh_lanczos_sharded(H, v0=None, ncv=20, restarts=10, mesh=None,
                         seed=0):
    """Ground eigenpair of a (host scipy / dense) hermitian operator,
    computed with the row-sharded matvec over the mesh — the
    Krylov-Schur-over-MPI replacement (``eigs_slepc`` slepc_linalg.py:499).
    """
    from ..linalg.lanczos import eigh_lanczos

    Hs = H if isinstance(H, ShardedSparseHam) else \
        ShardedSparseHam(H, mesh=mesh)
    if v0 is None:
        v0 = np.random.default_rng(seed).standard_normal(Hs.n_pad)
        if Hs.n_pad > Hs.n:
            v0[Hs.n:] = 0.0
    xs = Hs.shard_vector(v0)
    lam, v = eigh_lanczos(Hs.matvec, xs, ncv=ncv, restarts=restarts)
    return lam, Hs.to_host(v)


def expm_multiply_sharded(H, v, t=1.0, ncv=30, mesh=None,
                          hermitian=True):
    """exp(t H) v with the matvec sharded over the mesh (the SLEPc MFN
    replacement, ``mfn_multiply_slepc`` slepc_linalg.py:773)."""
    from ..linalg.lanczos import expm_multiply_krylov

    Hs = H if isinstance(H, ShardedSparseHam) else \
        ShardedSparseHam(H, mesh=mesh)
    xs = Hs.shard_vector(np.asarray(v).reshape(-1))
    out = expm_multiply_krylov(Hs.matvec, xs, t=t, ncv=ncv,
                               hermitian=hermitian)
    return Hs.to_host(out)


def approx_spectral_sharded(A, f, R=128, K=40, mesh=None, seed=None,
                            pos=False):
    """SLQ with the probe batch sharded across the mesh (the MPI-SLQ
    replacement, approx_spectral.py:696): every device runs its share
    of one batched Lanczos program."""
    from ..linalg.approx_spectral import (
        _quadrature_weights,
        construct_lanczos_tridiag,
    )

    if mesh is None:
        mesh = get_mesh()
    axis = mesh.axis_names[0]
    nd = mesh.devices.size
    R = -(-R // nd) * nd

    if hasattr(A, "matvec"):
        mv = A.matvec
        n = A.shape[0]
        dtype = np.dtype(str(A.dtype))
    else:
        Aa = jnp.asarray(A)
        mv = lambda x: Aa @ x
        n = Aa.shape[0]
        dtype = np.dtype(str(Aa.dtype))

    rng = np.random.default_rng(seed)
    V0 = rng.choice([-1.0, 1.0], size=(R, n)).astype(
        dtype if dtype.kind != "c" else np.float64
    )
    if dtype.kind == "c":
        V0 = V0.astype(dtype)
    V0 = jax.device_put(
        jnp.asarray(V0), NamedSharding(mesh, P(axis, None))
    )
    K = int(min(K, n))
    alpha, beta = construct_lanczos_tridiag(mv, n, K, V0, dtype)
    w, tau2 = _quadrature_weights(alpha, beta)
    w_np = np.asarray(w)
    if pos:
        w_np = np.clip(w_np, 0, None)
    vals = f(w_np)
    vals = np.where(np.isfinite(vals), vals, 0.0)
    ests = n * np.sum(np.asarray(tau2) * vals, axis=1)
    return float(np.mean(ests)), float(
        np.std(ests) / math.sqrt(len(ests))
    )


def contract_sliced(tn, sliced_inds, mesh=None, output_inds=(),
                    optimize=None):
    """Contract a TN by slicing ``sliced_inds`` and distributing the
    slices across the mesh (the multi-chip circuit-amplitude path;
    reference ``cut_iter`` tensor_core.py:9088 + cotengra sliced inds).

    All slices share one contraction expression; the slice axis is
    vmapped and sharded, so each device executes its share of one
    batched XLA program and the final sum is a ``psum`` over ICI.
    """
    from ..ops.contraction import array_contract_expression

    if mesh is None:
        mesh = get_mesh()
    axis = mesh.axis_names[0]
    nd = mesh.devices.size

    sliced_inds = tuple(sliced_inds)
    if not sliced_inds:
        # nothing to slice (tiny/fully-simplified network) — plain
        # single-program contraction is already correct and cheapest
        out = tn.contract(..., output_inds=tuple(output_inds),
                          optimize=optimize)
        # normalize to raw array data (the sliced path below always
        # returns arrays)
        return out.data if hasattr(out, "data") else out
    dims = [tn.ind_size(ix) for ix in sliced_inds]
    nslices = int(np.prod(dims))
    # pad #slices to multiple of devices by repeating (and weighting)
    n_pad = -(-nslices // nd) * nd

    tensors = tuple(tn.tensor_map.values())
    inputs = []
    arrays = []
    in_axes = []
    for t in tensors:
        t_sl = [ix for ix in t.inds if ix in sliced_inds]
        new_inds = tuple(ix for ix in t.inds if ix not in sliced_inds)
        inputs.append(new_inds)
        if t_sl:
            stack = []
            for combo in itertools.product(*(range(d) for d in dims)):
                sel = dict(zip(sliced_inds, combo))
                tt = t.isel({ix: sel[ix] for ix in t_sl})
                stack.append(tt.data)
            # pad with zero slices
            while len(stack) < n_pad:
                stack.append(jnp.zeros_like(stack[0]))
            arrays.append(jnp.stack(stack))
            in_axes.append(0)
        else:
            arrays.append(t.data)
            in_axes.append(None)

    expr = array_contract_expression(
        inputs, tuple(output_inds),
        shapes=[
            (a.shape[1:] if ax == 0 else a.shape)
            for a, ax in zip(arrays, in_axes)
        ],
        optimize=optimize,
    )

    def one_slice(*arrs):
        return expr(*arrs)

    batched = jax.vmap(one_slice, in_axes=tuple(in_axes))

    in_specs = tuple(
        P(axis, *([None] * (np.ndim(a) - 1))) if ax == 0 else P()
        for a, ax in zip(arrays, in_axes)
    )

    def local(*arrs):
        vals = batched(*arrs)
        return jax.lax.psum(jnp.sum(vals, axis=0), axis)

    fn = jax.jit(jax.shard_map(
        local, mesh=mesh, in_specs=in_specs, out_specs=P(),
    ))
    # place sliced stacks sharded
    placed = []
    for a, ax, spec in zip(arrays, in_axes, in_specs):
        if ax == 0:
            placed.append(
                jax.device_put(a, NamedSharding(mesh, spec))
            )
        else:
            placed.append(jax.device_put(a, NamedSharding(mesh, P())))
    return fn(*placed)


def choose_sliced_inds(tn, target_slices, exclude=()):
    """Pick indices of ``tn`` to slice so the number of slices (the
    product of their dimensions) reaches at least ``target_slices``
    (the reference reaches the same decision through cotengra's
    slicing optimizer; here we greedily take the highest-degree,
    largest indices, which both maximizes slice-count per index and
    tends to cut the contraction's widest tensors)."""
    from collections import Counter

    cnt = Counter()
    for t in tn.tensor_map.values():
        for ix in t.inds:
            cnt[ix] += 1
    # rank: inner indices first (degree >= 2), larger dims first
    cands = sorted(
        (ix for ix in cnt
         if ix not in exclude and tn.ind_size(ix) > 1),
        key=lambda ix: (-min(cnt[ix], 2), -tn.ind_size(ix)),
    )
    chosen = []
    nsl = 1
    for ix in cands:
        if nsl >= target_slices:
            break
        chosen.append(ix)
        nsl *= tn.ind_size(ix)
    return tuple(chosen)


def contract_tn_mesh(tn, mesh=None, output_inds=(), optimize=None,
                     sliced_inds=None):
    """Contract an arbitrary TN across a device mesh: choose slice
    indices (unless given) and dispatch to :func:`contract_sliced`.
    The single-device result is reproduced exactly (slices are an
    exact partition of the sum)."""
    if mesh is None:
        mesh = get_mesh()
    if sliced_inds is None:
        sliced_inds = choose_sliced_inds(
            tn, mesh.devices.size, exclude=set(output_inds)
        )
    return contract_sliced(
        tn, sliced_inds, mesh=mesh, output_inds=output_inds,
        optimize=optimize,
    )


def get_mesh_2d(shape=None, axis_names=("dl", "dr"), devices=None):
    """A 2D device mesh for operator-style shardings (e.g. the two
    virtual axes of DMRG environments). Defaults to the most square
    factorization of the device count."""
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if shape is None:
        p = int(math.sqrt(n))
        while n % p:
            p -= 1
        shape = (n // p, p)
    return Mesh(
        np.array(devices[: shape[0] * shape[1]]).reshape(shape),
        axis_names,
    )


def mesh_put(x, mesh, spec):
    """``jax.device_put`` with a divisibility-safe ``PartitionSpec``:
    any axis whose size does not divide by its assigned mesh-axis size
    is replicated instead (XLA requires even shards). This lets the
    same spec be applied across a sweep whose edge tensors have
    size-1 virtual axes."""
    sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    safe = []
    for dim, name in itertools.zip_longest(
        x.shape, spec, fillvalue=None
    ):
        if dim is None:
            break
        if name is not None and dim % sizes.get(name, 1) == 0:
            safe.append(name)
        else:
            safe.append(None)
    return jax.device_put(x, NamedSharding(mesh, P(*safe)))
