"""quimb_tpu.parallel — device-mesh distribution.

The TPU-native replacement for the reference's entire process/cluster
layer (SURVEY §2 C7/C8, §5 'distributed communication backend'):
MPI + PETSc/SLEPc row-slab operators become sharded arrays over a
``jax.sharding.Mesh`` with XLA collectives over ICI.

====================  =============================================
reference (MPI)        quimb_tpu.parallel (mesh)
====================  =============================================
mpi_launcher pools     ``get_mesh()`` / ``distributed_init()``
CSR row slabs          ``ShardedSparseHam`` (row-sharded COO)
``comm.Bcast``         replication via ``NamedSharding(mesh, P())``
``gather_petsc_array`` ``all_gather`` (implicit in jit output)
SLEPc Krylov-Schur     ``eigh_lanczos_sharded``
SLEPc MFN expm         ``expm_multiply_sharded``
MPI-parallel SLQ       ``approx_spectral_sharded`` (probe batch
                       sharded over the mesh)
sliced contraction     ``contract_sliced`` (slices via shard_map)
====================  =============================================
"""

from .pools import (
    can_use_mpi_pool,
    get_mpi_pool,
    get_thread_pool,
)
from .mesh import (
    ShardedSparseHam,
    approx_spectral_sharded,
    choose_sliced_inds,
    contract_sliced,
    contract_tn_mesh,
    distributed_init,
    eigh_lanczos_sharded,
    expm_multiply_sharded,
    get_mesh,
)

__all__ = [
    "ShardedSparseHam",
    "approx_spectral_sharded",
    "choose_sliced_inds",
    "contract_sliced",
    "contract_tn_mesh",
    "distributed_init",
    "eigh_lanczos_sharded",
    "expm_multiply_sharded",
    "get_mesh",
    "can_use_mpi_pool",
    "get_mpi_pool",
    "get_thread_pool",
]
