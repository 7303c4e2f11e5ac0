"""Host executor pools — the analogue of the reference's MPI pool layer
(``quimb/linalg/mpi_launcher.py``: ``get_mpi_pool`` :96,
``can_use_mpi_pool`` :52, ``get_thread_pool`` core.py:84).

On TPU the heavy parallelism is on-device (XLA + the mesh layer in
:mod:`quimb_tpu.parallel.mesh`); these pools exist for *host-side*
fan-out — contraction-path searches, SLQ repeat aggregation, parallel
local-expectation evaluation — and for API compatibility: code written
against the reference's ``pool.submit(...)`` idiom runs unchanged.
``get_mpi_pool`` returns the same process-local executor: MPI spawn
semantics make no sense on a TPU pod, where multi-host programs are
SPMD via ``jax.distributed`` (see SURVEY §5 'distributed backend').
"""

import concurrent.futures
import functools
import os


@functools.lru_cache(8)
def get_thread_pool(num_workers=None):
    """A process-wide thread pool (reference ``get_thread_pool``
    core.py:84)."""
    if num_workers is None:
        num_workers = int(os.environ.get(
            "QUIMB_NUM_THREAD_WORKERS", os.cpu_count() or 1
        ))
    return concurrent.futures.ThreadPoolExecutor(num_workers)


def can_use_mpi_pool():
    """Whether an MPI pool is available. Always False on the TPU
    build — multi-chip work goes through ``jax.sharding`` instead
    (reference ``can_use_mpi_pool`` mpi_launcher.py:52)."""
    return False


def get_mpi_pool(num_workers=None, num_threads=1):
    """Compatibility shim: returns the host thread pool. The
    reference spawns an ``MPIPoolExecutor`` here; on TPU the
    equivalent distribution is device-mesh sharding
    (quimb_tpu.parallel.mesh), so host-side submits run in threads."""
    return get_thread_pool(num_workers)


__all__ = ["get_thread_pool", "can_use_mpi_pool", "get_mpi_pool"]
