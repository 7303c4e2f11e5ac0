"""Test configuration: run everything on a virtual 8-device CPU mesh.

Mirrors the reference's approach of exercising 'distributed' code paths in
single-host CI (SURVEY.md §4): XLA's forced host device count stands in for
a real multi-chip TPU topology; the driver separately dry-runs the
multi-chip path on real shardings via ``__graft_entry__.dryrun_multichip``.

Note: on this image a TPU plugin force-registers itself and ignores
``JAX_PLATFORMS``, so we pin the *default device* to CPU instead.
"""

import os

# must be set before jax initializes its backends
os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
# tests run on CPU: full float64/complex128 reference semantics
os.environ["QUIMB_TPU_X64"] = "1"

import jax  # noqa: E402

# hermetic CPU-only suite: the axon TPU plugin force-registers itself
# and its backend init can HANG every test process when the remote
# tunnel is wedged (worker crash) — drop the factory before any
# backend discovery so pytest never touches the tunnel
jax.config.update("jax_platforms", "cpu")
import jax._src.xla_bridge as _xb  # noqa: E402

_xb._backend_factories.pop("axon", None)

jax.config.update("jax_enable_x64", True)

_CPUS = jax.devices("cpu")
jax.config.update("jax_default_device", _CPUS[0])

import pytest  # noqa: E402


def pytest_collection_modifyitems(config, items):
    """Auto-apply the ``slow`` marker from ``tests/_slow_tests.txt``
    (node ids measured >= 3 s on a 1-core box) so that
    ``pytest -m "not slow"`` is a smoke pass that finishes in a few
    minutes. Regenerate the list with
    ``pytest --durations=0 | awk '$1+0>=3' ...`` after large changes."""
    slow_file = os.path.join(os.path.dirname(__file__),
                             "_slow_tests.txt")
    try:
        with open(slow_file) as f:
            slow_ids = {line.strip() for line in f if line.strip()}
    except OSError:
        return
    for item in items:
        nodeid = item.nodeid.replace(os.sep, "/")
        # nodeids are relative to pytest's rootdir: when run from
        # inside tests/ the 'tests/' prefix is absent, so match on
        # suffix rather than exact equality
        if nodeid in slow_ids or ("tests/" + nodeid) in slow_ids:
            item.add_marker(pytest.mark.slow)


@pytest.fixture(scope="session")
def cpu_devices():
    return _CPUS


@pytest.fixture(scope="session")
def mesh8(cpu_devices):
    import numpy as np
    from jax.sharding import Mesh

    return Mesh(np.array(cpu_devices), ("d",))
