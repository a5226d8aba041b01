"""Test configuration: force CPU with an 8-device virtual mesh.

Tests must run anywhere (CI has no TPU); Pallas kernels run in interpreter
mode on CPU, and the distributed layer gets 8 virtual devices — the same
setup the driver uses for the multi-chip dry-run.
"""

import os

import resource

# The suite compiles ~100 interpret-mode Pallas kernels through XLA:CPU's
# LLVM JIT in one process; with the default 8 MB stack the JIT segfaults
# partway through (observed twice in backend_compile_and_load, at
# different tests — resource exhaustion, not a specific kernel).  Raise
# the limit before any backend thread is spawned.
_soft, _hard = resource.getrlimit(resource.RLIMIT_STACK)
if _soft != resource.RLIM_INFINITY and _soft < (64 << 20):
    _new = (64 << 20) if _hard == resource.RLIM_INFINITY else min(
        64 << 20, _hard)
    resource.setrlimit(resource.RLIMIT_STACK, (_new, _hard))

if os.environ.get("GST_TEST_TPU", "0") != "1":
    os.environ["JAX_PLATFORMS"] = "cpu"
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8"
        ).strip()
    # pytest plugins may import jax before this conftest runs, in which case
    # the env vars above are too late; the config API still works as long as
    # no backend has been initialized yet.
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 8)

import pytest  # noqa: E402


@pytest.fixture(scope="module", autouse=True)
def _drop_compiled_executables():
    """Free each module's compiled executables when the module finishes.

    The LLVM JIT memory held by ~25 min of interpret-mode kernel compiles
    accumulates across the suite and has twice segfaulted XLA:CPU's
    compiler near the 75% mark; per-module cache clearing keeps the peak
    bounded.  Cross-module recompiles are rare (modules exercise disjoint
    kernels), so the runtime cost is small.
    """
    yield
    import gc

    import jax

    jax.clear_caches()
    gc.collect()


@pytest.fixture(scope="session")
def cpu_mesh():
    from gpusorting_tpu.parallel.dist_sort import make_mesh

    return make_mesh(8)
