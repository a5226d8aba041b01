"""Test configuration: force CPU with an 8-device virtual mesh.

Tests must run anywhere (CI has no TPU); Pallas kernels run in interpreter
mode on CPU, and the distributed layer gets 8 virtual devices — the same
setup the driver uses for the multi-chip dry-run.
"""

import os

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


@pytest.fixture(scope="session")
def cpu_mesh():
    from gpusorting_tpu.parallel.dist_sort import make_mesh

    return make_mesh(8)
