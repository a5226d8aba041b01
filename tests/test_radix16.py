"""Native LSD radix-16 engine tests (TPU only — the 16-stream dynamic-size
DMA writer has no interpret-mode equivalent; benches/tpu_test_all.py runs
these on hardware)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(
    jax.devices()[0].platform != "tpu",
    reason="radix16 engine is TPU-only (dynamic-size DMA writer)")


def _check(x):
    from gpusorting_tpu.ops import radix16

    out = np.asarray(radix16.sort_codes_radix16(x))
    np.testing.assert_array_equal(out, np.sort(np.asarray(x)))


def test_uniform():
    from gpusorting_tpu.core import prng

    _check(prng.hybrid_taus_bits(100_000, seed=1))


def test_skewed_entropy():
    from gpusorting_tpu.core import prng

    _check(prng.make_test_keys(
        300_000, 7, jnp.uint32, prng.EntropyPreset.E020))


def test_all_equal():
    _check(jnp.full((70_000,), 0xDEADBEEF, jnp.uint32))


def test_boundary_sizes():
    from gpusorting_tpu.core import prng

    for n in (1, 127, 65536, 65537):
        _check(prng.hybrid_taus_bits(n, seed=n))


def test_cpu_raises():
    # documents the TPU-only contract (runs only when collected on TPU)
    pass


def test_pairs_stable():
    from gpusorting_tpu.core import prng
    from gpusorting_tpu.ops import radix16

    n = 100_000
    k = prng.hybrid_taus_bits(n, seed=2) & jnp.uint32(0xFF)
    v = jnp.arange(n, dtype=jnp.uint32)
    sk, sv = radix16.sort_pairs_radix16(k, v)
    rk, rv = jax.lax.sort((k, v), num_keys=1, is_stable=True)
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(rv))
