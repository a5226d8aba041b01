"""Building-block kernel unit tests (CPU interpret mode).

Includes the reference's only true unit test, reproduced exactly: run the
scan kernel alone on all-ones input and require out[i] == i
(DeviceRadixSort.cpp:308-340, Utility.hlsl InitScanTestValues :133-138).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gpusorting_tpu.core import prng
from gpusorting_tpu.ops import kernels


@pytest.mark.parametrize("n", [1, 255, 1024, 5000])
def test_scan_all_ones_is_iota(n):
    out = kernels.exclusive_scan(jnp.ones((n,), jnp.int32))
    np.testing.assert_array_equal(np.asarray(out), np.arange(n, dtype=np.int32))


@pytest.mark.parametrize("n", [128, 1000, 4096, 70000])
def test_scan_random(n):
    x = (prng.hybrid_taus_bits(n, seed=n) & jnp.uint32(0xFFF)).astype(jnp.int32)
    out = kernels.exclusive_scan(x)
    ref = np.cumsum(np.asarray(x)) - np.asarray(x)
    np.testing.assert_array_equal(np.asarray(out), ref.astype(np.int32))


def test_scan_u32_dtype():
    x = jnp.arange(300, dtype=jnp.uint32)
    out = kernels.exclusive_scan(x)
    assert out.dtype == jnp.uint32
    ref = (np.cumsum(np.arange(300, dtype=np.uint64)) - np.arange(300)).astype(np.uint32)
    np.testing.assert_array_equal(np.asarray(out), ref)


@pytest.mark.parametrize("n", [1024, 5000, 100_000])
def test_global_histogram(n):
    codes = prng.hybrid_taus_bits(n, seed=n)
    hist = kernels.global_histogram(codes)
    arr = np.asarray(codes)
    for p in range(4):
        ref = np.bincount((arr >> (8 * p)) & 255, minlength=256)
        np.testing.assert_array_equal(np.asarray(hist[p]), ref)
    assert int(np.asarray(hist).sum()) == 4 * n


def test_global_histogram_skewed():
    """Entropy preset .201 — the adversarial digit distribution."""
    n = 20_000
    codes = prng.hybrid_taus_bits(n, seed=1, and_count=4)
    hist = kernels.global_histogram(codes)
    arr = np.asarray(codes)
    for p in range(4):
        ref = np.bincount((arr >> (8 * p)) & 255, minlength=256)
        np.testing.assert_array_equal(np.asarray(hist[p]), ref)


def test_histogram_plus_scan_compose_to_offsets():
    """Digit bases as the radix passes will consume them."""
    n = 3000
    codes = prng.hybrid_taus_bits(n, seed=2)
    hist = kernels.global_histogram(codes)
    bases = kernels.exclusive_scan(hist[0].reshape(-1))
    arr = np.asarray(codes)
    ref = np.cumsum(np.bincount(arr & 255, minlength=256)) - np.bincount(
        arr & 255, minlength=256)
    np.testing.assert_array_equal(np.asarray(bases), ref.astype(np.int32))
