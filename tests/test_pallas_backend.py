"""Public sort API through Backend.PALLAS (native network), vs the XLA oracle.

The cross-backend identity is the framework's CUB-identity analog
(SplitSortTests.cuh:527-566): order-only checks miss no-write/all-zero bugs.
"""

import jax.numpy as jnp
import numpy as np
import pytest

import gpusorting_tpu as gst
from gpusorting_tpu.core import prng
from gpusorting_tpu.ops import xla_sort


KEY_DTYPES = [jnp.uint32, jnp.int32, jnp.float32]
ORDERS = [gst.Order.ASCENDING, gst.Order.DESCENDING]


@pytest.mark.parametrize("dtype", KEY_DTYPES)
@pytest.mark.parametrize("order", ORDERS)
def test_keys_native_matches_oracle(dtype, order):
    n = 1500
    keys = prng.make_test_keys(n, seed=n, key_dtype=dtype)
    out = gst.sort(keys, order=order, backend=gst.Backend.PALLAS)
    ref = xla_sort.sort_keys(keys, order=order)
    np.testing.assert_array_equal(
        np.asarray(out).view(np.uint32), np.asarray(ref).view(np.uint32))


@pytest.mark.parametrize("dtype", KEY_DTYPES)
def test_pairs_native_stable_matches_oracle(dtype):
    n = 2049
    # low-entropy keys -> duplicates -> stability exercised
    keys = prng.make_test_keys(
        n, seed=3, key_dtype=dtype, entropy=gst.EntropyPreset.E020)
    vals = jnp.arange(n, dtype=jnp.uint32)
    out_k, out_v = gst.sort_pairs(keys, vals, backend=gst.Backend.PALLAS)
    ref_k, ref_v = xla_sort.sort_pairs(keys, vals)
    np.testing.assert_array_equal(
        np.asarray(out_k).view(np.uint32), np.asarray(ref_k).view(np.uint32))
    np.testing.assert_array_equal(np.asarray(out_v), np.asarray(ref_v))


def test_pairs_native_u64_payload():
    n = 700
    keys = prng.make_test_keys(n, seed=9)
    vals = jnp.arange(n, dtype=jnp.uint32).astype(jnp.uint64) << jnp.uint64(30)
    out_k, out_v = gst.sort_pairs(keys, vals, backend=gst.Backend.PALLAS)
    ref_k, ref_v = xla_sort.sort_pairs(keys, vals)
    np.testing.assert_array_equal(np.asarray(out_k), np.asarray(ref_k))
    np.testing.assert_array_equal(np.asarray(out_v), np.asarray(ref_v))


def test_sorter_object_pallas_backend():
    s = gst.OneSweep(gst.SortConfig(backend=gst.Backend.PALLAS))
    assert s.validate_against_oracle(1024 + 37, seed=5)


def test_manual_tuning_override():
    """Manual TuningParameters thread to the native radix engines (the
    reference's explicit-tuning constructors, GPUSortBase.h:57-155)."""
    from gpusorting_tpu.core.config import TuningParameters

    manual = TuningParameters(2048, 7, 1 << 17, 110 << 20,
                              radix_tile_rows=256)
    s = gst.DeviceRadixSort(
        gst.SortConfig(backend=gst.Backend.PALLAS, mode=gst.Mode.PAIRS),
        tuning=manual)
    assert s.tuning is manual and s._tile_override == 256

    n = 1800
    keys = prng.make_test_keys(n, seed=11, entropy=gst.EntropyPreset.E020)
    vals = jnp.arange(n, dtype=jnp.uint32)
    out_k, out_v = s.sort(keys, vals)
    ref_k, ref_v = xla_sort.sort_pairs(keys, vals)
    np.testing.assert_array_equal(np.asarray(out_k), np.asarray(ref_k))
    np.testing.assert_array_equal(np.asarray(out_v), np.asarray(ref_v))

    # default lookup still used when no override is given
    assert gst.DeviceRadixSort(
        gst.SortConfig(backend=gst.Backend.PALLAS))._tile_override is None

    # functional surface: the override reaches ops.sort directly
    out = gst.sort(keys, backend=gst.Backend.PALLAS, variant="device_radix",
                   tile_rows=256)
    np.testing.assert_array_equal(
        np.asarray(out), np.asarray(xla_sort.sort_keys(keys)))
