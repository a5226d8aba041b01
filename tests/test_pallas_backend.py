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
