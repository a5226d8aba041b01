"""Native sorting-network unit tests (CPU interpret mode).

Mirrors the reference's scan-kernel-in-isolation idea (DeviceRadixSort.cpp:
308-340): the network core is tested directly against the XLA oracle before
it is exercised through the public sort API.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpusorting_tpu.ops import bitonic


RNG = np.random.RandomState(7)


def _rand_u32(n):
    return jnp.asarray(RNG.randint(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32))


@pytest.mark.parametrize("n", [1, 2, 127, 128, 129, 1000, 1024, 2048, 4097])
def test_sort_codes_matches_numpy(n):
    x = _rand_u32(n)
    out = bitonic.sort_codes(x)
    np.testing.assert_array_equal(np.asarray(out), np.sort(np.asarray(x)))


@pytest.mark.parametrize("n", [130, 1024, 3001])
def test_stable_pairs_bit_exact_vs_lax(n):
    # few distinct keys -> many ties -> stability is actually exercised
    k = jnp.asarray(RNG.randint(0, 8, size=n, dtype=np.int64).astype(np.uint32))
    v = jnp.arange(n, dtype=jnp.uint32)
    sk, sv = bitonic.sort_codes_stable_with(k, v)
    rk, rv = jax.lax.sort((k, v), num_keys=1, is_stable=True)
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(rv))


def test_extreme_values_and_duplicates():
    x = jnp.asarray(np.array(
        [0, 0xFFFFFFFF, 1, 0xFFFFFFFF, 0, 0x80000000, 0x7FFFFFFF] * 37,
        dtype=np.uint32))
    out = bitonic.sort_codes(x)
    np.testing.assert_array_equal(np.asarray(out), np.sort(np.asarray(x)))


def test_multiple_ride_operands():
    n = 513
    k = jnp.asarray(RNG.randint(0, 4, size=n, dtype=np.int64).astype(np.uint32))
    v1 = jnp.arange(n, dtype=jnp.uint32)
    v2 = (jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(2654435769))
    sk, s1, s2 = bitonic.sort_codes_stable_with(k, v1, v2)
    rk, r1, r2 = jax.lax.sort((k, v1, v2), num_keys=1, is_stable=True)
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(s1), np.asarray(r1))
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(r2))


def test_presorted_and_reversed():
    n = 2048
    asc = jnp.arange(n, dtype=jnp.uint32)
    np.testing.assert_array_equal(np.asarray(bitonic.sort_codes(asc)), np.asarray(asc))
    desc = jnp.flip(asc)
    np.testing.assert_array_equal(np.asarray(bitonic.sort_codes(desc)), np.asarray(asc))
