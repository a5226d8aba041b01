"""Native C++ host runtime tests: bit-exactness with the jnp implementations.

The native layer plays the reference's C++ host-framework role
(GPUSortBase.h / UtilityKernels.h); its PRNG must match core.prng exactly so
host- and device-generated fixtures are interchangeable.
"""

import numpy as np
import pytest

from gpusorting_tpu import native
from gpusorting_tpu.core import prng

pytestmark = pytest.mark.skipif(
    not native.available(), reason="no C++ toolchain for the native library")


@pytest.mark.parametrize("seed", [1, 10, 12345])
@pytest.mark.parametrize("and_count", [0, 2, 4])
def test_prng_bit_exact_with_jnp(seed, and_count):
    n = 4096
    ours = native.fill_hybrid_taus(n, seed, and_count)
    ref = np.asarray(prng.hybrid_taus_bits(n, seed, and_count))
    np.testing.assert_array_equal(ours, ref)


def test_radix_sort_matches_numpy():
    rng = np.random.RandomState(0)
    x = rng.randint(0, 2**32, size=100_000, dtype=np.uint64).astype(np.uint32)
    np.testing.assert_array_equal(native.radix_sort(x), np.sort(x))


def test_radix_sort_pairs_stable():
    rng = np.random.RandomState(1)
    k = rng.randint(0, 16, size=50_000).astype(np.uint32)  # heavy duplicates
    v = np.arange(50_000, dtype=np.uint32)
    sk, sv = native.radix_sort_pairs(k, v)
    order = np.argsort(k, kind="stable")
    np.testing.assert_array_equal(sk, k[order])
    np.testing.assert_array_equal(sv, v[order])


def test_validators():
    k = np.array([1, 2, 2, 3, 1, 5], dtype=np.uint32)
    assert native.count_order_violations(k) == 1
    assert native.count_order_violations(np.sort(k)) == 0
    assert native.count_order_violations(k[::-1].copy(), descending=True) == 1
    v = np.array([0, 1, 2, 3, 4, 5], dtype=np.uint32)
    assert native.count_pair_violations(np.sort(k), v) == 0
    offs = np.array([0, 3], dtype=np.uint32)
    # segments [1,2,2] and [3,1,5]: one violation in segment 2
    assert native.count_segmented_violations(k, offs) == 1


def test_validator_large_consistency():
    rng = np.random.RandomState(2)
    x = rng.randint(0, 2**32, size=1_000_000, dtype=np.uint64).astype(np.uint32)
    s = native.radix_sort(x)
    assert native.count_order_violations(s) == 0
    assert native.count_order_violations(x) > 0
