"""Mergesweep engine tests (CPU interpret mode).

The merge tail and hyper-stage kernels run under the Pallas interpreter;
phase 1 is plain lax.map + lax.sort.  Oracle identity against numpy/XLA.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpusorting_tpu.core import prng
from gpusorting_tpu.ops import mergesweep


@pytest.mark.parametrize("n,L", [
    (1000, 1024),        # single segment, padded
    (5000, 1024),        # multi-segment, pad partial
    (100_000, 8192),     # several merge passes
    (300_000, 2048),     # deep merge (k >> L), hyper stages exercised
])
def test_keys_oracle(n, L):
    x = prng.hybrid_taus_bits(n, seed=n % 89)
    out = np.asarray(mergesweep.sort_codes(x, seg_elems=L))
    np.testing.assert_array_equal(out, np.sort(np.asarray(x)))


def test_adversarial_inputs():
    for arr in (jnp.full((30_000,), 7, jnp.uint32),
                jnp.arange(30_000, dtype=jnp.uint32),
                jnp.arange(30_000, dtype=jnp.uint32)[::-1],
                jnp.full((30_000,), 0xFFFFFFFF, jnp.uint32),
                prng.hybrid_taus_bits(30_000, seed=5, and_count=3)):
        out = np.asarray(mergesweep.sort_codes(arr, seg_elems=2048))
        np.testing.assert_array_equal(out, np.sort(np.asarray(arr)))


def test_stable_pairs_oracle():
    n = 50_000
    k = prng.hybrid_taus_bits(n, seed=3) & jnp.uint32(0xFF)
    v = jnp.arange(n, dtype=jnp.uint32)
    sk, sv = mergesweep.sort_codes_stable_with(k, v, seg_elems=4096)
    rk, rv = jax.lax.sort((k, v), num_keys=1, is_stable=True)
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(rv))


def test_jit_safe():
    n = 40_000
    x = prng.hybrid_taus_bits(n, seed=11)
    out = np.asarray(jax.jit(
        lambda a: mergesweep.sort_codes(a, seg_elems=2048))(x))
    np.testing.assert_array_equal(out, np.sort(np.asarray(x)))


def test_bad_seg_elems():
    x = prng.hybrid_taus_bits(1000, seed=1)
    with pytest.raises(ValueError):
        mergesweep.sort_codes(x, seg_elems=3000)
    with pytest.raises(ValueError):
        mergesweep.sort_codes(x, seg_elems=512)
