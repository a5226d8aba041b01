"""Splitsweep (splitter-partition + sub-sort hybrid) tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpusorting_tpu.core import prng
from gpusorting_tpu.ops import splitsweep


def _check(x, **kw):
    out = np.asarray(splitsweep.sort_codes_splitsweep(
        x, tile_rows=128, **kw))
    np.testing.assert_array_equal(out, np.sort(np.asarray(x)))


def test_uniform():
    _check(prng.hybrid_taus_bits(40_000, seed=1))


def test_low_entropy_skew():
    _check(prng.make_test_keys(30_000, 7, entropy=prng.EntropyPreset.E020))


def test_all_equal():
    x = jnp.full((20_000,), 0xDEADBEEF, jnp.uint32)
    _check(x)


def test_presorted_and_reverse():
    x = jnp.arange(30_000, dtype=jnp.uint32)
    _check(x)
    _check(jnp.flip(x))


def test_max_code_keys():
    base = prng.hybrid_taus_bits(20_000, seed=3)
    x = jnp.where(jnp.arange(20_000) % 3 == 0, jnp.uint32(0xFFFFFFFF), base)
    _check(x)


def test_boundary_sizes():
    for n in (1, 127, 16384, 16385):
        _check(prng.hybrid_taus_bits(n, seed=n))


def test_pairs_stable():
    n = 40_000
    k = prng.hybrid_taus_bits(n, seed=2) & jnp.uint32(0xFF)
    v = jnp.arange(n, dtype=jnp.uint32)
    sk, sv = splitsweep.sort_pairs_splitsweep(k, v, tile_rows=128)
    rk, rv = jax.lax.sort((k, v), num_keys=1, is_stable=True)
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(rv))


def test_pairs_max_code_and_periodic():
    """Periodic max-code keys: catches stride-aliased sampling (the sample
    positions are multiplicative-hashed for exactly this input family)."""
    n = 40_000
    base = prng.hybrid_taus_bits(n, seed=2) & jnp.uint32(0xFF)
    k = jnp.where(jnp.arange(n) % 3 == 0, jnp.uint32(0xFFFFFFFF), base)
    v = jnp.arange(n, dtype=jnp.uint32)
    sk, sv = splitsweep.sort_pairs_splitsweep(k, v, tile_rows=128)
    rk, rv = jax.lax.sort((k, v), num_keys=1, is_stable=True)
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(rv))


def test_two_level():
    """Recursive sub_sort = a second partition level."""
    x = prng.hybrid_taus_bits(60_000, seed=9)

    def second_level(r):
        return splitsweep.sort_codes_splitsweep(r, tile_rows=128)

    # lax.map traces sub_sort; the recursive call must therefore stay
    # traceable (no host checks fire under trace)
    out = np.asarray(splitsweep.sort_codes_splitsweep(
        x, tile_rows=128, sub_sort=second_level))
    np.testing.assert_array_equal(out, np.sort(np.asarray(x)))


def test_variant_dispatch():
    """variant='splitsweep' routes through the hybrid engine (keys+pairs)."""
    import gpusorting_tpu as gst

    keys = prng.hybrid_taus_bits(20_000, seed=15)
    out = gst.sort(keys, backend=gst.Backend.PALLAS, variant="splitsweep")
    np.testing.assert_array_equal(np.asarray(out),
                                  np.sort(np.asarray(keys)))
    k = keys & jnp.uint32(0xFF)
    v = jnp.arange(20_000, dtype=jnp.uint32)
    sk, sv = gst.sort_pairs(k, v, backend=gst.Backend.PALLAS,
                            variant="splitsweep")
    rk, rv = jax.lax.sort((k, v), num_keys=1, is_stable=True)
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(rv))


def test_overflow_falls_back_exact_under_jit(monkeypatch):
    """A pathological splitter sample (all elements in one bucket) must
    produce EXACT output under jit via the in-graph fallback, not silently
    truncated buckets (round-2 behavior)."""
    def bad_splitters(codes, pos, oversample):
        z = jnp.zeros((splitsweep.NBUCKETS - 1,), codes.dtype)
        return z, jnp.zeros((splitsweep.NBUCKETS - 1,), jnp.uint32)

    monkeypatch.setattr(splitsweep, "_sample_splitters", bad_splitters)
    x = prng.hybrid_taus_bits(60_000, seed=21)
    out = np.asarray(jax.jit(
        lambda a: splitsweep.sort_codes_splitsweep(a, tile_rows=128))(x))
    np.testing.assert_array_equal(out, np.sort(np.asarray(x)))

    v = jnp.arange(60_000, dtype=jnp.uint32)
    k8 = x & jnp.uint32(0xFF)
    sk, sv = jax.jit(lambda a, b: splitsweep.sort_pairs_splitsweep(
        a, b, tile_rows=128))(k8, v)
    rk, rv = jax.lax.sort((k8, v), num_keys=1, is_stable=True)
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(rv))
