"""Native LSD radix-16 engine tests.

Small sizes run everywhere via the interpret-mode fallback (the 16-stream
writer streams row-by-row there), so CI executes the full native pipeline.
Large sizes remain TPU-only (benches/tpu_test_all.py runs those on hardware).

The segmented tests are the EmulatedDeadlocking analog (SURVEY.md §4.7):
each pass chained over adversarial tile-range splits with explicit carry
handoff must be bit-exact with the fused grid run.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpusorting_tpu.core import prng
from gpusorting_tpu.ops import radix16

ON_TPU = jax.devices()[0].platform == "tpu"
tpu_only = pytest.mark.skipif(not ON_TPU, reason="large sizes need hardware")


def _check(x, **kw):
    out = np.asarray(radix16.sort_codes_radix16(x, **kw))
    np.testing.assert_array_equal(out, np.sort(np.asarray(x)))


def test_uniform_small_default_tile():
    # the one test exercising the tuner's default tile (others pin 128 to
    # share one interpret-mode kernel compile)
    _check(prng.hybrid_taus_bits(20_000, seed=1))


def test_skewed_entropy_small():
    _check(prng.make_test_keys(
        30_000, 7, jnp.uint32, prng.EntropyPreset.E020), tile_rows=128)


def test_all_equal():
    _check(jnp.full((70_000,), 0xDEADBEEF, jnp.uint32), tile_rows=128)


def test_boundary_sizes_small():
    for n in (1, 127, 65536, 65537):
        _check(prng.hybrid_taus_bits(n, seed=n), tile_rows=128)


def test_bad_tile_rows():
    with pytest.raises(ValueError):
        radix16.sort_codes_radix16(jnp.zeros((256,), jnp.uint32),
                                   tile_rows=200)


def test_pairs_stable_small():
    n = 20_000
    k = prng.hybrid_taus_bits(n, seed=2) & jnp.uint32(0xFF)
    v = jnp.arange(n, dtype=jnp.uint32)
    sk, sv = radix16.sort_pairs_radix16(k, v, tile_rows=128)
    rk, rv = jax.lax.sort((k, v), num_keys=1, is_stable=True)
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(rv))


def test_bounded_bits_pass_skipping():
    """Keys bounded to 12 bits: 5 of 8 passes have a constant digit and are
    skipped via lax.cond (entropy/bits_to_sort adaptivity); output exact."""
    x = prng.hybrid_taus_bits(20_000, seed=4) & jnp.uint32(0xFFF)
    _check(x, tile_rows=128)
    v = jnp.arange(20_000, dtype=jnp.uint32)
    sk, sv = radix16.sort_pairs_radix16(x, v, tile_rows=128)
    rk, rv = jax.lax.sort((x, v), num_keys=1, is_stable=True)
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(rv))


# --- EmulatedDeadlocking analog: segmented == fused, bit-exact -------------


def test_segmented_keys_matches_fused():
    n = 130_000  # 1024 rows -> 2 tiles at tile_rows=512... use more tiles
    x = prng.hybrid_taus_bits(n, seed=3)
    fused = np.asarray(radix16.sort_codes_radix16(x, tile_rows=128))
    segs = radix16.adversarial_segments(n, tile_rows=128)
    assert len(segs) >= 2
    seg = np.asarray(radix16.sort_codes_radix16(x, tile_rows=128,
                                                segments=segs))
    np.testing.assert_array_equal(fused, seg)
    np.testing.assert_array_equal(fused, np.sort(np.asarray(x)))


def test_segmented_single_cut_boundary():
    """A single cut right after tile 0 — the tightest carry handoff."""
    n = 128 * 128 * 5 + 77  # ~6 tiles of 128 rows
    x = prng.make_test_keys(n, 9, jnp.uint32, prng.EntropyPreset.E033)
    ref = np.sort(np.asarray(x))
    out = np.asarray(radix16.sort_codes_radix16(
        x, tile_rows=128, segments=(1,)))
    np.testing.assert_array_equal(out, ref)


def test_segmented_pairs_stable():
    n = 100_000
    k = prng.hybrid_taus_bits(n, seed=5) & jnp.uint32(0x3F)
    v = jnp.arange(n, dtype=jnp.uint32)
    segs = radix16.adversarial_segments(n, tile_rows=128)
    sk, sv = radix16.sort_pairs_radix16(k, v, tile_rows=128, segments=segs)
    rk, rv = jax.lax.sort((k, v), num_keys=1, is_stable=True)
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(rv))


def test_emulated_deadlocking_class():
    """The API family invokes the segmented run and matches the oracle."""
    import gpusorting_tpu as gst

    s = gst.EmulatedDeadlocking(gst.SortConfig(backend=gst.Backend.PALLAS))
    keys = prng.hybrid_taus_bits(66_000, seed=12)
    out = np.asarray(s.sort(keys))
    np.testing.assert_array_equal(out, np.sort(np.asarray(keys)))


# --- large sizes: hardware only --------------------------------------------


@tpu_only
def test_uniform_large():
    _check(prng.hybrid_taus_bits(1 << 21, seed=1))


@tpu_only
def test_pairs_stable_large():
    n = 1 << 21
    k = prng.hybrid_taus_bits(n, seed=2) & jnp.uint32(0xFF)
    v = jnp.arange(n, dtype=jnp.uint32)
    sk, sv = radix16.sort_pairs_radix16(k, v)
    rk, rv = jax.lax.sort((k, v), num_keys=1, is_stable=True)
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(rv))


def test_public_radix16_variant():
    """The fused engine is first-class in the public variant dispatch
    (VERDICT r4 next #7): gst.sort(variant="radix16") reaches
    radix16.sort_codes_radix16 — not the network — and stays oracle-exact,
    keys and pairs."""
    import gpusorting_tpu as gst

    n = 9_000
    keys = prng.hybrid_taus_bits(n, seed=31)
    out = gst.sort(keys, backend=gst.Backend.PALLAS, variant="radix16",
                   tile_rows=128)
    np.testing.assert_array_equal(np.asarray(out), np.sort(np.asarray(keys)))

    k = prng.hybrid_taus_bits(n, seed=32) & jnp.uint32(0xFFFF)
    v = jnp.arange(n, dtype=jnp.uint32)
    sk, sv = gst.sort_pairs(k, v, backend=gst.Backend.PALLAS,
                            variant="radix16", tile_rows=128)
    rk, rv = jax.lax.sort((k, v), num_keys=1, is_stable=True)
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(rv))


def test_public_radix16_variant_is_not_network(monkeypatch):
    from gpusorting_tpu.ops import bitonic as bitonic_mod
    import gpusorting_tpu as gst

    def boom(*a, **k):
        raise AssertionError("network called despite variant='radix16'")

    monkeypatch.setattr(bitonic_mod, "sort_codes", boom)
    monkeypatch.setattr(bitonic_mod, "sort_codes_stable_with", boom)
    keys = prng.hybrid_taus_bits(4096, seed=33)
    out = gst.sort(keys, backend=gst.Backend.PALLAS, variant="radix16",
                   tile_rows=128)
    np.testing.assert_array_equal(np.asarray(out), np.sort(np.asarray(keys)))
