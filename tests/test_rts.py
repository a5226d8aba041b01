"""Reduce-then-scan (DeviceRadixSort analog) pipeline tests.

The 3-phase structure — tile_histogram4 (Upsweep), digit-major
exclusive_scan (Scan), table-driven downsweep — runs under interpret mode
in CI; benches/tpu_test_all.py covers hardware.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpusorting_tpu.core import prng
from gpusorting_tpu.ops import kernels, rts


def test_tile_histogram4():
    rows, tile_rows = 256, 128
    x = prng.hybrid_taus_bits(rows * 128, seed=3).reshape(rows, 128)
    th = np.asarray(kernels.tile_histogram4(x, 8, tile_rows))
    assert th.shape == (2, 16)
    host = np.asarray(x).reshape(2, -1)
    for t in range(2):
        expect = np.bincount((host[t] >> 8) & 15, minlength=16)
        np.testing.assert_array_equal(th[t], expect)


def test_rts_keys_small():
    x = prng.hybrid_taus_bits(20_000, seed=1)
    out = np.asarray(rts.sort_codes_rts(x, tile_rows=128))
    np.testing.assert_array_equal(out, np.sort(np.asarray(x)))


def test_rts_skew():
    x = prng.make_test_keys(30_000, 7, jnp.uint32, prng.EntropyPreset.E020)
    out = np.asarray(rts.sort_codes_rts(x, tile_rows=128))
    np.testing.assert_array_equal(out, np.sort(np.asarray(x)))


def test_rts_all_equal_and_boundaries():
    out = np.asarray(rts.sort_codes_rts(
        jnp.full((33_000,), 0xDEADBEEF, jnp.uint32), tile_rows=128))
    np.testing.assert_array_equal(out, np.full((33_000,), 0xDEADBEEF,
                                               np.uint32))
    for n in (1, 127, 16384, 16385):
        x = prng.hybrid_taus_bits(n, seed=n)
        out = np.asarray(rts.sort_codes_rts(x, tile_rows=128))
        np.testing.assert_array_equal(out, np.sort(np.asarray(x)))


def test_rts_pairs_stable():
    n = 40_000
    k = prng.hybrid_taus_bits(n, seed=2) & jnp.uint32(0xFF)
    v = jnp.arange(n, dtype=jnp.uint32)
    sk, sv = rts.sort_pairs_rts(k, v, tile_rows=128)
    rk, rv = jax.lax.sort((k, v), num_keys=1, is_stable=True)
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(rv))


def test_rts_chunked_downsweep():
    """Force multiple downsweep chunks (SMEM table bound analog)."""
    import gpusorting_tpu.ops.rts as rts_mod

    old = rts_mod._MAX_TILES_PER_CALL
    rts_mod._MAX_TILES_PER_CALL = 2
    try:
        x = prng.hybrid_taus_bits(100_000, seed=9)  # ~7 tiles of 128 rows
        out = np.asarray(rts.sort_codes_rts(x, tile_rows=128))
        np.testing.assert_array_equal(out, np.sort(np.asarray(x)))
    finally:
        rts_mod._MAX_TILES_PER_CALL = old


def test_device_radix_class_routes_to_rts():
    import gpusorting_tpu as gst

    s = gst.DeviceRadixSort(gst.SortConfig(backend=gst.Backend.PALLAS))
    keys = prng.hybrid_taus_bits(20_000, seed=12)
    out = np.asarray(s.sort(keys))
    np.testing.assert_array_equal(out, np.sort(np.asarray(keys)))


def test_pair_variant_dispatch_routes_native(monkeypatch):
    """sort_pairs variant='device_radix'/'splitsweep' must NOT fall through
    to the bitonic epilogue (advisor r2: the fall-through ran both engines
    and returned bitonic's output, making dispatch coverage illusory)."""
    import jax.numpy as jnp

    from gpusorting_tpu.ops import bitonic as bitonic_mod
    from gpusorting_tpu.ops import radix as radix_mod

    def boom(*a, **k):
        raise AssertionError("bitonic fallback reached for a native variant")

    monkeypatch.setattr(bitonic_mod, "sort_codes_stable_with", boom)
    keys = prng.hybrid_taus_bits(20_000, seed=3) & jnp.uint32(0xFF)
    vals = jnp.arange(20_000, dtype=jnp.uint32)
    for variant in ("device_radix", "splitsweep"):
        sk, sv = radix_mod.sort_pairs(keys, vals, variant=variant)
        import jax
        rk, rv = jax.lax.sort((keys, vals), num_keys=1, is_stable=True)
        np.testing.assert_array_equal(np.asarray(sk), np.asarray(rk))
        np.testing.assert_array_equal(np.asarray(sv), np.asarray(rv))


def test_megacore_parallel_downsweep_bit_exact():
    """The core-split-safe downsweep (edge side buffer + sequential fixup)
    is bit-exact with the sequential RMW form — keys AND pairs, across
    chunked calls (SURVEY §7 megacore hard part; VERDICT r4 item 6)."""
    import numpy as np
    from gpusorting_tpu.core import prng
    from gpusorting_tpu.ops import rts

    n = 70_000  # > 1 tile at tile_rows=128; exercises partial boundaries
    codes = prng.hybrid_taus_bits(n, seed=31) & jnp.uint32(0xFFFF)
    pay = jnp.arange(n, dtype=jnp.uint32)
    seq_k, seq_v = rts._sort_rts((codes, pay), tile_rows=128,
                                 parallel=False)
    par_k, par_v = rts._sort_rts((codes, pay), tile_rows=128,
                                 parallel=True)
    np.testing.assert_array_equal(np.asarray(seq_k), np.asarray(par_k))
    np.testing.assert_array_equal(np.asarray(seq_v), np.asarray(par_v))
    ref_k, ref_v = jax.lax.sort((codes, pay), num_keys=1, is_stable=True)
    np.testing.assert_array_equal(np.asarray(par_k), np.asarray(ref_k))
    np.testing.assert_array_equal(np.asarray(par_v), np.asarray(ref_v))


def test_megacore_gate(monkeypatch):
    """GST_MEGACORE forces the gate; default follows the core count."""
    from gpusorting_tpu.core import config as cfg

    monkeypatch.setenv("GST_MEGACORE", "1")
    assert cfg.megacore_parallel()
    monkeypatch.setenv("GST_MEGACORE", "0")
    assert not cfg.megacore_parallel()
    monkeypatch.delenv("GST_MEGACORE")
    info_v5p = cfg.DeviceInfo("tpu", "TPU v5p", "v5p", 1, 1 << 30,
                              1 << 24, 2765.0)
    assert cfg.tensorcores_per_chip(info_v5p) == 2
    assert cfg.megacore_parallel(info_v5p)
    assert cfg.grid_semantics(True) == ("parallel",)
    assert cfg.grid_semantics(False) == ("arbitrary",)
