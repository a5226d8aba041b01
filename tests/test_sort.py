"""Flat-sort integration tests mirroring the reference suites (SURVEY.md §4).

- boundary-window size sweep (thinned; exhaustive with --runslow semantics)
- config-matrix super tests (3 keys x 3 payloads x 2 orders)
- oracle identity vs numpy stable sort (the CUB-identity analog)
- entropy presets
"""

import jax.numpy as jnp
import numpy as np
import pytest

import gpusorting_tpu as gst
from gpusorting_tpu.core import codec, prng
from gpusorting_tpu.core.config import Backend, EntropyPreset, Mode, Order, SortConfig
from gpusorting_tpu.utils import validate


def numpy_oracle_pairs(keys, values, order):
    """Ground truth: numpy stable sort on encoded codes."""
    codes = np.asarray(codec.encode_keys(keys))
    perm = np.argsort(codes, kind="stable")
    if order == Order.DESCENDING:
        perm = perm[::-1]
    return np.asarray(keys)[perm], (None if values is None else np.asarray(values)[perm])


@pytest.mark.parametrize("n", [1, 2, 3, 127, 128, 129, 1000, 4096, 65537])
def test_sizes_u32(n):
    keys = prng.make_test_keys(n, seed=n)
    out = gst.sort(keys, backend=Backend.XLA)
    ref, _ = numpy_oracle_pairs(keys, None, Order.ASCENDING)
    np.testing.assert_array_equal(np.asarray(out), ref)


@pytest.mark.parametrize("kt", [jnp.uint32, jnp.int32, jnp.float32])
@pytest.mark.parametrize("order", [Order.ASCENDING, Order.DESCENDING])
def test_key_types_orders(kt, order):
    keys = prng.make_test_keys(5000, seed=11, key_dtype=kt)
    out = gst.sort(keys, order=order, backend=Backend.XLA)
    ref, _ = numpy_oracle_pairs(keys, None, order)
    np.testing.assert_array_equal(
        np.asarray(out).view(np.uint32), ref.view(np.uint32)
    )


@pytest.mark.parametrize("order", [Order.ASCENDING, Order.DESCENDING])
def test_pairs_stability_exact(order):
    """Duplicate-heavy keys; payload records input position."""
    n = 8192
    keys = (prng.hybrid_taus_bits(n, seed=3) & jnp.uint32(0xFF)).view(jnp.uint32)
    values = jnp.arange(n, dtype=jnp.uint32)
    out_k, out_v = gst.sort_pairs(keys, values, order=order, backend=Backend.XLA)
    ref_k, ref_v = numpy_oracle_pairs(keys, values, order)
    np.testing.assert_array_equal(np.asarray(out_k), ref_k)
    np.testing.assert_array_equal(np.asarray(out_v), ref_v)


def test_supertest_matrix_small():
    """18-config matrix (reference: Tests.h:6-368), small sizes on CPU."""
    rep = gst.super_test(gst.OneSweep, sizes=(257, 1024), backend=Backend.XLA)
    assert rep.all_passed, str(rep)


@pytest.mark.parametrize("preset", list(EntropyPreset))
def test_entropy_presets_sortable(preset):
    keys = prng.make_test_keys(4096, seed=17, entropy=preset)
    out = gst.sort(keys, backend=Backend.XLA)
    assert int(validate.count_order_violations(out)) == 0


def test_boundary_window_sweep_thinned():
    """Size sweep across a partition window (stride-thinned for CI).

    Reference: every size in [partitionSize, 2*partitionSize]
    (GPUSortBase.h:245-248); kernels must handle every partial-tile residue.
    """
    s = gst.DeviceRadixSort(SortConfig(backend=Backend.XLA))
    rep = s.test_all(boundary_window=512, large_sizes=(1 << 17,), boundary_stride=37)
    assert rep.all_passed, str(rep)


def test_sorter_classes_equivalent():
    keys = prng.make_test_keys(3000, seed=5, key_dtype=jnp.int32)
    outs = []
    for cls in (gst.OneSweep, gst.DeviceRadixSort, gst.ForwardSweep, gst.EmulatedDeadlocking):
        s = cls(SortConfig(key_type=gst.KeyType.INT32, backend=Backend.XLA))
        outs.append(np.asarray(s.sort(keys)))
    for o in outs[1:]:
        np.testing.assert_array_equal(outs[0], o)


def test_ffx_contract():
    with pytest.raises(ValueError):
        gst.FFXParallelSort(SortConfig(key_type=gst.KeyType.FLOAT32, backend=Backend.XLA))
    s = gst.FFXParallelSort(SortConfig(backend=Backend.XLA))
    assert s.validate_sort(2048, seed=1)


def test_payload_f32_bit_preserved():
    n = 1024
    keys = prng.make_test_keys(n, seed=23)
    vals = prng.hybrid_taus_bits(n, seed=24).view(jnp.float32)  # includes NaNs
    out_k, out_v = gst.sort_pairs(keys, vals, backend=Backend.XLA)
    ref_k, ref_v = numpy_oracle_pairs(keys, vals, Order.ASCENDING)
    np.testing.assert_array_equal(
        np.asarray(out_v).view(np.uint32), ref_v.view(np.uint32)
    )


def test_shape_errors():
    keys = jnp.zeros((16,), jnp.uint32)
    with pytest.raises(ValueError):
        gst.sort_pairs(keys, jnp.zeros((8,), jnp.uint32))
    with pytest.raises(ValueError):
        gst.sort(jnp.zeros((4, 4), jnp.uint32))
    with pytest.raises(ValueError):
        gst.sort_pairs_wide(keys, jnp.zeros((16,), jnp.uint32), jnp.zeros((8,), jnp.uint32))


def test_size_bucketing_identical_output():
    """Bucketed (sentinel-padded) sorts must be bit-identical to unbucketed,
    including stable pair order with MAX-code keys present."""
    from gpusorting_tpu.ops import xla_sort

    n = 5000  # buckets to 5120
    keys = prng.make_test_keys(n, seed=2)
    # force real 0xFFFFFFFF keys so sentinel interaction is exercised
    keys = keys.at[::7].set(jnp.uint32(0xFFFFFFFF))
    vals = jnp.arange(n, dtype=jnp.uint32)
    old = xla_sort.SIZE_BUCKETING
    try:
        xla_sort.SIZE_BUCKETING = True
        k1, v1 = gst.sort_pairs(keys, vals, backend=Backend.XLA)
        o1 = gst.sort(keys, backend=Backend.XLA)
        xla_sort.SIZE_BUCKETING = False
        k2, v2 = gst.sort_pairs(keys, vals, backend=Backend.XLA)
        o2 = gst.sort(keys, backend=Backend.XLA)
    finally:
        xla_sort.SIZE_BUCKETING = old
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))
    np.testing.assert_array_equal(np.asarray(o1), np.asarray(o2))


def test_empty_inputs():
    e = jnp.zeros((0,), jnp.uint32)
    assert gst.sort(e).shape == (0,)
    k, v = gst.sort_pairs(e, e)
    assert k.shape == (0,) and v.shape == (0,)
    assert gst.sort(e, backend=Backend.PALLAS).shape == (0,)


@pytest.mark.skipif(
    not __import__("os").environ.get("GST_EXHAUSTIVE"),
    reason="exhaustive boundary sweep (reference GPUSortBase.h:245-248, every "
           "size in a window); ~35 min — set GST_EXHAUSTIVE=1 to run")
def test_boundary_window_exhaustive():
    s = gst.DeviceRadixSort(SortConfig(backend=Backend.XLA))
    rep = s.test_all(boundary_window=2048, large_sizes=(), boundary_stride=1)
    assert rep.all_passed, str(rep)


def test_ffx_pipeline_exact():
    """The real 5-stage FFX pipeline (Count/CountReduce/Scan/ScanAdd/
    Scatter, ops/ffx.py) is bit-exact on keys and stable pairs."""
    import jax

    from gpusorting_tpu.ops import ffx

    x = prng.hybrid_taus_bits(70_000, seed=13)
    np.testing.assert_array_equal(
        np.asarray(ffx.sort_codes_ffx(x)), np.sort(np.asarray(x)))
    k = x[:40_000] & jnp.uint32(0xFFF)
    v = jnp.arange(40_000, dtype=jnp.uint32)
    sk, sv = ffx.sort_pairs_ffx(k, v)
    rk, rv = jax.lax.sort((k, v), num_keys=1, is_stable=True)
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(rk))
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(rv))


def test_entropy_skip_oracle():
    """The duplication exploit (rangesweep constant-block skip — the
    round-5 replacement for the deleted round-3/4 host tile-peek) stays
    oracle-exact on skewed inputs, and skip-on == skip-off bit-exactly;
    keys only (equal codes interchangeable)."""
    from gpusorting_tpu.core import prng
    from gpusorting_tpu.ops import rangesweep

    n, L = 40_000, 1024
    for x in (prng.hybrid_taus_bits(n, seed=2, and_count=4),  # E020
              jnp.full((n,), jnp.uint32(0xABCD1234))):
        on = np.asarray(rangesweep.sort_codes_rangesweep(
            x, seg_elems=L, entropy_skip=True))
        off = np.asarray(rangesweep.sort_codes_rangesweep(
            x, seg_elems=L, entropy_skip=False))
        np.testing.assert_array_equal(on, np.sort(np.asarray(x)))
        np.testing.assert_array_equal(on, off)
