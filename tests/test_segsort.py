"""Segmented-sort tests mirroring the reference SplitSort matrix (SURVEY.md §4.9).

Fast (property) checks + Full (oracle identity) checks over random/fixed
segment lengths and BITS_TO_SORT values (SplitSortTests.cuh:488-566).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import gpusorting_tpu as gst
from gpusorting_tpu.core import prng
from gpusorting_tpu.utils import validate
from gpusorting_tpu.ops import xla_sort
from gpusorting_tpu.segsort import splitsort


def numpy_segmented_oracle(offsets, keys, values=None):
    o = np.asarray(offsets)
    k = np.asarray(keys).copy()
    v = None if values is None else np.asarray(values).copy()
    bounds = list(o) + [len(k)]
    for i in range(len(o)):
        s, e = int(bounds[i]), int(bounds[i + 1])
        from gpusorting_tpu.core import codec

        perm = np.argsort(
            np.asarray(codec.encode_keys(jnp.asarray(k[s:e]))), kind="stable"
        )
        k[s:e] = k[s:e][perm]
        if v is not None:
            v[s:e] = v[s:e][perm]
    return k, v


@pytest.mark.parametrize("seg_len", [1, 4, 32, 257, 4096])
def test_fixed_length_segments(seg_len):
    total = 1 << 14
    offs, cnt = prng.make_fixed_segments(total, seg_len)
    keys = prng.make_test_keys(total, seed=seg_len)
    out = gst.split_sort_keys(offs, keys, cnt)
    ref, _ = numpy_segmented_oracle(offs, keys)
    np.testing.assert_array_equal(np.asarray(out), ref)


@pytest.mark.parametrize("max_len", [4, 64, 1024])
def test_random_length_segments_pairs(max_len):
    total = 1 << 13
    offs, cnt = prng.make_random_segments(total, max_len, seed=max_len)
    keys = prng.make_test_keys(total, seed=1 + max_len)
    vals = jnp.arange(total, dtype=jnp.uint32)
    out_k, out_v = gst.split_sort_pairs(offs, keys, vals, cnt, total)
    ref_k, ref_v = numpy_segmented_oracle(offs, keys, vals)
    np.testing.assert_array_equal(np.asarray(out_k), ref_k)
    np.testing.assert_array_equal(np.asarray(out_v), ref_v)  # stability


@pytest.mark.parametrize("bits", [4, 8, 16, 24, 32])
def test_bits_to_sort(bits):
    """Masked keys honor the BITS_TO_SORT contract (SplitSort.cuh:702)."""
    total = 1 << 12
    offs, cnt = prng.make_random_segments(total, 100, seed=bits)
    keys = prng.make_masked_random_values(total, bits, seed=bits).view(jnp.uint32)
    out = gst.split_sort_keys(offs, keys, cnt, bits_to_sort=bits)
    ref, _ = numpy_segmented_oracle(offs, keys)
    np.testing.assert_array_equal(np.asarray(out), ref)
    assert int(validate.count_segmented_violations(offs, out)) == 0


def test_f64_payload_wide_planes():
    """(u32, f64) pairs — the reference's 64-bit payload case, carried as
    dual u32 planes (the dtype-native x64 path is tested in
    tests/test_wide_payload.py; 64-bit jnp dtypes truncate without x64)."""
    total = 4096
    offs, cnt = prng.make_random_segments(total, 64, seed=77)
    keys = prng.make_test_keys(total, 78)
    f64bits = np.random.RandomState(1).rand(total).view(np.uint64)
    lo = jnp.asarray((f64bits & 0xFFFFFFFF).astype(np.uint32))
    hi = jnp.asarray((f64bits >> 32).astype(np.uint32))
    out_k, out_lo, out_hi = gst.split_sort_pairs_wide(
        offs, keys, lo, hi, cnt, total)
    offs_np = np.asarray(offs); ends = np.append(offs_np[1:], total)
    kk, ll, hh = (np.asarray(keys).copy(), np.asarray(lo).copy(),
                  np.asarray(hi).copy())
    for s in range(cnt):
        sl = slice(int(offs_np[s]), int(ends[s]))
        perm = np.argsort(kk[sl], kind="stable")
        kk[sl], ll[sl], hh[sl] = kk[sl][perm], ll[sl][perm], hh[sl][perm]
    np.testing.assert_array_equal(np.asarray(out_k), kk)
    np.testing.assert_array_equal(np.asarray(out_lo), ll)
    np.testing.assert_array_equal(np.asarray(out_hi), hh)


def test_windowed_path_matches_composite():
    """The two-window fast path must be bit-identical to the composite
    whole-buffer sort (cross-implementation oracle, SplitSortTests.cuh
    :527-566), including stability on duplicate-heavy keys."""
    from gpusorting_tpu.core import codec

    total = 1 << 13
    offs, cnt = prng.make_random_segments(total, 200, seed=5)
    keys = (prng.hybrid_taus_bits(total, seed=6) & jnp.uint32(0xF)).view(
        jnp.uint32)
    vals = jnp.arange(total, dtype=jnp.uint32)
    codes = codec.encode_keys(keys)
    disp = splitsort._window_dispatch(offs, total, cnt)
    assert disp is not None
    ml = disp["ml"]
    assert ml <= 200
    wc, (wv,) = splitsort._windowed_segmented_sort(
        offs, codes, (vals,), cnt, ml)
    cc, cv = splitsort._composite_segmented_sort(offs, codes, vals, cnt, 32)
    np.testing.assert_array_equal(np.asarray(wc), np.asarray(cc))
    np.testing.assert_array_equal(np.asarray(wv), np.asarray(cv))


def test_windowed_dispatch_thresholds():
    """Dispatch: windowed for small max_len, composite beyond the cap or
    for giant segments."""
    total = 1 << 12
    offs, cnt = prng.make_random_segments(total, 64, seed=9)
    assert splitsort._window_dispatch(offs, total, cnt) is not None
    # giant segment -> composite
    assert splitsort._window_dispatch(
        jnp.array([0], jnp.uint32), 1 << 18, 1) is None


def test_make_test_pairs_64bit_guard():
    with pytest.raises(ValueError):
        prng.make_test_pairs(64, 1, jnp.uint32, jnp.float64)


def test_single_giant_segment():
    """>65536-length segment: the whole-buffer composite path."""
    total = 1 << 17
    offs = jnp.array([0], dtype=jnp.uint32)
    keys = prng.make_test_keys(total, seed=99)
    out = gst.split_sort_keys(offs, keys, 1)
    np.testing.assert_array_equal(
        np.asarray(out), np.sort(np.asarray(keys), kind="stable")
    )


def test_sorter_object_lifecycle():
    total = 2048
    offs, cnt = prng.make_fixed_segments(total, 128)
    s = gst.SplitSorter(total, cnt)
    keys = prng.make_test_keys(total, seed=5)
    out = s.sort_keys(offs, keys)
    assert int(validate.count_segmented_violations(offs, out)) == 0
    s.close()


def test_fixed_length_fast_path_bit_exact():
    """Fixed-length segments route through the batched 2-D sort; output must
    be identical to the composite/oracle path (CUB-identity analog)."""
    total, L = 1 << 13, 32
    offs, S = prng.make_fixed_segments(total, L)
    keys = prng.make_test_keys(total, 11)
    vals = jnp.arange(total, dtype=jnp.uint32)
    k1, v1 = gst.split_sort_pairs(offs, keys, vals, S, total)
    k2, v2 = xla_sort.segmented_sort_pairs(offs, keys, vals, total)
    np.testing.assert_array_equal(np.asarray(k1), np.asarray(k2))
    np.testing.assert_array_equal(np.asarray(v1), np.asarray(v2))


def test_segment_length_histogram_reference_bins():
    h = splitsort.segment_length_histogram([1, 32, 33, 64, 131072, 131073, 5000])
    assert h["counts"].tolist() == [2, 2, 0, 0, 0, 0, 0, 0, 1, 0, 0, 0, 0, 1]
    assert h["gt_count"] == 1 and h["gt_total_length"] == 131073
    assert h["counts"].sum() + h["gt_count"] == 7


def test_next_fit_bin_packing_invariants():
    """Packing invariants mirror the reference's binning validator
    (UtilityKernels.cuh:660-862): per-bin totals <= capacity, big segments
    unpacked, bin ids contiguous."""
    rng = np.random.RandomState(0)
    lengths = rng.randint(1, 50, size=500)
    bins, nbins = splitsort.next_fit_bin_packing(lengths, 32)
    assert (bins[lengths > 32] == -1).all()
    for b in range(nbins):
        assert lengths[bins == b].sum() <= 32
    packed = np.unique(bins[bins >= 0])
    assert packed.tolist() == list(range(nbins))


def _seg_oracle(offs, total, keys, vals=None, bits=32):
    """Composite-path oracle (already cross-validated vs numpy)."""
    from gpusorting_tpu.core import codec

    codes = codec.encode_keys(keys)
    b = None if vals is None else vals
    sc, sb = splitsort._composite_segmented_sort(
        offs, codes, b, offs.shape[0], bits)
    return sc, sb


def test_fused_window_pairs_bounded_bits():
    """bits_to_sort small -> the fused 1-key window path (RadixFine
    analog) must be bit-identical to the composite, incl. stability."""
    total = 1 << 13
    offs, cnt = prng.make_random_segments(total, 200, seed=7)
    keys = (prng.hybrid_taus_bits(total, seed=8) & jnp.uint32(0xFFF)).view(
        jnp.uint32)
    vals = jnp.arange(total, dtype=jnp.uint32)
    sk, sv = splitsort.split_sort_pairs(
        offs, keys, vals, cnt, total, bits_to_sort=12)
    ck, cv = _seg_oracle(offs, total, keys, vals, bits=12)
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(ck))
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(cv))


def test_midrange_window_pairs():
    """Random maxlen in the (2048, 16384] midrange routes through windows
    (round-3: the round-2 cliff) and matches the composite exactly."""
    total = 1 << 15
    offs, cnt = prng.make_random_segments(total, 8192, seed=11)
    keys = (prng.hybrid_taus_bits(total, seed=12) & jnp.uint32(0xFF)).view(
        jnp.uint32)
    vals = jnp.arange(total, dtype=jnp.uint32)
    disp = splitsort._window_dispatch(offs, total, cnt)
    assert disp is not None and disp["ml"] > 2048  # genuinely midrange
    sk, sv = splitsort.split_sort_pairs(offs, keys, vals, cnt, total)
    ck, cv = _seg_oracle(offs, total, keys, vals)
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(ck))
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(cv))


def test_midrange_window_keys_only():
    """Keys-only midrange uses the 2-op unstable (or fused) window path."""
    total = 1 << 15
    offs, cnt = prng.make_random_segments(total, 8192, seed=13)
    keys = prng.hybrid_taus_bits(total, seed=14).view(jnp.uint32)
    out = splitsort.split_sort_keys(offs, keys, cnt)
    ck, _ = _seg_oracle(offs, total, keys)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ck))


def test_fused_window_keys_only_midrange():
    """Keys-only + bounded bits at midrange lengths -> fused 1-op path."""
    total = 1 << 15
    offs, cnt = prng.make_random_segments(total, 4096, seed=15)
    keys = (prng.hybrid_taus_bits(total, seed=16) & jnp.uint32(0xFFFF)).view(
        jnp.uint32)
    out = splitsort.split_sort_keys(offs, keys, cnt, bits_to_sort=16)
    ck, _ = _seg_oracle(offs, total, keys, bits=16)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ck))


def _bimodal_segments(total, long_lens, max_small=32, seed=0):
    """Many small segments with a few long ones sprinkled in."""
    rng = np.random.RandomState(seed)
    lens = []
    rem = total - sum(long_lens)
    while rem > 0:
        l = min(int(rng.randint(1, max_small + 1)), rem)
        lens.append(l)
        rem -= l
    for ll in long_lens:
        lens.insert(int(rng.randint(0, len(lens))), ll)
    offs = np.concatenate([[0], np.cumsum(lens)])[:-1].astype(np.uint32)
    return jnp.asarray(offs), len(lens)


def test_length_class_split_bimodal_pairs():
    """A bimodal workload (tiny bulk + few long segments) takes the
    length-class split: bulk windows at the small class's window, long
    tail compact-sorted-expanded (the binning-drives-execution path,
    SplitSortBinning.cuh:360-438).  Bit-exact vs the composite oracle,
    including stability on duplicate-heavy keys."""
    total = 1 << 13
    offs, cnt = _bimodal_segments(total, [1100, 800], seed=21)
    plan = splitsort._window_dispatch(offs, total, cnt)
    assert plan is not None and "split" in plan, plan
    keys = (prng.hybrid_taus_bits(total, seed=22) & jnp.uint32(0x3F)).view(
        jnp.uint32)
    vals = jnp.arange(total, dtype=jnp.uint32)
    sk, sv = splitsort.split_sort_pairs(offs, keys, vals, cnt, total)
    ck, cv = _seg_oracle(offs, total, keys, vals)
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(ck))
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(cv))
    # keys-only form through the same split
    out = splitsort.split_sort_keys(offs, keys, cnt)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ck))


def test_length_class_split_over_cap_segment():
    """One segment FAR past every window cap inside a tiny-segment bulk:
    round 2 sent the WHOLE workload to the composite; the split now
    serves the bulk through windows and only the long segment through
    the dense composite.  (The >131072 true-giant form of this case —
    where plan lacks "ml" entirely — is hardware-checked in
    benches/tpu_test_all.py §5b; it needs 2^21 elements to keep the tail
    fraction splittable, too slow for interpret-mode CI.)"""
    total = 1 << 18
    offs, cnt = _bimodal_segments(total, [50000], seed=23)
    plan = splitsort._window_dispatch(offs, total, cnt)
    assert plan is not None and "split" in plan, (
        None if plan is None else sorted(plan))
    # the whole-workload window ladder is infeasible at ml=50000
    assert splitsort._pick_window_mode(
        plan["ml"], plan["sid_bits"], 32, True) is None
    keys = prng.hybrid_taus_bits(total, seed=24).view(jnp.uint32)
    vals = jnp.arange(total, dtype=jnp.uint32)
    sk, sv = splitsort.split_sort_pairs(offs, keys, vals, cnt, total)
    ck, cv = _seg_oracle(offs, total, keys, vals)
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(ck))
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(cv))


def test_length_class_split_wide_payload():
    """64-bit payload planes ride the split path."""
    total = 1 << 13
    offs, cnt = _bimodal_segments(total, [1100], seed=25)
    plan = splitsort._window_dispatch(offs, total, cnt)
    assert plan is not None and "split" in plan
    keys = prng.hybrid_taus_bits(total, seed=26).view(jnp.uint32)
    lo = jnp.arange(total, dtype=jnp.uint32)
    hi = (jnp.arange(total, dtype=jnp.uint32) * jnp.uint32(7))
    sk, slo, shi = splitsort.split_sort_pairs_wide(
        offs, keys, lo, hi, cnt, total)
    ck, clo = _seg_oracle(offs, total, keys, lo)
    _, chi = _seg_oracle(offs, total, keys, hi)
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(ck))
    np.testing.assert_array_equal(np.asarray(slo), np.asarray(clo))
    np.testing.assert_array_equal(np.asarray(shi), np.asarray(chi))


def _lens_to_offs(lens):
    offs = np.concatenate([[0], np.cumsum(lens)])[:-1].astype(np.uint32)
    return jnp.asarray(offs), len(lens)


def _small_fill(total, max_small, seed):
    rng = np.random.RandomState(seed)
    lens, rem = [], total
    while rem > 0:
        l = min(int(rng.randint(1, max_small + 1)), rem)
        lens.append(l)
        rem -= l
    return lens


@pytest.mark.parametrize("where", ["start", "end", "adjacent"])
def test_length_class_split_tail_placement(where):
    """Long-tail mask boundary cases: a long segment at the very start
    of the array, at the very end (its end bound == n hits the
    scatter-drop edge), and two back-to-back long segments (the +1/-1
    boundary marks cancel at the shared offset)."""
    total = 1 << 13
    small = _small_fill(total - 1900, 32, seed=31)
    if where == "start":
        lens = [1100, 800] + small
    elif where == "end":
        lens = small + [800, 1100]
    else:  # adjacent, mid-array
        mid = len(small) // 2
        lens = small[:mid] + [1100, 800] + small[mid:]
    offs, cnt = _lens_to_offs(lens)
    plan = splitsort._window_dispatch(offs, total, cnt)
    assert plan is not None and "split" in plan, plan
    keys = (prng.hybrid_taus_bits(total, seed=32) & jnp.uint32(0xFF)).view(
        jnp.uint32)
    vals = jnp.arange(total, dtype=jnp.uint32)
    sk, sv = splitsort.split_sort_pairs(offs, keys, vals, cnt, total)
    ck, cv = _seg_oracle(offs, total, keys, vals)
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(ck))
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(cv))


def test_length_class_split_length1_bulk():
    """All-length-1 bulk (ml_small == 1): no bulk sort is needed or run;
    only the long tail is compact-sorted-expanded."""
    total = 1 << 12
    lens = [1] * (total - 800)
    lens.insert(1000, 800)
    offs, cnt = _lens_to_offs(lens)
    plan = splitsort._window_dispatch(offs, total, cnt)
    assert plan is not None and "split" in plan, plan
    assert plan["split"]["ml"] == 1
    keys = prng.hybrid_taus_bits(total, seed=33).view(jnp.uint32)
    vals = jnp.arange(total, dtype=jnp.uint32)
    sk, sv = splitsort.split_sort_pairs(offs, keys, vals, cnt, total)
    ck, cv = _seg_oracle(offs, total, keys, vals)
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(ck))
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(cv))


def test_fixed_length_giant_map_path():
    """Fixed L >= map_rows_min routes to the lax.map per-segment flat
    sort (the SortGt8192 grid-strided region analog); oracle-exact for
    keys, pairs, and the 64-bit wide payload form."""
    from gpusorting_tpu.ops import xla_sort
    L = xla_sort.map_rows_min(True)
    S = 2
    total = S * L
    offs = jnp.asarray(np.arange(S, dtype=np.uint32) * L)
    keys = (prng.hybrid_taus_bits(total, seed=41) & jnp.uint32(0xFFFF)).view(
        jnp.uint32)
    vals = jnp.arange(total, dtype=jnp.uint32)

    out = gst.split_sort_keys(offs, keys, S)
    ck, _ = _seg_oracle(offs, total, keys)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ck))

    sk, sv = gst.split_sort_pairs(offs, keys, vals, S, total)
    ck, cv = _seg_oracle(offs, total, keys, vals)
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(ck))
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(cv))

    hi = vals * jnp.uint32(7)
    wk, wlo, whi = gst.split_sort_pairs_wide(offs, keys, vals, hi, S, total)
    _, chi = _seg_oracle(offs, total, keys, hi)
    np.testing.assert_array_equal(np.asarray(wk), np.asarray(ck))
    np.testing.assert_array_equal(np.asarray(wlo), np.asarray(cv))
    np.testing.assert_array_equal(np.asarray(whi), np.asarray(chi))


@pytest.mark.parametrize("max_len", [1, 7, 32])
def test_packed_bins_strategy_pairs(max_len):
    """strategy="packed": the NextFitBinPacking-driven gather path
    (SplitSortBins32 analog, SplitSortVariants.cuh:386-451) is bit-exact
    vs the numpy oracle, payload order included (stability)."""
    total = 1 << 13
    offs, cnt = prng.make_random_segments(total, max_len, seed=50 + max_len)
    keys = prng.make_test_keys(total, seed=51 + max_len)
    vals = jnp.arange(total, dtype=jnp.uint32)
    out_k, out_v = splitsort.split_sort_pairs(
        offs, keys, vals, cnt, total, strategy="packed")
    ref_k, ref_v = numpy_segmented_oracle(offs, keys, vals)
    np.testing.assert_array_equal(np.asarray(out_k), ref_k)
    np.testing.assert_array_equal(np.asarray(out_v), ref_v)


def test_packed_bins_strategy_keys_only_and_guards():
    total = 1 << 12
    offs, cnt = prng.make_random_segments(total, 32, seed=60)
    keys = prng.make_test_keys(total, seed=61)
    out = splitsort.split_sort_pairs(
        offs, keys, None, cnt, total, strategy="packed")
    ref, _ = numpy_segmented_oracle(offs, keys)
    np.testing.assert_array_equal(np.asarray(out), ref)

    # identical output to the AUTO (window) route — cross-strategy oracle
    auto = splitsort.split_sort_pairs(offs, keys, None, cnt, total)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(auto))

    # a segment longer than the 32 capacity is rejected
    offs2, cnt2 = prng.make_random_segments(total, 200, seed=62)
    with pytest.raises(ValueError):
        splitsort.split_sort_pairs(
            offs2, keys, None, cnt2, total, strategy="packed")
    with pytest.raises(ValueError):
        splitsort.split_sort_pairs(offs, keys, None, cnt, total,
                                   strategy="bogus")


def test_packed_bins_all_equal_keys_stability():
    """All-equal keys: packed path must preserve original payload order
    within each segment (stable row sort keyed by (sid, code))."""
    total = 4096
    offs, cnt = prng.make_random_segments(total, 20, seed=70)
    keys = jnp.full((total,), 0xABCD1234, jnp.uint32)
    vals = jnp.arange(total, dtype=jnp.uint32)
    out_k, out_v = splitsort.split_sort_pairs(
        offs, keys, vals, cnt, total, strategy="packed")
    np.testing.assert_array_equal(np.asarray(out_k), np.asarray(keys))
    np.testing.assert_array_equal(np.asarray(out_v), np.asarray(vals))


def test_packed_bins_wide_payload_and_sorter_object():
    """Packed strategy through the wide (two-plane) form and the
    SplitSorter object surface."""
    total = 1 << 12
    offs, cnt = prng.make_random_segments(total, 24, seed=80)
    keys = prng.make_test_keys(total, seed=81)
    lo = jnp.arange(total, dtype=jnp.uint32)
    hi = lo * jnp.uint32(3)
    wk, wlo, whi = splitsort.split_sort_pairs_wide(
        offs, keys, lo, hi, cnt, total, strategy="packed")
    ak, alo, ahi = splitsort.split_sort_pairs_wide(
        offs, keys, lo, hi, cnt, total)
    np.testing.assert_array_equal(np.asarray(wk), np.asarray(ak))
    np.testing.assert_array_equal(np.asarray(wlo), np.asarray(alo))
    np.testing.assert_array_equal(np.asarray(whi), np.asarray(ahi))

    sorter = splitsort.SplitSorter(total, cnt)
    sk = sorter.sort_keys(offs, keys, strategy="packed")
    rk = sorter.sort_keys(offs, keys)
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(rk))
    sorter.close()


def test_bounded_bits_requires_u32_keys():
    """bits_to_sort < 32 bounds RAW u32 key values (reference: u32 masked
    fixtures); i32/f32 encodings set the top bit, so they are rejected."""
    total = 1 << 10
    offs, cnt = prng.make_random_segments(total, 64, seed=90)
    ikeys = jnp.arange(total, dtype=jnp.int32) - total // 2
    with pytest.raises(ValueError, match="uint32"):
        splitsort.split_sort_keys(offs, ikeys, cnt, bits_to_sort=16)
    fkeys = ikeys.astype(jnp.float32)
    with pytest.raises(ValueError, match="uint32"):
        splitsort.split_sort_pairs(
            offs, fkeys, jnp.arange(total, dtype=jnp.uint32), cnt, total,
            bits_to_sort=8)
    # full-width i32/f32 keys remain fine
    out = splitsort.split_sort_keys(offs, ikeys, cnt)
    ref, _ = numpy_segmented_oracle(offs, ikeys)
    np.testing.assert_array_equal(np.asarray(out), ref)


def test_packed_under_jit_clear_error():
    import jax

    total = 1 << 10
    offs, cnt = prng.make_random_segments(total, 16, seed=91)
    keys = prng.make_test_keys(total, seed=92)

    def f(o, k):
        return splitsort.split_sort_pairs(o, k, None, cnt, total,
                                          strategy="packed")

    with pytest.raises(ValueError, match="host-known"):
        jax.jit(f)(offs, keys)


def test_split_feasibility_uses_mode_cap():
    """A full-32-bit-key pairs workload whose maxlen exceeds the stable3
    window cap (16384) but not the keys cap (32768) must still take the
    length-class split when the bulk qualifies: feasibility is judged
    against the cap of the mode that would actually run (r3 review fix —
    the keys-cap check made exactly these workloads fall to the
    composite)."""
    lens = [10000] * 30 + [20000] * 3
    total = sum(lens)
    offs = jnp.asarray(
        np.concatenate([[0], np.cumsum(lens)[:-1]]).astype(np.uint32))
    cnt = len(lens)

    # pairs mode (stable3: shrink fails, whole window infeasible) -> split
    plan = splitsort._window_dispatch(offs, total, cnt, bits_to_sort=32,
                                      has_payload=True)
    assert plan is not None and "split" in plan
    assert plan["split"]["ml"] == 10000
    # the bulk mode itself must be runnable
    bmode = splitsort._pick_window_mode(
        plan["split"]["ml"], plan["split"]["sid_bits"], 32, True)
    assert bmode == "stable3"

    # keys mode: whole window feasible (keys2 cap 32768) and shrink too
    # small -> no split, whole-window plan stands (unchanged behavior)
    kplan = splitsort._window_dispatch(offs, total, cnt, bits_to_sort=32,
                                       has_payload=False)
    assert kplan is not None and "split" not in kplan and kplan["ml"] == 20000

    # end-to-end: the split route is bit-exact vs the composite oracle
    keys = prng.make_test_keys(total, seed=77)
    vals = jnp.arange(total, dtype=jnp.uint32)
    sk, sv = splitsort.split_sort_pairs(offs, keys, vals, cnt)
    ck, cv = _seg_oracle(offs, total, keys, vals)
    np.testing.assert_array_equal(np.asarray(sk), np.asarray(ck))
    np.testing.assert_array_equal(np.asarray(sv), np.asarray(cv))


# ---------------------------------------------------------------------------
# jit-safe plans (VERDICT r4 item 3: the segInfo-readback-as-object analog)
# ---------------------------------------------------------------------------


def test_jitted_plan_keeps_window_route(monkeypatch):
    """A jitted call with plan= routes the window ladder bit-exactly.

    Without a plan, traced offsets silently fell to the ~0.5 G composite
    (VERDICT r3 missing #3).  The composite entry points are replaced with
    bombs so any fallback fails loudly; the windowed path is instrumented
    to prove it ran.
    """
    import jax

    total = 1 << 12
    offs, S = prng.make_random_segments(total, 100, seed=9)
    keys = prng.make_test_keys(total, seed=10)
    vals = jnp.arange(total, dtype=jnp.uint32)
    plan = gst.make_segsort_plan(offs, total, int(S))

    def boom(*a, **k):
        raise AssertionError("composite path ran despite plan")

    ran = []
    real_window = splitsort._windowed_segmented_sort

    def spy(*a, **k):
        ran.append(True)
        return real_window(*a, **k)

    monkeypatch.setattr(splitsort, "_composite_multi", boom)
    monkeypatch.setattr(splitsort, "_composite_segmented_sort", boom)
    monkeypatch.setattr(splitsort, "_windowed_segmented_sort", spy)

    fn = jax.jit(lambda o, k, v: splitsort.split_sort_pairs(
        o, k, v, int(S), total, plan=plan))
    sk, sv = fn(offs, keys, vals)
    assert ran, "window ladder did not run"
    ref_k, ref_v = numpy_segmented_oracle(offs, keys, vals)
    np.testing.assert_array_equal(np.asarray(sk), ref_k)
    np.testing.assert_array_equal(np.asarray(sv), ref_v)


def test_jitted_without_plan_warns_and_stays_exact():
    """Traced offsets without a plan: one warning, composite result exact."""
    import jax

    total = 1 << 11
    offs, S = prng.make_random_segments(total, 64, seed=12)
    keys = prng.make_test_keys(total, seed=13)
    vals = jnp.arange(total, dtype=jnp.uint32)
    splitsort._WARNED_TRACED_OFFSETS[0] = False
    with pytest.warns(UserWarning, match="make_segsort_plan"):
        fn = jax.jit(lambda o, k, v: splitsort.split_sort_pairs(
            o, k, v, int(S), total))
        sk, sv = fn(offs, keys, vals)
    ref_k, ref_v = numpy_segmented_oracle(offs, keys, vals)
    np.testing.assert_array_equal(np.asarray(sk), ref_k)
    np.testing.assert_array_equal(np.asarray(sv), ref_v)
    assert splitsort._WARNED_TRACED_OFFSETS[0]


def test_make_segsort_fn_fixed_route(monkeypatch):
    """make_segsort_fn: jitted closure keeps the fixed-length batched route."""
    L, total = 64, 1 << 12
    offs, S = prng.make_fixed_segments(total, L)
    plan = gst.make_segsort_plan(offs, total, int(S))
    assert plan.fixed_length == L

    def boom(*a, **k):
        raise AssertionError("composite path ran for a fixed-length plan")

    monkeypatch.setattr(splitsort, "_composite_multi", boom)
    monkeypatch.setattr(splitsort, "_composite_segmented_sort", boom)
    keys = prng.make_test_keys(total, seed=14)
    vals = jnp.arange(total, dtype=jnp.uint32)
    fn = gst.make_segsort_fn(plan)
    sk, sv = fn(offs, keys, vals)
    ref_k, ref_v = numpy_segmented_oracle(offs, keys, vals)
    np.testing.assert_array_equal(np.asarray(sk), ref_k)
    np.testing.assert_array_equal(np.asarray(sv), ref_v)

    fnk = gst.make_segsort_fn(plan, has_payload=False)
    sk2 = fnk(offs, keys)
    np.testing.assert_array_equal(np.asarray(sk2), ref_k)


def test_plan_mismatch_raises():
    total = 1 << 10
    offs, S = prng.make_fixed_segments(total, 32)
    plan = gst.make_segsort_plan(offs, total, int(S))
    keys = prng.make_test_keys(total, seed=15)
    with pytest.raises(ValueError, match="plan was built for"):
        gst.split_sort_pairs(offs, keys, keys, int(S) + 1, total, plan=plan)


def test_plan_requires_concrete_offsets():
    import jax

    total = 1 << 10
    offs, S = prng.make_fixed_segments(total, 32)

    def build(o):
        return gst.make_segsort_plan(o, total, int(S))

    with pytest.raises(ValueError, match="concrete"):
        jax.jit(lambda o: (build(o), o)[1])(offs)


# ---------------------------------------------------------------------------
# multi-class dispatch (VERDICT r4 item 2: the executed 14-bin form)
# ---------------------------------------------------------------------------


def _mixed_length_offsets(lens):
    lens = np.asarray(lens, dtype=np.int64)
    offs = np.concatenate([[0], np.cumsum(lens)])[:-1]
    return jnp.asarray(offs.astype(np.uint32)), int(lens.sum())


def test_multi_class_dispatch_small_caps(monkeypatch):
    """bulk + two padded classes + composite tail, all exercised at CI
    scale via a routing override that shrinks every cap; oracle-exact and
    the padded-row path is proven to run."""
    gst.set_routing_override(gst.RoutingParameters(
        window_max_keys=256, window_max_fused=256, window_max_pairs=256,
        segsort_bulk_max=128, segsort_padded_max=1024,
        segsort_extract_max_frac=1.0))
    try:
        rng = np.random.RandomState(7)
        lens = ([int(x) for x in rng.randint(1, 100, size=40)]   # bulk
                + [300, 450, 700, 1000]                           # padded
                + [2000])                                         # tail
        rng.shuffle(lens)
        offs, total = _mixed_length_offsets(lens)
        S = len(lens)
        plan = splitsort._window_dispatch(offs, total, S,
                                          bits_to_sort=32,
                                          has_payload=True)
        assert plan is not None and "classes" in plan
        cp = plan["classes"]
        assert cp["bulk"] is not None
        assert {c["B"] for c in cp["padded"]} == {512, 1024}
        assert cp["tail"] is not None and cp["tail"]["k"] == 2000

        ran = []
        real = splitsort._padded_rows_class_sort

        def spy(*a, **k):
            ran.append(a[2]["B"])
            return real(*a, **k)

        monkeypatch.setattr(splitsort, "_padded_rows_class_sort", spy)
        keys = prng.make_test_keys(total, seed=21)
        vals = jnp.arange(total, dtype=jnp.uint32)
        sk, sv = gst.split_sort_pairs(offs, keys, vals, S, total)
        assert sorted(ran) == [512, 1024]
        ref_k, ref_v = numpy_segmented_oracle(offs, keys, vals)
        np.testing.assert_array_equal(np.asarray(sk), ref_k)
        np.testing.assert_array_equal(np.asarray(sv), ref_v)
    finally:
        gst.clear_routing_override()


def test_multi_class_real_caps_pairs_band():
    """The real-caps trigger: a pairs workload whose max length exceeds
    the window cap routes per-class — WHEN the extracted mass is the
    minority (the measured-winning regime; the round-4 hardware gate
    `segsort_extract_max_frac` keeps majority-extraction workloads on the
    composite, which measured faster — RESULTS.md round-4 segsort
    section).  One big segment + a dominant small bulk."""
    lens = [20000] + [int(x) for x in
                      np.random.RandomState(3).randint(1, 64, size=1100)]
    offs, total = _mixed_length_offsets(lens)
    assert 20000 / total <= 0.5  # minority extraction by construction
    S = len(lens)
    plan = splitsort._window_dispatch(offs, total, S, bits_to_sort=32,
                                      has_payload=True)
    assert plan is not None
    # this shape may qualify for the (earlier-checked) bimodal split —
    # either way a routed non-composite plan must exist and be exact
    assert ("split" in plan) or ("classes" in plan)
    keys = prng.make_test_keys(total, seed=22)
    vals = jnp.arange(total, dtype=jnp.uint32)
    sk, sv = gst.split_sort_pairs(offs, keys, vals, S, total)
    ref_k, ref_v = numpy_segmented_oracle(offs, keys, vals)
    np.testing.assert_array_equal(np.asarray(sk), ref_k)
    np.testing.assert_array_equal(np.asarray(sv), ref_v)


def test_multi_class_majority_extraction_gated():
    """Majority-extraction workloads (the regime hardware measured 0.65x
    the composite) must NOT take the class plan under real caps."""
    lens = [20000] + [int(x) for x in
                      np.random.RandomState(3).randint(1, 64, size=190)]
    offs, total = _mixed_length_offsets(lens)
    assert 20000 / total > 0.5
    plan = splitsort._window_dispatch(offs, total, len(lens),
                                      bits_to_sort=32, has_payload=True)
    assert plan is None or "classes" not in plan


def test_multi_class_keys_and_wide(monkeypatch):
    """Keys-only and dual-plane 64-bit payloads through the class plan."""
    gst.set_routing_override(gst.RoutingParameters(
        window_max_keys=128, window_max_fused=128, window_max_pairs=128,
        segsort_bulk_max=64, segsort_padded_max=512,
        segsort_extract_max_frac=1.0))
    try:
        lens = [40, 17, 300, 512, 80, 1000, 33, 450]
        offs, total = _mixed_length_offsets(lens)
        S = len(lens)
        keys = prng.make_test_keys(total, seed=23)
        sk = gst.split_sort_keys(offs, keys, S)
        ref_k, _ = numpy_segmented_oracle(offs, keys)
        np.testing.assert_array_equal(np.asarray(sk), ref_k)

        lo = jnp.arange(total, dtype=jnp.uint32)
        hi = prng.hybrid_taus_bits(total, seed=24)
        wk, wlo, whi = gst.split_sort_pairs_wide(offs, keys, lo, hi, S,
                                                 total)
        kk, ll, hh = (np.asarray(keys).copy(), np.asarray(lo).copy(),
                      np.asarray(hi).copy())
        bounds = np.concatenate([[0], np.cumsum(lens)])
        for s in range(S):
            sl = slice(int(bounds[s]), int(bounds[s + 1]))
            perm = np.argsort(kk[sl], kind="stable")
            kk[sl], ll[sl], hh[sl] = kk[sl][perm], ll[sl][perm], hh[sl][perm]
        np.testing.assert_array_equal(np.asarray(wk), kk)
        np.testing.assert_array_equal(np.asarray(wlo), ll)
        np.testing.assert_array_equal(np.asarray(whi), hh)
    finally:
        gst.clear_routing_override()


def test_multi_class_under_jit_with_plan(monkeypatch):
    """The class plan rides SegSortPlan: jitted callers keep the route."""
    import jax

    gst.set_routing_override(gst.RoutingParameters(
        window_max_keys=128, window_max_fused=128, window_max_pairs=128,
        segsort_bulk_max=64, segsort_padded_max=512,
        segsort_extract_max_frac=1.0))
    try:
        lens = [40, 17, 300, 80, 33, 450, 12, 200]
        offs, total = _mixed_length_offsets(lens)
        S = len(lens)
        plan = gst.make_segsort_plan(offs, total, S)

        def boom(*a, **k):
            raise AssertionError("whole-composite ran despite class plan")

        monkeypatch.setattr(splitsort, "_composite_segmented_sort", boom)
        keys = prng.make_test_keys(total, seed=25)
        vals = jnp.arange(total, dtype=jnp.uint32)
        fn = jax.jit(lambda o, k, v: splitsort.split_sort_pairs(
            o, k, v, S, total, plan=plan))
        sk, sv = fn(offs, keys, vals)
        ref_k, ref_v = numpy_segmented_oracle(offs, keys, vals)
        np.testing.assert_array_equal(np.asarray(sk), ref_k)
        np.testing.assert_array_equal(np.asarray(sv), ref_v)
    finally:
        gst.clear_routing_override()


def test_composite_fused_rangesweep_route():
    """Flagship-size fused composites route through the rangesweep
    engine (round-5 midrange shot): forced-route output is bit-exact
    with the XLA composite for 0/1/2 payload planes (2 planes = the
    64-bit payload form)."""
    import gpusorting_tpu as gst
    from gpusorting_tpu.core import config as cfg
    from gpusorting_tpu.core import prng
    from gpusorting_tpu.segsort import splitsort

    n, bits = 40_000, 12
    offs, S = prng.make_random_segments(n, 512, seed=3)
    codes = prng.hybrid_taus_bits(n, seed=5) & jnp.uint32((1 << bits) - 1)
    pay1 = prng.hybrid_taus_bits(n, seed=6)
    pay2 = prng.hybrid_taus_bits(n, seed=7)
    real_auto = cfg.auto_engine
    for payloads in ((), (pay1,), (pay1, pay2)):
        want = splitsort._composite_multi(offs, codes, payloads, S, bits)
        cfg.set_routing_override(gst.RoutingParameters(
            rangesweep_seg_elems=1024, rangesweep_seg_elems_pairs=1024,
            rangesweep_seg_elems_pairs_wide=1024))
        cfg.auto_engine = lambda *a, **k: "rangesweep"
        try:
            got = splitsort._composite_multi(offs, codes, payloads, S, bits)
        finally:
            cfg.auto_engine = real_auto
            cfg.clear_routing_override()
        np.testing.assert_array_equal(np.asarray(got[0]),
                                      np.asarray(want[0]))
        for g, w in zip(got[1], want[1]):
            np.testing.assert_array_equal(np.asarray(g), np.asarray(w))
