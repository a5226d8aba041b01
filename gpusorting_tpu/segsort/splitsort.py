"""SplitSort — segmented sort (the reference's second product surface).

Reference API (GPUSortingCUDA/SegSort/SplitSort/SplitSort.cuh:674-934):
    SplitSortAllocateTempMemory(totalSegLength, totalSegCount, tempMem)
    SplitSortPairs<BITS_TO_SORT, V>(segments, sort, values, totalSegCount,
                                    totalSegLength, tempMem)
    SplitSortFreeTempMemory(tempMem)
  segments = exclusive-prefix offsets; BITS_TO_SORT in [4,32] bounds key bits;
  payload V in {uint32_t, double}.

TPU-native design (SURVEY.md §7.4): segments are bucketed by length class
(the reference uses 14 bins, SplitSort.cuh:740-930); short classes sort as
padded 2-D batches with dummy-key masking (the reference's 0xFFFFFFFF trick,
OneSweep.cu:195-205); the catch-all path is the composite (segId << bits |
key) whole-buffer sort — exactly the reference's large-segment strategy
(SplitSortLarge.cuh:1198-1289), which on TPU is also the *fast* path since it
reuses the flat radix engine.  `bits_to_sort` directly reduces composite sort
width, the same optimization lever as the reference's template parameter.

JAX has no malloc surface, so the Allocate/Free temp-memory calls are
represented by the `SplitSorter` object lifecycle (buffers are managed by
XLA); the functions exist as no-op shims for API parity.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp
import numpy as np

from ..core import codec
from ..core.config import KeyType
from ..ops import xla_sort


def _ceil_log2(x: int) -> int:
    return max(1, math.ceil(math.log2(max(2, x))))


def split_sort_allocate_temp_memory(total_seg_length: int, total_seg_count: int):
    """API-parity shim (reference: SplitSort.cuh:674-690). Returns a handle."""
    return {"total_seg_length": total_seg_length, "total_seg_count": total_seg_count}


def split_sort_free_temp_memory(handle) -> None:
    """API-parity shim (reference: SplitSort.cuh:692-697)."""
    del handle


def _check_bounded_bits(bits_to_sort: int, kt: KeyType) -> None:
    """bits_to_sort < 32 is a bound on the RAW u32 key value (reference:
    masked u32 fixtures, UtilityKernels.cuh:170-248; SplitSort keys are
    uint32_t, SplitSort.cuh:702).  i32/f32 keys encode with the top bit
    set (codec.encode_keys), so a bounded-bits fused/composite key would
    silently truncate them — reject instead."""
    if bits_to_sort < 32 and kt != KeyType.UINT32:
        raise ValueError(
            "bits_to_sort < 32 applies to uint32 keys only (the reference's "
            f"SplitSort key type); got {kt.name} keys")


class SegSortPlan:
    """Host-computed dispatch plan for one segment layout.

    The reference decides its 14-bin dispatch on the HOST from a 16-word
    segInfo readback (SplitSort.cuh:654-668) — a deliberate sync.  The TPU
    analog: compute every host-side inspection (fixed-length detection,
    the length histogram, window terms, length-class split geometry) ONCE,
    outside jit, and carry it as a static object.  A jitted caller that
    passes `plan=` keeps all fast routes (windows/split/fixed); without a
    plan, traced offsets silently used to fall to the ~0.5 G composite —
    a 3-28x cliff with no warning (VERDICT r3 missing #3).

    The plan is keyed to ONE offsets array + total length; the sort
    functions trust it (they cannot re-check traced offsets), so passing a
    plan built from different offsets returns garbage — the same contract
    as the reference's segInfo.
    """

    def __init__(self, seg_offsets, total_length: int,
                 total_seg_count: int | None = None):
        try:
            offs = np.asarray(seg_offsets)
        except (jax.errors.ConcretizationTypeError,
                jax.errors.TracerArrayConversionError):
            raise ValueError(
                "make_segsort_plan requires concrete (host-known) offsets "
                "— build the plan OUTSIDE jit, then pass it into the "
                "jitted call (the reference's segInfo host readback, "
                "SplitSort.cuh:654-668)") from None
        self.offsets = offs
        self.total = int(total_length)
        self.seg_count = int(total_seg_count if total_seg_count is not None
                             else offs.shape[0])
        self.fixed_length = _fixed_length_of(offs, self.total, self.seg_count)
        self._window_plans: dict = {}

    def window_plan(self, bits_to_sort: int, has_payload: bool):
        """The (cached) _window_dispatch result for one key mode."""
        key = (bits_to_sort, has_payload)
        if key not in self._window_plans:
            self._window_plans[key] = _window_dispatch(
                self.offsets, self.total, self.seg_count,
                bits_to_sort=bits_to_sort, has_payload=has_payload)
        return self._window_plans[key]


def make_segsort_plan(seg_offsets, total_length: int,
                      total_seg_count: int | None = None) -> SegSortPlan:
    """Build the reusable host-side dispatch plan (see SegSortPlan)."""
    return SegSortPlan(seg_offsets, total_length, total_seg_count)


def make_segsort_fn(plan: SegSortPlan, has_payload: bool = True,
                    bits_to_sort: int = 32, strategy: str = "auto"):
    """jit-compiled segmented sort closure bound to one plan.

    Returns fn(seg_offsets, keys[, values]) — the deferred-dispatch analog
    of the reference's CommandBuffer Sort overloads (OneSweep.cs:297-427):
    the host decision is baked in, the call is pure device work.
    """
    if has_payload:
        def fn(seg_offsets, keys, values):
            return split_sort_pairs(
                seg_offsets, keys, values, plan.seg_count, plan.total,
                bits_to_sort, strategy=strategy, plan=plan)
    else:
        def fn(seg_offsets, keys):
            return split_sort_keys(
                seg_offsets, keys, plan.seg_count, bits_to_sort,
                strategy=strategy, plan=plan)
    return jax.jit(fn)


# one-shot warning when traced offsets silently lose every fast path
_WARNED_TRACED_OFFSETS = [False]


def _warn_traced_offsets_once():
    if not _WARNED_TRACED_OFFSETS[0]:
        _WARNED_TRACED_OFFSETS[0] = True
        import warnings

        warnings.warn(
            "split_sort called under jit with traced seg_offsets and no "
            "plan= — every fast route (fixed-length/window/split) needs "
            "host-known offsets, so this call runs the whole-buffer "
            "composite sort (up to 28x slower).  Build the plan once "
            "outside jit: plan = gst.make_segsort_plan(offsets, total); "
            "then pass plan= (or use gst.make_segsort_fn(plan)).",
            stacklevel=3)


def _fixed_length_of(seg_offsets, total_length: int, seg_count: int):
    """If every segment has the same length L, return L, else None.

    The reference makes its bin dispatch on the host from a 16-word segInfo
    readback (SplitSort.cuh:654-668); this host-side inspection of the
    offsets array is the same pattern.
    """
    try:
        offs = np.asarray(seg_offsets)
    except (jax.errors.ConcretizationTypeError,
            jax.errors.TracerArrayConversionError):
        return None  # offsets not concrete under jit: composite path
    if offs.shape[0] != seg_count or seg_count == 0:
        return None
    if total_length % seg_count:
        return None
    L = total_length // seg_count
    if offs[0] != 0:
        return None
    if not np.array_equal(offs, np.arange(seg_count, dtype=np.uint64) * L):
        return None
    return int(L)


# Fixed-length giant-segment crossover: beyond xla_sort.map_rows_min(mode)
# a `lax.map` of flat per-segment sorts beats the batched minor-axis sort
# (r3 hardware probes: 2^22 total pairs L=2^18 map 1.21 G vs batched
# 0.62 G, L=2^14 batched wins 2.51 vs 2.10; hw_sort_batched2_r3 pins the
# crossovers at 2^15 keys / 2^16 pairs).  Same mechanism as the flagship
# lax.map discovery: each mapped sort stays VMEM-resident.  Shared with
# the public row-sort surface (ops.xla_sort.sort_batched — identical code
# shape), hence the shared helper reading the routing tuner
# (core.config.RoutingParameters).


def _batched_segmented_sort(codes, payload_bits, seg_count: int, L: int):
    """Fixed-length fast path: reshape to (S, L) and run one batched sort.

    Measured on v5e: XLA's batched minor-axis sort runs 13-30+ Gelem/s vs
    0.65 Gelem/s for the flat composite sort — a 20-50x win for binned
    segments (probes/PROBES.md).  This is the TPU-native analog of the
    reference's per-bin specialized kernels (SplitSort.cuh:751-930): the
    "bin" is the static row length, the batch axis replaces the grid.
    Giant fixed segments (L >= the mode's map_rows_min) run as a
    `lax.map` of flat per-segment sorts instead (the reference's
    grid-strided SortGt8192 region, SplitSort.cuh:455-573).
    """
    k2 = codes.reshape(seg_count, L)
    if payload_bits is None:
        # keys-only on bare codes: the all-keys invariant holds
        if L >= xla_sort.map_rows_min(False):
            (sk,) = xla_sort.map_rows_sort((k2,), True)
        else:
            (sk,) = xla_sort.sort_all_keys_unstable((k2,), dimension=1)
        return sk.reshape(-1), None
    v2 = payload_bits.reshape(seg_count, L)
    if L >= xla_sort.map_rows_min(True):
        sk, sv = xla_sort.map_rows_sort((k2, v2), False)
    else:
        sk, sv = jax.lax.sort((k2, v2), num_keys=1, is_stable=True,
                              dimension=1)
    return sk.reshape(-1), sv.reshape(-1)


# Random-length fast path: largest max segment length the two-pass window
# trick serves, by mode.  Round-3 hardware sweep at 2^22 total
# (benches/RESULTS.md): the window-pass rate decays gently with L (no
# cliff beyond 4096 — the round-2 cap at 2048 was an unmeasured
# extrapolation), so windows beat the ~0.5 G composite up to:
#   keys-only (2-op unstable / 1-op fused): maxlen 32768 (0.7-1.9 G)
#   pairs, bounded-bits fused (2-op stable): maxlen 32768 (0.56-1.6 G)
#   pairs, full 32-bit keys (3-op stable):   maxlen 16384 (0.58-1.0 G)
# The caps live in the routing tuner (core.config.RoutingParameters
# window_max_keys/fused/pairs) so non-v5e generations can override them.


def _window_sid_bits(starts: np.ndarray, max_len: int) -> int:
    """Bits for a window-local segment index at the window size `max_len`
    implies (both window grids), for the fused bounded-bits key (the
    SplitSortRadixFine analog, SplitSortVariants.cuh:846-1138).  Counts
    the max segments INTERSECTING any window: segments starting in the
    window plus one possibly straddling in (segments are contiguous, so
    at most one crosses the left edge)."""
    L = max(128, 1 << (max(1, max_len - 1)).bit_length() + 1)
    max_int = 0
    for off in (0, L // 2):
        win = (starts + off) // L
        max_int = max(max_int, int(np.bincount(win).max()) + 1)
    return max(1, int(np.ceil(np.log2(max_int + 2))))


# Length-class split (the binning-drives-execution path): bulk segments
# window-sort at their own small window; the long tail is compacted out,
# composite-sorted densely, and expanded back into its spans.  Applied
# when the tail is small and the window shrink is large.
_SPLIT_BULK_COVER = 0.75   # min elem fraction the small class must cover
_SPLIT_MAX_TAIL = 0.25     # max elem fraction in the long tail
_SPLIT_MIN_SHRINK = 4      # min window-size ratio to justify the split


def _window_dispatch(seg_offsets, total: int, seg_count: int,
                     bits_to_sort: int = 32, has_payload: bool = False):
    """Host-side dispatch plan off the 14-bucket length histogram — the
    analog of the reference's segInfo readback + per-bin launch decision
    (SplitSort.cuh:654-668, SplitSortBinning.cuh:360-438).

    bits_to_sort/has_payload identify the key mode so window feasibility
    is judged against the cap of the mode that would actually run
    (stable3 caps at 16384, keys2/fused at 32768 — _pick_window_mode);
    judging every mode against the keys cap made full-32-bit-key pairs
    workloads with maxlen in (16384, 32768] skip a length-class split
    they qualified for and fall to the ~0.5 G composite.

    Returns None (composite / traced offsets) or a dict:
      {"ml", "sid_bits"}          — whole-workload window ladder terms
                                    (absent when giant segments preclude
                                    them), plus
      {"split": {...}} when the length-class split applies: the histogram
      shows a small-segment bulk (>= _SPLIT_BULK_COVER of elements) whose
      own window is >= _SPLIT_MIN_SHRINK smaller than the global one (or
      the global window is infeasible outright).  The split dict carries
      the class threshold T, the bulk's ml/sid_bits, and the long-segment
      geometry (host numpy: starts/lens/k) for the compact-sort-expand
      tail path.
    """
    try:
        offs = np.asarray(seg_offsets)
    except (jax.errors.ConcretizationTypeError,
            jax.errors.TracerArrayConversionError):
        return None  # offsets traced: composite path
    if seg_count == 0 or offs.shape[0] != seg_count:
        return None
    lens = segment_lengths(offs, total)
    if lens.size == 0 or lens.min() < 0:
        return None
    hist = segment_length_histogram(lens)
    starts = offs.astype(np.int64)
    ml = int(lens.max())
    plan = {}
    if hist["gt_count"] == 0:
        plan["ml"] = ml
        plan["sid_bits"] = _window_sid_bits(starts, ml)

    # length-class split consideration
    if seg_count >= 2 and total > 0:
        bin_idx = np.searchsorted(np.asarray(BIN_BOUNDS), lens, side="left")
        w = np.cumsum(np.bincount(bin_idx, weights=lens,
                                  minlength=len(BIN_BOUNDS) + 1))
        covered = np.nonzero(w[:len(BIN_BOUNDS)]
                             >= _SPLIT_BULK_COVER * total)[0]
        if covered.size:
            T = BIN_BOUNDS[int(covered[0])]
            small = lens <= T
            tail_elems = int(lens[~small].sum())
            ml_small = int(lens[small].max()) if small.any() else 0
            # infeasible == the whole-workload window ladder cannot run in
            # the mode this workload would get (exactly the check the
            # caller applies to plan["ml"] afterwards)
            infeasible = "ml" not in plan or _pick_window_mode(
                plan["ml"], plan["sid_bits"], bits_to_sort,
                has_payload) is None
            shrink_ok = (1 << (max(1, ml - 1)).bit_length()) >= (
                _SPLIT_MIN_SHRINK * (1 << (max(1, ml_small - 1)).bit_length()))
            if (0 < tail_elems <= _SPLIT_MAX_TAIL * total
                    and (infeasible or shrink_ok)):
                plan["split"] = {
                    "T": T,
                    "ml": ml_small,
                    "sid_bits": _window_sid_bits(starts, max(2, ml_small)),
                    "long_starts": starts[~small],
                    "long_lens": lens[~small],
                    "k": tail_elems,
                }

    # generalized multi-class dispatch (VERDICT r4 item 2 — the executed
    # 14-bin form): built when the whole-workload window ladder cannot run
    # in this mode and the measured bimodal split didn't qualify.
    # MEASURED GATE (round-4 hardware, benches/logs/hw_r4_validation.log):
    # extraction pays ~6 whole-array passes (mask/compact/expand each way
    # + merge), so per-class routing wins only when the extracted mass is
    # the MINORITY — at uniform-random maxlen 32768 (extracted ~95%) it
    # ran 0.65x the composite, while the bimodal split (extracted ~2%)
    # measured 3.4x.  The movement floor (~4 passes + padded sorts at the
    # measured 1.2-1.3 G window rates) caps the uniform-random band's
    # possible win at ~1.4x, so the composite stays the honest route
    # there (the wall is recorded in RESULTS.md round-4 segsort section).
    if "split" not in plan:
        whole_infeasible = ("ml" not in plan or _pick_window_mode(
            plan["ml"], plan["sid_bits"], bits_to_sort, has_payload)
            is None)
        if whole_infeasible:
            cp = _build_class_plan(starts, lens, total, bits_to_sort,
                                   has_payload)
            if cp is not None:
                from ..core.config import get_routing_parameters

                extracted = (sum(c["k"] for c in cp["padded"])
                             + (cp["tail"]["k"] if cp["tail"] else 0))
                frac = extracted / max(total, 1)
                if frac <= get_routing_parameters(
                        ).segsort_extract_max_frac:
                    plan["classes"] = cp
    return plan or None


def _window_pass(sid, codes, payloads, L: int, offset: int, n: int,
                 mode: str = "stable3", fuse_bits: int = 0):
    """One batched row sort over L-wide windows starting at -offset
    (front-padded with sentinels).  Modes (round-3 hardware sweep,
    benches/RESULTS.md):

      stable3 — stable (seg_id, code, payloads...) lex sort (num_keys=2);
                the general pairs path
      keys2   — unstable (seg_id, code) sort; keys-only (equal pairs are
                interchangeable), ~2-3x faster than stable3
      fused   — the SplitSortRadixFine analog (bounded bits,
                SplitSortVariants.cuh:846-1138): ONE u32 key
                (window-local seg index << fuse_bits | code) so the sort
                is 1-op (keys) / (1+payloads)-op (pairs); seg id and code
                are RECOVERED from the fused key afterwards.  Requires
                sid_bits + fuse_bits <= 31 (headroom keeps real keys
                below the back-pad sentinel 0xFFFFFFFF).
    """
    pad_front = offset
    pad_back = (-(n + offset)) % L

    def padf(x, front_fill, back_fill):
        return jnp.concatenate([
            jnp.full((pad_front,), front_fill, x.dtype), x,
            jnp.full((pad_back,), back_fill, x.dtype)])

    # front pads must sort BEFORE all real elements (sid -1), back pads
    # after (sid max), so real elements keep their window positions
    sid_p = padf(sid, jnp.int32(-1), jnp.int32(0x7FFFFFFF))
    codes_p = padf(codes, jnp.uint32(0), jnp.uint32(0xFFFFFFFF))
    rows = sid_p.shape[0] // L
    s2 = sid_p.reshape(rows, L)
    c2 = codes_p.reshape(rows, L)
    p2 = tuple(padf(p, jnp.uint32(0), jnp.uint32(0)).reshape(rows, L)
               for p in payloads)

    def unpad(r):
        return r.reshape(-1)[pad_front:pad_front + n]

    if mode == "fused":
        base = s2[:, :1]                      # nondecreasing sids: row min
        loc = (s2 - base).astype(jnp.uint32)  # window-local seg index
        fused = (loc << fuse_bits) | c2
        fused = jnp.where(s2 == jnp.int32(0x7FFFFFFF),
                          jnp.uint32(0xFFFFFFFF), fused)
        fused = jnp.where(s2 == jnp.int32(-1), jnp.uint32(0), fused)
        res = jax.lax.sort((fused,) + p2, num_keys=1, is_stable=True,
                           dimension=1)
        f_out = res[0]
        # recover sid/code for the REAL elements (pads are sliced off;
        # rows are invariant under a row sort, so each element's window
        # base is unchanged)
        code_out = f_out & jnp.uint32((1 << fuse_bits) - 1)
        sid_out = (f_out >> fuse_bits).astype(jnp.int32) + base
        return (unpad(sid_out), unpad(code_out),
                tuple(unpad(r) for r in res[1:]))

    if mode == "keys2":
        # keys-only: (sid, code) are both comparator keys
        rs, rc = xla_sort.sort_all_keys_unstable((s2, c2), dimension=1)
        return unpad(rs), unpad(rc), ()

    res = jax.lax.sort((s2, c2) + p2, num_keys=2, is_stable=True,
                       dimension=1)
    out = [unpad(r) for r in res]
    return out[0], out[1], tuple(out[2:])


def _windowed_segmented_sort(seg_offsets, codes, payloads, seg_count: int,
                             max_len: int, mode: str = "stable3",
                             fuse_bits: int = 0):
    """Random-length segments via two overlapping window sorts.

    TPU-native replacement for the reference's 14 per-length-bin kernels
    (SplitSort.cuh:751-930): instead of gathering each length class, sort
    segments within L-wide windows twice, at offsets 0 and L/2, where
    L = 2*ceil_pow2(max_len).  Every segment of length <= L/2 lies wholly
    inside a window of one of the two grids, so it gets exactly sorted
    there; the other pass leaves already-sorted segments unchanged
    (a stable/total-order window sort of a sorted segment is the
    identity on it).  No data movement, no per-class shapes — the whole
    dispatch is the window length + key mode, chosen from the host-side
    segment-length histogram exactly like the reference's segInfo
    readback (SplitSort.cuh:654-668).
    """
    n = codes.shape[0]
    L = max(128, 1 << (max(1, max_len - 1)).bit_length() + 1)
    sid = xla_sort.segment_ids_from_offsets(seg_offsets, n).astype(jnp.int32)
    sid1, c1, p1 = _window_pass(sid, codes, payloads, L, 0, n, mode,
                                fuse_bits)
    _, c2, p2 = _window_pass(sid1, c1, p1, L, L // 2, n, mode, fuse_bits)
    return c2, p2


def _packed_bins_segmented_sort(seg_offsets, codes, payloads: tuple,
                                seg_count: int, total: int,
                                capacity: int = 32):
    """NextFitBinPacking-driven execution — the SplitSortBins32 analog.

    Reference: NextFitBinPacking packs runs of <=32-length segments into
    32-key bins so one warp sorts a whole bin (SplitSortBinning.cuh:360-438,
    SplitSortVariants.cuh:386-451).  Next-fit packs CONSECUTIVE segments,
    so each bin is a contiguous element span of length <= capacity: gather
    the spans into dense (bins, capacity) rows (row-coalesced: idx[b, j] =
    span_start[b] + j), run ONE stable batched row sort keyed by
    (segment id, code), and scatter rows back to their spans.

    This is the executed alternative to the two-window path for
    maxlen <= capacity workloads.  Note the equivalence that makes windows
    the default: the window grids ARE next-fit packing with capacity L/2
    and zero data movement — every window is a fixed-capacity span of
    whole segments, with the one possible straddler handled by the second
    (offset) grid.  The packed form pays a gather + scatter to halve the
    row width; benches/RESULTS.md records the hardware comparison.
    """
    n = codes.shape[0]
    try:
        offs = np.asarray(seg_offsets, dtype=np.int64)
    except (jax.errors.ConcretizationTypeError,
            jax.errors.TracerArrayConversionError):
        raise ValueError(
            "strategy='packed' requires host-known (concrete) offsets — "
            "under jit, pass offsets as a captured numpy array or use "
            "strategy='auto' (composite fallback)") from None
    lens = segment_lengths(offs, total)
    if lens.size and int(lens.max()) > capacity:
        raise ValueError(
            f"packed strategy requires every segment length <= {capacity}")
    bin_ids, nbins = next_fit_bin_packing(lens, capacity)
    if nbins == 0 or n == 0:
        return codes, payloads
    # first packable segment of each bin (bin_ids nondecreasing; all
    # segments are packable here)
    first_seg = np.searchsorted(bin_ids, np.arange(nbins), side="left")
    span_start = offs[first_seg]
    span_end = np.append(span_start[1:], np.int64(total))

    sid = xla_sort.segment_ids_from_offsets(seg_offsets, n).astype(jnp.int32)
    starts = jnp.asarray(span_start.astype(np.int32))
    ends = jnp.asarray(span_end.astype(np.int32))
    idx = starts[:, None] + jnp.arange(capacity, dtype=jnp.int32)[None, :]
    pad = idx >= ends[:, None]
    safe = jnp.minimum(idx, jnp.int32(n - 1))
    s2 = jnp.where(pad, jnp.int32(0x7FFFFFFF), sid[safe])
    c2 = jnp.where(pad, jnp.uint32(0xFFFFFFFF), codes[safe])
    p2 = tuple(jnp.where(pad, jnp.uint32(0), p[safe]) for p in payloads)

    if payloads:
        res = jax.lax.sort((s2, c2) + p2, num_keys=2, is_stable=True,
                           dimension=1)
        rows = res[1:]
    else:
        # keys-only on bare codes: equal (sid, code) rows interchangeable
        _, rc = xla_sort.sort_all_keys_unstable((s2, c2), dimension=1)
        rows = (rc,)
    # pads sort to row ends (sid 0x7FFFFFFF), so real elements land back on
    # j < span_len — scatter rows to their spans, dropping pad lanes
    tgt = jnp.where(pad, jnp.int32(n), idx).reshape(-1)
    out_c = codes.at[tgt].set(rows[0].reshape(-1), mode="drop")
    out_p = tuple(p.at[tgt].set(r.reshape(-1), mode="drop")
                  for p, r in zip(payloads, rows[1:]))
    return out_c, out_p


def _composite_multi(seg_offsets, codes, payloads: tuple, seg_count: int,
                     bits_to_sort: int):
    """Whole-buffer composite (segId || key) sort, any payload count.

    Semantics of SplitSortLarge.cuh:1198-1289: sort the concatenation of
    all segments by the composite (segment id, bounded key); stability
    gives correct in-segment payload order.  Fused to a single u32 key
    when segIdBits + bits_to_sort <= 32 (the bits_to_sort lever).
    Returns (sorted_codes, sorted_payloads_tuple).
    """
    n = codes.shape[0]
    seg_ids = xla_sort.segment_ids_from_offsets(seg_offsets, n)
    seg_bits = _ceil_log2(seg_count) + 1
    if seg_bits + bits_to_sort <= 32:
        comp = (seg_ids << jnp.uint32(bits_to_sort)) | codes
        mask = jnp.uint32((1 << bits_to_sort) - 1)
        # flagship-size fused composites ride the rangesweep engine (the
        # round-5 midrange shot: at n above the measured crossover the
        # flat oracle loses 19-26% — hw_r5_campaign5/6; codes recover
        # from the sorted composite as comp & mask, payloads ride the
        # stable plane pipeline).  The 2-key branch below cannot route:
        # rangesweep's equal-run split is only exact for (code, index)
        # composites (ordered by construction), not (segid, code) —
        # see PARITY.md segsort midrange note.
        from ..core.config import Mode, auto_engine

        if not payloads:
            if auto_engine(n) == "rangesweep":
                from ..ops import rangesweep

                return (rangesweep.sort_codes_rangesweep(comp) & mask), ()
            # equal comp implies equal codes: all operands are keys
            _, sc = xla_sort.sort_all_keys_unstable((comp, codes))
            return sc, ()
        if auto_engine(n, Mode.PAIRS,
                       payload_bits=64 if len(payloads) > 1 else 32
                       ) == "rangesweep":
            from ..ops import rangesweep

            res = rangesweep.sort_pairs_rangesweep_planes(
                comp, tuple(payloads),
                seg_elems=rangesweep._default_seg_elems_pairs(
                    wide=len(payloads) > 1))
            return (res[0] & mask), tuple(res[1:])
        res = jax.lax.sort((comp, codes) + payloads, num_keys=1,
                           is_stable=True)
        return res[1], tuple(res[2:])
    if not payloads:
        _, sc = xla_sort.sort_all_keys_unstable((seg_ids, codes))
        return sc, ()
    res = jax.lax.sort((seg_ids, codes) + payloads, num_keys=2,
                       is_stable=True)
    return res[1], tuple(res[2:])


def _composite_segmented_sort(
    seg_offsets: jnp.ndarray,
    codes: jnp.ndarray,
    payload_bits: jnp.ndarray | None,
    seg_count: int,
    bits_to_sort: int,
):
    """Single-payload form of `_composite_multi` (the historical API)."""
    sc, ps = _composite_multi(
        seg_offsets, codes,
        () if payload_bits is None else (payload_bits,),
        seg_count, bits_to_sort)
    return sc, (ps[0] if ps else None)


def _interval_mask(starts: np.ndarray, lens: np.ndarray, n: int):
    """Per-element membership mask from host-known [start, start+len)
    intervals: +-1 boundary scatter + cumsum (the segment_ids_from_offsets
    pattern; intervals must not overlap)."""
    bounds = np.concatenate([starts, starts + lens]).astype(np.int64)
    delta = np.concatenate([np.ones_like(starts), -np.ones_like(starts)])
    marks = jnp.zeros((n,), jnp.int32).at[jnp.asarray(bounds)].add(
        jnp.asarray(delta.astype(np.int32)), mode="drop")
    return jnp.cumsum(marks) > 0


def _dense_tail_composite(seg_offsets_unused, codes, payloads: tuple,
                          starts: np.ndarray, lens: np.ndarray, k: int,
                          bits_to_sort: int):
    """Extract the named segments densely, composite-sort them as their own
    tiny workload, and return (mask, sorted_ops_expanded_back).

    The compact/expand pair runs at 8/23 Gelem/s vs XLA's 0.11 G gather
    (probes/PROBES.md), which is what makes extraction affordable.
    Elements are taken from the ORIGINAL arrays (order within each segment
    = input order), so stability is preserved end to end.
    """
    from ..ops import stitch

    n = codes.shape[0]
    mask = _interval_mask(starts, lens, n)
    packed, _cnt = stitch.compact_ops((codes,) + payloads, mask)
    t_codes = packed[0][:k]
    t_pays = tuple(p[:k] for p in packed[1:])
    t_offs = jnp.asarray(
        np.concatenate([[0], np.cumsum(lens)])[:-1].astype(np.uint32))
    sc_t, ps_t = _composite_multi(t_offs, t_codes, t_pays, len(lens),
                                  bits_to_sort)
    exp = stitch.expand_ops((sc_t,) + ps_t, mask)
    return mask, exp


def _padded_rows_class_sort(codes, payloads: tuple, cls: dict, n: int):
    """Sort one extracted length class as padded rows — the TPU analog of
    the reference's per-bin specialized kernel launch
    (SplitSort.cuh:751-930, DispatchGt8192 :522-573).

    Segments with lengths in (B/2, B] are compacted out of the full array
    (8 Gelem/s), expanded into a dense (S_c, B) row layout (23 Gelem/s)
    where row i's prefix holds segment i and the suffix is key-sentinel
    padded, then ONE stable batched (or, beyond map_rows_min, lax.map'd)
    row sort finishes every segment: each row IS one segment, so pairs
    need only the 2-operand (code, payload) sort instead of the window
    ladder's two 3-operand passes — the mechanism that serves the pairs
    maxlen (16384, 131072] band the composite used to eat (VERDICT r3
    missing #2).  Pads are a row suffix, so a stable sort keeps real
    0xFFFFFFFF keys ahead of them (the reference's dummy-key trick,
    OneSweep.cu:195-205); keys-only rows may sort unstable because equal
    u32 values are interchangeable.

    Returns (mask, sorted_ops_expanded_back) like _dense_tail_composite.
    """
    from ..ops import stitch

    starts, lens, k, B = cls["starts"], cls["lens"], cls["k"], cls["B"]
    S_c = len(lens)
    mask = _interval_mask(starts, lens, n)
    packed, _cnt = stitch.compact_ops((codes,) + payloads, mask)
    lens_dev = jnp.asarray(lens.astype(np.int32))
    maskp = (jnp.arange(B, dtype=jnp.int32)[None, :]
             < lens_dev[:, None]).reshape(-1)
    exp = stitch.expand_ops(tuple(p[:k] for p in packed), maskp)
    k2 = jnp.where(maskp, exp[0],
                   jnp.uint32(0xFFFFFFFF)).reshape(S_c, B)
    p2 = tuple(e.reshape(S_c, B) for e in exp[1:])
    if payloads:
        if B >= xla_sort.map_rows_min(True):
            res = xla_sort.map_rows_sort((k2,) + p2, False)
        else:
            res = jax.lax.sort((k2,) + p2, num_keys=1, is_stable=True,
                               dimension=1)
    else:
        # keys-only on bare codes: unstable == stable (values identical)
        if B >= xla_sort.map_rows_min(False):
            res = xla_sort.map_rows_sort((k2,), True)
        else:
            res = xla_sort.sort_all_keys_unstable((k2,), dimension=1)
    flat = tuple(x.reshape(-1) for x in res)
    packed2, _cnt2 = stitch.compact_ops(flat, maskp)
    back = stitch.expand_ops(tuple(p[:k] for p in packed2), mask)
    return mask, back


def _build_class_plan(starts: np.ndarray, lens: np.ndarray, total: int,
                      bits_to_sort: int, has_payload: bool):
    """Host-side multi-class plan for workloads whose max length exceeds
    the window cap — the executed general form of the reference's 14-bin
    dispatch (SplitSort.cuh:740-930):

      bulk   — every segment <= T_bulk window-sorts IN PLACE (zero data
               movement; small windows measured >= ~1 G for every mode)
      padded — each occupied power-of-two class in (T_bulk, padded_max]
               is extracted and sorted as padded rows
               (_padded_rows_class_sort); occupancy is always > 50%
      tail   — segments beyond padded_max extract to a dense composite

    Returns None when there is nothing to split (no padded class or tail),
    else {"bulk": {...}|None, "padded": [...], "tail": {...}|None}.
    """
    from ..core.config import get_routing_parameters

    r = get_routing_parameters()
    if total <= 0 or lens.size == 0:
        return None
    # power-of-two class bound per segment (min class 2: length-1 segments
    # need no sorting but still belong to the bulk)
    bnd = np.power(2, np.ceil(np.log2(np.maximum(lens, 2)))).astype(np.int64)
    occupied = np.unique(bnd)
    bulk_sel = bnd <= r.segsort_bulk_max
    bulk = None
    if bulk_sel.any():
        ml_b = int(lens[bulk_sel].max())
        bulk = {"ml": ml_b,
                "sid_bits": _window_sid_bits(starts, max(2, ml_b))}
    padded = []
    for B in occupied:
        if B <= r.segsort_bulk_max or B > r.segsort_padded_max:
            continue
        sel = bnd == B
        padded.append({
            "B": int(B),
            "starts": starts[sel],
            "lens": lens[sel],
            "k": int(lens[sel].sum()),
        })
    tail = None
    t_sel = bnd > r.segsort_padded_max
    if t_sel.any():
        tail = {"starts": starts[t_sel], "lens": lens[t_sel],
                "k": int(lens[t_sel].sum())}
    if not padded and (tail is None or bulk is None):
        # nothing to split: either every class is bulk-feasible (the whole
        # window ladder would have run) or EVERY segment is tail-class —
        # then the plain composite is the same sort minus the copies
        return None
    return {"bulk": bulk, "padded": padded, "tail": tail}


def _multi_class_segmented_sort(seg_offsets, codes, payloads: tuple,
                                seg_count: int, cplan: dict,
                                bits_to_sort: int, has_payload: bool):
    """Execute a _build_class_plan: in-place bulk windows + per-class
    padded-row sorts + dense composite tail.  Every segment belongs to
    exactly one class (the bounds partition the length axis), and every
    extracted class reads the ORIGINAL arrays, so each span is written by
    exactly one stable mechanism."""
    n = codes.shape[0]
    bulk = cplan["bulk"]
    if bulk is not None and bulk["ml"] > 1:
        mode = _pick_window_mode(bulk["ml"], bulk["sid_bits"],
                                 bits_to_sort, has_payload)
        if mode is None:
            # caps are perf knobs, not correctness gates: a routing
            # override below segsort_bulk_max must not skip the bulk sort
            mode = "stable3" if has_payload else "keys2"
        out_c, out_p = _windowed_segmented_sort(
            seg_offsets, codes, payloads, seg_count, bulk["ml"], mode=mode,
            fuse_bits=bits_to_sort if mode == "fused" else 0)
    else:
        out_c, out_p = codes, payloads
    for cls in cplan["padded"]:
        mask, srt = _padded_rows_class_sort(codes, payloads, cls, n)
        out_c = jnp.where(mask, srt[0], out_c)
        out_p = tuple(jnp.where(mask, s, o)
                      for s, o in zip(srt[1:], out_p))
    if cplan["tail"] is not None:
        t = cplan["tail"]
        mask, srt = _dense_tail_composite(
            seg_offsets, codes, payloads, t["starts"], t["lens"], t["k"],
            bits_to_sort)
        out_c = jnp.where(mask, srt[0], out_c)
        out_p = tuple(jnp.where(mask, s, o)
                      for s, o in zip(srt[1:], out_p))
    return out_c, out_p


def _split_class_segmented_sort(seg_offsets, codes, payloads: tuple,
                                seg_count: int, split: dict,
                                mode: str | None, fuse_bits: int,
                                bits_to_sort: int):
    """Length-class split: windows for the bulk, compact-sort-expand for
    the long tail — the binning-drives-execution path.

    The reference gathers length classes into per-bin buffers and launches
    a kernel per bin (SplitSortBinning.cuh:360-438, SplitSort.cuh:740-930).
    TPU-native equivalent for a bimodal workload: the small-segment bulk is
    window-sorted IN PLACE at its own (small) window — long segments ride
    along and stay within their spans (window sorts keyed by segment id
    preserve each segment's element multiset per span) — while the long
    tail is compacted out densely (`stitch.compact_ops`), composite-sorted
    as its own tiny workload, and streamed back into its spans with
    `stitch.expand_ops` (both ~6-8 Gelem/s vs XLA's 0.11 G gather).
    """
    # bulk: window ladder at the small class's own window; long elements
    # participate (their within-span order becomes garbage) and are
    # overwritten below
    if split["ml"] > 1 and mode is not None:
        c_b, p_b = _windowed_segmented_sort(
            seg_offsets, codes, payloads, seg_count, split["ml"],
            mode=mode, fuse_bits=fuse_bits)
    else:
        c_b, p_b = codes, payloads  # length<=1 bulk is already sorted

    # tail: dense extraction -> composite sort -> stream back
    mask, exp = _dense_tail_composite(
        seg_offsets, codes, payloads, split["long_starts"],
        split["long_lens"], split["k"], bits_to_sort)
    out_c = jnp.where(mask, exp[0], c_b)
    out_p = tuple(jnp.where(mask, e, pb) for e, pb in zip(exp[1:], p_b))
    return out_c, out_p


def _pick_window_mode(ml: int, sid_bits: int, bits_to_sort: int,
                      has_payload: bool):
    """Key-mode ladder for the window path (round-3 hardware sweep,
    benches/RESULTS.md): fused when the bounded-bits key fits, else the
    cheapest correct multi-operand sort under the measured window caps
    (routing tuner rows window_max_keys/fused/pairs)."""
    from ..core.config import get_routing_parameters

    r = get_routing_parameters()
    fusable = sid_bits + bits_to_sort <= 31
    if fusable and ml <= r.window_max_fused:
        return "fused"
    if not has_payload:
        return "keys2" if ml <= r.window_max_keys else None
    return "stable3" if ml <= r.window_max_pairs else None


def _concrete_or_none(seg_offsets):
    """Host numpy view of the offsets, or None when traced under jit."""
    try:
        return np.asarray(seg_offsets)
    except (jax.errors.ConcretizationTypeError,
            jax.errors.TracerArrayConversionError):
        return None


def _dispatch_random_lengths(plan, seg_offsets, codes, payloads: tuple,
                             total: int, seg_count: int, bits_to_sort: int,
                             has_payload: bool):
    """Histogram-driven random-length dispatch: length-class split, whole
    window ladder, or None (caller falls to the composite).  `plan` is the
    _window_dispatch dict (from a SegSortPlan under jit, or computed
    inline from concrete offsets)."""
    if not plan:
        return None
    split = plan.get("split")
    if split is not None:
        if split["ml"] > 1:
            bmode = _pick_window_mode(split["ml"], split["sid_bits"],
                                      bits_to_sort, has_payload)
        else:
            bmode = None  # length<=1 bulk needs no sorting
        if bmode is not None or split["ml"] <= 1:
            return _split_class_segmented_sort(
                seg_offsets, codes, payloads, seg_count, split, bmode,
                bits_to_sort if bmode == "fused" else 0, bits_to_sort)
    if "classes" in plan:
        return _multi_class_segmented_sort(
            seg_offsets, codes, payloads, seg_count, plan["classes"],
            bits_to_sort, has_payload)
    if "ml" in plan:
        mode = _pick_window_mode(plan["ml"], plan["sid_bits"],
                                 bits_to_sort, has_payload)
        if mode is not None:
            return _windowed_segmented_sort(
                seg_offsets, codes, payloads, seg_count, plan["ml"],
                mode=mode,
                fuse_bits=bits_to_sort if mode == "fused" else 0)
    return None


def split_sort_pairs(
    seg_offsets: jnp.ndarray,
    keys: jnp.ndarray,
    values: jnp.ndarray | None,
    total_seg_count: int,
    total_seg_length: int | None = None,
    bits_to_sort: int = 32,
    strategy: str = "auto",
    plan: SegSortPlan | None = None,
):
    """Sort each segment independently; stable within segments.

    Reference: SplitSortPairs<BITS_TO_SORT, V> (SplitSort.cuh:702-934).
    `values=None` gives the keys-only form.  `strategy="packed"` forces the
    NextFitBinPacking gather path (every segment must be <= 32 long and the
    offsets host-known); "auto" picks by measurement (windows).

    `plan` (gst.make_segsort_plan) carries the host-side dispatch decisions
    so jitted callers with traced offsets keep the fast routes; without it,
    traced offsets fall to the composite path (warned once).
    """
    if not (4 <= bits_to_sort <= 32):
        raise ValueError("bits_to_sort must be in [4, 32] (reference contract)")
    if strategy not in ("auto", "packed"):
        raise ValueError(f"unknown strategy {strategy!r}")
    kt = codec.key_type_of(keys)
    _check_bounded_bits(bits_to_sort, kt)
    codes = codec.encode_keys(keys)
    bits = None if values is None else codec.payload_to_bits(values)

    total = keys.shape[0] if total_seg_length is None else total_seg_length
    if plan is not None and (plan.seg_count != total_seg_count
                             or plan.total != total):
        raise ValueError(
            f"plan was built for (seg_count={plan.seg_count}, "
            f"total={plan.total}), this call has ({total_seg_count}, "
            f"{total})")
    if strategy == "packed":
        payloads = () if bits is None else (bits,)
        sc, ps = _packed_bins_segmented_sort(
            seg_offsets, codes, payloads, total_seg_count, total)
        sb = ps[0] if bits is not None else None
        out_k = codec.decode_keys(sc, kt)
        if values is None:
            return out_k
        return out_k, codec.bits_to_payload(sb, values.dtype)
    if plan is not None:
        L = plan.fixed_length
    else:
        L = _fixed_length_of(seg_offsets, total, total_seg_count)
    if L is not None and L > 1:
        sc, sb = _batched_segmented_sort(codes, bits, total_seg_count, L)
    else:
        payloads = () if bits is None else (bits,)
        if plan is not None:
            wp = plan.window_plan(bits_to_sort, bits is not None)
        else:
            if _concrete_or_none(seg_offsets) is None:
                _warn_traced_offsets_once()
            wp = _window_dispatch(seg_offsets, total, total_seg_count,
                                  bits_to_sort=bits_to_sort,
                                  has_payload=bits is not None)
        res = _dispatch_random_lengths(
            wp, seg_offsets, codes, payloads, total, total_seg_count,
            bits_to_sort, has_payload=bits is not None)
        if res is not None:
            sc, ps = res
            sb = ps[0] if bits is not None else None
        else:
            sc, sb = _composite_segmented_sort(
                seg_offsets, codes, bits, total_seg_count, bits_to_sort
            )

    out_k = codec.decode_keys(sc, kt)
    if values is None:
        return out_k
    return out_k, codec.bits_to_payload(sb, values.dtype)


def split_sort_pairs_wide(
    seg_offsets: jnp.ndarray,
    keys: jnp.ndarray,
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    total_seg_count: int,
    total_seg_length: int | None = None,
    bits_to_sort: int = 32,
    strategy: str = "auto",
    plan: SegSortPlan | None = None,
):
    """Segmented pair sort with a 64-bit payload as two u32 planes.

    Covers the reference's ``SplitSortPairs<BITS, double>`` instantiation
    (SplitSort.cuh:702; payload V in {uint32_t, double}) without requiring
    the jax x64 flag: the two planes ride the same stable sort.  `plan`
    keeps the fast routes under jit (see split_sort_pairs).
    """
    if not (4 <= bits_to_sort <= 32):
        raise ValueError("bits_to_sort must be in [4, 32] (reference contract)")
    if strategy not in ("auto", "packed"):
        raise ValueError(f"unknown strategy {strategy!r}")
    kt = codec.key_type_of(keys)
    _check_bounded_bits(bits_to_sort, kt)
    codes = codec.encode_keys(keys)
    lo32 = lo.view(jnp.uint32)
    hi32 = hi.view(jnp.uint32)
    total = keys.shape[0] if total_seg_length is None else total_seg_length
    n = codes.shape[0]
    if plan is not None and (plan.seg_count != total_seg_count
                             or plan.total != total):
        raise ValueError(
            f"plan was built for (seg_count={plan.seg_count}, "
            f"total={plan.total}), this call has ({total_seg_count}, "
            f"{total})")

    if strategy == "packed":
        sc, (slo, shi) = _packed_bins_segmented_sort(
            seg_offsets, codes, (lo32, hi32), total_seg_count, total)
        return codec.decode_keys(sc, kt), slo.view(lo.dtype), shi.view(hi.dtype)
    if plan is not None:
        L = plan.fixed_length
    else:
        L = _fixed_length_of(seg_offsets, total, total_seg_count)
    if L is not None and L > 1:
        S = total_seg_count
        ops3 = (codes.reshape(S, L), lo32.reshape(S, L), hi32.reshape(S, L))
        if L >= xla_sort.map_rows_min(True):
            sc, slo, shi = xla_sort.map_rows_sort(ops3, False)
        else:
            sc, slo, shi = jax.lax.sort(ops3, num_keys=1, is_stable=True,
                                        dimension=1)
        sc, slo, shi = sc.reshape(-1), slo.reshape(-1), shi.reshape(-1)
    else:
        if plan is not None:
            wp = plan.window_plan(bits_to_sort, True)
        else:
            if _concrete_or_none(seg_offsets) is None:
                _warn_traced_offsets_once()
            wp = _window_dispatch(seg_offsets, total, total_seg_count,
                                  bits_to_sort=bits_to_sort,
                                  has_payload=True)
        res = _dispatch_random_lengths(
            wp, seg_offsets, codes, (lo32, hi32), total, total_seg_count,
            bits_to_sort, has_payload=True)
        if res is not None:
            sc, (slo, shi) = res
        else:
            sc, (slo, shi) = _composite_multi(
                seg_offsets, codes, (lo32, hi32), total_seg_count,
                bits_to_sort)
    return codec.decode_keys(sc, kt), slo.view(lo.dtype), shi.view(hi.dtype)


def split_sort_keys(
    seg_offsets: jnp.ndarray,
    keys: jnp.ndarray,
    total_seg_count: int,
    bits_to_sort: int = 32,
    strategy: str = "auto",
    plan: SegSortPlan | None = None,
):
    return split_sort_pairs(
        seg_offsets, keys, None, total_seg_count, None, bits_to_sort,
        strategy=strategy, plan=plan
    )


# ---------------------------------------------------------------------------
# Binning metadata (reference: SplitSortBinning.cuh — NextFitBinPacking,
# 14-bucket histogram, BinningScan).  On TPU these are dispatch metadata,
# computed host-side exactly like the reference's segInfo host readback.
# ---------------------------------------------------------------------------

# Reference bin upper bounds (SplitSort.cuh:740-930): 14 length classes.
BIN_BOUNDS = (32, 64, 128, 256, 512, 1024, 2048, 4096, 6144, 8192,
              16384, 32768, 65536, 131072)


def segment_lengths(seg_offsets, total_length: int) -> np.ndarray:
    """Lengths from the exclusive-prefix offsets array (host-side)."""
    offs = np.asarray(seg_offsets, dtype=np.int64)
    ends = np.append(offs[1:], np.int64(total_length))
    return (ends - offs).astype(np.int64)


def segment_length_histogram(lengths) -> dict:
    """14-bucket histogram + large-segment stats (SplitSortBinning.cuh:360-438).

    Returns {"counts": (14,), "gt_count": int, "gt_total_length": int} where
    counts[i] = segments with BIN_BOUNDS[i-1] < len <= BIN_BOUNDS[i].
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    gt = lengths > BIN_BOUNDS[-1]
    edges = np.array((0,) + BIN_BOUNDS, dtype=np.int64)
    idx = np.searchsorted(edges, lengths[~gt], side="left")  # 1..14 in-range
    counts = np.bincount(np.clip(idx, 1, len(BIN_BOUNDS)) - 1,
                         minlength=len(BIN_BOUNDS))
    return {
        "counts": counts.astype(np.int64),
        "gt_count": int(gt.sum()),
        "gt_total_length": int(lengths[gt].sum()),
    }


def next_fit_bin_packing(lengths, bin_capacity: int = 32):
    """Next-fit packing of <=capacity segments into capacity-sized bins.

    Reference: NextFitBinPacking packs runs of <=32-length segments into
    32-key bins so one warp sorts a whole bin (SplitSortBinning.cuh:360-438).
    Drives `_packed_bins_segmented_sort` (strategy="packed"): each bin is a
    contiguous element span gathered into one 32-wide sort row.  The default
    two-window path is this same packing at capacity L/2 with zero data
    movement (windows are fixed-capacity spans of whole segments), which is
    why AUTO routes windows (hardware comparison in benches/RESULTS.md).
    Returns (bin_id per segment, bin_count); segments longer than capacity
    get bin_id -1.
    """
    lengths = np.asarray(lengths, dtype=np.int64)
    bin_ids = np.full(lengths.shape, -1, dtype=np.int64)
    fill = bin_capacity + 1  # force a new bin on first packable segment
    b = -1
    for i, l in enumerate(lengths):
        if l > bin_capacity:
            continue
        if fill + l > bin_capacity:
            b += 1
            fill = 0
        bin_ids[i] = b
        fill += l
    return bin_ids, b + 1


class SplitSorter:
    """Object wrapper owning the temp-memory lifecycle (reference API shape)."""

    def __init__(self, total_seg_length: int, total_seg_count: int):
        self._handle = split_sort_allocate_temp_memory(
            total_seg_length, total_seg_count
        )
        self.total_seg_length = total_seg_length
        self.total_seg_count = total_seg_count

    def sort_pairs(self, seg_offsets, keys, values, bits_to_sort: int = 32,
                   strategy: str = "auto",
                   plan: SegSortPlan | None = None):
        return split_sort_pairs(
            seg_offsets,
            keys,
            values,
            self.total_seg_count,
            self.total_seg_length,
            bits_to_sort,
            strategy=strategy,
            plan=plan,
        )

    def sort_keys(self, seg_offsets, keys, bits_to_sort: int = 32,
                  strategy: str = "auto",
                  plan: SegSortPlan | None = None):
        return split_sort_keys(
            seg_offsets, keys, self.total_seg_count, bits_to_sort,
            strategy=strategy, plan=plan
        )

    def close(self):
        split_sort_free_temp_memory(self._handle)
        self._handle = None
