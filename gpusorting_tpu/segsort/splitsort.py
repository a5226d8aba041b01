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
from ..core.config import Backend
from ..ops import xla_sort


def _ceil_log2(x: int) -> int:
    return max(1, math.ceil(math.log2(max(2, x))))


def split_sort_allocate_temp_memory(total_seg_length: int, total_seg_count: int):
    """API-parity shim (reference: SplitSort.cuh:674-690). Returns a handle."""
    return {"total_seg_length": total_seg_length, "total_seg_count": total_seg_count}


def split_sort_free_temp_memory(handle) -> None:
    """API-parity shim (reference: SplitSort.cuh:692-697)."""
    del handle


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


def _batched_segmented_sort(codes, payload_bits, seg_count: int, L: int):
    """Fixed-length fast path: reshape to (S, L) and run one batched sort.

    Measured on v5e: XLA's batched minor-axis sort runs 13-30+ Gelem/s vs
    0.65 Gelem/s for the flat composite sort — a 20-50x win for binned
    segments (probes/PROBES.md).  This is the TPU-native analog of the
    reference's per-bin specialized kernels (SplitSort.cuh:751-930): the
    "bin" is the static row length, the batch axis replaces the grid.
    """
    k2 = codes.reshape(seg_count, L)
    if payload_bits is None:
        # keys-only: unstable == stable on bare codes, and 2x faster on TPU
        (sk,) = jax.lax.sort((k2,), num_keys=1, is_stable=False, dimension=1)
        return sk.reshape(-1), None
    v2 = payload_bits.reshape(seg_count, L)
    sk, sv = jax.lax.sort((k2, v2), num_keys=1, is_stable=True, dimension=1)
    return sk.reshape(-1), sv.reshape(-1)


# Random-length fast path: largest window the two-pass trick should use
# before falling back to the composite sort.  The batched minor-axis sort
# rate decays with L (probes/PROBES.md: 21 Gelem/s at L<=256 down to 4.2 G
# at L=4096); beyond this cap two window passes cost more than one
# composite sort.
_WINDOW_CAP = 4096


def _window_max_length(seg_offsets, total: int, seg_count: int):
    """Max segment length if the windowed path applies, else None.

    Host-side dispatch off the 14-bucket length histogram — the analog of
    the reference's segInfo readback + per-bin launch decision
    (SplitSort.cuh:654-668, SplitSortBinning.cuh:360-438).
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
    if hist["gt_count"] > 0:
        return None  # giant segments: whole-buffer composite (reference
        #             SplitSortLarge in-place path)
    ml = int(lens.max())
    if ml > _WINDOW_CAP // 2:
        return None
    return ml


def _window_pass(sid, codes, payloads, L: int, offset: int, n: int):
    """One stable batched row sort of (seg_id, code[, payloads...]) over
    L-wide windows starting at -offset (front-padded with sentinels)."""
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
    ops = (sid_p.reshape(rows, L), codes_p.reshape(rows, L)) + tuple(
        padf(p, jnp.uint32(0), jnp.uint32(0)).reshape(rows, L)
        for p in payloads)
    res = jax.lax.sort(ops, num_keys=2, is_stable=True, dimension=1)
    out = [r.reshape(-1)[pad_front:pad_front + n] for r in res]
    return out[0], out[1], tuple(out[2:])


def _windowed_segmented_sort(seg_offsets, codes, payloads, seg_count: int,
                             max_len: int):
    """Random-length segments via two overlapping window sorts.

    TPU-native replacement for the reference's 14 per-length-bin kernels
    (SplitSort.cuh:751-930): instead of gathering each length class, sort
    (seg_id, key) stably within L-wide windows twice, at offsets 0 and L/2,
    where L = 2*ceil_pow2(max_len).  Every segment of length <= L/2 lies
    wholly inside a window of one of the two grids, so it gets exactly
    sorted there; the other pass leaves already-sorted segments unchanged
    (stable sort of a sorted row is the identity).  No data movement, no
    per-class shapes — the whole dispatch is the window length, chosen from
    the host-side segment-length histogram exactly like the reference's
    segInfo readback (SplitSort.cuh:654-668).
    """
    n = codes.shape[0]
    L = max(128, 1 << (max(1, max_len - 1)).bit_length() + 1)
    sid = xla_sort.segment_ids_from_offsets(seg_offsets, n).astype(jnp.int32)
    sid1, c1, p1 = _window_pass(sid, codes, payloads, L, 0, n)
    _, c2, p2 = _window_pass(sid1, c1, p1, L, L // 2, n)
    return c2, p2


def _composite_segmented_sort(
    seg_offsets: jnp.ndarray,
    codes: jnp.ndarray,
    payload_bits: jnp.ndarray | None,
    seg_count: int,
    bits_to_sort: int,
):
    """Whole-buffer composite (segId || key) sort.

    Semantics of SplitSortLarge.cuh:1198-1289: sort the concatenation of all
    segments by the composite (segment id, bounded key); stability gives
    correct in-segment payload order.  Here the composite is carried as a
    two-key stable sort, which the radix engine lowers to
    ceil((segIdBits + bits_to_sort)/8) passes.
    """
    n = codes.shape[0]
    seg_ids = xla_sort.segment_ids_from_offsets(seg_offsets, n)
    seg_bits = _ceil_log2(seg_count) + 1
    if seg_bits + bits_to_sort <= 32:
        # single fused u32 composite — fewest radix passes
        comp = (seg_ids << jnp.uint32(bits_to_sort)) | codes
        if payload_bits is None:
            # equal comp implies equal codes: unstable == stable here
            _, sc = jax.lax.sort((comp, codes), num_keys=2, is_stable=False)
            return sc, None
        _, sc, sb = jax.lax.sort(
            (comp, codes, payload_bits), num_keys=1, is_stable=True
        )
        return sc, sb
    if payload_bits is None:
        _, sc = jax.lax.sort((seg_ids, codes), num_keys=2, is_stable=False)
        return sc, None
    _, sc, sb = jax.lax.sort(
        (seg_ids, codes, payload_bits), num_keys=2, is_stable=True
    )
    return sc, sb


def split_sort_pairs(
    seg_offsets: jnp.ndarray,
    keys: jnp.ndarray,
    values: jnp.ndarray | None,
    total_seg_count: int,
    total_seg_length: int | None = None,
    bits_to_sort: int = 32,
    backend: Backend = Backend.AUTO,
):
    """Sort each segment independently; stable within segments.

    Reference: SplitSortPairs<BITS_TO_SORT, V> (SplitSort.cuh:702-934).
    `values=None` gives the keys-only form.
    """
    if not (4 <= bits_to_sort <= 32):
        raise ValueError("bits_to_sort must be in [4, 32] (reference contract)")
    kt = codec.key_type_of(keys)
    codes = codec.encode_keys(keys)
    bits = None if values is None else codec.payload_to_bits(values)

    total = keys.shape[0] if total_seg_length is None else total_seg_length
    L = _fixed_length_of(seg_offsets, total, total_seg_count)
    if L is not None and L > 1:
        sc, sb = _batched_segmented_sort(codes, bits, total_seg_count, L)
    else:
        ml = _window_max_length(seg_offsets, total, total_seg_count)
        if ml is not None:
            payloads = () if bits is None else (bits,)
            sc, ps = _windowed_segmented_sort(
                seg_offsets, codes, payloads, total_seg_count, ml)
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
):
    """Segmented pair sort with a 64-bit payload as two u32 planes.

    Covers the reference's ``SplitSortPairs<BITS, double>`` instantiation
    (SplitSort.cuh:702; payload V in {uint32_t, double}) without requiring
    the jax x64 flag: the two planes ride the same stable sort.
    """
    if not (4 <= bits_to_sort <= 32):
        raise ValueError("bits_to_sort must be in [4, 32] (reference contract)")
    kt = codec.key_type_of(keys)
    codes = codec.encode_keys(keys)
    lo32 = lo.view(jnp.uint32)
    hi32 = hi.view(jnp.uint32)
    total = keys.shape[0] if total_seg_length is None else total_seg_length
    n = codes.shape[0]

    L = _fixed_length_of(seg_offsets, total, total_seg_count)
    ml = (None if L is not None
          else _window_max_length(seg_offsets, total, total_seg_count))
    if L is not None and L > 1:
        S = total_seg_count
        sc, slo, shi = jax.lax.sort(
            (codes.reshape(S, L), lo32.reshape(S, L), hi32.reshape(S, L)),
            num_keys=1, is_stable=True, dimension=1)
        sc, slo, shi = sc.reshape(-1), slo.reshape(-1), shi.reshape(-1)
    elif ml is not None:
        sc, (slo, shi) = _windowed_segmented_sort(
            seg_offsets, codes, (lo32, hi32), total_seg_count, ml)
    else:
        seg_ids = xla_sort.segment_ids_from_offsets(seg_offsets, n)
        seg_bits = _ceil_log2(total_seg_count) + 1
        if seg_bits + bits_to_sort <= 32:
            comp = (seg_ids << jnp.uint32(bits_to_sort)) | codes
            _, sc, slo, shi = jax.lax.sort(
                (comp, codes, lo32, hi32), num_keys=1, is_stable=True)
        else:
            _, sc, slo, shi = jax.lax.sort(
                (seg_ids, codes, lo32, hi32), num_keys=2, is_stable=True)
    return codec.decode_keys(sc, kt), slo.view(lo.dtype), shi.view(hi.dtype)


def split_sort_keys(
    seg_offsets: jnp.ndarray,
    keys: jnp.ndarray,
    total_seg_count: int,
    bits_to_sort: int = 32,
    backend: Backend = Backend.AUTO,
):
    return split_sort_pairs(
        seg_offsets, keys, None, total_seg_count, None, bits_to_sort, backend
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
    On TPU the two-window execution path makes packing UNNECESSARY for
    correctness or speed (segments are sorted in place; no gather into
    bins), so this is informational metadata: it reports how tightly the
    reference's warp-bin strategy would have packed the workload.
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

    def sort_pairs(self, seg_offsets, keys, values, bits_to_sort: int = 32):
        return split_sort_pairs(
            seg_offsets,
            keys,
            values,
            self.total_seg_count,
            self.total_seg_length,
            bits_to_sort,
        )

    def sort_keys(self, seg_offsets, keys, bits_to_sort: int = 32):
        return split_sort_keys(
            seg_offsets, keys, self.total_seg_count, bits_to_sort
        )

    def close(self):
        split_sort_free_temp_memory(self._handle)
        self._handle = None
