"""Rangesweep — exact-splitter range exchange over pre-sorted mapped chunks.

The flagship keys-only composition (VERDICT r3 missing #1): the ONE cost-model
candidate below XLA's 468 ms/2^28 that round 3 never ran.  Reference role:
OneSweep's DigitBinningPass (OneSweep.cu:164-344) — the engine that wins the
headline benchmark.

  1. pad to N = K*L and `lax.map` K flat XLA chunk sorts — each chunk stays
     VMEM-resident (13 ms per 2^24 on v5e; 16 x 2^24 = 208 ms at 2^28,
     benches/RESULTS.md), unlike the batched dimension=1 form (390 ms).
  2. EXACT balanced cuts: a 32-step value bisection over the K sorted chunks
     (k-way multisequence selection, vectorized over the K-1 boundaries;
     at K >= 64 the bisection runs hierarchically against a <=3K-row
     head-window slab per boundary — `_exact_cuts_hier` — keeping the
     cuts ~20 ms where the flat form pays ~K^2).
     Equal-value runs are split BY COUNT across adjacent buckets — legal for
     keys-only because equal u32 codes are interchangeable — so every bucket
     is exactly L elements for ANY distribution: no sampling slack, no
     overflow path, skew/entropy-proof by construction (contrast
     splitsweep's sampled splitters + overflow fallback).
  3. range exchange: each (chunk, bucket) range is CONTIGUOUS in its sorted
     chunk.  Whole 128-lane rows ride a sequential-grid HBM->HBM DMA
     relocate kernel — no per-element distribution work, so probe13's
     ~6 ms/2^24 bucketize floor does NOT apply.  The <=127-element row
     fringes at range edges (<= 254*K*K elements total, ~65K at K=16)
     live in exactly two source rows per range; one 2*K*K-row gather
     pulls those rows and ONE tiny batched sort (unique dense-position
     keys) packs each bucket's fringes densely — because
     bulk_rows*128 + fringe_count == L exactly, the slab is an exact
     row-aligned fill of the space after the bucket's packed bulk: one
     DMA per bucket, every output row written exactly once, no scatter
     and NO padding (round-4b lesson: padding a bucket to L + 2K*128
     de-power-of-two's phase 3 and XLA's bitonic sort pads it back up to
     2L — measured +160 ms, hw_rangesweep3_r4.log; round-4h lesson:
     searchsorted / small-row take_along_axis index machinery costs
     13-26 ms at these shapes in pipeline position, the batched sort
     ~0.3 ms — hw_prep_iso_r4.log).
  4. buckets are dense and exactly L elements: `lax.map` flat sorts again.

Placement order inside a bucket is irrelevant — step 4 re-sorts the bucket;
steps 2-3 only need to deliver the exact multiset, which they do.

The count-split of equal runs makes the KEYS form unstable-only; the
PAIRS form (`sort_pairs_rangesweep`, round 4j) restores exact stability
by riding a u32 original-index plane and sorting phases 1/3 by the
unique composite (code, index) — see its docstring for the proof sketch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .radix16 import LANES, _is_tpu

_SENTINEL = jnp.uint32(0xFFFFFFFF)


def _grid_sem():
    # block-disjoint programs: core-splittable on Megacore parts
    from ..core.config import grid_semantics, megacore_parallel

    return grid_semantics(megacore_parallel())


def _default_seg_elems() -> int:
    """Phase-1 chunk length: measured winner 2^21 on v5e with the
    hierarchical cuts (394.8 ms at 2^28 vs 412.5/441.4/417.8 at
    2^22/2^23/2^20 — hw_r5_campaign5.log Q rows; the r4 winner 2^23 was
    set by the old cuts' ~K^2 wall)."""
    from ..core.config import get_routing_parameters

    return get_routing_parameters().rangesweep_seg_elems


def _default_seg_elems_pairs(wide: bool = False) -> int:
    """Pairs phase-1 chunk length: 2^21 with the hierarchical cuts
    (1099.9 ms at 2^28 vs 1168.9 at 2^22 — hw_r5_campaign5.log S rows).
    wide=True returns the 4-plane (64-bit payload) seg (2^22, campaign-5
    T row)."""
    from ..core.config import get_routing_parameters

    r = get_routing_parameters()
    return (r.rangesweep_seg_elems_pairs_wide if wide
            else r.rangesweep_seg_elems_pairs)


def _default_seg_elems_index() -> int:
    """Argsort (2-plane) phase-1 chunk length: 2^21 with the
    hierarchical cuts (803.2 ms at 2^28 vs 845.6 at 2^22 —
    hw_r5_campaign5.log R rows)."""
    from ..core.config import get_routing_parameters

    return get_routing_parameters().rangesweep_seg_elems_index


def _exact_cuts(x2: jnp.ndarray, K: int, L: int,
                return_splitters: bool = False):
    """(K, K+1) per-chunk cut positions making bucket b exactly L elements.

    x2 is (K, L) (or any chunk-major reshape of it) with sorted u32
    chunks.  32-step bisection over the value space finds, per boundary
    b, the value v_b whose equal run straddles global rank (b+1)*L;
    counts below v_b come from per-chunk binary searches
    (jnp.searchsorted on sorted rows — K*(K-1) queries per step, not per
    element), and the run itself is split by count in chunk order.
    """
    x2 = x2.reshape(K, L)
    targets = jnp.arange(1, K, dtype=jnp.int32) * jnp.int32(L)  # (K-1,)

    def ranks(v, side):
        # (K, K-1): per-chunk insertion points of the K-1 candidates
        return jax.vmap(
            lambda row: jnp.searchsorted(row, v, side=side).astype(jnp.int32)
        )(x2)

    def step(t, v):
        bit = 31 - t
        vp = v | (jnp.uint32(1) << bit)
        below = jnp.sum(ranks(vp, "left"), axis=0)  # #elements < vp
        return jnp.where(below < targets, vp, v)

    # v_b = largest value with #{x < v_b} < target_b  (its equal run
    # contains the cut; #{x <= v_b} >= target_b)
    v = jax.lax.fori_loop(0, 32, step, jnp.zeros((K - 1,), jnp.uint32))
    c = ranks(v, "left")                             # (K, K-1) below-run
    e = ranks(v, "right") - c                        # run lengths
    deficit = targets - jnp.sum(c, axis=0)           # take from runs
    excl = jnp.cumsum(e, axis=0) - e                 # run mass before chunk
    take = jnp.clip(deficit[None, :] - excl, 0, e)
    cuts = c + take                                  # (K, K-1)
    zeros = jnp.zeros((K, 1), jnp.int32)
    full = jnp.full((K, 1), L, jnp.int32)
    bounds = jnp.concatenate([zeros, cuts, full], axis=1)  # (K, K+1)
    if return_splitters:
        return bounds, v
    return bounds


def _exact_cuts_hier(x2: jnp.ndarray, K: int, L: int,
                     heads: jnp.ndarray | None = None,
                     return_splitters: bool = False):
    """(K, K+1) cut positions, bit-identical to `_exact_cuts`, computed
    hierarchically so the cost stays flat as K grows.

    The flat bisection's cost explodes ~K^2 (32 value steps x K^2
    `searchsorted` probes against the full array: 8 ms at K=32 but
    156 ms at K=128 on v5e — benches/logs/hw_r5_campaign3.log H rows).
    This version never touches the big array beyond ONE 3K-row gather
    per boundary:

      1. row heads (every LANES-th element; a chunk row's minimum) get a
         provenance sort — one (N/128)-element 2-plane sort.  With the
         total order (value, chunk, position), the element of global
         rank b*L provably lies between the heads of head-rank m-K and
         m+K (m = b*l_rows): each head's element-rank is within 128*K
         of 128*(its head-rank).  Rank windows, not value windows, so
         duplicate-heavy inputs (all-equal keys) keep the bound.
      2. per boundary, the candidate rows are the 2K rank-window rows
         plus one straddle row per chunk (the row just before each
         chunk's window) — <= 3K rows, gathered into one slab.  Rows
         before the window are wholly below the target (count 128 each),
         rows after are wholly above (count 0).
      3. the 32-step value bisection runs against the slab only
         (base*128 + #slab-elements < v).  The fixed point equals the
         true v_b: below v_b the base rows under-count at most the
         equal run, and at v_b+1 every taken run element lives in
         base+window, so the slab count crosses the target exactly
         where the full count does.
      4. the equal-run split in chunk order uses window run counts; run
         elements in base rows are already (correctly) taken.
    """
    R = L // LANES
    KR = K * R
    if heads is None:
        heads = x2.reshape(K, R, LANES)[:, :, 0]
    ids = jax.lax.iota(jnp.uint32, KR)
    _, sid = jax.lax.sort((heads.reshape(-1), ids), num_keys=2)
    # rnk[i, r] = sorted position of chunk i's row r head (ascending in r)
    _, rnk_flat = jax.lax.sort((sid, ids), num_keys=2)
    rnk = rnk_flat.astype(jnp.int32).reshape(K, R)

    m = jnp.arange(1, K, dtype=jnp.int32) * jnp.int32(R)       # (K-1,)
    jlo = jnp.maximum(m - K, 0)
    jhi = jnp.minimum(m + K, KR)

    # a[i, b] = #heads of chunk i with sorted rank < jlo_b
    a = jax.vmap(lambda row: jnp.searchsorted(
        row, jlo, side="left").astype(jnp.int32))(rnk)          # (K, K-1)
    base = jnp.maximum(a - 1, 0)                                # full rows

    # slab row ids: 2K rank-window rows + K straddle rows per boundary
    t = jnp.arange(2 * K, dtype=jnp.int32)                      # (2K,)
    widx = jlo[:, None] + t[None, :]                            # (K-1, 2K)
    wvalid = widx < jhi[:, None]
    wid = jnp.take(sid, jnp.clip(widx, 0, KR - 1),
                   axis=0).astype(jnp.int32)                    # (K-1, 2K)
    sid_chunk = jnp.arange(K, dtype=jnp.int32)[None, :]         # (1, K)
    strad_id = sid_chunk * R + (a.T - 1)                        # (K-1, K)
    svalid = a.T >= 1
    row_ids = jnp.concatenate([wid, strad_id], axis=1)          # (K-1, 3K)
    valid = jnp.concatenate([wvalid, svalid], axis=1)
    chunk_of = jnp.where(valid, row_ids // R, -1)
    safe_ids = jnp.where(valid, row_ids, 0)

    slab = jnp.take(x2.reshape(KR, LANES), safe_ids.reshape(-1),
                    axis=0).reshape(K - 1, 3 * K, LANES)
    lane_valid = valid[:, :, None]                              # (K-1,3K,1)

    base_total = jnp.sum(base, axis=0)                          # (K-1,)
    targets = jnp.arange(1, K, dtype=jnp.int32) * jnp.int32(L)

    def step(s, v):
        bit = 31 - s
        vp = v | (jnp.uint32(1) << bit)
        w = jnp.sum(jnp.where(lane_valid & (slab < vp[:, None, None]), 1, 0),
                    axis=(1, 2))
        below = base_total * LANES + w
        return jnp.where(below < targets, vp, v)

    v = jax.lax.fori_loop(0, 32, step, jnp.zeros((K - 1,), jnp.uint32))

    # per-(boundary, chunk) window counts below / equal the splitter
    lt = jnp.sum(jnp.where(lane_valid & (slab < v[:, None, None]), 1, 0),
                 axis=2)                                        # (K-1, 3K)
    eq = jnp.sum(jnp.where(lane_valid & (slab == v[:, None, None]), 1, 0),
                 axis=2)
    oh = (chunk_of[:, :, None] ==
          jnp.arange(K, dtype=jnp.int32)[None, None, :])        # (K-1,3K,K)
    c_w = jnp.sum(jnp.where(oh, lt[:, :, None], 0), axis=1).T   # (K, K-1)
    e_w = jnp.sum(jnp.where(oh, eq[:, :, None], 0), axis=1).T
    c = base * LANES + c_w
    deficit = targets - jnp.sum(c, axis=0)
    excl = jnp.cumsum(e_w, axis=0) - e_w
    take = jnp.clip(deficit[None, :] - excl, 0, e_w)
    cuts = c + take
    zeros = jnp.zeros((K, 1), jnp.int32)
    full = jnp.full((K, 1), L, jnp.int32)
    bounds = jnp.concatenate([zeros, cuts, full], axis=1)
    if return_splitters:
        return bounds, v
    return bounds


# smallest K where the head-window cuts beat the flat bisection; the
# bisection cost grows ~K^2 (8 ms at K=32, 156 ms at K=128 — campaign-3 H
# rows) while hier stays ~flat.  MEASURED on v5e (hw_r5_campaign5 P rows,
# p1+cuts at 2^28): K=32 bisect 209.8 vs hier 220.6 — bisect keeps small
# K; K=64 hier 208.4 vs bisect 224.7; K=128 hier 198.5 vs bisect 332.3;
# K=256 hier 196.1 (bisect unmeasurable).  Hardware digests exact at
# uniform/dup/all-equal (P0 rows).
_CUTS_HIER_MIN_K: int | None = 64


def _cuts(x2: jnp.ndarray, K: int, L: int, method: str | None = None,
          heads: jnp.ndarray | None = None,
          return_splitters: bool = False):
    """Cut-computation dispatch: "bisect" = the flat value bisection
    (cheapest at small K), "hier" = the head-window scheme (flat in K),
    None = auto by K (`_CUTS_HIER_MIN_K`).  Both produce identical cuts
    (tests/test_rangesweep.py equality sweep).  return_splitters=True
    also returns the (K-1,) boundary values v (v[j] = the value of
    global rank (j+1)*L - 1, i.e. bucket j's LAST element) — free, both
    impls compute them."""
    if method is None:
        method = ("hier" if _CUTS_HIER_MIN_K is not None
                  and K >= _CUTS_HIER_MIN_K else "bisect")
    if method == "hier":
        return _exact_cuts_hier(x2, K, L, heads=heads,
                                return_splitters=return_splitters)
    if method != "bisect":
        raise ValueError(f"unknown cuts method {method!r}")
    return _exact_cuts(x2, K, L, return_splitters=return_splitters)


def _relocate_kernel(ctrl_ref, src_ref, fringe_ref, out_ref, sem, *,
                     K: int, l_rows: int, slab_rows: int,
                     interpret: bool):
    """One program per BUCKET: direct HBM->HBM range relocate.

    Program b copies its K source ranges (chunk i's rows
    [ctrl[b*K+i], +ctrl[2KK+b*K+i]) -> out rows [ctrl[KK+b*K+i], ...))
    plus the bucket's densely-packed fringe slab (exactly
    l_rows - ctrl[3KK+b] rows, because bulk*128 + fringes == L).

    Each dynamic-LENGTH range is binary-decomposed into conditional
    STATIC-size power-of-two copies: the DMA engine streams static-size
    copies at ~250 GB/s regardless of copy count or semaphore fan-out,
    while dynamic-size copies take a ~7x slower path (~37 GB/s) —
    benches/hw_dma_bw.py vs hw_rangesweep5/6 logs.  All copies are issued
    ASYNC on one counting semaphore, then drained with identical
    conditional structure.

    Writes are disjoint per program (exact packing) — core-splittable.
    """
    b = pl.program_id(0)
    KK = K * K
    n_bits = max(l_rows.bit_length(), 1)
    # the fringe copy is <= slab_rows rows by construction (bulk*128 +
    # fringes == L and fringes <= 254*K elems), so its decomposition must
    # not trace slices wider than the slab — at small K with large L,
    # l_rows-sized slices from the (K*slab_rows,) slab fail bounds checks
    fr_bits = max(min(l_rows, slab_rows).bit_length(), 1)

    def blocks(src, s0, d0, nr, act, n_bits=n_bits):
        # static-size power-of-two copies covering [0, nr) rows
        off = jnp.int32(0)
        for k in range(n_bits - 1, -1, -1):
            bit = (nr >> k) & 1

            @pl.when(bit == 1)
            def _(off=off, k=k):
                getattr(pltpu.make_async_copy(
                    src.at[pl.ds(s0 + off, 1 << k), :],
                    out_ref.at[pl.ds(d0 + off, 1 << k), :],
                    sem), act)()

            off = off + (bit << k)

    if interpret:
        # the interpreter cannot overlap; run each block synchronously
        def body(i, _):
            base = b * K + i
            blocks(src_ref, ctrl_ref[base], ctrl_ref[KK + base],
                   ctrl_ref[2 * KK + base], "start")
            blocks(src_ref, ctrl_ref[base], ctrl_ref[KK + base],
                   ctrl_ref[2 * KK + base], "wait")
            return 0

        jax.lax.fori_loop(0, K, body, 0)
        bulk_b = ctrl_ref[3 * KK + b]
        blocks(fringe_ref, b * slab_rows, b * l_rows + bulk_b,
               l_rows - bulk_b, "start", n_bits=fr_bits)
        blocks(fringe_ref, b * slab_rows, b * l_rows + bulk_b,
               l_rows - bulk_b, "wait", n_bits=fr_bits)
        return

    def sweep(act):
        def body(i, _):
            base = b * K + i
            blocks(src_ref, ctrl_ref[base], ctrl_ref[KK + base],
                   ctrl_ref[2 * KK + base], act)
            return 0

        jax.lax.fori_loop(0, K, body, 0)
        bulk_b = ctrl_ref[3 * KK + b]
        blocks(fringe_ref, b * slab_rows, b * l_rows + bulk_b,
               l_rows - bulk_b, act, n_bits=fr_bits)

    sweep("start")
    sweep("wait")


@functools.lru_cache(maxsize=16)
def _build_relocate(rows_out: int, K: int, l_rows: int,
                    slab_rows: int, interpret: bool):
    kern = functools.partial(_relocate_kernel, K=K, l_rows=l_rows,
                             slab_rows=slab_rows, interpret=interpret)

    def call(ctrl, src, fringe):
        return pl.pallas_call(
            kern,
            grid=(K,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((rows_out, LANES), jnp.int32),
            scratch_shapes=[
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 << 20, has_side_effects=True,
                # disjoint dst rows per program: core-splittable
                dimension_semantics=_grid_sem()),
            interpret=interpret,
        )(ctrl, src, fringe)

    return call


def _exchange_prep(planes: tuple, bounds: jnp.ndarray, K: int, L: int):
    """XLA-side preparation for the range exchange: the SMEM control
    table and the densely-packed per-bucket fringe slabs, computed once
    from the key-plane bounds and shared by every relocate core.

    Returns (ctrl, fringes, aux) where ctrl is the flat i32 control
    vector (a0 | dst | nr | bulk, output-major), fringes is one
    (K*slab_rows, LANES) u32 slab array per plane, and aux =
    (a0, nr_bi, bulk_rows_b) carries the row-map intermediates the
    "gather" probe arm rebuilds its index map from."""
    N = K * L
    rows_total = N // LANES
    l_rows = L // LANES
    # per-bucket fringe slab: fringe count <= 254*K elems < 2K rows
    slab_rows = 2 * K
    i_base = (jnp.arange(K, dtype=jnp.int32) * L)[:, None]    # (K,1)
    g_start = bounds[:, :-1] + i_base                          # (K,K) elems
    g_end = bounds[:, 1:] + i_base

    a0 = -(-g_start // LANES)                                  # ceil rows
    a1 = g_end // LANES                                        # floor rows
    nrows = jnp.maximum(a1 - a0, 0)                            # (i,b)

    # output-major (b, i) ordering
    nr_bi = nrows.T                                            # (b,i)
    bulk_rows_b = jnp.sum(nr_bi, axis=1)                       # (b,)
    dst_bi = (jnp.arange(K, dtype=jnp.int32) * l_rows)[:, None] + (
        jnp.cumsum(nr_bi, axis=1) - nr_bi)
    ctrl = jnp.concatenate(
        [a0.T.reshape(-1), dst_bi.reshape(-1), nr_bi.reshape(-1),
         bulk_rows_b])

    # fringes: the <=127-element ends of each range that the row relocate
    # skips.  Each range's fringes live in exactly TWO source rows (the
    # partial row before its bulk and the one after), so the ONLY touch
    # of the big array is a 2*K*K-row gather; everything after is
    # fixed-small-shape lane gathers.  (Round-4f lesson: a flat element
    # gather from the 1 GB array cost ~42 ms for 262K elements in
    # pipeline position — benches/logs/hw_rangesweep9_r4.log C vs D.)
    lo_end = jnp.minimum(a0 * LANES, g_end)
    front = lo_end - g_start                                   # (i,b)
    hi_start = jnp.maximum(a1 * LANES, lo_end)
    back = g_end - hi_start
    fr_bi = (front + back).T                                   # (b,i)
    foff_bi = jnp.cumsum(fr_bi, axis=1) - fr_bi                # excl, (b,i)

    row_f = jnp.clip(a0.T - 1, 0, rows_total - 1)              # (b,i)
    row_b = jnp.clip(a1.T, 0, rows_total - 1)
    pair_rows = jnp.stack([row_f, row_b], axis=-1).reshape(-1)  # (2KK,)
    pairs_pp = tuple(
        jnp.take(p.reshape(rows_total, LANES), pair_rows, axis=0).reshape(
            K, K, 2 * LANES)                                   # (b,i,256)
        for p in planes)

    # dense per-bucket slab by ONE tiny batched sort: every valid fringe
    # slot gets its UNIQUE dense position (foff[b,i] + within-piece rank)
    # as an i32 key, junk gets a big key, and an unstable 2-operand row
    # sort of (K, 2K*128) packs each bucket densely.  (Round-4h lesson:
    # searchsorted and small-row take_along_axis cost 13-26 ms at these
    # shapes in pipeline position — benches/logs/hw_prep_iso_r4.log —
    # while a 262K-pair batched sort is ~0.3 ms by the window-pass table.)
    s = jax.lax.broadcasted_iota(jnp.int32, (K, K, 2 * LANES), 2)
    front_bi3 = front.T[:, :, None]                            # (b,i,1)
    back_bi3 = back.T[:, :, None]
    g0_lane3 = (g_start.T % LANES)[:, :, None]
    jf = s - g0_lane3                                          # front rank
    jb = front_bi3 + (s - LANES)                               # back rank
    key = jnp.where(
        (s < LANES) & (jf >= 0) & (jf < front_bi3),
        foff_bi[:, :, None] + jf,
        jnp.where((s >= LANES) & (s - LANES < back_bi3),
                  foff_bi[:, :, None] + jb,
                  jnp.int32(2 * K * LANES)))                   # unique pos
    sorted_slab = jax.lax.sort(
        (key.reshape(K, slab_rows * LANES),)
        + tuple(p.reshape(K, slab_rows * LANES) for p in pairs_pp),
        dimension=1, num_keys=1)
    fringes = tuple(s.reshape(K * slab_rows, LANES)
                    for s in sorted_slab[1:])
    return ctrl, fringes, (a0, nr_bi, bulk_rows_b)


def _range_exchange(planes: tuple, bounds: jnp.ndarray, K: int, L: int,
                    interpret: bool,
                    method: str = "dma") -> tuple:
    """Move each (chunk i, bucket b) contiguous range into bucket b's
    dense L-element region, for every u32 plane in `planes` (1 for keys;
    3 for the pairs pipeline: codes + index + payload; 4 for 64-bit
    payloads: codes + index + lo + hi — the control plan is computed
    ONCE from the key bounds and reused per plane; the relocate kernel
    build is shape-cached so extra planes reuse the same compiled
    kernel).  The <=254-element range-edge fringes are
    gathered DENSELY into one slab per bucket (one small XLA gather);
    bulk*128 + fringes == L, so the slab is the exact row-aligned fill
    after the bucket's packed bulk rows.

    method="dma" (the MEASURED DEFAULT): the Pallas relocate — one
    program per bucket, direct HBM->HBM async copies, each dynamic-length
    range binary-decomposed into static-size power-of-two copies
    (hw_dma_bw.py: static-size DMA streams ~250 GB/s; dynamic-size copies
    take a ~7x slower path).  End-to-end 391.6 ms at 2^28 seg 2^21 with
    the hierarchical cuts (hw_r5_campaign9.log; 441.4 at the round-4
    seg 2^23) — the shipping configuration.

    method="gather" (probe/fallback, measured LOSER): ONE whole-array XLA
    row gather — fringe slabs appended below the source rows, a
    device-computed (rows,) map pulls every output row.  The isolated
    20.5 ms probe number (hw_rowgather_probe.py) was CONSTANT-index
    specialization; with real dynamic indices the gather runs
    ~1.2 Gelem/s and the end-to-end measured 630 ms at 2^28
    (hw_rangesweep7_r4.log, RESULTS.md r4e).  Kept as the
    structure-isolating probe arm, not a route.

    Accepts planes in any chunk-major shape (flat (N,) or
    (K, l_rows, LANES)); returns a tuple of (rows_total, LANES) u32
    arrays — K dense buckets of exactly L elements per plane, all planes
    moved by the identical plan.  Keeping the row-major 2-D shape at the
    phase boundaries lets the mapped phase-3 sorts consume the buckets
    without the hidden (K, L) relayout (campaign 12).
    """
    N = K * L
    rows_total = N // LANES
    l_rows = L // LANES
    slab_rows = 2 * K
    ctrl, fringes, (a0, nr_bi, bulk_rows_b) = _exchange_prep(
        planes, bounds, K, L)

    if method == "gather":
        # out row q of bucket b: bulk rows pull from chunk
        # i = max{i: cum[b,i] <= q} at a0[i,b] + (q - cum[b,i]); slab rows
        # (q >= bulk_rows_b) pull from the appended fringe slab
        cum = jnp.cumsum(nr_bi, axis=1) - nr_bi                # (b,i)
        q = jax.lax.broadcasted_iota(jnp.int32, (K, l_rows), 1)
        i_sel = jax.vmap(
            lambda cb, qb: jnp.searchsorted(
                cb, qb, side="right").astype(jnp.int32))(cum, q) - 1
        i_sel = jnp.clip(i_sel, 0, K - 1)
        pick = lambda m: jnp.take_along_axis(m, i_sel, axis=1)  # (b,l_rows)
        src_bulk = pick(a0.T) + (q - pick(cum))
        is_slab = q >= bulk_rows_b[:, None]
        slab_base = (rows_total
                     + slab_rows * jnp.arange(K, dtype=jnp.int32)[:, None]
                     - bulk_rows_b[:, None])
        g = jnp.where(is_slab, slab_base + q, src_bulk).reshape(-1)
        return tuple(
            jnp.take(jnp.concatenate(
                [p.reshape(rows_total, LANES), f], axis=0),
                g, axis=0)
            for p, f in zip(planes, fringes))

    reloc = _build_relocate(rows_total, K, l_rows, slab_rows, interpret)
    return tuple(
        reloc(ctrl, p.reshape(rows_total, LANES).view(jnp.int32),
              f.view(jnp.int32)).view(jnp.uint32)
        for p, f in zip(planes, fringes))


def sort_codes_rangesweep(codes: jnp.ndarray,
                          seg_elems: int | None = None,
                          interpret: bool | None = None,
                          method: str = "dma",
                          cuts: str | None = None,
                          entropy_skip: bool = True) -> jnp.ndarray:
    """Ascending keys-only sort of u32 codes via the range exchange.

    method: "dma" (measured default — the Pallas relocate kernel) or
    "gather" (the measured-loser probe arm); see `_range_exchange`.
    cuts: None (auto by K) / "bisect" / "hier" — see `_cuts`.

    entropy_skip: the duplication exploit (the reference's low-entropy
    speedup signature, README.md:25-27 / Tests.h:370-419).  Interior
    bucket b is provably CONSTANT whenever adjacent cut splitters are
    equal (v[b-1] == v[b]); a per-bucket `lax.cond` inside the phase-3
    map skips those sorts, gated behind one scalar cond requiring
    >= 90% of interior buckets flagged.  MEASURED (hw_r5_campaign7/9):
    a cond inside the mapped body costs ~+120 ms at 2^28 regardless of
    the branch taken (it breaks XLA's map pipelining), so the UNGATED
    per-bucket form loses at every entropy preset — but the OUTER
    scalar cond is free (E100 adaptive 391.6 vs 395.6 plain; E020
    404.7 vs 407.5) and near-constant inputs take the skipping branch
    and win 2.08x (all-equal 120.0 vs 249.2).  DEFAULT ON.  COST_SHEETS
    Sheet 5 Wall B has the analysis.  Keys only (equal codes are
    interchangeable; the pairs pipeline still owes an index sort).
    """
    if method not in ("gather", "dma"):
        raise ValueError(f"unknown method {method!r}")
    if interpret is None:
        interpret = not _is_tpu()
    n = codes.shape[0]
    L = seg_elems or _default_seg_elems()
    if L % LANES:
        raise ValueError(f"seg_elems must be a multiple of {LANES}, got {L}")
    if n <= L:
        # single chunk: one flat sort IS the algorithm
        from . import xla_sort

        return xla_sort.sort_all_keys_unstable((codes,))[0]
    K = -(-n // L)
    N = K * L
    x = codes
    if N != n:
        x = jnp.concatenate([x, jnp.full((N - n,), _SENTINEL, jnp.uint32)])

    from . import xla_sort

    l_rows = L // LANES

    # phase 1: mapped VMEM-resident chunk sorts (row heads ride out
    # fused — the hier cuts consume them without touching the big array).
    # Map bodies take/return (l_rows, LANES) chunk SHAPES and flatten
    # in-VMEM: the flat (K, L) form tiles its last two dims so chunks
    # interleave in memory, and every map boundary pays a hidden ~38 ms
    # HBM relayout per pass at 2^28 (campaign 12: D0 flat 177.9 ms vs
    # D4 2-D-body 139.5 ms per mapped pass; hw_r5_campaign12.log).
    def _p1(r2):
        s = xla_sort.sort_all_keys_unstable((r2.reshape(-1),))[0]
        s2 = s.reshape(l_rows, LANES)
        return s2, s2[:, 0]

    x2, heads = jax.lax.map(_p1, x.reshape(K, l_rows, LANES))
    # phase 2: exact cuts + range exchange (dense buckets)
    bounds, v = _cuts(x2, K, L, method=cuts, heads=heads,
                      return_splitters=True)
    (out,) = _range_exchange((x2,), bounds, K, L, interpret,
                             method=method)

    # phase 3: mapped dense-bucket sorts — the same shape as phase 1.
    # Interior bucket b is provably constant iff v[b-1] == v[b] (its
    # first element >= the left splitter, its last IS the right one);
    # edge buckets stay conservative (always sorted).
    def _sort_chunk(r2):
        return xla_sort.sort_all_keys_unstable(
            (r2.reshape(-1),))[0].reshape(l_rows, LANES)

    def _plain(o):
        return jax.lax.map(_sort_chunk, o.reshape(K, l_rows, LANES))

    if entropy_skip and K > 2:
        flags = jnp.zeros((K,), jnp.bool_).at[1:K - 1].set(v[:-1] == v[1:])

        def _skipping(o):
            def _p3(t):
                r2, f = t
                return jax.lax.cond(f, lambda rr: rr, _sort_chunk, r2)

            return jax.lax.map(_p3, (o.reshape(K, l_rows, LANES), flags))

        frac_hi = (jnp.sum(flags[1:K - 1].astype(jnp.int32))
                   >= jnp.int32(int(0.9 * (K - 2))))
        res = jax.lax.cond(frac_hi, _skipping, _plain, out)
    else:
        res = _plain(out)
    return res.reshape(-1)[:n]


def sort_pairs_rangesweep(codes: jnp.ndarray, bits: jnp.ndarray,
                          seg_elems: int | None = None,
                          interpret: bool | None = None,
                          method: str = "dma",
                          cuts: str | None = None):
    """STABLE (codes, payload-bits) pair sort via the range exchange;
    bit-exact with `jax.lax.sort((codes, bits), num_keys=1,
    is_stable=True)`.

    Keys-only rangesweep splits straddling equal-value runs BY COUNT,
    which is only legal when equal elements are interchangeable.  The
    pairs form makes every placement decision deterministic instead: a
    u32 original-index plane rides through the pipeline and phases 1/3
    sort by the UNIQUE composite (code, index) — `num_keys=2`, unstable,
    which equals the stable single-key sort by construction.  Bucket
    assignment is exact because the count-split takes each straddling
    run's elements in CHUNK order and, within a chunk, the run's prefix
    (phase-1 orders equal codes by ascending index): chunk order x
    in-chunk index order IS global index order, so every bucket receives
    precisely the elements of (code, index)-rank [b*L, (b+1)*L) and the
    phase-3 two-key sort reconstructs the exact stable permutation —
    entry order inside the exchanged bucket (bulk rows then fringe slab)
    never matters.  Pads carry sentinel codes AND the largest indices
    (iota over the padded length), so they sort strictly last even when
    real 0xFFFFFFFF keys collide with the sentinel.

    64-BIT PAYLOADS (u64 `bits`) ride as TWO u32 planes (lo, hi) through
    the identical pipeline — 4 planes total (codes, index, lo, hi), one
    exchange plan, the same (code, index) 2-key phase sorts (the payload
    planes are never compared).  Reference surface: SplitSort.cuh:702
    (double payloads); the reference's CUDA pair sorts move 64-bit
    payloads the same split-plane way.

    Reference role: the pair-sort headline of the OneSweep family
    (OneSweep.cu pairs dispatch; GPUSortBase.h payload surface) — here
    the win comes from the same VMEM-residency edge as the keys engine,
    which is LARGER for pairs because the flat oracle's 3-operand
    working set spills earlier (measured: benches/hw_pairs_probe.py,
    docs/COST_SHEETS.md Sheet 3 round-4j addendum).
    """
    if method not in ("gather", "dma"):
        raise ValueError(f"unknown method {method!r}")
    n = codes.shape[0]
    wide = bits.dtype == jnp.uint64
    L = seg_elems or _default_seg_elems_pairs(wide=wide)
    if n <= L:
        return jax.lax.sort((codes, bits), num_keys=1, is_stable=True)
    if wide:
        lo = (bits & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        hi = (bits >> jnp.uint64(32)).astype(jnp.uint32)
        k3, slo, shi = sort_pairs_rangesweep_planes(
            codes, (lo, hi), seg_elems=L, interpret=interpret,
            method=method, cuts=cuts)
        return k3, (slo.astype(jnp.uint64)
                    | (shi.astype(jnp.uint64) << jnp.uint64(32)))
    k3, sv = sort_pairs_rangesweep_planes(
        codes, (bits,), seg_elems=L, interpret=interpret, method=method,
        cuts=cuts)
    return k3, sv


def sort_pairs_rangesweep_planes(codes: jnp.ndarray, planes: tuple,
                                 seg_elems: int,
                                 interpret: bool | None = None,
                                 method: str = "dma",
                                 return_index: bool = False,
                                 cuts: str | None = None):
    """Plane-level core of `sort_pairs_rangesweep`: stable pair sort of
    u32 codes with 0..2 u32 payload planes moved by the same permutation
    (2 planes = a 64-bit payload's lo/hi — the direct entry for
    `ops.sort_pairs_wide`, which already holds split planes).  Returns
    (sorted_codes, *permuted_planes); bit-exact with the stable oracle
    moving each plane.

    return_index=True additionally returns the u32 original-index plane
    right after the codes — the STABLE ARGSORT permutation, obtained for
    free because the pipeline already rides it for determinism.  With
    planes=() this is the 2-plane argsort fast path: the reference
    argsort idiom is a pair sort whose payload IS the index
    (GPUSortBase.h CreateTestInput), so carrying a third plane would
    duplicate the index plane — measured 2-op mapped phases run 502/392
    -> the 3-op form pays ~28% more per phase (hw_r5_campaign1.log D)."""
    if interpret is None:
        interpret = not _is_tpu()
    n = codes.shape[0]
    L = seg_elems
    if L % LANES:
        raise ValueError(f"seg_elems must be a multiple of {LANES}, got {L}")
    if n <= L:
        idx0 = jax.lax.iota(jnp.uint32, n)
        out = jax.lax.sort((codes, idx0) + tuple(planes), num_keys=1,
                           is_stable=True)
        if return_index:
            return out
        return (out[0],) + out[2:]
    K = -(-n // L)
    N = K * L
    k = codes
    if N != n:
        k = jnp.concatenate([k, jnp.full((N - n,), _SENTINEL, jnp.uint32)])
        planes = tuple(
            jnp.concatenate([p, jnp.zeros((N - n,), jnp.uint32)])
            for p in planes)
    idx = jax.lax.iota(jnp.uint32, N)
    l_rows = L // LANES

    sort2 = lambda t: jax.lax.sort(t, num_keys=2, is_stable=False)

    def _sort_chunk(t):
        # (l_rows, LANES) plane chunks; flatten in-VMEM (campaign 12:
        # flat (K, L) map boundaries pay a hidden HBM relayout per pass)
        s = sort2(tuple(a.reshape(-1) for a in t))
        return tuple(a.reshape(l_rows, LANES) for a in s)

    # phase 1: mapped VMEM-resident (code, index, payload...) chunk sorts
    # (code-plane row heads ride out fused for the hier cuts)
    def _p1(t):
        s2 = _sort_chunk(t)
        return s2, s2[0][:, 0]

    p1, heads = jax.lax.map(
        _p1, tuple(p.reshape(K, l_rows, LANES)
                   for p in (k, idx) + tuple(planes)))
    # phase 2: exact cuts from the key plane; one plan moves all planes
    bounds = _cuts(p1[0], K, L, method=cuts, heads=heads)
    ex = _range_exchange(p1, bounds, K, L, interpret, method=method)
    # phase 3: mapped two-key bucket sorts reconstruct the stable order
    p3 = jax.lax.map(
        _sort_chunk, tuple(p.reshape(K, l_rows, LANES) for p in ex))
    tail = 1 if return_index else 2
    return (p3[0].reshape(-1)[:n],) + tuple(
        p.reshape(-1)[:n] for p in p3[tail:])


def argsort_rangesweep(codes: jnp.ndarray,
                       seg_elems: int | None = None,
                       interpret: bool | None = None,
                       method: str = "dma",
                       cuts: str | None = None):
    """Stable argsort of u32 codes via the 2-plane range exchange.

    Returns (sorted_codes, perm) with perm the u32 stable-ascending
    permutation — bit-exact with
    `jax.lax.sort((codes, iota), num_keys=1, is_stable=True)`.  This is
    `sort_pairs_rangesweep` with payload == index collapsed to TWO
    planes (the index plane the stable pipeline already rides IS the
    payload), dropping a full plane from both mapped phases and the
    exchange.  Reference role: the argsort idiom is a pair sort with an
    iota payload (GPUSortBase.h CreateTestInput; SortCommon.hlsl
    stability validator)."""
    L = seg_elems or _default_seg_elems_index()
    return sort_pairs_rangesweep_planes(
        codes, (), seg_elems=L, interpret=interpret, method=method,
        return_index=True, cuts=cuts)
