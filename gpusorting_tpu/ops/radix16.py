"""Native LSD radix-16 sort engine — the TPU OneSweep equivalent.

Eight 4-bit passes over u32 codes; each pass is ONE fused Pallas kernel per
tile (sequential grid) that plays the role of the reference's
DigitBinningPass (OneSweep.cu:164-344), with TPU mechanisms replacing every
GPU one (SURVEY.md §2.7):

  reference                         here
  ---------                         ----
  atomic tile index + lookback      sequential grid + per-stream carries
  WLMS ballot ranking               within-row bitonic pack by (digit,lane)
  warp-hist scan                    per-row start tables + row-prefix rolls
  shared-memory pre-scatter         per-bucket phase rotation (lane gather)
  coalesced device scatter          banded placement matmuls (MXU int8) +
                                    16 per-stream row-aligned DMA writers

Pairs ride as a second operand through the same pack/rotate/place machinery
(the pass is stable: within-row order is lane order, rows accumulate in row
order, tiles in grid order — so payloads land exactly as a stable sort
moves them).  Global digit bases come from ops.kernels.global_histogram
(4-bit histograms are free marginals of the 8-bit joints) + exclusive scans.

Stream-boundary correctness: each digit stream d owns output elements
[base_d, base_{d+1}); rows wholly inside a stream are DMA'd full as the
stream's cursor crosses them (lanes owned by earlier streams are written as
zeros then repaired); every PARTIAL row lives in the stream's carry until the
final flush, which read-modify-OR-writes each carry into place.  Every output
row's end boundary is crossed by exactly one stream, so every row is
eventually full-written and flush reads are always defined; pre-flush full
writes only zero-fill foreign lanes, and flushes run last, sequentially.

Sentinel padding: n pads to a tile multiple with 0xFFFFFFFF keys, which have
digit 15 in every position and therefore stay glued to the tail through all
passes; the final slice drops them (pair sentinels carry payload 0).

This engine is exact and skew-independent but VPU-bound (the within-row
bitonic pack + 16 rotations — docs/ROADMAP_perf.md has the cost sheet), so
it currently trails the XLA path; it exists to complete the native radix
pipeline end-to-end and as the optimization substrate for round 2.

Interpret mode (CPU): dynamic-size DMA slices are not expressible under the
Pallas interpreter, so the 16-stream writer falls back to a bounded
`fori_loop` of single-row copies (static size 1, dynamic start) — identical
output, used by CI.

Restartable carries (the EmulatedDeadlocking analog): every pass can be
executed as a chain of tile-range segments.  Each segment flushes its
partial stream rows (RMW-OR) and reports its final cursors; the next segment
re-absorbs those partial rows from the output buffer (input/output aliasing)
and continues.  This proves the pass depends ONLY on the documented
sequential-carry contract — the TPU-native counterpart of the reference's
skip-tiles-then-revisit deadlock emulation (EmulatedDeadlocking.hlsl:15-247):
there, tiles execute out of order and the lookback fallback restores
progress; here, in-order execution is a hardware guarantee, and the hazard
class that remains (a grid split across kernel invocations or cores) is
exercised by the segmented run, which must be bit-exact with the fused one.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import kernels as _kernels

LANES = 128
NBUCKETS = 16
_BLK = 128          # source rows per placement block (A/B'd: 32-row blocks
                    # run 25% slower — small placement matmuls waste the MXU)
# band must cover _BLK+2 rows AND be a multiple of 8: dynamic VMEM slices of
# non-sublane-multiple HEIGHT relayout catastrophically (measured 2.45 ms vs
# ~0 per pass at 2^22 — the whole engine overhead was this)
_BAND = 144


def _within_row_sort_schedule():
    """(j, k) stages of a 128-wide bitonic network; final level ascending
    everywhere (k sentinel bit above any real row index)."""
    sched = []
    k = 2
    while k <= LANES:
        j = k // 2
        while j >= 1:
            kk = k if k < LANES else (1 << 30)
            sched.append((j, kk))
            j //= 2
        k *= 2
    return np.array(sched, np.int32)


def _pack_rows(sched_ref, xin, shift, tile_rows: int, sp=None):
    """Sort each 128-lane row by (4-bit digit, lane): bitonic on packed i32.

    Returns (xs, dsort): the operands with rows digit-grouped (stably) and
    the per-lane sorted digits.  Shared by the fused (OneSweep-like) and the
    3-phase (DeviceRadixSort) engines.  When `sp` (the row-sorted packed
    array, produced OUTSIDE the kernel by XLA's batched minor-axis sort) is
    given, the in-kernel network is skipped and only the permutation apply
    (one lane-gather per operand) runs here.
    """
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 1)
    if sp is None:
        digit = jax.lax.shift_right_logical(xin[0], shift) & 15
        packed = (digit << 7) | lane

        def stage(s, y):
            j = sched_ref[s, 0]
            k = sched_ref[s, 1]
            idx = lane ^ j
            peer = jnp.take_along_axis(y, idx, axis=1)
            want_min = ((lane & j) != 0) == ((lane & k) != 0)
            take_self = (y < peer) == want_min
            return jnp.where(take_self, y, peer)

        packed = jax.lax.fori_loop(0, sched_ref.shape[0], stage, packed)
    else:
        packed = sp
    src = packed & 127
    dsort = packed >> 7
    xs = tuple(jnp.take_along_axis(x, src, axis=1) for x in xin)
    return xs, dsort


def _rowsort_packed(x2d, shift):
    """XLA batched row sort of (digit<<7 | lane) — the out-of-kernel half of
    the pack (see _XLA_ROWSORT)."""
    lane = jax.lax.broadcasted_iota(jnp.int32, x2d.shape, 1)
    digit = jax.lax.shift_right_logical(x2d, shift) & 15
    packed = (digit << 7) | lane
    return jax.lax.sort((packed,), num_keys=1, is_stable=False,
                        dimension=1)[0]


def _run_tables(dsort, tile_rows: int):
    """(R,16) run-start / count / row-prefix tables + (1,16) tile counts."""
    row1 = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, 1), 0)
    starts = []
    for d in range(NBUCKETS + 1):
        if d == 0:
            starts.append(jnp.zeros((tile_rows, 1), jnp.int32))
        elif d == NBUCKETS:
            starts.append(jnp.full((tile_rows, 1), LANES, jnp.int32))
        else:
            starts.append(
                jnp.sum(dsort < d, axis=1, keepdims=True).astype(jnp.int32))
    rowstart = jnp.concatenate(starts[:NBUCKETS], axis=1)       # (R,16)
    cnt = jnp.concatenate(
        [starts[d + 1] - starts[d] for d in range(NBUCKETS)], axis=1)

    rp = cnt
    s = 1
    while s < tile_rows:
        rp = rp + jnp.where(row1 >= s, pltpu.roll(rp, s, axis=0), 0)
        s *= 2
    rowpref = rp - cnt                                          # (R,16)
    tilecnt = rp[tile_rows - 1:tile_rows, :]                    # (1,16)
    return rowstart, cnt, rowpref, tilecnt


import os as _os

# Hardware ablation at 2^24 uniform (v5e, round 2): baseline 108 ms;
# XLA rowsort 104 ms (keep); per-(block,bucket) pl.when skip 149 ms — the
# branches de-pipeline the placement loop, so occupancy skipping must be
# gated at tile granularity, not block (see _place_bucket); the SMEM
# high-water accumulator discipline blew up compile time (>15 min) — bulk
# zeroing stays.  f32x f32 dot_general crashes this Mosaic at runtime.
_SKIP_EMPTY = _os.environ.get("GST_RADIX16_SKIP_EMPTY", "0") == "1"
_F32_PLANES = _os.environ.get("GST_RADIX16_F32_PLANES", "0") == "1"
_TOPS_DISCIPLINE = _os.environ.get("GST_RADIX16_TOPS", "0") == "1"
# Within-row digit grouping strategy: XLA's batched minor-axis sort of the
# packed (digit<<7 | lane) rows measured 0.67 ms/2^24 vs 1.8 ms for the
# in-kernel bitonic-28 (probes/probe12_rowsort.py); the permutation is
# APPLIED in-kernel (lane-gather at 289 Gelem/s) because XLA's own
# take_along_axis runs at 0.11 Gelem/s on this part.
_XLA_ROWSORT = _os.environ.get("GST_RADIX16_XLA_ROWSORT", "1") == "1"
# Fuse each part's four byte planes into ONE width-512 matmul: the per-sort
# matmul count at 2^24 drops from ~32K tiny dispatches to ~8K.
_WIDE_MM = _os.environ.get("GST_RADIX16_WIDE_MM", "0") == "1"
# Tile-granular occupancy skip: gate each bucket's whole placement body on
# tilecnt[0,d] > 0 (16 branches/tile).  Coarser than the rejected
# per-(block,bucket) pl.when (256+ branches, +41 ms); empty buckets are
# exact no-ops on all carried state, so skewed digit distributions speed up
# (the reference family's entropy curve, README.md:25-27).
_TILE_SKIP = _os.environ.get("GST_RADIX16_TILE_SKIP", "1") == "1"


def _place_bucket(d, cur, accs, tops, xs, rowstart, cnt, rowpref,
                  num_ops: int, tile_rows: int):
    """Rotate bucket d's runs to their output phase and place them into
    accs[*][d] (rows relative to cur>>7) via banded f32 16-bit-plane matmuls.

    The accumulator is NEVER bulk-zeroed: the per-bucket high-water mark
    (tops) makes each band write an assign above the mark and an accumulate
    below it, so stale rows from earlier tiles are overwritten exactly when
    first touched (bulk zeroing cost ~20 writes/element/tile).  Blocks with
    no elements of this bucket are skipped entirely, making the work
    proportional to bucket occupancy — skewed / low-entropy digit
    distributions get FASTER (reference entropy family, README.md:25-27).
    """
    nblk = tile_rows // _BLK
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 1)
    band_iota = jax.lax.broadcasted_iota(jnp.int32, (_BLK, _BAND), 1)
    band_row = jax.lax.broadcasted_iota(jnp.int32, (_BAND, 1), 0)
    lane_blk = jax.lax.broadcasted_iota(jnp.int32, (_BLK, LANES), 1)

    cur_row = cur >> 7
    rs_d = rowstart[:, d:d + 1]
    T = cur + rowpref[:, d:d + 1] - rs_d                     # (R,1)
    k_idx = (lane - T) & (LANES - 1)
    valid_all = (k_idx >= rs_d) & (k_idx < rs_d + cnt[:, d:d + 1])
    # run geometry from the (R,1) tables — NO elementwise reductions:
    # the run starts at absolute element T+rowstart, i.e. acc row w0 and
    # lane phase phi; non-wrapped (lo) elements sit at lanes >= phi
    run_abs = T + rs_d                                       # (R,1)
    w0_row = (run_abs >> 7) - cur_row
    phi = run_abs & (LANES - 1)
    has_row = cnt[:, d:d + 1] > 0
    big = jnp.int32(1 << 20)
    w0_or_big = jnp.where(has_row, w0_row, big)

    def body(b, sl, blk_min):
        blk_base = jnp.minimum(blk_min, jnp.int32(tile_rows))
        idx = k_idx[sl]
        xr = tuple(jnp.take_along_axis(x[sl], idx, axis=1)
                   for x in xs)
        vb = valid_all[sl]
        srel = jnp.where(has_row[sl], w0_row[sl] - blk_base, -1)
        is_lo = lane_blk >= phi[sl]
        if _TOPS_DISCIPLINE:
            top = tops[d]
            keep = band_row < (top - blk_base)               # (BAND,1)
        for o, acc in enumerate(accs):
            xv = jnp.where(vb, xr[o], 0)
            xlo = jnp.where(is_lo, xv, 0)
            xhi = xv - xlo
            out = jnp.zeros((_BAND, LANES), jnp.int32)
            if _F32_PLANES:
                s_lo = (srel == band_iota).astype(jnp.float32)
                s_hi = (srel + 1 == band_iota).astype(jnp.float32)
                for part_x, smat in ((xlo, s_lo), (xhi, s_hi)):
                    # two 16-bit planes, exact in f32: each output cell
                    # receives at most ONE element (lane-disjoint runs), so
                    # sums are single products 0/1 * [0,2^16) — exact, and
                    # the plane recombine is an OR
                    p_lo = (part_x & 0xFFFF).astype(jnp.float32)
                    p_hi = jax.lax.shift_right_logical(
                        part_x, 16).astype(jnp.float32)
                    r_lo = jax.lax.dot_general(
                        smat, p_lo, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    r_hi = jax.lax.dot_general(
                        smat, p_hi, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                    out = out + (r_lo.astype(jnp.int32)
                                 | (r_hi.astype(jnp.int32) << 16))
            elif _WIDE_MM:
                s_lo = (srel == band_iota).astype(jnp.bfloat16)
                s_hi = (srel + 1 == band_iota).astype(jnp.bfloat16)
                for part_x, smat in ((xlo, s_lo), (xhi, s_hi)):
                    mat = jnp.concatenate(
                        [((part_x >> (8 * kk)) & 255).astype(jnp.bfloat16)
                         for kk in range(4)], axis=1)          # (BLK, 512)
                    r = jax.lax.dot_general(
                        smat, mat, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)    # (BAND, 512)
                    ri = r.astype(jnp.int32)
                    for kk in range(4):
                        out = out + (
                            ri[:, kk * LANES:(kk + 1) * LANES] << (8 * kk))
            else:
                s_lo = (srel == band_iota).astype(jnp.bfloat16)
                s_hi = (srel + 1 == band_iota).astype(jnp.bfloat16)
                for part_x, smat in ((xlo, s_lo), (xhi, s_hi)):
                    for kk in range(4):
                        mat = ((part_x >> (8 * kk)) & 255).astype(
                            jnp.bfloat16)
                        r = jax.lax.dot_general(
                            smat, mat, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        out = out + (r.astype(jnp.int32) << (8 * kk))
            prev = acc[d, pl.ds(blk_base, _BAND), :]
            if _TOPS_DISCIPLINE:
                acc[d, pl.ds(blk_base, _BAND), :] = jnp.where(
                    keep, prev + out, out)
            else:
                acc[d, pl.ds(blk_base, _BAND), :] = prev + out
        if _TOPS_DISCIPLINE:
            tops[d] = blk_base + _BAND

    for b in range(nblk):
        sl = slice(b * _BLK, (b + 1) * _BLK)
        blk_min = jnp.min(w0_or_big[sl])
        if _SKIP_EMPTY:
            @pl.when(blk_min < big)
            def _(b=b, sl=sl, blk_min=blk_min):
                body(b, sl, blk_min)
        else:
            body(b, sl, blk_min)


def _binning_kernel(sched_ref, ctrl_ref, *refs, tile_rows: int,
                    num_ops: int, interpret: bool, resume: bool,
                    do_flush: bool, use_sp: bool = _XLA_ROWSORT,
                    flush_write: bool = False):
    """One LSD radix-16 pass over a range of tiles.

    refs: num_ops input refs, [when resume: num_ops prev-output ANY refs +
    one carry_in (num_ops*16, 128) VMEM ref], then outputs: num_ops HBM data
    refs, cursors_out (16,) SMEM, carry_out (num_ops*16, 128); then scratch:
    carry rows, cursors (16,) SMEM, num_ops accumulators
    (16, tile_rows+BAND, 128), one DMA semaphore.

    ctrl_ref[0:16] holds the starting cursors (the digit bases for a fresh
    pass, or the previous segment's cursors_out for a resumed one) and
    ctrl_ref[16] the pass's digit shift — runtime values so ONE compiled
    kernel serves all 8 passes.  The RMW flush of partial stream rows runs
    only when `do_flush` (the final segment); intermediate segments hand
    their carry state to the next segment via (cursors_out, carry_out)
    instead — the same state evolution as the fused grid, so segmented runs
    are bit-exact by construction.
    """
    sp_ref = refs[0] if use_sp else None
    refs = refs[1:] if use_sp else refs
    in_refs = refs[:num_ops]
    pos = num_ops
    prev_refs = refs[pos:pos + num_ops] if resume else ()
    pos += num_ops if resume else 0
    carry_in = refs[pos] if resume else None
    pos += 1 if resume else 0
    out_refs = refs[pos:pos + num_ops]
    cursors_out = refs[pos + num_ops]
    carry_out = refs[pos + num_ops + 1]
    scratch = refs[pos + num_ops + 2:]
    carry_rows = scratch[0]
    cursors = scratch[1]
    tops = scratch[2]
    accs = scratch[3:3 + num_ops]
    sem = scratch[3 + num_ops]

    t = pl.program_id(0)
    nblk = tile_rows // _BLK
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 1)
    row1 = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, 1), 0)

    @pl.when(t == 0)
    def _():
        for d in range(NBUCKETS):
            cursors[d] = ctrl_ref[d]
        if not resume:
            carry_rows[:] = jnp.zeros_like(carry_rows)
        else:
            carry_rows[:] = carry_in[:]
            if interpret:
                # the interpreter does not alias buffers: copy the previous
                # segment's output forward (on TPU input_output_aliases makes
                # out_refs literally the previous buffers)
                for o in range(num_ops):
                    cp = pltpu.make_async_copy(prev_refs[o], out_refs[o], sem)
                    cp.start()
                    cp.wait()

    xin = tuple(r[:] for r in in_refs)

    # --- 1. within-row pack by (digit, lane) ---
    xs, dsort = _pack_rows(sched_ref, xin, ctrl_ref[NBUCKETS], tile_rows,
                           sp=sp_ref[:] if use_sp else None)

    # --- 2. per-row run starts + per-tile row prefixes per digit ---
    rowstart, cnt, rowpref, tilecnt = _run_tables(dsort, tile_rows)

    if not _TOPS_DISCIPLINE:
        for acc in accs:
            acc[:] = jnp.zeros_like(acc)

    # --- 3. per bucket: rotate, place, stream out ---
    def place_bucket_d(d):
        cur = cursors[d]                                         # elements
        cur_row = cur >> 7
        for o, acc in enumerate(accs):
            acc[d, 0:1, :] = carry_rows[o * NBUCKETS + d:
                                        o * NBUCKETS + d + 1, :]
        tops[d] = jnp.int32(1)
        _place_bucket(d, cur, accs, tops, xs, rowstart, cnt, rowpref,
                      num_ops, tile_rows)

        new_cur = cur + tilecnt[0, d]
        full_rows = (new_cur >> 7) - cur_row

        @pl.when(full_rows > 0)
        def _(d=d, full_rows=full_rows, cur_row=cur_row):
            if interpret:
                # the interpreter cannot express dynamic-SIZE slices; stream
                # row by row (static size 1, dynamic start) instead
                def row_copy(i, _):
                    for o in range(num_ops):
                        cp = pltpu.make_async_copy(
                            accs[o].at[d, pl.ds(i, 1), :],
                            out_refs[o].at[pl.ds(cur_row + i, 1), :], sem)
                        cp.start()
                        cp.wait()
                    return 0

                jax.lax.fori_loop(0, full_rows, row_copy, 0)
            else:
                for o in range(num_ops):
                    cp = pltpu.make_async_copy(
                        accs[o].at[d, pl.ds(0, full_rows), :],
                        out_refs[o].at[pl.ds(cur_row, full_rows), :], sem)
                    cp.start()
                    cp.wait()

        rem = new_cur & (LANES - 1)
        keep = jax.lax.broadcasted_iota(jnp.int32, (1, LANES), 1) < rem
        for o, acc in enumerate(accs):
            tail = acc[d, pl.ds(full_rows, 1), :]
            carry_rows[o * NBUCKETS + d:o * NBUCKETS + d + 1, :] = (
                jnp.where(keep, tail, 0))
        cursors[d] = new_cur

    for d in range(NBUCKETS):
        if _TILE_SKIP:
            # tile-granular occupancy gate (VERDICT r2 #6): a bucket with
            # no elements in THIS TILE is a no-op on all carried state
            # (cursor unchanged, carry row reloaded==stored, no DMA), so
            # the whole placement body is skippable.  16 branches per
            # tile, each gating ~1/16 of the tile's placement work —
            # unlike the rejected per-(block,bucket) pl.when (256+ tiny
            # branches de-pipelined the loop, +41 ms).  Skewed /
            # low-entropy digit distributions get FASTER (the reference
            # family's signature entropy curve, README.md:25-27).
            @pl.when(tilecnt[0, d] > 0)
            def _(d=d):
                place_bucket_d(d)
        else:
            place_bucket_d(d)

    # --- 4. at the segment's last tile: export carry state; on the FINAL
    # segment also RMW-OR each stream's partial row into place ---
    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        carry_out[:] = carry_rows[:]

        def flush(d, _):
            rw = cursors[d] >> 7
            cursors_out[d] = cursors[d]

            if do_flush and flush_write:
                # each output row belongs to exactly ONE stream (row-aligned
                # stream regions): plain-write the zero-padded carry
                @pl.when((cursors[d] & (LANES - 1)) > 0)
                def _():
                    for o in range(num_ops):
                        cp = pltpu.make_async_copy(
                            carry_rows.at[pl.ds(o * NBUCKETS + d, 1), :],
                            out_refs[o].at[pl.ds(rw, 1), :], sem)
                        cp.start()
                        cp.wait()
            elif do_flush:
                @pl.when((cursors[d] & (LANES - 1)) > 0)
                def _():
                    for o in range(num_ops):
                        cp1 = pltpu.make_async_copy(
                            out_refs[o].at[pl.ds(rw, 1), :],
                            accs[o].at[0, pl.ds(0, 1), :], sem)
                        cp1.start()
                        cp1.wait()
                        merged = accs[o][0, 0:1, :] | carry_rows[
                            pl.ds(o * NBUCKETS + d, 1), :]
                        accs[o][0, 0:1, :] = merged
                        cp2 = pltpu.make_async_copy(
                            accs[o].at[0, pl.ds(0, 1), :],
                            out_refs[o].at[pl.ds(rw, 1), :], sem)
                        cp2.start()
                        cp2.wait()
            return 0

        jax.lax.fori_loop(0, NBUCKETS, flush, 0)


@functools.lru_cache(maxsize=64)
def _build_pass(rows: int, tile_rows: int, num_ops: int,
                interpret: bool = False, num_tiles: int | None = None,
                resume: bool = False, do_flush: bool = True,
                external_sp: bool = False, flush_write: bool = False,
                out_rows: int | None = None):
    """Build one pass call over `num_tiles` tiles of a `rows`-row array.

    A fresh call takes (sched, ctrl, *xs) — ctrl = [cursors(16), shift] —
    and returns (*outs, cursors_out, carry_out).  A resume call additionally
    takes the previous segment's outputs (aliased in place on TPU) plus its
    carry_out, and starts its cursors from ctrl = the prior cursors_out.

    external_sp: the caller supplies the row-sorted packed array (bucket ids
    from splitters rather than digits — the splitsweep engine); call
    signature becomes (sched, ctrl, sp, *xs...).  flush_write: stream
    regions are row-aligned and exclusively owned, so the final partial-row
    flush plain-writes instead of RMW-OR.  out_rows: output row count when
    it differs from the input (bucket-padded layouts).
    """
    if num_tiles is None:
        num_tiles = rows // tile_rows
    if out_rows is None:
        out_rows = rows
    use_sp = _XLA_ROWSORT or external_sp
    kern = functools.partial(_binning_kernel, tile_rows=tile_rows,
                             num_ops=num_ops,
                             interpret=interpret, resume=resume,
                             do_flush=do_flush, use_sp=use_sp,
                             flush_write=flush_write)

    def call(sched, ctrl, *arrs):
        extra = []
        if external_sp:
            extra = [arrs[0]]
            arrs = arrs[1:]
        elif _XLA_ROWSORT:
            # XLA batched row sort does the within-row digit grouping; the
            # kernel only applies the recovered permutation (probe12)
            extra = [_rowsort_packed(arrs[0], ctrl[NBUCKETS])]
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + [pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0))
             for _ in range(len(extra))]
        in_specs += [pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0))
                     for _ in range(num_ops)]
        if resume:
            in_specs += [pl.BlockSpec(memory_space=pl.ANY)
                         for _ in range(num_ops)]
            in_specs += [pl.BlockSpec((num_ops * NBUCKETS, LANES),
                                      lambda i: (0, 0))]
        # alias previous outputs in place (real aliasing is a TPU property;
        # the interpreter copies them forward inside the kernel instead)
        base = 2 + len(extra) + num_ops
        aliases = ({base + o: o for o in range(num_ops)}
                   if (resume and not interpret) else {})
        arrs = tuple(extra) + tuple(arrs)
        return pl.pallas_call(
            kern,
            grid=(num_tiles,),
            in_specs=in_specs,
            out_specs=tuple(pl.BlockSpec(memory_space=pl.ANY)
                            for _ in range(num_ops))
            + (pl.BlockSpec(memory_space=pltpu.SMEM),
               pl.BlockSpec((num_ops * NBUCKETS, LANES), lambda i: (0, 0))),
            out_shape=tuple(
                jax.ShapeDtypeStruct((out_rows + 2, LANES), jnp.int32)
                for _ in range(num_ops))
            + (jax.ShapeDtypeStruct((NBUCKETS,), jnp.int32),
               jax.ShapeDtypeStruct((num_ops * NBUCKETS, LANES), jnp.int32)),
            scratch_shapes=[
                pltpu.VMEM((num_ops * NBUCKETS, LANES), jnp.int32),
                pltpu.SMEM((NBUCKETS,), jnp.int32),   # cursors
                pltpu.SMEM((NBUCKETS,), jnp.int32),   # tops (high-water)
            ] + [pltpu.VMEM((NBUCKETS, tile_rows + _BAND, LANES), jnp.int32)
                 for _ in range(num_ops)]
            + [pltpu.SemaphoreType.DMA(())],
            input_output_aliases=aliases,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 << 20, has_side_effects=True,
                # grid-carried cursors + carry rows: the fused engine's
                # defining state; REQUIRES the sequential per-core grid
                # (machine-declared; the core-split-safe engine is rts's
                # parallel downsweep, ops/rts.py)
                dimension_semantics=("arbitrary",)),
            interpret=interpret,
        )(sched, ctrl, *arrs)

    # jit so tracing/compilation is cached across the 8 passes (the kernel is
    # pass-agnostic: cursors and shift arrive via ctrl at runtime)
    return jax.jit(call)


@functools.lru_cache(maxsize=64)
def _build_pass_with_skip(rows: int, tile_rows: int, num_ops: int,
                          interpret: bool):
    """Cached (pass | identity) conditional — one compile for all 8 passes.

    Entropy / bounded-bits adaptivity: a pass whose digit is globally
    constant is the identity — skipped via lax.cond (reference entropy
    benchmark family README.md:25-27; also fires for keys bounded below 32
    bits, the bits_to_sort lever).
    """
    call = _build_pass(rows, tile_rows, num_ops, interpret)

    def with_skip(sched, ctrl, skip, *xs):
        def run_pass(xs_in):
            return tuple(call(sched, ctrl, *xs_in)[:num_ops])

        def skip_pass(xs_in):
            return tuple(
                jnp.concatenate([x, jnp.zeros((2, LANES), jnp.int32)])
                for x in xs_in)

        return jax.lax.cond(skip, skip_pass, run_pass, tuple(xs))

    return jax.jit(with_skip)


def _is_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def _bases_all_passes(x: jnp.ndarray,
                      interpret: bool | None = None):
    """(8,16) exclusive digit bases + (8,16) digit counts, one hist read."""
    hist8 = _kernels.global_histogram(x, passes=4, interpret=interpret)
    joint = hist8.reshape(4, 16, 16)
    bases, counts = [], []
    for p in range(8):
        h4 = joint[p // 2].sum(axis=1 if (p % 2) else 0)      # (16,)
        counts.append(h4)
        bases.append(jnp.cumsum(h4) - h4)
    return (jnp.stack(bases).astype(jnp.int32),
            jnp.stack(counts).astype(jnp.int32))


def _sort_radix16(operands, tile_rows: int, interpret: bool | None = None,
                  segments: tuple[int, ...] | None = None):
    """Core: operands = (codes, *ride) u32 1-D; returns permuted operands.

    segments: optional tile-index cut points; each pass then runs as a chain
    of restartable tile-range calls with explicit cursor handoff (the
    EmulatedDeadlocking analog — must be bit-exact with the fused run).
    """
    if interpret is None:
        interpret = not _is_tpu()
    if tile_rows < _BLK or tile_rows % _BLK:
        raise ValueError(
            f"tile_rows must be a positive multiple of {_BLK}, got {tile_rows}"
            " (the binning kernel places whole 128-row blocks)")
    num_ops = len(operands)
    n = operands[0].shape[0]
    rows = max(tile_rows, -(-n // LANES))
    rows = -(-rows // tile_rows) * tile_rows
    pad = rows * LANES - n
    xs = []
    for i, x in enumerate(operands):
        if pad:
            fill = jnp.full((pad,), 0xFFFFFFFF if i == 0 else 0, jnp.uint32)
            x = jnp.concatenate([x, fill])
        xs.append(x.reshape(rows, LANES).view(jnp.int32))

    bases, digit_counts = _bases_all_passes(
        xs[0].reshape(-1).view(jnp.uint32), interpret=interpret)
    sched = jnp.asarray(_within_row_sort_schedule())
    total_tiles = rows // tile_rows
    n_total = jnp.int32(rows * LANES)
    if segments:
        bounds = sorted({0, total_tiles}
                        | {s for s in segments if 0 < s < total_tiles})
    for p in range(8):
        shift_arr = jnp.full((1,), 4 * p, jnp.int32)
        if not segments or len(bounds) == 2:
            call = _build_pass_with_skip(rows, tile_rows, num_ops, interpret)
            skip = jnp.max(digit_counts[p]) == n_total
            ys = call(sched, jnp.concatenate([bases[p], shift_arr]),
                      skip, *xs)
        else:
            cursors = bases[p]
            ys, carry = None, None
            for a, b in zip(bounds[:-1], bounds[1:]):
                call = _build_pass(rows, tile_rows, num_ops,
                                   interpret, num_tiles=b - a,
                                   resume=ys is not None,
                                   do_flush=b == total_tiles)
                seg_xs = [x[a * tile_rows:b * tile_rows] for x in xs]
                extra = [] if ys is None else list(ys) + [carry]
                ctrl = jnp.concatenate([cursors, shift_arr])
                res = call(sched, ctrl, *seg_xs, *extra)
                ys, cursors, carry = (res[:num_ops], res[num_ops],
                                      res[num_ops + 1])
        xs = [y[:rows] for y in ys]
    return tuple(y.reshape(-1)[:n].view(jnp.uint32) for y in xs)


def adversarial_segments(n: int, tile_rows: int = 512) -> tuple[int, ...]:
    """Awkward tile-range cut points for the EmulatedDeadlocking analog.

    Splits the pass grid right after the first tile, near thirds, and right
    before the last tile — the boundary cases for the carry handoff
    (reference intent: EmulatedDeadlocking.hlsl:15-247 forces the lookback
    fallback; here the hazard class is a grid split, exercised directly).
    """
    rows = max(tile_rows, -(-n // LANES))
    rows = -(-rows // tile_rows) * tile_rows
    t = rows // tile_rows
    return tuple(sorted({1, t // 3, t // 2, t - 1} - {0}))


def _default_tile_rows(pairs: bool = False) -> int:
    from ..core.config import Mode, get_tuning_parameters

    mode = Mode.PAIRS if pairs else Mode.KEYS_ONLY
    return get_tuning_parameters(mode=mode).radix_tile_rows


def sort_codes_radix16(codes: jnp.ndarray, tile_rows: int | None = None,
                       interpret: bool | None = None,
                       segments: tuple[int, ...] | None = None) -> jnp.ndarray:
    """Full 8-pass LSD radix-16 sort of u32 codes (keys-only)."""
    tile_rows = tile_rows or _default_tile_rows()
    return _sort_radix16((codes,), tile_rows, interpret, segments)[0]


def sort_pairs_radix16(codes: jnp.ndarray, payload: jnp.ndarray,
                       tile_rows: int | None = None,
                       interpret: bool | None = None,
                       segments: tuple[int, ...] | None = None):
    """Stable pair sort through the native radix pipeline.

    Returns (sorted_codes, permuted_payload) — bit-exact with
    jax.lax.sort((codes, payload), is_stable=True) because every pass is
    stable (see module docstring).
    """
    tile_rows = tile_rows or _default_tile_rows(pairs=True)
    return _sort_radix16((codes, payload.view(jnp.uint32)), tile_rows,
                         interpret, segments)
