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


def _binning_kernel(sched_ref, bases_ref, *refs, tile_rows: int, shift: int,
                    num_ops: int):
    """One LSD radix-16 pass over one tile.

    refs: num_ops input refs, num_ops HBM output refs, then scratch:
    carry rows (num_ops*16, 128), cursors (16,) SMEM,
    num_ops accumulators (16, tile_rows+BAND, 128), one DMA semaphore.
    """
    in_refs = refs[:num_ops]
    out_refs = refs[num_ops:2 * num_ops]
    carry_rows = refs[2 * num_ops]
    cursors = refs[2 * num_ops + 1]
    accs = refs[2 * num_ops + 2:2 * num_ops + 2 + num_ops]
    sem = refs[2 * num_ops + 2 + num_ops]

    t = pl.program_id(0)
    nblk = tile_rows // _BLK
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 1)
    row1 = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, 1), 0)

    @pl.when(t == 0)
    def _():
        carry_rows[:] = jnp.zeros_like(carry_rows)
        for d in range(NBUCKETS):
            cursors[d] = bases_ref[d]

    xin = tuple(r[:] for r in in_refs)
    digit = jax.lax.shift_right_logical(xin[0], shift) & 15

    # --- 1. within-row pack by (digit, lane): bitonic on packed i32 ---
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
    src = packed & 127
    dsort = packed >> 7
    xs = tuple(jnp.take_along_axis(x, src, axis=1) for x in xin)

    # --- 2. per-row run starts + per-tile row prefixes per digit ---
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

    for acc in accs:
        acc[:] = jnp.zeros_like(acc)

    band_iota = jax.lax.broadcasted_iota(jnp.int32, (_BLK, _BAND), 1)
    lane_blk = jax.lax.broadcasted_iota(jnp.int32, (_BLK, LANES), 1)

    # --- 3. per bucket: rotate, place, stream out ---
    for d in range(NBUCKETS):
        cur = cursors[d]                                         # elements
        cur_row = cur >> 7
        rs_d = rowstart[:, d:d + 1]
        T = cur + rowpref[:, d:d + 1] - rs_d                     # (R,1)
        idx = (lane - T) & (LANES - 1)
        xr = tuple(jnp.take_along_axis(x, idx, axis=1) for x in xs)
        k_orig = idx                                             # sorted lane
        valid = (k_orig >= rs_d) & (k_orig < rs_d + cnt[:, d:d + 1])
        # run geometry from the (R,1) tables — NO elementwise reductions:
        # the run starts at absolute element T+rowstart, i.e. acc row w0 and
        # lane phase phi; non-wrapped (lo) elements sit at lanes >= phi
        run_abs = T + rs_d                                       # (R,1)
        w0_row = (run_abs >> 7) - cur_row
        phi = run_abs & (LANES - 1)
        has_row = cnt[:, d:d + 1] > 0
        big = jnp.int32(1 << 20)
        w0_or_big = jnp.where(has_row, w0_row, big)
        for o, acc in enumerate(accs):
            acc[d, 0:1, :] = carry_rows[o * NBUCKETS + d:
                                        o * NBUCKETS + d + 1, :]

        for b in range(nblk):
            sl = slice(b * _BLK, (b + 1) * _BLK)
            vb = valid[sl]
            blk_base = jnp.minimum(jnp.min(w0_or_big[sl]),
                                   jnp.int32(tile_rows))
            srel = jnp.where(has_row[sl], w0_row[sl] - blk_base, -1)
            s_lo = (srel == band_iota).astype(jnp.bfloat16)
            s_hi = (srel + 1 == band_iota).astype(jnp.bfloat16)
            # bf16 byte planes hold 0..255 exactly, so masked-out zeros are
            # correct without the int8 -128 bias / occupancy matmul; the
            # hi part is a subtraction instead of a second mask
            is_lo = lane_blk >= phi[sl]
            outs = [jnp.zeros((_BAND, LANES), jnp.int32)
                    for _ in range(num_ops)]
            for o in range(num_ops):
                xv = jnp.where(vb, xr[o][sl], 0)
                xlo = jnp.where(is_lo, xv, 0)
                xhi = xv - xlo
                acc_o = outs[o]
                for part_x, smat in ((xlo, s_lo), (xhi, s_hi)):
                    for kk in range(4):
                        mat = ((part_x >> (8 * kk)) & 255).astype(jnp.bfloat16)
                        r = jax.lax.dot_general(
                            smat, mat, (((0,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
                        acc_o = acc_o + (r.astype(jnp.int32) << (8 * kk))
                outs[o] = acc_o
            for o, acc in enumerate(accs):
                acc[d, pl.ds(blk_base, _BAND), :] = (
                    acc[d, pl.ds(blk_base, _BAND), :] + outs[o])

        new_cur = cur + tilecnt[0, d]
        full_rows = (new_cur >> 7) - cur_row

        @pl.when(full_rows > 0)
        def _(d=d, full_rows=full_rows, cur_row=cur_row):
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

    # --- 4. final flush: RMW-OR each stream's partial row into place ---
    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        def flush(d, _):
            rw = cursors[d] >> 7

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
def _build_pass(rows: int, tile_rows: int, shift: int, num_ops: int):
    kern = functools.partial(_binning_kernel, tile_rows=tile_rows,
                             shift=shift, num_ops=num_ops)

    def call(sched, bases, *xs):
        return pl.pallas_call(
            kern,
            grid=(rows // tile_rows,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ] + [pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0))
                 for _ in range(num_ops)],
            out_specs=tuple(pl.BlockSpec(memory_space=pl.ANY)
                            for _ in range(num_ops)),
            out_shape=tuple(
                jax.ShapeDtypeStruct((rows + 2, LANES), jnp.int32)
                for _ in range(num_ops)),
            scratch_shapes=[
                pltpu.VMEM((num_ops * NBUCKETS, LANES), jnp.int32),
                pltpu.SMEM((NBUCKETS,), jnp.int32),
            ] + [pltpu.VMEM((NBUCKETS, tile_rows + _BAND, LANES), jnp.int32)
                 for _ in range(num_ops)]
            + [pltpu.SemaphoreType.DMA(())],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 << 20, has_side_effects=True),
        )(sched, bases, *xs)

    return call


def _is_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def _bases_all_passes(x: jnp.ndarray) -> jnp.ndarray:
    """(8,16) exclusive digit bases from one histogram read."""
    hist8 = _kernels.global_histogram(x, passes=4)            # (4,256)
    joint = hist8.reshape(4, 16, 16)
    bases = []
    for p in range(8):
        h4 = joint[p // 2].sum(axis=1 if (p % 2) else 0)      # (16,)
        bases.append(jnp.cumsum(h4) - h4)
    return jnp.stack(bases).astype(jnp.int32)


def _sort_radix16(operands, tile_rows: int):
    """Core: operands = (codes, *ride) u32 1-D; returns permuted operands."""
    if not _is_tpu():
        raise NotImplementedError(
            "radix16 engine is TPU-only (its multi-stream dynamic-size DMA "
            "writer cannot run under interpret mode); use Backend.XLA or "
            "the bitonic network off-TPU")
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

    bases = _bases_all_passes(
        xs[0].reshape(-1).view(jnp.uint32))
    sched = jnp.asarray(_within_row_sort_schedule())
    for p in range(8):
        call = _build_pass(rows, tile_rows, 4 * p, num_ops)
        ys = call(sched, bases[p], *xs)
        xs = [y[:rows] for y in ys]
    return tuple(y.reshape(-1)[:n].view(jnp.uint32) for y in xs)


def sort_codes_radix16(codes: jnp.ndarray,
                       tile_rows: int = 512) -> jnp.ndarray:
    """Full 8-pass LSD radix-16 sort of u32 codes (keys-only, TPU only)."""
    return _sort_radix16((codes,), tile_rows)[0]


def sort_pairs_radix16(codes: jnp.ndarray, payload: jnp.ndarray,
                       tile_rows: int = 512):
    """Stable pair sort through the native radix pipeline (TPU only).

    Returns (sorted_codes, permuted_payload) — bit-exact with
    jax.lax.sort((codes, payload), is_stable=True) because every pass is
    stable (see module docstring).
    """
    return _sort_radix16((codes, payload.view(jnp.uint32)), tile_rows)
