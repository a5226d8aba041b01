"""Banded-placement compaction — the ragged-stitch primitive (prototype).

`compact(x, mask)` produces the dense row-major stream of masked elements.
This is the building block that every radix/sample-sort design needs and that
XLA cannot provide (its gather/scatter run at ~0.1 Gelem/s on this part):
vectorized, exact, skew-independent ragged concatenation.

Mechanism per tile (grid-sequential, with a <=127-element carry row):
  1. within-row pack: inclusive lane-prefix of the mask, then the j-th set
     lane found by a 7-step branchless binary search over the prefix
     (lane-gathers), then one gather packs each row left
  2. row placement: exclusive prefix of row counts + the running carry gives
     each row's global element offset g; rotate the packed row to lane phase
     g & 127 (one per-row-shift gather) and split into lo/hi row parts
  3. banded placement matmul: for each 128-row block, a (block_rows+2,128)
     0/1 matrix S (one-hot of each row's target output row, built per ROW so
     it costs ~1/128 op per element) places both parts on the MXU:
     out += S_loT @ x_lo + S_hiT @ x_hi.  Contributions are lane-disjoint by
     construction, so the sum IS the placement.  int32 values ride as 4 int8
     byte planes plus an occupancy plane (int8 matmuls, int32 accumulate).
  4. completed 128-lane rows are DMA'd to the output at the running row
     cursor (dynamic start, dynamic size); the trailing partial row stays in
     the carry for the next tile and is flushed zero-padded at the end.

Output contract: the first `count` elements (row-major) are the masked
elements in input order; the tail beyond the last written row is unspecified.

Reference analog: this implements what SortCommon.hlsl's shared-memory
pre-scatter + coalesced device scatter (:587-592, :635-977) achieves on GPUs
— turning ragged per-partition output into full-width memory transactions.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_BLK = 128  # input rows per placement block
# covers the <=129-row span of a block AND is a multiple of 8: dynamic VMEM
# slices of non-sublane-multiple height relayout catastrophically
_BAND = 144


def _arbitrary():
    from ..core.config import grid_semantics

    return grid_semantics(False)


def _tuning():
    from ..core.config import get_tuning_parameters

    return get_tuning_parameters()


def _lane_iota(rows):
    return jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)


def _inclusive_lane_prefix(v):
    lane = _lane_iota(v.shape[0])
    p = v
    for s in (1, 2, 4, 8, 16, 32, 64):
        p = p + jnp.where(lane >= s, pltpu.roll(p, s, axis=1), 0)
    return p


def _pack_src(prefix):
    """src[r, j] = index of the (j+1)-th set lane (7-step binary search)."""
    rows = prefix.shape[0]
    j = _lane_iota(rows)
    pos = jnp.full((rows, LANES), -1, jnp.int32)
    for s in (64, 32, 16, 8, 4, 2, 1):
        cand = jnp.minimum(pos + s, LANES - 1)
        pc = jnp.take_along_axis(prefix, cand, axis=1)
        pos = jnp.where((pc <= j) & (pos + s <= LANES - 1), cand, pos)
    return jnp.minimum(pos + 1, LANES - 1)


def _compact_kernel(*refs, tile_rows: int, static_writes: bool,
                    num_ops: int = 1):
    """One tile: pack, place, and stream completed rows to HBM.

    refs: num_ops input refs + mask ref; num_ops HBM output refs + count
    SMEM ref; scratch: carry rows (num_ops, 128), carry meta (2,) SMEM,
    num_ops accumulators, DMA semaphore.
    """
    x_refs = refs[:num_ops]
    m_ref = refs[num_ops]
    o_hbms = refs[num_ops + 1:2 * num_ops + 1]
    cnt_ref = refs[2 * num_ops + 1]
    carry_row = refs[2 * num_ops + 2]
    carry_meta = refs[2 * num_ops + 3]
    accs = refs[2 * num_ops + 4:3 * num_ops + 4]
    sem = refs[3 * num_ops + 4]
    t = pl.program_id(0)
    nblk = tile_rows // _BLK

    @pl.when(t == 0)
    def _():
        carry_meta[0] = jnp.int32(0)   # elements held in carry row
        carry_meta[1] = jnp.int32(0)   # full output rows already written
        carry_row[:] = jnp.zeros_like(carry_row)

    xs = tuple(r[:] for r in x_refs)
    m = (m_ref[:] != 0).astype(jnp.int32)
    lane = _lane_iota(tile_rows)

    # 1. within-row pack
    prefix = _inclusive_lane_prefix(m)
    lens = prefix[:, LANES - 1:LANES]                     # (R,1)
    src = _pack_src(prefix)
    packs = tuple(jnp.take_along_axis(x, src, axis=1) for x in xs)
    j = lane
    valid = j < lens

    # 2. row offsets: carry elements + exclusive prefix of lens over rows
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, 1), 0)
    rp = lens
    s = 1
    while s < tile_rows:
        rp = rp + jnp.where(row >= s, pltpu.roll(rp, s, axis=0), 0)
        s *= 2
    carry_n = carry_meta[0]
    g = rp - lens + carry_n                                # (R,1) global elem offset
    tile_total = rp[tile_rows - 1, 0] + carry_n

    phi = g & (LANES - 1)
    w = g >> 7                                             # target output row (tile-rel)

    # 3. rotate to phase and split lo/hi
    rot_idx = (j - phi) & (LANES - 1)                      # (R,128)
    xrs = tuple(jnp.take_along_axis(p, rot_idx, axis=1) for p in packs)
    jr = jnp.take_along_axis(jnp.where(valid, j, LANES), rot_idx, axis=1)
    # element at rotated lane l has original j = jr[l]; it is lo if
    # phi + jr < 128 i.e. l == phi+jr (no wrap), hi if it wrapped
    okay = jr < LANES
    lo_m = okay & (phi + jr < LANES)
    hi_m = okay & (phi + jr >= LANES)

    # 4. placement per 128-row block into the accumulators
    for o, acc in enumerate(accs):
        acc[:] = jnp.zeros_like(acc)
        acc[0:1, :] = carry_row[o:o + 1, :]

    band_iota = jax.lax.broadcasted_iota(jnp.int32, (_BLK, _BAND), 1)
    for b in range(nblk):
        sl = slice(b * _BLK, (b + 1) * _BLK)
        wb = w[sl]                                         # (BLK,1)
        w0 = wb[0, 0]
        srel = wb - w0                                     # 0.._BAND-2
        s_lo = (srel == band_iota).astype(jnp.int8)        # (BLK,BAND)
        s_hi = (srel + 1 == band_iota).astype(jnp.int8)
        for o, acc in enumerate(accs):
            out_i32 = jnp.zeros((_BAND, LANES), jnp.int32)
            for part_m, smat in ((lo_m[sl], s_lo), (hi_m[sl], s_hi)):
                planes = []
                for k in range(4):
                    byte = ((xrs[o][sl] >> (8 * k)) & 255) - 128
                    # mask in i32 (Mosaic rejects int8 elementwise mults)
                    planes.append(
                        (jnp.where(part_m, byte, 0).astype(jnp.int8),
                         8 * k))
                planes.append((part_m.astype(jnp.int8), -1))  # occupancy
                for mat, shift in planes:
                    r = jax.lax.dot_general(
                        smat, mat, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)     # (BAND,128)
                    if shift < 0:
                        # undo the -128 bias on all four byte planes at
                        # once: 128 * 0x01010101 == 0x80808080 (mod 2^32)
                        out_i32 = out_i32 + r * jnp.int32(-2139062144)
                    else:
                        out_i32 = out_i32 + (r << shift)
            # accumulate into the tile accumulator at dynamic row offset
            acc[pl.ds(w0, _BAND), :] = acc[pl.ds(w0, _BAND), :] + out_i32

    # 5. stream completed rows to HBM at the global row cursor
    full_rows = tile_total >> 7
    rows_written = carry_meta[1]

    if static_writes:
        # interpret mode cannot express dynamic-size slices: write the whole
        # accumulator; later tiles rewrite the overlap with correct content
        for o in range(num_ops):
            cp = pltpu.make_async_copy(
                accs[o].at[pl.ds(0, tile_rows + _BAND), :],
                o_hbms[o].at[pl.ds(rows_written, tile_rows + _BAND), :],
                sem)
            cp.start()
            cp.wait()
    else:
        @pl.when(full_rows > 0)
        def _():
            for o in range(num_ops):
                cp = pltpu.make_async_copy(
                    accs[o].at[pl.ds(0, full_rows), :],
                    o_hbms[o].at[pl.ds(rows_written, full_rows), :],
                    sem)
                cp.start()
                cp.wait()
    # 6. save trailing partial row into the carry
    rem = tile_total & (LANES - 1)
    keep = _lane_iota(1) < rem
    for o, acc in enumerate(accs):
        tail = acc[pl.ds(full_rows, 1), :]
        carry_row[o:o + 1, :] = jnp.where(keep, tail, 0)
    carry_meta[0] = rem
    carry_meta[1] = rows_written + full_rows

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        # flush the zero-padded partial rows and report the count
        for o in range(num_ops):
            cp2 = pltpu.make_async_copy(
                carry_row.at[pl.ds(o, 1), :],
                o_hbms[o].at[pl.ds(carry_meta[1], 1), :], sem)
            cp2.start()
            cp2.wait()
        cnt_ref[0] = carry_meta[1] * LANES + carry_meta[0]


@functools.lru_cache(maxsize=16)
def _build_compact(rows: int, tile_rows: int, interpret: bool,
                   num_ops: int = 1):
    kern = functools.partial(_compact_kernel, tile_rows=tile_rows,
                             static_writes=interpret, num_ops=num_ops)

    def call(*arrs):
        return pl.pallas_call(
            kern,
            grid=(rows // tile_rows,),
            in_specs=[pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0))
                      for _ in range(num_ops + 1)],
            out_specs=tuple(pl.BlockSpec(memory_space=pl.ANY)
                            for _ in range(num_ops))
            + (pl.BlockSpec(memory_space=pltpu.SMEM),),
            out_shape=tuple(
                jax.ShapeDtypeStruct((rows + tile_rows + _BAND, LANES),
                                     jnp.int32)
                for _ in range(num_ops))
            + (jax.ShapeDtypeStruct((1,), jnp.int32),),
            scratch_shapes=[
                pltpu.VMEM((num_ops, LANES), jnp.int32),    # carry rows
                pltpu.SMEM((2,), jnp.int32),                # carry meta
            ] + [pltpu.VMEM((tile_rows + _BAND, LANES), jnp.int32)
                 for _ in range(num_ops)]
            + [pltpu.SemaphoreType.DMA(())],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_tuning().vmem_limit_bytes,
                has_side_effects=True,
                # grid-carried write cursor: sequential per core
                dimension_semantics=_arbitrary()),
            interpret=interpret,
        )(*arrs)

    return jax.jit(call)


def compact_ops(values: tuple, mask: jnp.ndarray,
                interpret: bool | None = None):
    """Dense row-major streams of `v[mask]` for several 1-D operands moved
    by the SAME mask (order-preserving).  Returns (packed_tuple, count)."""
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    n = values[0].shape[0]
    dts = [v.dtype for v in values]
    rows = max(_BLK, -(-n // LANES))
    # 2048 rows measured best on v5e (5.8 Gelem/s at 2^24; bigger tiles gain
    # nothing and compile slower); tiles must be whole _BLK blocks
    tile_rows = min(2048, -(-rows // _BLK) * _BLK)
    rows = -(-rows // tile_rows) * tile_rows
    pad = rows * LANES - n
    xs = []
    for v in values:
        x = v.view(jnp.int32) if v.dtype == jnp.uint32 else v
        if pad:
            x = jnp.concatenate([x, jnp.zeros((pad,), jnp.int32)])
        xs.append(x.reshape(rows, LANES))
    m = mask.astype(jnp.int32)
    if pad:
        m = jnp.concatenate([m, jnp.zeros((pad,), jnp.int32)])
    res = _build_compact(rows, tile_rows, interpret, len(values))(
        *xs, m.reshape(rows, LANES))
    outs, cnt = res[:len(values)], res[len(values)]
    flats = tuple(
        (o.reshape(-1)[:n].view(dt) if dt == jnp.uint32
         else o.reshape(-1)[:n])
        for o, dt in zip(outs, dts))
    return flats, cnt[0]


def compact(values: jnp.ndarray, mask: jnp.ndarray,
            interpret: bool | None = None):
    """Dense row-major stream of `values[mask]` (order-preserving).

    Returns (packed, count): `packed.reshape(-1)[:count]` are the selected
    elements in input order; the tail is unspecified.  `values` is 1-D i32 or
    u32, `mask` boolean of the same shape.
    """
    flats, cnt = compact_ops((values,), mask, interpret)
    return flats[0], cnt


# ---------------------------------------------------------------------------
# expand — the inverse of compact: dense stream -> masked positions.
#
# out[i] = src[rank(i)] where mask[i], rank(i) = #masked positions before i;
# out[i] = 0 elsewhere.  XLA's gather would do this at ~0.11 Gelem/s on this
# part (probes/PROBES.md); here the cross-row movement is the same banded
# one-hot int8 matmul as compact (each output row reads from <=2 consecutive
# stream rows) and the within-row movement is a lane gather (289 Gelem/s
# in-kernel).  This is the placement half of the reference's binning gather
# (SplitSortBinning.cuh): segments pulled out of a mixed workload can be
# sorted densely and streamed back into their original spans.
# ---------------------------------------------------------------------------


def _expand_kernel(*refs, tile_rows: int, num_ops: int = 1):
    m_ref = refs[0]
    s_hbms = refs[1:num_ops + 1]
    o_refs = refs[num_ops + 1:2 * num_ops + 1]
    meta = refs[2 * num_ops + 1]
    blocks = refs[2 * num_ops + 2:3 * num_ops + 2]
    sem = refs[3 * num_ops + 2]
    t = pl.program_id(0)
    nblk = tile_rows // _BLK
    bsrc = tile_rows + _BAND + 8  # static stream-block height (rows)

    @pl.when(t == 0)
    def _():
        meta[0] = jnp.int32(0)  # stream elements consumed by prior tiles

    m = (m_ref[:] != 0).astype(jnp.int32)

    # within-row ranks and per-row stream offsets (same scans as compact)
    prefix = _inclusive_lane_prefix(m)
    pfx_ex = prefix - m                                    # exclusive, (R,128)
    lens = prefix[:, LANES - 1:LANES]
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, 1), 0)
    rp = lens
    s = 1
    while s < tile_rows:
        rp = rp + jnp.where(row >= s, pltpu.roll(rp, s, axis=0), 0)
        s *= 2
    c = meta[0]
    g_rel = rp - lens                                      # (R,1) tile-rel
    tile_total = rp[tile_rows - 1, 0]

    # bring in every stream row this tile can touch (static size, dynamic
    # row start — the supported DMA shape on this part)
    c_row = c >> 7
    for o in range(num_ops):
        cp = pltpu.make_async_copy(
            s_hbms[o].at[pl.ds(c_row, bsrc), :],
            blocks[o].at[pl.ds(0, bsrc), :], sem)
        cp.start()
        cp.wait()

    # offset of each row's first stream element, relative to the block
    off0 = (c & (LANES - 1)) + g_rel                       # (R,1)
    q = off0 >> 7                                          # block row
    phase = off0 & (LANES - 1)

    band_iota = jax.lax.broadcasted_iota(jnp.int32, (_BLK, _BAND), 1)
    for b in range(nblk):
        sl = slice(b * _BLK, (b + 1) * _BLK)
        qb = q[sl]
        q0 = qb[0, 0]
        srel = qb - q0                                     # 0.._BAND-2
        s_lo = (srel == band_iota).astype(jnp.int8)        # (BLK,BAND)
        s_hi = (srel + 1 == band_iota).astype(jnp.int8)
        idx = phase[sl] + pfx_ex[sl]                       # (BLK,128)
        use_hi = idx >= LANES
        il = idx & (LANES - 1)
        for o in range(num_ops):
            sc = blocks[o][pl.ds(q0, _BAND), :]            # (BAND,128) i32
            picked = []
            for smat in (s_lo, s_hi):
                out_i32 = jnp.full((_BLK, LANES), jnp.int32(-2139062144))
                for k in range(4):
                    plane = (((sc >> (8 * k)) & 255) - 128).astype(jnp.int8)
                    r = jax.lax.dot_general(
                        smat, plane, (((1,), (0,)), ((), ())),
                        preferred_element_type=jnp.int32)  # (BLK,128)
                    # one-hot rows: bias is exactly 128 per byte plane,
                    # folded into the 0x80808080 initializer above
                    out_i32 = out_i32 + (r << (8 * k))
                picked.append(out_i32)
            val = jnp.where(use_hi,
                            jnp.take_along_axis(picked[1], il, axis=1),
                            jnp.take_along_axis(picked[0], il, axis=1))
            o_refs[o][sl, :] = jnp.where(m[sl] != 0, val, 0)

    meta[0] = c + tile_total


@functools.lru_cache(maxsize=16)
def _build_expand(rows: int, src_rows: int, tile_rows: int, interpret: bool,
                  num_ops: int = 1):
    kern = functools.partial(_expand_kernel, tile_rows=tile_rows,
                             num_ops=num_ops)
    bsrc = tile_rows + _BAND + 8

    def call(m, *srcs):
        return pl.pallas_call(
            kern,
            grid=(rows // tile_rows,),
            in_specs=[pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0))]
            + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(num_ops)],
            out_specs=tuple(pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0))
                            for _ in range(num_ops)),
            out_shape=tuple(jax.ShapeDtypeStruct((rows, LANES), jnp.int32)
                            for _ in range(num_ops)),
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)]
            + [pltpu.VMEM((bsrc, LANES), jnp.int32) for _ in range(num_ops)]
            + [pltpu.SemaphoreType.DMA(())],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_tuning().vmem_limit_bytes,
                # grid-carried read cursor: sequential per core
                dimension_semantics=_arbitrary()),
            interpret=interpret,
        )(m, *srcs)

    return jax.jit(call)


def expand_ops(srcs: tuple, mask: jnp.ndarray,
               interpret: bool | None = None):
    """Place dense streams at masked positions (inverse of `compact_ops`).

    For each operand, returns a 1-D array `out` with
    `out[i] = src[rank(i)]` where `mask[i]` (rank = number of masked
    positions before i, i.e. the compact stream index) and 0 elsewhere.
    Only the first `mask.sum()` elements of each `src` are read.  All
    operands move by the SAME mask.  1-D i32/u32 operands.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    n = mask.shape[0]
    dts = [v.dtype for v in srcs]
    rows = max(_BLK, -(-n // LANES))
    tile_rows = min(2048, -(-rows // _BLK) * _BLK)
    rows = -(-rows // tile_rows) * tile_rows
    pad = rows * LANES - n
    bsrc = tile_rows + _BAND + 8
    src_rows = rows + bsrc  # static DMA window never reads out of bounds
    xs = []
    for v in srcs:
        x = v.view(jnp.int32) if v.dtype == jnp.uint32 else v
        # srcs may be shorter than the mask (only mask.sum() entries read)
        x = jnp.concatenate(
            [x, jnp.zeros((src_rows * LANES - x.shape[0],), jnp.int32)])
        xs.append(x.reshape(src_rows, LANES))
    m = mask.astype(jnp.int32)
    if pad:
        m = jnp.concatenate([m, jnp.zeros((pad,), jnp.int32)])
    res = _build_expand(rows, src_rows, tile_rows, interpret, len(srcs))(
        m.reshape(rows, LANES), *xs)
    if not isinstance(res, (tuple, list)):
        res = (res,)
    return tuple(
        (o.reshape(-1)[:n].view(dt) if dt == jnp.uint32 else o.reshape(-1)[:n])
        for o, dt in zip(res, dts))
