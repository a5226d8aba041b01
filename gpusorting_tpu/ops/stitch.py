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


def _compact_kernel(x_ref, m_ref, o_hbm, cnt_ref, carry_row, carry_meta,
                    acc, sem, *, tile_rows: int, static_writes: bool):
    """One tile: pack, place, and stream completed rows to HBM."""
    t = pl.program_id(0)
    nblk = tile_rows // _BLK

    @pl.when(t == 0)
    def _():
        carry_meta[0] = jnp.int32(0)   # elements held in carry row
        carry_meta[1] = jnp.int32(0)   # full output rows already written
        carry_row[:] = jnp.zeros_like(carry_row)

    x = x_ref[:]
    m = (m_ref[:] != 0).astype(jnp.int32)
    lane = _lane_iota(tile_rows)

    # 1. within-row pack
    prefix = _inclusive_lane_prefix(m)
    lens = prefix[:, LANES - 1:LANES]                     # (R,1)
    src = _pack_src(prefix)
    packed = jnp.take_along_axis(x, src, axis=1)
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
    xr = jnp.take_along_axis(packed, rot_idx, axis=1)
    jr = jnp.take_along_axis(jnp.where(valid, j, LANES), rot_idx, axis=1)
    # element at rotated lane l has original j = jr[l]; it is lo if
    # phi + jr < 128 i.e. l == phi+jr (no wrap), hi if it wrapped
    okay = jr < LANES
    lo_m = okay & (phi + jr < LANES)
    hi_m = okay & (phi + jr >= LANES)

    # 4. placement per 128-row block into the accumulator
    acc[:] = jnp.zeros_like(acc)
    acc[0:1, :] = carry_row[:]

    band_iota = jax.lax.broadcasted_iota(jnp.int32, (_BLK, _BAND), 1)
    for b in range(nblk):
        sl = slice(b * _BLK, (b + 1) * _BLK)
        wb = w[sl]                                         # (BLK,1)
        w0 = wb[0, 0]
        srel = wb - w0                                     # 0.._BAND-2
        s_lo = (srel == band_iota).astype(jnp.int8)        # (BLK,BAND)
        s_hi = (srel + 1 == band_iota).astype(jnp.int8)
        out_i32 = jnp.zeros((_BAND, LANES), jnp.int32)
        for part_m, smat in ((lo_m[sl], s_lo), (hi_m[sl], s_hi)):
            planes = []
            for k in range(4):
                byte = ((xr[sl] >> (8 * k)) & 255) - 128   # [-128,127]
                # mask in i32 (Mosaic rejects int8 elementwise multiplies)
                planes.append((jnp.where(part_m, byte, 0).astype(jnp.int8),
                               8 * k))
            planes.append((part_m.astype(jnp.int8), -1))   # occupancy
            for mat, shift in planes:
                r = jax.lax.dot_general(
                    smat, mat, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.int32)       # (BAND,128)
                if shift < 0:
                    # undo the -128 bias on all four byte planes at once:
                    # 128 * 0x01010101 == 0x80808080 (mod 2^32)
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
        cp = pltpu.make_async_copy(
            acc.at[pl.ds(0, tile_rows + _BAND), :],
            o_hbm.at[pl.ds(rows_written, tile_rows + _BAND), :],
            sem)
        cp.start()
        cp.wait()
    else:
        @pl.when(full_rows > 0)
        def _():
            cp = pltpu.make_async_copy(
                acc.at[pl.ds(0, full_rows), :],
                o_hbm.at[pl.ds(rows_written, full_rows), :],
                sem)
            cp.start()
            cp.wait()
    # 6. save trailing partial row into the carry
    rem = tile_total & (LANES - 1)
    tail = acc[pl.ds(full_rows, 1), :]
    keep = _lane_iota(1) < rem
    carry_row[:] = jnp.where(keep, tail, 0)
    carry_meta[0] = rem
    carry_meta[1] = rows_written + full_rows

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        # flush the zero-padded partial row and report the count
        cp2 = pltpu.make_async_copy(
            carry_row.at[pl.ds(0, 1), :],
            o_hbm.at[pl.ds(carry_meta[1], 1), :], sem)
        cp2.start()
        cp2.wait()
        cnt_ref[0] = carry_meta[1] * LANES + carry_meta[0]


@functools.lru_cache(maxsize=16)
def _build_compact(rows: int, tile_rows: int, interpret: bool):
    kern = functools.partial(_compact_kernel, tile_rows=tile_rows,
                             static_writes=interpret)

    def call(x, m):
        return pl.pallas_call(
            kern,
            grid=(rows // tile_rows,),
            in_specs=[
                pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0)),
                pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0)),
            ],
            out_specs=(
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pltpu.SMEM),
            ),
            out_shape=(
                jax.ShapeDtypeStruct((rows + tile_rows + _BAND, LANES),
                                     jnp.int32),
                jax.ShapeDtypeStruct((1,), jnp.int32),
            ),
            scratch_shapes=[
                pltpu.VMEM((1, LANES), jnp.int32),          # carry row
                pltpu.SMEM((2,), jnp.int32),                # carry meta
                pltpu.VMEM((tile_rows + _BAND, LANES), jnp.int32),
                pltpu.SemaphoreType.DMA(()),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_tuning().vmem_limit_bytes,
                has_side_effects=True),
            interpret=interpret,
        )(x, m)

    return call


def compact(values: jnp.ndarray, mask: jnp.ndarray,
            interpret: bool | None = None):
    """Dense row-major stream of `values[mask]` (order-preserving).

    Returns (packed, count): `packed.reshape(-1)[:count]` are the selected
    elements in input order; the tail is unspecified.  `values` is 1-D i32 or
    u32, `mask` boolean of the same shape.
    """
    if interpret is None:
        interpret = jax.devices()[0].platform != "tpu"
    n = values.shape[0]
    dt = values.dtype
    rows = max(_BLK, -(-n // LANES))
    # 2048 rows measured best on v5e (5.8 Gelem/s at 2^24; bigger tiles gain
    # nothing and compile slower); tiles must be whole _BLK blocks
    tile_rows = min(2048, -(-rows // _BLK) * _BLK)
    rows = -(-rows // tile_rows) * tile_rows
    pad = rows * LANES - n
    x = values.view(jnp.int32) if dt == jnp.uint32 else values
    m = mask.astype(jnp.int32)
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,), jnp.int32)])
        m = jnp.concatenate([m, jnp.zeros((pad,), jnp.int32)])
    out, cnt = _build_compact(rows, tile_rows, interpret)(
        x.reshape(rows, LANES), m.reshape(rows, LANES))
    flat = out.reshape(-1)[:n]
    return (flat.view(dt) if dt == jnp.uint32 else flat), cnt[0]
