"""Native Pallas building-block kernels: global histogram + carried scan.

These are the TPU-native forms of the reference's radix-pass building blocks
(SURVEY.md §2.3):

  global_histogram   — all four 8-bit digit positions histogrammed in ONE
                       read of the input (reference: SweepCommon.hlsl
                       `GlobalHistogram` :69-117, OneSweep.cu:44-123).
                       Per tile, each digit position's 256-bin joint count is
                       a (16,128)x(128,16) nibble one-hot matmul batched over
                       rows (MXU int8), accumulated across the sequential
                       grid in a VMEM scratch.
  exclusive_scan     — grid-serialized single-pass exclusive prefix sum:
                       a VMEM carry rides the sequential grid, replacing the
                       reference's reduce-then-scan Scan kernel AND
                       OneSweep's decoupled lookback in one mechanism
                       (reference: DeviceRadixSort.hlsl `Scan` :176-417;
                       SweepCommon.hlsl `Lookback` :268-295; BASELINE.json
                       north-star "grid-serialized single-pass scan").

Both run under interpret mode on CPU for the test suite.

Measured on v5e (dependent-chain timing): global_histogram 7.3 Gelem/s
(9.2 ms at 2^26, 4 positions per read; compute-bound on the 2x16 one-hot
compares), exclusive_scan 15.2 Gelem/s (~122 GB/s).  Optimization headroom
noted in probes/PROBES.md.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _arbitrary():
    from ..core.config import grid_semantics

    return grid_semantics(False)


def _tuning():
    from ..core.config import get_tuning_parameters

    return get_tuning_parameters()


def _is_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


# ---------------------------------------------------------------------------
# Global histogram
# ---------------------------------------------------------------------------


def _hist_kernel(x_ref, o_ref, acc_ref, *, tile_rows: int, passes: int):
    """Accumulate (passes, 256) digit counts for one tile into acc_ref."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    x = x_ref[:]
    io16 = jax.lax.broadcasted_iota(jnp.int32, (1, 16, 1), 1)
    for p in range(passes):
        d = ((x >> (8 * p)) & 255).astype(jnp.int32)
        hi = (d >> 4).reshape(tile_rows, 1, LANES)
        lo = (d & 15).reshape(tile_rows, 1, LANES)
        # both one-hots in (R,16,128) layout, contracted over lanes
        # (no relayout; rate-neutral vs the transpose form but simpler)
        ohh = (hi == io16).astype(jnp.int8)
        ohl = (lo == io16).astype(jnp.int8)
        joint = jax.lax.dot_general(
            ohh, ohl, (((2,), (2,)), ((0,), (0,))),
            preferred_element_type=jnp.int32)          # (R, 16, 16)
        # reduce over rows in-kernel; the (16,16)->(256,) reshape happens
        # outside (Mosaic rejects reshaping the minor dims of a 3-D vector)
        acc_ref[p, :] = acc_ref[p, :] + jnp.sum(joint, axis=0)

    @pl.when(t == pl.num_programs(0) - 1)
    def _():
        o_ref[:] = acc_ref[:]


@functools.lru_cache(maxsize=16)
def _build_hist(rows: int, tile_rows: int, passes: int, interpret: bool):
    kern = functools.partial(_hist_kernel, tile_rows=tile_rows, passes=passes)

    def call(x):
        return pl.pallas_call(
            kern,
            grid=(rows // tile_rows,),
            in_specs=[pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((passes, 16, 16), lambda i: (0, 0, 0)),
            out_shape=jax.ShapeDtypeStruct((passes, 16, 16), jnp.int32),
            scratch_shapes=[pltpu.VMEM((passes, 16, 16), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_tuning().vmem_limit_bytes,
                # carried VMEM/SMEM state or a whole-array revisited
                # output block: sequential per core, machine-declared
                dimension_semantics=_arbitrary()),
            interpret=interpret,
        )(x)

    return call


def global_histogram(codes: jnp.ndarray, passes: int = 4,
                     interpret: bool | None = None) -> jnp.ndarray:
    """(passes, 256) digit histograms of u32 codes in one pass over the data.

    codes is 1-D; tail elements beyond a multiple of 128 are padded with
    0xFFFFFFFF and the pad count is subtracted from every position's last bin.
    """
    if interpret is None:
        interpret = not _is_tpu()
    n = codes.shape[0]
    rows = max(8, -(-n // LANES))
    tile_rows = min(_tuning().partition_rows, rows)
    rows = -(-rows // tile_rows) * tile_rows
    pad = rows * LANES - n
    if pad:
        codes = jnp.concatenate(
            [codes, jnp.full((pad,), 0xFFFFFFFF, jnp.uint32)])
    hist = _build_hist(rows, tile_rows, passes, interpret)(
        codes.reshape(rows, LANES)).reshape(passes, 256)
    if pad:
        hist = hist.at[:, 255].add(-pad)
    return hist


# ---------------------------------------------------------------------------
# Per-tile 4-bit histogram (the reduce-then-scan Upsweep analog)
# ---------------------------------------------------------------------------


def _tile_hist4_kernel(ctrl_ref, x_ref, o_ref, *, tile_rows: int):
    """(16,) digit counts of one tile for the pass shift in ctrl_ref[0].

    Reference: DeviceRadixSort.hlsl `Upsweep` :39-171 — per-block digit
    counts written digit-major.  Here the transpose to digit-major happens
    host-side on the tiny (T,16) table.  The output rides as ONE
    whole-array block revisited every grid step (a (1,16) per-tile block
    violates Mosaic's 8-sublane divisibility once T > 1).
    """
    t = pl.program_id(0)
    x = x_ref[:]
    d = jax.lax.shift_right_logical(x, ctrl_ref[0]) & 15
    io16 = jax.lax.broadcasted_iota(jnp.int32, (1, 16, 1), 1)
    oh = (d.reshape(tile_rows, 1, LANES) == io16).astype(jnp.int8)
    counts = jnp.sum(oh, axis=(0, 2), dtype=jnp.int32)      # (16,)
    o_ref[pl.ds(t, 1), :] = counts.reshape(1, 16)


@functools.lru_cache(maxsize=16)
def _build_tile_hist4(rows: int, tile_rows: int, interpret: bool):
    kern = functools.partial(_tile_hist4_kernel, tile_rows=tile_rows)
    num_tiles = rows // tile_rows

    def call(ctrl, x):
        return pl.pallas_call(
            kern,
            grid=(num_tiles,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0)),
            ],
            out_specs=pl.BlockSpec((num_tiles, 16), lambda i: (0, 0)),
            out_shape=jax.ShapeDtypeStruct((num_tiles, 16), jnp.int32),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_tuning().vmem_limit_bytes,
                # carried VMEM/SMEM state or a whole-array revisited
                # output block: sequential per core, machine-declared
                dimension_semantics=_arbitrary()),
            interpret=interpret,
        )(ctrl, x)

    return jax.jit(call)


def tile_histogram4(codes2d: jnp.ndarray, shift, tile_rows: int,
                    interpret: bool | None = None) -> jnp.ndarray:
    """(T, 16) per-tile 4-bit digit counts of a (rows, 128) u32/i32 array.

    `tile_rows` must match the consuming scatter pass's tiling.  `shift` may
    be a traced scalar — one compiled kernel serves all passes.
    """
    if interpret is None:
        interpret = not _is_tpu()
    rows = codes2d.shape[0]
    assert rows % tile_rows == 0
    ctrl = jnp.asarray(shift, jnp.int32).reshape(1)
    return _build_tile_hist4(rows, tile_rows, interpret)(
        ctrl, codes2d.view(jnp.int32))


# ---------------------------------------------------------------------------
# Grid-serialized exclusive scan
# ---------------------------------------------------------------------------


def _scan_kernel(x_ref, o_ref, carry_ref, *, tile_rows: int):
    """Exclusive prefix sum of one tile with a VMEM carry across the grid."""
    t = pl.program_id(0)

    @pl.when(t == 0)
    def _():
        carry_ref[0] = jnp.int32(0)

    x = x_ref[:]
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 1)
    # inclusive prefix within each row (7 log-steps along lanes)
    p = x
    for s in (1, 2, 4, 8, 16, 32, 64):
        p = p + jnp.where(lane >= s, pltpu.roll(p, s, axis=1), 0)
    # row totals -> inclusive prefix across rows (log-steps along sublanes)
    row = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, 1), 0)
    tot = p[:, LANES - 1:LANES]                      # (R, 1) row sums
    rp = tot
    s = 1
    while s < tile_rows:
        rp = rp + jnp.where(row >= s, pltpu.roll(rp, s, axis=0), 0)
        s *= 2
    # exclusive row base = inclusive-across-rows minus own row total
    base = rp - tot
    o_ref[:] = p - x + base + carry_ref[0]
    carry_ref[0] = carry_ref[0] + rp[tile_rows - 1, 0]


@functools.lru_cache(maxsize=16)
def _build_scan(rows: int, tile_rows: int, interpret: bool):
    kern = functools.partial(_scan_kernel, tile_rows=tile_rows)

    def call(x):
        return pl.pallas_call(
            kern,
            grid=(rows // tile_rows,),
            in_specs=[pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0))],
            out_specs=pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0)),
            out_shape=jax.ShapeDtypeStruct((rows, LANES), jnp.int32),
            scratch_shapes=[pltpu.SMEM((1,), jnp.int32)],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_tuning().vmem_limit_bytes,
                # carried VMEM/SMEM state or a whole-array revisited
                # output block: sequential per core, machine-declared
                dimension_semantics=_arbitrary()),
            interpret=interpret,
        )(x)

    return call


def exclusive_scan(values: jnp.ndarray,
                   interpret: bool | None = None) -> jnp.ndarray:
    """Exclusive prefix sum of a 1-D i32/u32 array (sequential-grid carry)."""
    if interpret is None:
        interpret = not _is_tpu()
    n = values.shape[0]
    dt = values.dtype
    rows = max(8, -(-n // LANES))
    tile_rows = min(2 * _tuning().partition_rows, rows)
    rows = -(-rows // tile_rows) * tile_rows
    pad = rows * LANES - n
    x = values.view(jnp.int32) if dt == jnp.uint32 else values
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,), jnp.int32)])
    out = _build_scan(rows, tile_rows, interpret)(x.reshape(rows, LANES))
    out = out.reshape(-1)[:n]
    return out.view(dt) if dt == jnp.uint32 else out
