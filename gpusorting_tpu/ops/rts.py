"""DeviceRadixSort — the 3-phase reduce-then-scan native pipeline.

Reference: Shaders/DeviceRadixSort.hlsl:39-514 (Upsweep → Scan → Downsweep)
and its CUDA mirror DeviceRadixSort.cu.  TPU-native redesign at radix 16
(4-bit digits, 8 passes): 8-bit digits are hostile to 128-lane run movement
(at 256 buckets the average per-row run is half an element, defeating every
vector mover — probes/PROBES.md); the reference's own FFX baseline makes
the same radix choice for its portable path (FFXParallelSort.cpp:28-43).

Per pass:
  Upsweep   — ops.kernels.tile_histogram4: per-tile (16,) digit counts, one
              read of the input (DeviceRadixSort.hlsl Upsweep :39-171).
  Scan      — ops.kernels.exclusive_scan over the DIGIT-MAJOR (16*T,)
              flattened table: one grid-serialized scan produces, in a
              single number per (digit, tile), the global digit base PLUS
              the inter-tile offset — exactly the reference's digit-major
              passHist layout (DeviceRadixSort.hlsl:65, Scan :176-417).
  Downsweep — table-driven scatter: every (tile, digit) reads its absolute
              output cursor from the scanned table (SMEM) and places its
              elements via the shared pack/rotate/banded-matmul machinery
              (ops.radix16 helpers).  Boundary output rows are RMW-OR'd
              (race-free under the sequential grid), interior rows are
              plain row-DMAs.  The output starts zeroed (donated buffer) so
              OR-merging at digit/tile boundaries is well defined.

Unlike the fused engine (ops/radix16.py) no state is carried across tiles:
given the table, tiles are independent — the portability/restartability
property that defines the reference's reduce-then-scan family.  The
downsweep grid is chunked (the cursor table rides SMEM), which doubles as
the >65535-dispatch flattening analog (SortCommon.hlsl:120-130).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import kernels as _kernels
from .radix16 import (
    LANES,
    NBUCKETS,
    _BAND,
    _BLK,
    _TOPS_DISCIPLINE,
    _XLA_ROWSORT,
    _is_tpu,
    _pack_rows,
    _place_bucket,
    _rowsort_packed,
    _run_tables,
    _within_row_sort_schedule,
)

# SMEM budget for the per-chunk cursor table: 16 * MAX_TILES i32.
_MAX_TILES_PER_CALL = 1024


def _downsweep_kernel(sched_ref, ctrl_ref, table_ref, *refs, tile_rows: int,
                      num_ops: int, num_tiles: int, interpret: bool,
                      first_chunk: bool, parallel: bool = False):
    """Scatter one chunk of tiles using absolute cursors from table_ref.

    refs: num_ops inputs, num_ops prev/zeroed ANY refs (aliased to outputs
    on TPU), num_ops outputs [+ one edge-side output when parallel], then
    scratch: tops (16,) SMEM, num_ops accs, staging (num_ops, 8, LANES),
    DMA semaphore.  ctrl_ref[0] = digit shift.
    table_ref[d * num_tiles + t] = absolute element cursor of (tile t,
    digit d) — digit-major, chunk-local tile index.

    parallel (Megacore mode, SURVEY §7 hard parts): tiles become fully
    core-split safe.  Any output row is either FULL within one (tile,
    digit) range — then exactly one program plain-writes it — or split
    between ranges — then EVERY contribution goes to this tile's own rows
    of the edge side buffer (zero-masked when absent), and a sequential
    fixup kernel (_edge_fixup_kernel) ORs them into place afterward.  No
    program ever reads or writes another program's state, so the grid may
    be declared dimension_semantics=("parallel",) and split across
    TensorCores.  The default sequential mode instead RMW-ORs boundary
    rows in place (race-free only under the in-order grid).
    """
    sp_ref = refs[0] if _XLA_ROWSORT else None
    refs = refs[1:] if _XLA_ROWSORT else refs
    in_refs = refs[:num_ops]
    prev_refs = refs[num_ops:2 * num_ops]
    out_refs = refs[2 * num_ops:3 * num_ops]
    pos = 3 * num_ops
    side_ref = refs[pos] if parallel else None
    pos += 1 if parallel else 0
    scratch = refs[pos:]
    tops = scratch[0]
    accs = scratch[1:1 + num_ops]
    stag = scratch[1 + num_ops]
    sem = scratch[2 + num_ops]

    t = pl.program_id(0)

    if interpret:
        # the interpreter does not alias buffers: copy the zeroed (or
        # previous chunk's) buffer forward
        @pl.when(t == 0)
        def _():
            for o in range(num_ops):
                cp = pltpu.make_async_copy(prev_refs[o], out_refs[o], sem)
                cp.start()
                cp.wait()

    xin = tuple(r[:] for r in in_refs)
    xs, dsort = _pack_rows(sched_ref, xin, ctrl_ref[0], tile_rows,
                           sp=sp_ref[:] if _XLA_ROWSORT else None)
    rowstart, cnt, rowpref, tilecnt = _run_tables(dsort, tile_rows)

    if not _TOPS_DISCIPLINE:
        for acc in accs:
            acc[:] = jnp.zeros_like(acc)

    def rmw_or(o, out_row, acc_row, d):
        """out[out_row] |= accs[o][d, acc_row] (single row, sequential)."""
        cp1 = pltpu.make_async_copy(
            out_refs[o].at[pl.ds(out_row, 1), :],
            stag.at[o, pl.ds(0, 1), :], sem)
        cp1.start()
        cp1.wait()
        stag[o, 0:1, :] = stag[o, 0:1, :] | accs[o][d, pl.ds(acc_row, 1), :]
        cp2 = pltpu.make_async_copy(
            stag.at[o, pl.ds(0, 1), :],
            out_refs[o].at[pl.ds(out_row, 1), :], sem)
        cp2.start()
        cp2.wait()

    def write_full_rows(d, lo_row, first_full, n_full):
        @pl.when(n_full > 0)
        def _():
            if interpret:
                def row_copy(i, _):
                    for o in range(num_ops):
                        cp = pltpu.make_async_copy(
                            accs[o].at[d, pl.ds(first_full - lo_row + i,
                                                1), :],
                            out_refs[o].at[pl.ds(first_full + i, 1), :],
                            sem)
                        cp.start()
                        cp.wait()
                    return 0

                jax.lax.fori_loop(0, n_full, row_copy, 0)
            else:
                for o in range(num_ops):
                    cp = pltpu.make_async_copy(
                        accs[o].at[d, pl.ds(first_full - lo_row,
                                            n_full), :],
                        out_refs[o].at[pl.ds(first_full, n_full), :],
                        sem)
                    cp.start()
                    cp.wait()

    for d in range(NBUCKETS):
        cur = table_ref[d * num_tiles + t]
        tops[d] = jnp.int32(0)
        _place_bucket(d, cur, accs, tops, xs, rowstart, cnt, rowpref,
                      num_ops, tile_rows)

        tc = tilecnt[0, d]

        if parallel:
            # core-split-safe boundary handling: this tile's partial-row
            # contributions go, zero-masked, to its OWN side rows — always
            # written (absent partials must be zeros, the side buffer is
            # uninitialized output memory)
            lo_row = cur >> 7
            hi = cur + tc
            first_full = (cur + (LANES - 1)) >> 7
            n_full = (hi >> 7) - first_full
            has = tc > 0
            lo_cond = has & ((cur & (LANES - 1)) != 0)
            hi_cond = (has & ((hi & (LANES - 1)) != 0)
                       & ((hi >> 7) >= first_full))
            hi_idx = jnp.clip((hi >> 7) - lo_row, 0, tile_rows + _BAND - 1)
            for o in range(num_ops):
                base_row = ((t * num_ops + o) * NBUCKETS + d) * 2
                stag[o, 2:3, :] = jnp.where(
                    lo_cond, accs[o][d, 0:1, :], 0)
                cp = pltpu.make_async_copy(
                    stag.at[o, pl.ds(2, 1), :],
                    side_ref.at[pl.ds(base_row, 1), :], sem)
                cp.start()
                cp.wait()
                stag[o, 3:4, :] = jnp.where(
                    hi_cond, accs[o][d, pl.ds(hi_idx, 1), :], 0)
                cp2 = pltpu.make_async_copy(
                    stag.at[o, pl.ds(3, 1), :],
                    side_ref.at[pl.ds(base_row + 1, 1), :], sem)
                cp2.start()
                cp2.wait()

            @pl.when(tc > 0)
            def _(d=d, lo_row=lo_row, first_full=first_full,
                  n_full=n_full):
                write_full_rows(d, lo_row, first_full, n_full)
        else:
            @pl.when(tc > 0)
            def _(d=d, cur=cur, tc=tc):
                lo_row = cur >> 7
                hi = cur + tc
                first_full = (cur + (LANES - 1)) >> 7
                n_full = (hi >> 7) - first_full

                @pl.when((cur & (LANES - 1)) != 0)
                def _():
                    for o in range(num_ops):
                        rmw_or(o, lo_row, 0, d)

                write_full_rows(d, lo_row, first_full, n_full)

                @pl.when(((hi & (LANES - 1)) != 0)
                         & ((hi >> 7) >= first_full))
                def _():
                    for o in range(num_ops):
                        rmw_or(o, hi >> 7, (hi >> 7) - lo_row, d)


@functools.lru_cache(maxsize=64)
def _build_downsweep(rows: int, tile_rows: int, num_ops: int,
                     num_tiles: int, interpret: bool, first_chunk: bool,
                     parallel: bool = False):
    from ..core.config import grid_semantics

    kern = functools.partial(
        _downsweep_kernel, tile_rows=tile_rows, num_ops=num_ops,
        num_tiles=num_tiles, interpret=interpret, first_chunk=first_chunk,
        parallel=parallel)

    def call(sched, ctrl, table, *arrs):
        extra = []
        if _XLA_ROWSORT:
            extra = [_rowsort_packed(arrs[0], ctrl[0])]
        in_specs = [
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ] + [pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0))
             for _ in range(len(extra) + num_ops)]
        in_specs += [pl.BlockSpec(memory_space=pl.ANY)
                     for _ in range(num_ops)]
        base = 3 + len(extra) + num_ops
        aliases = ({} if interpret
                   else {base + o: o for o in range(num_ops)})
        arrs = tuple(extra) + tuple(arrs)
        out_shapes = tuple(
            jax.ShapeDtypeStruct((rows + 2, LANES), jnp.int32)
            for _ in range(num_ops))
        if parallel:
            out_shapes += (jax.ShapeDtypeStruct(
                (num_tiles * num_ops * NBUCKETS * 2, LANES), jnp.int32),)
        return pl.pallas_call(
            kern,
            grid=(num_tiles,),
            in_specs=in_specs,
            out_specs=tuple(pl.BlockSpec(memory_space=pl.ANY)
                            for _ in range(len(out_shapes))),
            out_shape=out_shapes,
            scratch_shapes=[
                pltpu.SMEM((NBUCKETS,), jnp.int32),
            ] + [pltpu.VMEM((NBUCKETS, tile_rows + _BAND, LANES), jnp.int32)
                 for _ in range(num_ops)]
            + [pltpu.VMEM((num_ops, 8, LANES), jnp.int32),
               pltpu.SemaphoreType.DMA(())],
            input_output_aliases=aliases,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=110 << 20, has_side_effects=True,
                dimension_semantics=grid_semantics(parallel)),
            interpret=interpret,
        )(sched, ctrl, table, *arrs)

    return jax.jit(call)


def _edge_fixup_kernel(rowtab_ref, side_ref, *refs, num_ops: int,
                      num_tiles: int, interpret: bool):
    """Sequential OR-merge of the parallel downsweep's edge side rows.

    rowtab_ref[(e * NBUCKETS + d) * num_tiles + t] = absolute output row of
    tile t / digit d / edge e, or -1 when that partial does not exist.
    Multiple (t, d, e) entries may name the SAME output row (that is the
    hazard the side buffer exists for); this grid is declared "arbitrary"
    (sequential per core), so the read-OR-write chains never race.
    """
    prev_refs = refs[:num_ops]
    out_refs = refs[num_ops:2 * num_ops]
    stag = refs[2 * num_ops]
    sem = refs[2 * num_ops + 1]
    t = pl.program_id(0)

    if interpret:
        @pl.when(t == 0)
        def _():
            for o in range(num_ops):
                cp = pltpu.make_async_copy(prev_refs[o], out_refs[o], sem)
                cp.start()
                cp.wait()

    for d in range(NBUCKETS):
        for e in (0, 1):
            row = rowtab_ref[(e * NBUCKETS + d) * num_tiles + t]

            @pl.when(row >= 0)
            def _(d=d, e=e, row=row):
                for o in range(num_ops):
                    side_row = ((t * num_ops + o) * NBUCKETS + d) * 2 + e
                    cp1 = pltpu.make_async_copy(
                        out_refs[o].at[pl.ds(row, 1), :],
                        stag.at[o, pl.ds(0, 1), :], sem)
                    cp1.start()
                    cp1.wait()
                    cp2 = pltpu.make_async_copy(
                        side_ref.at[pl.ds(side_row, 1), :],
                        stag.at[o, pl.ds(1, 1), :], sem)
                    cp2.start()
                    cp2.wait()
                    stag[o, 0:1, :] = stag[o, 0:1, :] | stag[o, 1:2, :]
                    cp3 = pltpu.make_async_copy(
                        stag.at[o, pl.ds(0, 1), :],
                        out_refs[o].at[pl.ds(row, 1), :], sem)
                    cp3.start()
                    cp3.wait()


@functools.lru_cache(maxsize=64)
def _build_edge_fixup(rows: int, num_ops: int, num_tiles: int,
                      interpret: bool):
    from ..core.config import grid_semantics

    kern = functools.partial(_edge_fixup_kernel, num_ops=num_ops,
                             num_tiles=num_tiles, interpret=interpret)

    def call(rowtab, side, *prev):
        aliases = ({} if interpret
                   else {2 + o: o for o in range(num_ops)})
        return pl.pallas_call(
            kern,
            grid=(num_tiles,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY)]
            + [pl.BlockSpec(memory_space=pl.ANY)
               for _ in range(num_ops)],
            out_specs=tuple(pl.BlockSpec(memory_space=pl.ANY)
                            for _ in range(num_ops)),
            out_shape=tuple(
                jax.ShapeDtypeStruct((rows + 2, LANES), jnp.int32)
                for _ in range(num_ops)),
            scratch_shapes=[pltpu.VMEM((num_ops, 8, LANES), jnp.int32),
                            pltpu.SemaphoreType.DMA(())],
            input_output_aliases=aliases,
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 << 20, has_side_effects=True,
                dimension_semantics=grid_semantics(False)),
            interpret=interpret,
        )(rowtab, side, *prev)

    return jax.jit(call)


def _sort_rts(operands, tile_rows: int, interpret: bool | None = None,
              parallel: bool | None = None):
    """Core 3-phase LSD sort; operands = (codes, *ride) u32 1-D.

    parallel=None resolves from config.megacore_parallel(): dual-core
    generations (v4/v5p) run the core-split-safe downsweep (SURVEY §7
    megacore hard part), single-core parts keep the sequential RMW form.
    """
    if interpret is None:
        interpret = not _is_tpu()
    if parallel is None:
        from ..core.config import megacore_parallel

        parallel = megacore_parallel()
    if tile_rows < _BLK or tile_rows % _BLK:
        raise ValueError(
            f"tile_rows must be a positive multiple of {_BLK}, "
            f"got {tile_rows}")
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

    for p in range(8):
        shift = jnp.full((1,), 4 * p, jnp.int32)
        # Upsweep: per-tile digit counts for this pass
        th = _kernels.tile_histogram4(xs[0], shift[0], tile_rows,
                                      interpret=interpret)       # (T,16)
        # Scan: digit-major flatten -> one scan = global base + tile offset
        table = _kernels.exclusive_scan(
            th.T.reshape(-1), interpret=interpret)               # (16*T,)
        table2 = table.reshape(NBUCKETS, total_tiles)
        # Downsweep, chunked so the cursor table rides SMEM
        xs = run_downsweep_chunks(xs, table2, sched, shift, rows, tile_rows,
                                  num_ops, total_tiles, interpret,
                                  parallel=parallel,
                                  counts_dm=th.T if parallel else None)
    return tuple(y.reshape(-1)[:n].view(jnp.uint32) for y in xs)


def run_downsweep_chunks(xs, table_dm, sched, shift, rows, tile_rows,
                         num_ops, total_tiles, interpret,
                         parallel: bool = False, counts_dm=None):
    """One pass's table-driven scatter, chunked so the cursor table rides
    SMEM (<= _MAX_TILES_PER_CALL tiles per pallas_call; the >65535-dispatch
    flattening analog).  `table_dm` is the digit-major (NBUCKETS,
    total_tiles) cursor table.  Shared by the 3-phase rts pipeline and the
    ffx 5-stage baseline (ops/ffx.py) so the chunking contract — the
    first_chunk flag and the rows+2 slack-row convention of
    _build_downsweep — lives in exactly one place.

    parallel (Megacore): the downsweep grid is declared core-splittable
    and boundary rows ride a side buffer merged by the sequential
    _edge_fixup_kernel; requires `counts_dm` (the digit-major (NBUCKETS,
    total_tiles) per-tile counts — the upsweep table) to locate the
    partial rows.  Bit-exact with the sequential mode by construction
    (tests force it via GST_MEGACORE=1).
    """
    max_tiles = 512 if parallel else _MAX_TILES_PER_CALL
    prev = [jnp.zeros((rows + 2, LANES), jnp.int32) for _ in range(num_ops)]
    a = 0
    while a < total_tiles:
        b = min(a + max_tiles, total_tiles)
        call = _build_downsweep(rows, tile_rows, num_ops, b - a,
                                interpret, first_chunk=a == 0,
                                parallel=parallel)
        chunk_table = table_dm[:, a:b].reshape(-1)
        seg_xs = [x[a * tile_rows:b * tile_rows] for x in xs]
        res = list(call(sched, shift, chunk_table, *seg_xs, *prev))
        if parallel:
            outs, side = res[:num_ops], res[num_ops]
            cur = table_dm[:, a:b]
            tc = counts_dm[:, a:b]
            hi = cur + tc
            first_full = (cur + (LANES - 1)) >> 7
            lo_row = jnp.where((tc > 0) & ((cur & (LANES - 1)) != 0),
                               cur >> 7, -1)
            hi_row = jnp.where(
                (tc > 0) & ((hi & (LANES - 1)) != 0)
                & ((hi >> 7) >= first_full), hi >> 7, -1)
            rowtab = jnp.stack([lo_row, hi_row]).reshape(-1)
            fix = _build_edge_fixup(rows, num_ops, b - a, interpret)
            prev = list(fix(rowtab, side, *outs))
        else:
            prev = res
        a = b
    return [y[:rows] for y in prev]


def sort_codes_rts(codes: jnp.ndarray, tile_rows: int | None = None,
                   interpret: bool | None = None) -> jnp.ndarray:
    """Full 8-pass reduce-then-scan radix-16 sort of u32 codes."""
    from .radix16 import _default_tile_rows

    return _sort_rts((codes,), tile_rows or _default_tile_rows(),
                     interpret)[0]


def sort_pairs_rts(codes: jnp.ndarray, payload: jnp.ndarray,
                   tile_rows: int | None = None,
                   interpret: bool | None = None):
    """Stable pair sort through the 3-phase pipeline.

    Bit-exact with jax.lax.sort((codes, payload), is_stable=True): each pass
    is stable (within-row lane order, rows in order, tiles in order).
    """
    from .radix16 import _default_tile_rows

    return _sort_rts((codes, payload.view(jnp.uint32)),
                     tile_rows or _default_tile_rows(pairs=True), interpret)
