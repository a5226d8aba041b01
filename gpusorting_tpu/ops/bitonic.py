"""Native TPU sorting network — the round-1 Pallas compute path.

Why a Batcher bitonic network (see probes/PROBES.md for the measured design
space): sorting at 2^28 on this part is VPU-bound, and a compare-exchange
stage is the cheapest per-element primitive (~5-7 VPU ops with stride pairing
via lane gathers / sublane rolls).  All radix-grouping schemes require a
data-dependent permutation whose src/one-hot construction costs >=100 VPU
ops/elem/pass and/or breaks on skewed digit distributions, so the network wins
for a first native implementation: it is exact, skew-immune, stable (with an
index tiebreak), and pairs-capable (ride-along operands).

Reference mapping: this plays the role of the reference's device sort kernels
(DeviceRadixSort.hlsl / OneSweep.cu DigitBinningPass) — one fused in-VMEM
stage pass is the analog of a "partition pass", and the cross-tile stages are
the analog of the inter-block scan/scatter, built on TPU sequential-grid
semantics instead of warp ballots and decoupled lookback (SURVEY.md §2.7).

Structure for N = R*128 elements (power of two), element i at (row i>>7,
lane i&127):

  for level k in 2,4,...,N:            # sorted runs of k, alternating
    for stride j in k/2,...,1:         # compare-exchange i <-> i^j
      want_min(i) = ((i&j)==0) == ((i&k)==0)

  * strides j < TILE elems run fused in one Pallas kernel per tile, looping
    over a (j, k) schedule held in SMEM (the tile never leaves VMEM; traced
    strides because static unrolling takes minutes-per-stage to compile on
    this backend's remote AOT compiler)
  * strides j >= TILE elems run as one elementwise kernel over block pairs
    (each program reads its block and its partner block b ^ (j/TILE))

Comparisons are on sign-biased int32 (u32 min/max crashes Mosaic on this
backend — PROBES.md); signed ordering on biased codes equals u32 order.

Multiple operands ride the network like `jax.lax.sort` variadic operands:
the first `num_keys` operands form the lexicographic comparator (key codes,
then an index tiebreak for stability), the rest are permuted along.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128


def _grid_sem():
    # block-disjoint programs: core-splittable on Megacore parts
    from ..core.config import grid_semantics, megacore_parallel

    return grid_semantics(megacore_parallel())


def _tuning():
    from ..core.config import get_tuning_parameters

    return get_tuning_parameters()

_SIGN = jnp.int32(-0x80000000)


def _bias_u32_to_i32(x: jnp.ndarray) -> jnp.ndarray:
    """Map u32 so that signed i32 order == unsigned u32 order."""
    return (x.view(jnp.int32) if x.dtype == jnp.uint32 else x) ^ _SIGN


def _unbias_i32_to_u32(x: jnp.ndarray) -> jnp.ndarray:
    return (x ^ _SIGN).view(jnp.uint32)


def _lex_lt(self_ops, peer_ops, num_keys: int):
    """self < peer lexicographically over the first num_keys operands (i32)."""
    lt = self_ops[0] < peer_ops[0]
    eq = None
    for t in range(1, num_keys):
        e = self_ops[t - 1] == peer_ops[t - 1]
        eq = e if eq is None else (eq & e)
        lt = lt | (eq & (self_ops[t] < peer_ops[t]))
    return lt


def _stage(ops, peers, want_min, num_keys):
    self_lt = _lex_lt(ops, peers, num_keys)
    take_self = self_lt == want_min
    return tuple(jnp.where(take_self, y, p) for y, p in zip(ops, peers))


def _local_stages_kernel(sched_ref, *refs, num_ops: int, num_keys: int,
                         tile_rows: int, num_stages: int):
    """Run a (j, k) schedule (SMEM array) on one VMEM-resident tile.

    The schedule loop is a `fori_loop` with traced strides: static unrolling
    compiles catastrophically slowly on this backend's remote AOT compiler
    (48 stages = 380 s), while the dynamic form compiles in seconds and runs
    within ~2x of the static form's projected rate.
    """
    in_refs = refs[:num_ops]
    out_refs = refs[num_ops:]
    row_base = pl.program_id(0) * tile_rows
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 1)
    lrow = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 0)
    grow = lrow + row_base

    def body(s, ops):
        j = sched_ref[s, 0]
        k = sched_ref[s, 1]

        def lane_peers(ops):
            idx = lane ^ j
            return tuple(jnp.take_along_axis(y, idx, axis=1) for y in ops)

        def row_peers(ops):
            jr = j // LANES
            rbit = (lrow & jr) != 0
            out = []
            for y in ops:
                up = pltpu.roll(y, -jr, axis=0)  # y[row + jr]
                dn = pltpu.roll(y, jr, axis=0)   # y[row - jr]
                out.append(jnp.where(rbit, dn, up))
            return tuple(out)

        peers = jax.lax.cond(j < LANES, lane_peers, row_peers, ops)
        jbit = jnp.where(j < LANES, lane & j, lrow & (j // LANES)) != 0
        kbit = jnp.where(k < LANES, lane & k, grow & (k // LANES)) != 0
        return _stage(ops, peers, jbit == kbit, num_keys)

    ops = jax.lax.fori_loop(0, num_stages, body, tuple(r[:] for r in in_refs))
    for o_ref, y in zip(out_refs, ops):
        o_ref[:] = y


def _global_stage_kernel(jk_ref, *refs, num_ops: int, num_keys: int,
                         tile_rows: int):
    """One compare-exchange stage with stride >= tile: program b reads its own
    block and partner block b ^ (j/tile); j,k from SMEM; writes its block."""
    self_refs = refs[:num_ops]
    peer_refs = refs[num_ops:2 * num_ops]
    out_refs = refs[2 * num_ops:]
    j = jk_ref[0]
    k = jk_ref[1]
    i0 = pl.program_id(0) * (tile_rows * LANES)
    want_min = ((i0 & j) != 0) == ((i0 & k) != 0)
    ops = tuple(r[:] for r in self_refs)
    peers = tuple(r[:] for r in peer_refs)
    out = _stage(ops, peers, want_min, num_keys)
    for o_ref, y in zip(out_refs, out):
        o_ref[:] = y


@functools.lru_cache(maxsize=128)
def _build_local_pass(num_ops, num_keys, tile_rows, num_stages, grid,
                      interpret):
    kern = functools.partial(
        _local_stages_kernel, num_ops=num_ops, num_keys=num_keys,
        tile_rows=tile_rows, num_stages=num_stages)
    blk = lambda: pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0))

    def call(sched, *args):
        return pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [
                blk() for _ in range(num_ops)],
            out_specs=tuple(blk() for _ in range(num_ops)),
            out_shape=tuple(
                jax.ShapeDtypeStruct((grid * tile_rows, LANES), jnp.int32)
                for _ in range(num_ops)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_tuning().vmem_limit_bytes,
                dimension_semantics=_grid_sem()),
            interpret=interpret,
        )(sched, *args)
    return call


@functools.lru_cache(maxsize=128)
def _build_global_stage(num_ops, num_keys, tile_rows, grid, jblocks, interpret):
    """jblocks = j // tile_elems, static so the partner index map is static."""
    kern = functools.partial(
        _global_stage_kernel, num_ops=num_ops, num_keys=num_keys,
        tile_rows=tile_rows)
    self_blk = lambda: pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0))
    peer_blk = lambda: pl.BlockSpec((tile_rows, LANES), lambda i: (i ^ jblocks, 0))

    def call(jk, *ops):
        return pl.pallas_call(
            kern,
            grid=(grid,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [self_blk() for _ in range(num_ops)]
            + [peer_blk() for _ in range(num_ops)],
            out_specs=tuple(self_blk() for _ in range(num_ops)),
            out_shape=tuple(
                jax.ShapeDtypeStruct((grid * tile_rows, LANES), jnp.int32)
                for _ in range(num_ops)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_tuning().vmem_limit_bytes,
                dimension_semantics=_grid_sem()),
            interpret=interpret,
        )(jk, *ops, *ops)
    return call


def _is_tpu() -> bool:
    return jax.devices()[0].platform == "tpu"


def sort_network_i32(operands, num_keys: int, interpret: bool | None = None):
    """Sort equal-length 1-D i32 operand tuple lexicographically by the first
    num_keys operands (ascending, signed).  Returns permuted operands.

    Pure network core: key operands must already be sign-biased if they
    encode u32 codes.

    PAD-TIE INVARIANT (shared with mergesweep.merge_sort_network_i32): the
    network is unstable and pads EVERY operand with int32 max.  When
    num_keys < len(operands), callers must make real key tuples strictly
    smaller than the all-max pad tuple — e.g. a bounded index tiebreak as
    the last key (sort_codes_stable_with's idx < n).  Keys-only calls are
    always safe: max-tied elements are interchangeable.
    """
    if interpret is None:
        interpret = not _is_tpu()
    n = operands[0].shape[0]
    num_ops = len(operands)
    N = max(1024, 1 << (n - 1).bit_length())
    R = N // LANES
    tile_rows = min(_tuning().network_tile_rows(num_ops), R)
    tile_elems = tile_rows * LANES
    grid = R // tile_rows

    pad = N - n
    padded = []
    for x in operands:
        if pad:
            fill = jnp.full((pad,), jnp.iinfo(jnp.int32).max, jnp.int32)
            x = jnp.concatenate([x, fill])
        padded.append(x.reshape(R, LANES))

    # --- levels fully inside a tile: one fused pass over a SMEM schedule ---
    sched = []
    k = 2
    while k <= tile_elems:
        j = k // 2
        while j >= 1:
            sched.append((j, k))
            j //= 2
        k *= 2
    sched_arr = jnp.asarray(np.array(sched, np.int32).reshape(-1, 2))
    local_pass = _build_local_pass(
        num_ops, num_keys, tile_rows, len(sched), grid, interpret)
    ops = tuple(local_pass(sched_arr, *padded))

    # --- levels above the tile: global stages + a reusable local tail ---
    tail_js = _powers_desc(tile_elems // 2)
    tail_pass = _build_local_pass(
        num_ops, num_keys, tile_rows, len(tail_js), grid, interpret)
    k = tile_elems * 2
    while k <= N:
        j = k // 2
        while j >= tile_elems:
            gcall = _build_global_stage(
                num_ops, num_keys, tile_rows, grid, j // tile_elems, interpret)
            ops = tuple(gcall(jnp.asarray([j, k], jnp.int32), *ops))
            j //= 2
        tail_arr = jnp.asarray(
            np.array([(jj, k) for jj in tail_js], np.int32).reshape(-1, 2))
        ops = tuple(tail_pass(tail_arr, *ops))
        k *= 2

    return tuple(y.reshape(N)[:n] for y in ops)


def _powers_desc(top: int):
    out = []
    j = top
    while j >= 1:
        out.append(j)
        j //= 2
    return out


# ---------------------------------------------------------------------------
# lax.sort-compatible wrappers on u32 code arrays
# ---------------------------------------------------------------------------


def sort_codes(codes: jnp.ndarray) -> jnp.ndarray:
    """Ascending sort of u32 codes (keys-only; duplicates indistinguishable)."""
    (out,) = sort_network_i32((_bias_u32_to_i32(codes),), num_keys=1)
    return _unbias_i32_to_u32(out)


def sort_codes_stable_with(codes: jnp.ndarray, *ride: jnp.ndarray):
    """Stable ascending sort of u32 codes; `ride` u32 arrays are permuted along.

    Stability comes from an index tiebreak operand (total order), matching
    `jax.lax.sort(is_stable=True)` output bit-for-bit.
    """
    n = codes.shape[0]
    idx = jax.lax.iota(jnp.int32, n)
    ops = (_bias_u32_to_i32(codes), idx) + tuple(r.view(jnp.int32) for r in ride)
    out = sort_network_i32(ops, num_keys=2)
    sorted_codes = _unbias_i32_to_u32(out[0])
    sorted_ride = tuple(r.view(jnp.uint32) for r in out[2:])
    return (sorted_codes,) + sorted_ride
