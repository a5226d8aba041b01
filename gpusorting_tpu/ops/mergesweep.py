"""Mergesweep — mapped-segment sort + fused Batcher merge tail (flagship).

Round-3 measurements that shape this design (probes/PROBES.md round 3,
benches/RESULTS.md):

  - XLA's flat sort is VMEM-resident up to 2^24 (13 ms, 1.29 Gkeys/s) and
    decays to 0.575 G at 2^28 — but `lax.map` over 2^24 chunks keeps the
    per-chunk rate at ANY total size (16 x 2^24 = 208 ms at 2^28).  The
    batched `dimension=1` form does NOT (390 ms) — XLA sorts it at
    near-flat-rate.
  - A compare-exchange stage floor is ~1.1 ms per 2^28 (248 Gcmpex/s);
    the round-2 local-stages kernel ran 6x off that floor (per-stage
    lax.cond between lane/row paths + per-stage direction-bit rebuilds).

Structure for N = 2^p elements:

  1. pad to N; view as K = N/L segments of L = 2^24 (VMEM-residency edge)
  2. odd segments get bit-flipped keys (sorting ~x ascending == sorting x
     descending — avoids materializing a reversal, which costs 17.6 ms/2^26
     through XLA's rev)
  3. `lax.map` of flat XLA sorts over the K segments, then un-flip
  4. merge passes k = 2L..N of the standard Batcher network, each pass:
       - ONE fused hyper-stage kernel for all strides j >= tile (elements
         re-viewed as (H, W, lo, 128) so the W axis carries the high
         stride bits — one HBM round-trip for up to log2(W) stages)
       - ONE fused tail kernel for all strides j < tile (row-stage loop +
         lane-stage loop, direction bits hoisted; no per-stage cond)

Properties: exact for any distribution (oblivious — no splitters, no
slack, no overflow), jit-safe, stable with an index tiebreak, pairs ride
along.  This engine is the TPU analog of the reference's OneSweep role
(OneSweep.cu:164-344): the one that wins the headline benchmark; like the
reference leans on CUB block primitives, it leans on XLA's sort at the
size where XLA is optimal and spends native kernels only on the merge.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .bitonic import (
    LANES,
    _bias_u32_to_i32,
    _build_global_stage,
    _is_tpu,
    _lex_lt,
    _tuning,
    _unbias_i32_to_u32,
)

# The fused hyper-stage kernel (one HBM trip for all high strides of a
# pass) SIGSEGVs this Mosaic at production shapes (W=2, lo_tile=8192 —
# probes round 3); high strides fall back to per-stage global kernels
# until a newer backend lands.  GST_MERGESWEEP_HYPER=1 re-enables it.
import os as _os

_USE_HYPER = _os.environ.get("GST_MERGESWEEP_HYPER", "0") == "1"

def _default_seg_elems() -> int:
    """Segment length for the mapped phase-1 sorts: 2^24 i32 = 64 MB is the
    measured VMEM-residency edge of XLA's flat sort on v5e (13 ms/segment);
    the value lives in the routing tuner so other generations can override
    it (core.config.RoutingParameters.mergesweep_seg_elems)."""
    from ..core.config import get_routing_parameters

    return get_routing_parameters().mergesweep_seg_elems


def _grid_sem():
    # block-disjoint programs: core-splittable on Megacore parts
    from ..core.config import grid_semantics, megacore_parallel

    return grid_semantics(megacore_parallel())


def _tile_rows_for(num_ops: int, R: int) -> int:
    budget = _tuning().vmem_limit_bytes
    rows = max(8, budget // (num_ops * LANES * 4 * 3))  # in + out + slack
    rows = 1 << (rows.bit_length() - 1)
    # blocks above 16384 rows crash this Mosaic (SIGSEGV in the remote AOT
    # compiler at 65536-row BlockSpecs — round-3 sweep); cap matches the
    # round-2 network tile ceiling
    return min(rows, 16384, R)


def _merge_tail_kernel(ctrl_ref, *refs, num_ops: int, num_keys: int,
                       tile_rows: int, num_row_stages: int,
                       num_lane_stages: int):
    """All strides j < tile_elems of one merge pass k, fused.

    ctrl = [k_row (k//128), jr_top (top row stride)].
    Row stages run jr = jr_top >> s; lane stages run j = 64 >> s.  The
    k-direction bit is hoisted out of both loops (constant per pass), and
    there is no per-stage branch — the round-2 kernel's 6x-off-floor cost
    was the per-stage lane/row cond + direction-bit rebuilds.
    """
    in_refs = refs[:num_ops]
    out_refs = refs[num_ops:]
    row_base = pl.program_id(0) * tile_rows
    lane = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 1)
    lrow = jax.lax.broadcasted_iota(jnp.int32, (tile_rows, LANES), 0)
    k_row = ctrl_ref[0]
    jr_top = ctrl_ref[1]
    # direction: want_min = (jbit == kbit); kbit constant across the pass
    kbit = ((lrow + row_base) & k_row) != 0

    ops = tuple(r[:] for r in in_refs)

    def row_body(s, ops):
        jr = jax.lax.shift_right_logical(jr_top, s)
        rbit = (lrow & jr) != 0
        want_min = rbit == kbit
        peers = []
        for y in ops:
            up = pltpu.roll(y, -jr, axis=0)   # y[row + jr]
            dn = pltpu.roll(y, jr, axis=0)    # y[row - jr]
            peers.append(jnp.where(rbit, dn, up))
        self_lt = _lex_lt(ops, peers, num_keys)
        take_self = self_lt == want_min
        return tuple(jnp.where(take_self, y, p)
                     for y, p in zip(ops, peers))

    ops = jax.lax.fori_loop(0, num_row_stages, row_body, ops)

    def lane_body(s, ops):
        j = jax.lax.shift_right_logical(jnp.int32(64), s)
        idx = lane ^ j
        want_min = ((lane & j) != 0) == kbit
        peers = tuple(jnp.take_along_axis(y, idx, axis=1) for y in ops)
        self_lt = _lex_lt(ops, peers, num_keys)
        take_self = self_lt == want_min
        return tuple(jnp.where(take_self, y, p)
                     for y, p in zip(ops, peers))

    ops = jax.lax.fori_loop(0, num_lane_stages, lane_body, ops)
    for o_ref, y in zip(out_refs, ops):
        o_ref[:] = y


@functools.lru_cache(maxsize=64)
def _build_merge_tail(num_ops, num_keys, tile_rows, num_row_stages,
                      num_lane_stages, grid, interpret):
    kern = functools.partial(
        _merge_tail_kernel, num_ops=num_ops, num_keys=num_keys,
        tile_rows=tile_rows, num_row_stages=num_row_stages,
        num_lane_stages=num_lane_stages)
    blk = lambda: pl.BlockSpec((tile_rows, LANES), lambda i: (i, 0))

    def call(ctrl, *args):
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
        )(ctrl, *args)
    return call


def _hyper_stage_kernel(ctrl_ref, *refs, num_ops: int, num_keys: int,
                        W: int, lo_tile: int, lo_log: int, num_stages: int):
    """All strides j >= tile_elems of one merge pass, in one HBM trip.

    The caller views the row space as (H, W, mid, lo_tile, LANES) where the
    W axis spans exactly the row-stride bits of this pass's high stages;
    each program loads a (1, W, 1, lo_tile, LANES) block, so stage s pairs
    rows at distance (W >> (s+1)) * lo_tile inside the block.

    ctrl = [k_row, hi_row_base] — hi_row_base is this program's global row
    of block element 0 (for the k-direction bit, constant per program).
    """
    in_refs = refs[:num_ops]
    out_refs = refs[num_ops:]
    rows = W * lo_tile
    lrow = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 0)
    k_row = ctrl_ref[0]
    h = pl.program_id(0)
    c = pl.program_id(1)
    # global row of block row r: h*(W*stride_rows) + w*stride_rows +
    # c*lo_tile + i, where stride_rows = the LOW stage's jr = mid*lo_tile.
    # Only bits >= the top stride matter for kbit (k_row > all w bits).
    hi_base = h * (W * ctrl_ref[1]) + c * lo_tile
    kbit = ((hi_base + 0 * lrow) & k_row) != 0  # constant (broadcast) plane
    w_of = jax.lax.shift_right_logical(lrow, lo_log)

    ops = tuple(r[:].reshape(rows, LANES) for r in in_refs)

    def body(s, ops):
        wj = jax.lax.shift_right_logical(jnp.int32(W), s + 1)  # partner w bit
        jr = wj * lo_tile
        rbit = (w_of & wj) != 0
        want_min = rbit == kbit
        peers = []
        for y in ops:
            up = pltpu.roll(y, -jr, axis=0)
            dn = pltpu.roll(y, jr, axis=0)
            peers.append(jnp.where(rbit, dn, up))
        self_lt = _lex_lt(ops, peers, num_keys)
        take_self = self_lt == want_min
        return tuple(jnp.where(take_self, y, p)
                     for y, p in zip(ops, peers))

    ops = jax.lax.fori_loop(0, num_stages, body, ops)
    for o_ref, y in zip(out_refs, ops):
        o_ref[:] = y.reshape(1, W, 1, lo_tile, LANES)


@functools.lru_cache(maxsize=64)
def _build_hyper_stage(num_ops, num_keys, W, lo_tile, num_stages, H, mid,
                       interpret):
    lo_log = lo_tile.bit_length() - 1
    kern = functools.partial(
        _hyper_stage_kernel, num_ops=num_ops, num_keys=num_keys, W=W,
        lo_tile=lo_tile, lo_log=lo_log, num_stages=num_stages)
    blk = lambda: pl.BlockSpec((1, W, 1, lo_tile, LANES),
                               lambda h, c: (h, 0, c, 0, 0))

    def call(ctrl, *args):
        return pl.pallas_call(
            kern,
            grid=(H, mid),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)] + [
                blk() for _ in range(num_ops)],
            out_specs=tuple(blk() for _ in range(num_ops)),
            out_shape=tuple(
                jax.ShapeDtypeStruct((H, W, mid, lo_tile, LANES), jnp.int32)
                for _ in range(num_ops)),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=_tuning().vmem_limit_bytes,
                dimension_semantics=_grid_sem()),
            interpret=interpret,
        )(ctrl, *args)
    return call


def _run_merge_pass(ops, k, R, tile_rows, num_ops, num_keys, interpret):
    """One merge pass (all strides k/2 .. 1) on (R, LANES) i32 operands."""
    tile_elems = tile_rows * LANES
    grid = R // tile_rows
    k_row = k // LANES

    # high strides j = k/2 .. tile_elems: per-stage global kernels (the
    # fused hyper path crashes this Mosaic — see _USE_HYPER note)
    if k > tile_elems and not _USE_HYPER:
        j = k // 2
        while j >= tile_elems:
            gcall = _build_global_stage(
                num_ops, num_keys, tile_rows, grid, j // tile_elems,
                interpret)
            ops = tuple(gcall(jnp.asarray([j, k], jnp.int32), *ops))
            j //= 2
    elif k > tile_elems:
        num_hi = (k // (2 * tile_elems)).bit_length()
        W = 1 << num_hi
        stride_rows = tile_rows            # lowest high stride, in rows
        span = W * stride_rows             # rows spanned by the W axis
        H = R // span
        # split stride_rows into (mid, lo_tile) to bound VMEM: block rows
        # = W * lo_tile
        max_rows = _tile_rows_for(num_ops, R)
        lo_tile = max(8, min(stride_rows, max_rows // W))
        mid = stride_rows // lo_tile
        hyper = _build_hyper_stage(num_ops, num_keys, W, lo_tile, num_hi,
                                   H, mid, interpret)
        ctrl = jnp.asarray([k_row, stride_rows], jnp.int32)
        shaped = tuple(y.reshape(H, W, mid, lo_tile, LANES) for y in ops)
        out = hyper(ctrl, *shaped)
        ops = tuple(y.reshape(R, LANES) for y in out)

    # low strides j < min(k, tile_elems): one fused tail call
    top = min(k, tile_elems)
    jr_top = max(1, (top // 2) // LANES)
    num_row_stages = jr_top.bit_length() if top > LANES else 0
    num_lane_stages = 7  # 64..1 (LANES=128)
    tail = _build_merge_tail(num_ops, num_keys, tile_rows, num_row_stages,
                             num_lane_stages, grid, interpret)
    ctrl = jnp.asarray([k_row, jr_top], jnp.int32)
    return tuple(tail(ctrl, *ops))


def merge_sort_network_i32(
    operands,
    num_keys: int,
    seg_elems: int | None = None,
    interpret: bool | None = None,
):
    """Sort equal-length 1-D i32 operand tuple lexicographically by the
    first num_keys operands (ascending, signed); returns permuted operands.

    Key operands must already be sign-biased if they encode u32 codes
    (same contract as bitonic.sort_network_i32).

    PAD-TIE INVARIANT (shared with bitonic.sort_network_i32): the network
    is unstable and pads EVERY operand with int32 max.  When num_keys <
    len(operands), a real element whose key tuple equals the all-max pad
    tuple could receive pad fill in its non-key operands — callers must
    make real key tuples strictly smaller than all-max, e.g. by passing a
    bounded index tiebreak as the last key (what sort_codes_stable_with
    does: idx < n <= int32 max).  Keys-only calls (num_keys ==
    len(operands)) are always safe: max-tied elements are interchangeable.
    """
    if interpret is None:
        interpret = not _is_tpu()
    n = operands[0].shape[0]
    num_ops = len(operands)
    N = max(1024, 1 << (n - 1).bit_length())
    L = seg_elems or _default_seg_elems()
    if L & (L - 1):
        raise ValueError(f"seg_elems must be a power of two, got {L}")
    L = min(L, N)
    if L < 1024:
        raise ValueError(f"seg_elems must be >= 1024, got {L}")
    K = N // L
    R = N // LANES

    pad = N - n
    padded = []
    for x in operands:
        if pad:
            fill = jnp.full((pad,), jnp.iinfo(jnp.int32).max, jnp.int32)
            x = jnp.concatenate([x, fill])
        padded.append(x)

    if K == 1:
        out = jax.lax.sort(tuple(padded), num_keys=num_keys,
                           is_stable=False)
        return tuple(y[:n] for y in out)

    # --- phase 1: mapped flat sorts; odd segments sort descending via the
    # bit-flip trick (sorting ~x ascending == x descending; applied to ALL
    # key operands so lexicographic order flips as a whole) ---
    flip = ((jax.lax.iota(jnp.int32, N) >> (L.bit_length() - 1)) & 1) != 0
    prep = [jnp.where(flip, ~y, y) if i < num_keys else y
            for i, y in enumerate(padded)]
    # 3-D (l_rows, LANES) map bodies dodge the flat (K, L) boundary
    # relayout (campaign 12/14 mechanism; L is a power of two >= LANES
    # whenever K > 1 here, but keep the flat fallback for tiny L)
    if L % LANES == 0:
        lr = L // LANES
        stacked = tuple(y.reshape(K, lr, LANES) for y in prep)

        def seg_sort(args):
            s = jax.lax.sort(tuple(a.reshape(-1) for a in args),
                             num_keys=num_keys, is_stable=False)
            return tuple(a.reshape(lr, LANES) for a in s)
    else:
        stacked = tuple(y.reshape(K, L) for y in prep)

        def seg_sort(args):
            return jax.lax.sort(args, num_keys=num_keys, is_stable=False)

    res = jax.lax.map(seg_sort, stacked)
    flat = [y.reshape(N) for y in (res if isinstance(res, tuple) else (res,))]
    ops = tuple(
        (jnp.where(flip, ~y, y) if i < num_keys else y).reshape(R, LANES)
        for i, y in enumerate(flat))

    # --- phase 2: merge passes k = 2L .. N ---
    tile_rows = _tile_rows_for(num_ops, R)
    k = L * 2
    while k <= N:
        ops = _run_merge_pass(ops, k, R, tile_rows, num_ops, num_keys,
                              interpret)
        k *= 2

    return tuple(y.reshape(N)[:n] for y in ops)


def sort_codes(codes: jnp.ndarray, seg_elems: int | None = None,
               interpret: bool | None = None) -> jnp.ndarray:
    """Ascending keys-only sort of u32 codes via the mergesweep engine."""
    (out,) = merge_sort_network_i32(
        (_bias_u32_to_i32(codes),), num_keys=1, seg_elems=seg_elems,
        interpret=interpret)
    return _unbias_i32_to_u32(out)


def sort_codes_stable_with(codes: jnp.ndarray, *ride: jnp.ndarray,
                           seg_elems: int | None = None,
                           interpret: bool | None = None):
    """Stable ascending sort of u32 codes with ride-along u32 operands.

    Index-tiebreak stability — bit-exact with
    jax.lax.sort((codes, *ride), is_stable=True)."""
    n = codes.shape[0]
    idx = jax.lax.iota(jnp.int32, n)
    ops = ((_bias_u32_to_i32(codes), idx)
           + tuple(r.view(jnp.int32) for r in ride))
    out = merge_sort_network_i32(ops, num_keys=2, seg_elems=seg_elems,
                                 interpret=interpret)
    sorted_codes = _unbias_i32_to_u32(out[0])
    return (sorted_codes,) + tuple(r.view(jnp.uint32) for r in out[2:])
