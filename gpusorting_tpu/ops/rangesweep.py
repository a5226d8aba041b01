"""Rangesweep — exact-splitter range exchange over pre-sorted mapped chunks.

The flagship keys-only composition (VERDICT r3 missing #1): the ONE cost-model
candidate below XLA's 468 ms/2^28 that round 3 never ran.  Reference role:
OneSweep's DigitBinningPass (OneSweep.cu:164-344) — the engine that wins the
headline benchmark.

  1. pad to N = K*L and `lax.map` K flat XLA chunk sorts — each chunk stays
     VMEM-resident (13 ms per 2^24 on v5e; 16 x 2^24 = 208 ms at 2^28,
     benches/RESULTS.md), unlike the batched dimension=1 form (390 ms).
  2. EXACT balanced cuts: a 32-step value bisection over the K sorted chunks
     (k-way multisequence selection, vectorized over the K-1 boundaries).
     Equal-value runs are split BY COUNT across adjacent buckets — legal for
     keys-only because equal u32 codes are interchangeable — so every bucket
     is exactly L elements for ANY distribution: no sampling slack, no
     overflow path, skew/entropy-proof by construction (contrast
     splitsweep's sampled splitters + overflow fallback).
  3. range exchange: each (chunk, bucket) range is CONTIGUOUS in its sorted
     chunk.  Whole 128-lane rows ride a sequential-grid HBM->HBM DMA
     relocate kernel — no per-element distribution work, so probe13's
     ~6 ms/2^24 bucketize floor does NOT apply.  The <=127-element row
     fringes at range edges (<= 254*K*K elements total, ~65K at K=16) are
     gathered DENSELY into one slab per bucket by a single small XLA
     gather; because bulk_rows*128 + fringe_count == L exactly, the
     bucket's fringe slab is an exact row-aligned fill of the space after
     its packed bulk — one DMA per bucket, every output row written
     exactly once, no scatter and NO padding (round-4b lesson: padding a
     bucket to L + 2K*128 de-power-of-two's phase 3 and XLA's bitonic
     sort pads it back up to 2L — measured +160 ms at 2^28,
     benches/logs/hw_rangesweep3_r4.log).
  4. buckets are dense and exactly L elements: `lax.map` flat sorts again.

Placement order inside a bucket is irrelevant — step 4 re-sorts the bucket;
steps 2-3 only need to deliver the exact multiset, which they do.

Keys-only by design (step 2's count-split of equal runs breaks pair
stability); pairs keep their measured engines (ops/radix.py).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .radix16 import LANES, _is_tpu

_SENTINEL = jnp.uint32(0xFFFFFFFF)
# relocate bounce-buffer height (rows): 2048 rows x 128 lanes x 4 B = 1 MB
_CHUNK_ROWS = 2048


def _grid_sem():
    # block-disjoint programs: core-splittable on Megacore parts
    from ..core.config import grid_semantics, megacore_parallel

    return grid_semantics(megacore_parallel())


def _default_seg_elems() -> int:
    """Chunk length: the VMEM-residency edge of XLA's flat sort (shared
    with mergesweep's phase 1 — same mechanism, same tuner row)."""
    from ..core.config import get_routing_parameters

    return get_routing_parameters().mergesweep_seg_elems


def _exact_cuts(x2: jnp.ndarray, K: int, L: int) -> jnp.ndarray:
    """(K, K+1) per-chunk cut positions making bucket b exactly L elements.

    x2 is (K, L) with sorted u32 rows.  32-step bisection over the value
    space finds, per boundary b, the value v_b whose equal run straddles
    global rank (b+1)*L; counts below v_b come from per-chunk binary
    searches (jnp.searchsorted on sorted rows — K*(K-1) queries per step,
    not per element), and the run itself is split by count in chunk order.
    """
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
    return jnp.concatenate([zeros, cuts, full], axis=1)  # (K, K+1)


def _relocate_kernel(ctrl_ref, src_ref, fringe_ref, out_ref, scratch, sem, *,
                     P: int, K: int, l_rows: int, slab_rows: int,
                     interpret: bool):
    """Sequential-grid HBM->HBM row relocate + dense fringe fill.

    Program p = b*K + i handles the (chunk i -> bucket b) range:
      1. bulk:   ctrl[2P+p] whole rows from src row ctrl[p] to out row
         ctrl[P+p], bounced through a VMEM scratch in _CHUNK_ROWS blocks
         (dynamic row start+size DMA — the envelope probes/PROBES.md
         records as safe)
      2. fringe: the last program of each bucket (i == K-1) copies the
         bucket's densely-packed fringe slab — exactly
         l_rows - ctrl[3P+b] rows, because bulk*128 + fringes == L — from
         fringe row b*slab_rows into the space after the packed bulk

    Every output row is written exactly once by exactly one program — no
    XLA scatter pass, no padding, and the grid stays core-splittable.
    """
    p = pl.program_id(0)
    b = p // K
    i = p - b * K
    s0 = ctrl_ref[p]
    d0 = ctrl_ref[P + p]
    nr = ctrl_ref[2 * P + p]

    def copy_rows(src, s_off, d_off, sz):
        cp = pltpu.make_async_copy(
            src.at[pl.ds(s_off, sz), :], scratch.at[pl.ds(0, sz), :], sem)
        cp.start()
        cp.wait()
        cp2 = pltpu.make_async_copy(
            scratch.at[pl.ds(0, sz), :], out_ref.at[pl.ds(d_off, sz), :],
            sem)
        cp2.start()
        cp2.wait()

    def loop_rows(src, s0, d0, nr):
        if interpret:
            # the interpreter cannot express dynamic-SIZE slices: row by row
            def row_copy(t, _):
                copy_rows(src, s0 + t, d0 + t, 1)
                return 0

            jax.lax.fori_loop(0, nr, row_copy, 0)
        else:
            def body(t, _):
                off = t * _CHUNK_ROWS
                sz = jnp.minimum(jnp.int32(_CHUNK_ROWS), nr - off)
                copy_rows(src, s0 + off, d0 + off, sz)
                return 0

            jax.lax.fori_loop(0, (nr + _CHUNK_ROWS - 1) // _CHUNK_ROWS,
                              body, 0)

    loop_rows(src_ref, s0, d0, nr)

    @pl.when(i == K - 1)
    def _fringe_fill():
        bulk_b = ctrl_ref[3 * P + b]
        loop_rows(fringe_ref, b * slab_rows, b * l_rows + bulk_b,
                  l_rows - bulk_b)


@functools.lru_cache(maxsize=16)
def _build_relocate(rows_out: int, P: int, K: int, l_rows: int,
                    slab_rows: int, interpret: bool):
    kern = functools.partial(_relocate_kernel, P=P, K=K, l_rows=l_rows,
                             slab_rows=slab_rows, interpret=interpret)

    def call(ctrl, src, fringe):
        return pl.pallas_call(
            kern,
            grid=(P,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((rows_out, LANES), jnp.int32),
            scratch_shapes=[
                pltpu.VMEM((_CHUNK_ROWS, LANES), jnp.int32),
                pltpu.SemaphoreType.DMA,
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 << 20, has_side_effects=True,
                # disjoint dst rows per program: core-splittable
                dimension_semantics=_grid_sem()),
            interpret=interpret,
        )(ctrl, src, fringe)

    return call


def _range_exchange(x: jnp.ndarray, bounds: jnp.ndarray, K: int, L: int,
                    interpret: bool) -> jnp.ndarray:
    """Move each (chunk i, bucket b) contiguous range into bucket b's
    dense L-element region: whole rows via the DMA relocate; the
    <=254-element range-edge fringes are gathered DENSELY into one slab
    per bucket (one small XLA gather) and DMA'd as the exact row-aligned
    fill after the bucket's packed bulk (bulk*128 + fringes == L).

    Returns flat (N,) u32: K dense buckets of exactly L elements.
    """
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
    # skips.  Pack bucket b's fringes densely in chunk order: slab
    # position t belongs to chunk c with foff[b,c] <= t < foff[b,c+1].
    lo_end = jnp.minimum(a0 * LANES, g_end)
    front = lo_end - g_start                                   # (i,b)
    hi_start = jnp.maximum(a1 * LANES, lo_end)
    back = g_end - hi_start
    fr_bi = (front + back).T                                   # (b,i)
    foff_bi = jnp.cumsum(fr_bi, axis=1) - fr_bi                # excl, (b,i)
    fringe_b = jnp.sum(fr_bi, axis=1)                          # == L-128*bulk

    t = jax.lax.broadcasted_iota(jnp.int32, (K, slab_rows * LANES), 1)
    c = jax.vmap(
        lambda fo, tt: jnp.searchsorted(fo, tt, side="right").astype(
            jnp.int32))(foff_bi, t) - 1
    c = jnp.clip(c, 0, K - 1)
    take = lambda m: jnp.take_along_axis(m.T, c, axis=1)       # (b, slab)
    j = t - take(foff_bi.T)
    src = jnp.where(j < take(front), take(g_start) + j,
                    take(hi_start) + (j - take(front)))
    valid = t < fringe_b[:, None]
    vals = jnp.where(valid.reshape(-1),
                     x[jnp.clip(src, 0, N - 1).reshape(-1)], _SENTINEL)
    fringe = vals.reshape(K * slab_rows, LANES)

    out2 = _build_relocate(rows_total, K * K, K, l_rows, slab_rows,
                           interpret)(
        ctrl, x.reshape(rows_total, LANES).view(jnp.int32),
        fringe.view(jnp.int32))
    return out2.view(jnp.uint32).reshape(-1)


def sort_codes_rangesweep(codes: jnp.ndarray,
                          seg_elems: int | None = None,
                          interpret: bool | None = None) -> jnp.ndarray:
    """Ascending keys-only sort of u32 codes via the range exchange."""
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

    # phase 1: mapped VMEM-resident chunk sorts
    x2 = jax.lax.map(lambda r: xla_sort.sort_all_keys_unstable((r,))[0],
                     x.reshape(K, L))
    # phase 2: exact cuts + range exchange (dense buckets, flat (N,))
    bounds = _exact_cuts(x2, K, L)
    out = _range_exchange(x2.reshape(-1), bounds, K, L, interpret)
    # phase 3: mapped dense-bucket sorts — the same shape as phase 1
    res = jax.lax.map(lambda r: xla_sort.sort_all_keys_unstable((r,))[0],
                      out.reshape(K, L))
    return res.reshape(-1)[:n]
