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
     gathered into two sentinel-padded rows per (chunk, bucket) and placed
     at STATIC positions in the bucket's 2K-row slack by the same kernel;
     the kernel sentinel-fills the bulk/fringe seam — every output row is
     written exactly once, no XLA scatter pass anywhere.
  4. buckets are exactly L real elements in an (L + 2K*128)-element padded
     region: `lax.map` flat sorts again, keep each row's first L.

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
# fringe slots per (chunk, bucket) range: two partial rows + slack
_FRINGE_SLOTS = 256


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
                     P: int, K: int, l_rows: int, region_rows: int,
                     interpret: bool):
    """Sequential-grid HBM->HBM row relocate + fringe placement + gap fill.

    Program p = b*K + i handles the (chunk i -> bucket b) range:
      1. bulk:   ctrl[2P+p] whole rows from src row ctrl[p] to out row
         ctrl[P+p], bounced through a VMEM scratch in _CHUNK_ROWS blocks
         (dynamic row start+size DMA — the envelope probes/PROBES.md
         records as safe)
      2. fringe: 2 STATIC rows fringe[2p:2p+2] -> out rows
         [b*region_rows + l_rows + 2i, +2) — the <=254 sub-row elements
         at the range's edges, sentinel-padded by the host
      3. gap:    the last program of each bucket (i == K-1) fills the
         unwritten rows between the bucket's packed bulk (ctrl[3P+b]
         rows) and l_rows with the sentinel

    Every output row is written exactly once by exactly one program — no
    XLA scatter pass, no prefill, and the grid stays core-splittable.
    """
    p = pl.program_id(0)
    b = p // K
    i = p - b * K
    s0 = ctrl_ref[p]
    d0 = ctrl_ref[P + p]
    nr = ctrl_ref[2 * P + p]
    base = b * region_rows

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

    if interpret:
        # the interpreter cannot express dynamic-SIZE slices: row by row
        def row_copy(t, _):
            copy_rows(src_ref, s0 + t, d0 + t, 1)
            return 0

        jax.lax.fori_loop(0, nr, row_copy, 0)

        def fr_copy(t, _):
            copy_rows(fringe_ref, 2 * p + t, base + l_rows + 2 * i + t, 1)
            return 0

        jax.lax.fori_loop(0, 2, fr_copy, 0)
    else:
        nblocks = (nr + _CHUNK_ROWS - 1) // _CHUNK_ROWS

        def body(t, _):
            off = t * _CHUNK_ROWS
            sz = jnp.minimum(jnp.int32(_CHUNK_ROWS), nr - off)
            copy_rows(src_ref, s0 + off, d0 + off, sz)
            return 0

        jax.lax.fori_loop(0, nblocks, body, 0)
        copy_rows(fringe_ref, 2 * p, base + l_rows + 2 * i, 2)

    @pl.when(i == K - 1)
    def _gap_fill():
        bulk_b = ctrl_ref[3 * P + b]
        gn = l_rows - bulk_b  # <= ~2K+1 rows (<=254 fringe elems/chunk)
        scratch[...] = jnp.full((_CHUNK_ROWS, LANES), -1, jnp.int32)

        if interpret:
            def g_row(t, _):
                cp = pltpu.make_async_copy(
                    scratch.at[pl.ds(0, 1), :],
                    out_ref.at[pl.ds(base + bulk_b + t, 1), :], sem)
                cp.start()
                cp.wait()
                return 0

            jax.lax.fori_loop(0, gn, g_row, 0)
        else:
            def g_body(t, _):
                off = t * _CHUNK_ROWS
                sz = jnp.minimum(jnp.int32(_CHUNK_ROWS), gn - off)
                cp = pltpu.make_async_copy(
                    scratch.at[pl.ds(0, sz), :],
                    out_ref.at[pl.ds(base + bulk_b + off, sz), :], sem)
                cp.start()
                cp.wait()
                return 0

            jax.lax.fori_loop(0, (gn + _CHUNK_ROWS - 1) // _CHUNK_ROWS,
                              g_body, 0)


@functools.lru_cache(maxsize=16)
def _build_relocate(rows_out: int, P: int, K: int, l_rows: int,
                    region_rows: int, interpret: bool):
    kern = functools.partial(_relocate_kernel, P=P, K=K, l_rows=l_rows,
                             region_rows=region_rows, interpret=interpret)

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
    PADDED region (l_rows bulk+gap rows, then 2K static fringe rows):
    whole rows via the DMA relocate, <=254-element range-edge fringes as
    two sentinel-padded rows per (b, i) placed at static positions by the
    same kernel — no per-element scatter anywhere.

    Returns (K, Lp) u32 with Lp = L + 2*K*LANES: each row holds bucket
    b's exact L-element multiset plus sentinels; the caller sorts each
    padded row and keeps the first L.
    """
    N = K * L
    rows_total = N // LANES
    l_rows = L // LANES
    region_rows = l_rows + 2 * K
    i_base = (jnp.arange(K, dtype=jnp.int32) * L)[:, None]    # (K,1)
    g_start = bounds[:, :-1] + i_base                          # (K,K) elems
    g_end = bounds[:, 1:] + i_base

    a0 = -(-g_start // LANES)                                  # ceil rows
    a1 = g_end // LANES                                        # floor rows
    nrows = jnp.maximum(a1 - a0, 0)                            # (i,b)

    # output-major (b, i) ordering
    nr_bi = nrows.T                                            # (b,i)
    bulk_rows_b = jnp.sum(nr_bi, axis=1)                       # (b,)
    dst_bi = (jnp.arange(K, dtype=jnp.int32) * region_rows)[:, None] + (
        jnp.cumsum(nr_bi, axis=1) - nr_bi)
    ctrl = jnp.concatenate(
        [a0.T.reshape(-1), dst_bi.reshape(-1), nr_bi.reshape(-1),
         bulk_rows_b])

    # fringes: the <=127-element ends of each range that the row relocate
    # skips, gathered into two dense sentinel-padded rows per (b, i)
    lo_end = jnp.minimum(a0 * LANES, g_end)
    front = lo_end - g_start                                   # (i,b)
    hi_start = jnp.maximum(a1 * LANES, lo_end)
    back = g_end - hi_start
    j = jax.lax.broadcasted_iota(jnp.int32, (K, K, _FRINGE_SLOTS), 2)
    src = jnp.where(
        j < front[:, :, None], g_start[:, :, None] + j,
        hi_start[:, :, None] + (j - front[:, :, None]))
    valid = j < (front + back)[:, :, None]
    vals = jnp.where(valid.reshape(-1),
                     x[jnp.clip(src, 0, N - 1).reshape(-1)], _SENTINEL)
    fringe = jnp.transpose(vals.reshape(K, K, _FRINGE_SLOTS),
                           (1, 0, 2)).reshape(-1, LANES)       # (2*K*K,128)

    out2 = _build_relocate(K * region_rows, K * K, K, l_rows, region_rows,
                           interpret)(
        ctrl, x.reshape(rows_total, LANES).view(jnp.int32),
        fringe.view(jnp.int32))
    return out2.view(jnp.uint32).reshape(K, region_rows * LANES)


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
    # phase 2: exact cuts + range exchange (padded buckets, (K, Lp))
    bounds = _exact_cuts(x2, K, L)
    out = _range_exchange(x2.reshape(-1), bounds, K, L, interpret)
    # phase 3: mapped padded-bucket sorts; sentinels sort to each row's
    # tail, the first L elements are the bucket (slice inside the map body
    # so the padded (K, Lp) intermediate is never materialized)
    res = jax.lax.map(
        lambda r: xla_sort.sort_all_keys_unstable((r,))[0][:L], out)
    return res.reshape(-1)[:n]
