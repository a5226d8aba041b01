"""Mergesweep — batched-segment sort + Batcher merge tail (flagship engine).

Design (round 3; see docs/ROADMAP_perf.md):  on this part XLA's flat sort
rate decays log-quadratically with n (2.65 Gkeys/s at 2^18 down to 0.575 at
2^28) while a native compare-exchange stage costs a size-independent
~4 ns/Melem.  Every partition-based composition measured in rounds 1-2 pays
a data-dependent-permutation toll (>=30 VPU-ops/elem/bucket) that no Mosaic
feature on this backend removes (probes/probe13_bitcast.py).  The winning
structure avoids permutation entirely:

  1. pad to a power of two N, view as (K, L) segments (L a power of two)
  2. ONE batched `jax.lax.sort` along the minor axis — XLA runs at its
     small-size sweet-spot rate for every segment
  3. reverse odd segments (so L-blocks alternate ascending/descending —
     precisely the invariant the standard bitonic network guarantees after
     its k=L pass)
  4. run ONLY the remaining merge passes k = 2L .. N of the Batcher network
     (ops.bitonic's fused local passes + global stages, unchanged)

This is the TPU analog of the reference's OneSweep role: the engine AUTO
ships for the headline benchmark (OneSweep.cu:164-344).  Like the reference
leans on CUB block primitives inside its kernels, this leans on XLA's sort
for the in-segment phase and spends native kernels only where XLA decays.

Properties: exact for any input distribution (no splitters, no slack, no
overflow paths — merging is oblivious), jit-safe by construction, stable
with an index-tiebreak operand, pairs ride along.  Cost model: batched
phase at XLA's rate(L) + merge tail of sum_{m=log2(2L)}^{log2(N)} m
compare-exchange stages at ~1 ms per 2^28-stage.

The segment length trades the two phases: bigger L = fewer merge stages
but a slower batched rate.  `_default_seg_elems` picks from the measured
v5e sweep (benches/RESULTS.md round 3).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .bitonic import (
    LANES,
    _bias_u32_to_i32,
    _build_global_stage,
    _build_local_pass,
    _is_tpu,
    _powers_desc,
    _tuning,
    _unbias_i32_to_u32,
)


def _default_seg_elems(n: int) -> int:
    # v5e hardware sweep (round 3): 2^22 segments won at 2^26-2^28
    # (batched-rate x stage-count tradeoff); below 2^22 the engine is a
    # single lax.sort call anyway (K=1).
    return 1 << 22


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
    """
    if interpret is None:
        interpret = not _is_tpu()
    n = operands[0].shape[0]
    num_ops = len(operands)
    N = max(1024, 1 << (n - 1).bit_length())
    L = seg_elems or _default_seg_elems(n)
    if L & (L - 1):
        raise ValueError(f"seg_elems must be a power of two, got {L}")
    L = min(L, N)
    K = N // L
    R = N // LANES

    pad = N - n
    padded = []
    for x in operands:
        if pad:
            fill = jnp.full((pad,), jnp.iinfo(jnp.int32).max, jnp.int32)
            x = jnp.concatenate([x, fill])
        padded.append(x.reshape(K, L))

    # --- phase 1: one batched minor-axis sort over all K segments ---
    ops2 = jax.lax.sort(tuple(padded), num_keys=num_keys, is_stable=False,
                        dimension=1)
    if K == 1:
        return tuple(y.reshape(N)[:n] for y in ops2)

    # odd segments reversed: after the standard network's k=L pass, block m
    # is ascending iff bit log2(L) of its base index is 0 — i.e. even m
    odd = (jnp.arange(K, dtype=jnp.int32) & 1)[:, None] != 0
    ops2 = tuple(jnp.where(odd, jnp.flip(y, axis=1), y) for y in ops2)
    ops = tuple(y.reshape(R, LANES) for y in ops2)

    # --- phase 2: merge passes k = 2L .. N of the Batcher network ---
    tile_rows = min(_tuning().network_tile_rows(num_ops), R)
    tile_elems = tile_rows * LANES
    grid = R // tile_rows

    k = L * 2
    while k <= N:
        j = k // 2
        while j >= tile_elems:
            gcall = _build_global_stage(
                num_ops, num_keys, tile_rows, grid, j // tile_elems,
                interpret)
            ops = tuple(gcall(jnp.asarray([j, k], jnp.int32), *ops))
            j //= 2
        # all strides below the tile run as one fused pass; with the default
        # L >= tile_elems every pass shares one compiled tail (stage count
        # identical; the (j, k) schedule is a runtime SMEM argument)
        js = _powers_desc(min(k // 2, tile_elems // 2))
        tail_arr = jnp.asarray(
            np.array([(jj, k) for jj in js], np.int32).reshape(-1, 2))
        tail_pass = _build_local_pass(
            num_ops, num_keys, tile_rows, len(js), grid, interpret)
        ops = tuple(tail_pass(tail_arr, *ops))
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
