#!/usr/bin/env python
"""Rangesweep stage breakdown + chunk-size sweep (round 4).

First run (logs/hw_rangesweep_r4.log): exact on hardware, 508 ms at 2^28 vs
XLA's 468 — phases 1+3 (2 x mapped 2^24 sorts = ~416 ms) leave ~92 ms in
cuts+exchange.  The flat-sort size sweep (RESULTS.md) says smaller chunks
sort FASTER per element (1.84 G at 2^22 vs 0.94 at 2^24), so K=64 chunks
could drop the two sort phases to ~290 ms — if the mapped form holds the
standalone rate and the K^2 exchange overhead stays small.

Rows: stage breakdown at seg=2^24, then full timing at seg 2^21..2^24.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

import gpusorting_tpu as gst
from gpusorting_tpu.ops import rangesweep, xla_sort
from gpusorting_tpu.utils import timing


def emit(name, res, extra=None):
    row = {"bench": name, **{k: res[k] for k in (
        "keys_per_sec", "seconds_per_sort", "n", "batch",
        "timing_floored", "spread_min_s", "spread_max_s")}}
    row.update(extra or {})
    print(json.dumps(row), flush=True)


def make_stage_fns(L):
    def p1(codes):
        n = codes.shape[0]
        K = n // L
        x2 = jax.lax.map(
            lambda r: xla_sort.sort_all_keys_unstable((r,))[0],
            codes.reshape(K, L))
        return x2.reshape(-1)

    def p1cuts(codes):
        n = codes.shape[0]
        K = n // L
        x2 = jax.lax.map(
            lambda r: xla_sort.sort_all_keys_unstable((r,))[0],
            codes.reshape(K, L))
        bounds = rangesweep._exact_cuts(x2, K, L)
        flat = x2.reshape(-1)
        return flat.at[0].add(jnp.sum(bounds).astype(jnp.uint32))

    def p12(codes):
        n = codes.shape[0]
        K = n // L
        x2 = jax.lax.map(
            lambda r: xla_sort.sort_all_keys_unstable((r,))[0],
            codes.reshape(K, L))
        bounds = rangesweep._exact_cuts(x2, K, L)
        return rangesweep._range_exchange(x2.reshape(-1), bounds, K, L,
                                          False)

    return p1, p1cuts, p12


def main():
    n = 1 << 28
    L0 = 1 << 24
    p1, p1cuts, p12 = make_stage_fns(L0)
    for name, fn in [("stage_p1", p1), ("stage_p1cuts", p1cuts),
                     ("stage_p12", p12)]:
        res = timing.batch_timing(fn, n, batch=3, seed=10, repeats=2)
        emit(name, res, {"seg": L0})

    for lg in (23, 22, 21):
        L = 1 << lg
        fn = lambda codes, L=L: rangesweep.sort_codes_rangesweep(
            codes, seg_elems=L)
        res = timing.batch_timing(fn, n, batch=3, seed=10, repeats=2)
        emit(f"rangesweep_2^28_seg2^{lg}", res,
             {"seg": L, "K": n // L})
    return 0


if __name__ == "__main__":
    sys.exit(main())
