#!/usr/bin/env python
"""Rangesweep round-4b: scatter-free exchange + phase-3 premium isolation.

Round-4a measured (logs/hw_rangesweep2_r4.log, OLD exchange with the XLA
fringe scatter): p1 216.8 ms / cuts +2.7 ms / exchange +27 ms / full 508 ms
at seg 2^24; full 485 ms at seg 2^23 — phase 3 ran ~45 ms slower than
phase 1 (262 vs 217).  Two suspects: the scatter pass (now gone — fringes
ride static rows inside the relocate kernel) and an inherent premium on
re-sorting a Pallas-produced buffer.  Rows here:

  - stage_p1 at seg 2^24 / 2^23 / 2^22 (does lax.map hold the rate at K=64?)
  - control_p1p1: two chained mapped sorts, NO exchange (XLA's sort network
    is data-independent, so sorting sorted rows costs the same) — the
    premium floor
  - full rangesweep at seg 2^24 / 2^23 with the new exchange
  - XLA oracle 2^28 in the same process for the head-to-head
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax

import gpusorting_tpu as gst
from gpusorting_tpu.ops import rangesweep, xla_sort
from gpusorting_tpu.utils import timing


def emit(name, res, extra=None):
    row = {"bench": name, **{k: res[k] for k in (
        "keys_per_sec", "seconds_per_sort", "n", "batch",
        "timing_floored", "spread_min_s", "spread_max_s")}}
    row.update(extra or {})
    print(json.dumps(row), flush=True)


def p1_fn(L):
    def p1(codes):
        K = codes.shape[0] // L
        x2 = jax.lax.map(
            lambda r: xla_sort.sort_all_keys_unstable((r,))[0],
            codes.reshape(K, L))
        return x2.reshape(-1)

    return p1


def main():
    n = 1 << 28

    for lg in (24, 23, 22):
        L = 1 << lg
        res = timing.batch_timing(p1_fn(L), n, batch=3, seed=10, repeats=2)
        emit(f"stage_p1_seg2^{lg}", res, {"seg": L, "K": n // L})

    def p1p1(codes):
        f = p1_fn(1 << 24)
        return f(f(codes))

    res = timing.batch_timing(p1p1, n, batch=3, seed=10, repeats=2)
    emit("control_p1p1_seg2^24", res, {"seg": 1 << 24})

    for lg in (24, 23):
        L = 1 << lg
        fn = lambda codes, L=L: rangesweep.sort_codes_rangesweep(
            codes, seg_elems=L)
        res = timing.batch_timing(fn, n, batch=3, seed=10, repeats=2)
        emit(f"rangesweep_new_2^28_seg2^{lg}", res, {"seg": L, "K": n // L})

    res = timing.batch_timing(
        lambda codes: xla_sort.sort_all_keys_unstable((codes,))[0],
        n, batch=3, seed=10, repeats=2)
    emit("xla_oracle_2^28", res)
    return 0


if __name__ == "__main__":
    sys.exit(main())
