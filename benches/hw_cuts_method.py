#!/usr/bin/env python
"""Micro-bench: _exact_cuts cost vs jnp.searchsorted method, seg 2^23.

Round-4d isolated cuts at 11.4 ms (32 bisection steps x vmapped
searchsorted over (K=32, L=2^23) rows).  The default method='scan' is a
sequential log2(L) partition loop per step; 'scan_unrolled' trades
dispatches for code size.  Timed here ON TOP of phase 1 (p1cuts - p1
attribution, same harness as hw_rangesweep5).
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import functools

import jax
import jax.numpy as jnp

from gpusorting_tpu.ops import rangesweep, xla_sort
from gpusorting_tpu.utils import timing


def emit(name, res, extra=None):
    row = {"bench": name, **{k: res[k] for k in (
        "keys_per_sec", "seconds_per_sort", "n", "batch",
        "timing_floored", "spread_min_s", "spread_max_s")}}
    row.update(extra or {})
    print(json.dumps(row), flush=True)


def cuts_with_method(x2, K, L, method):
    targets = jnp.arange(1, K, dtype=jnp.int32) * jnp.int32(L)

    def ranks(v):
        return jax.vmap(
            lambda row: jnp.searchsorted(
                row, v, side="left", method=method).astype(jnp.int32))(x2)

    def step(t, v):
        bit = 31 - t
        vp = v | (jnp.uint32(1) << bit)
        below = jnp.sum(ranks(vp), axis=0)
        return jnp.where(below < targets, vp, v)

    return jax.lax.fori_loop(0, 32, step,
                             jnp.zeros((K - 1,), jnp.uint32))


def main():
    n = 1 << 28
    L = 1 << 23
    K = n // L

    def p1(codes):
        x2 = jax.lax.map(
            lambda r: xla_sort.sort_all_keys_unstable((r,))[0],
            codes.reshape(K, L))
        return x2.reshape(-1)

    res = timing.batch_timing(p1, n, batch=6, seed=10, repeats=2)
    emit("cuts_base_p1", res)

    for method in ("scan", "scan_unrolled"):
        def p1c(codes, method=method):
            x2 = jax.lax.map(
                lambda r: xla_sort.sort_all_keys_unstable((r,))[0],
                codes.reshape(K, L))
            v = cuts_with_method(x2, K, L, method)
            return x2.reshape(-1).at[0].add(jnp.sum(v))

        res = timing.batch_timing(p1c, n, batch=6, seed=10, repeats=2)
        emit(f"cuts_method_{method}", res)
    return 0


if __name__ == "__main__":
    sys.exit(main())
