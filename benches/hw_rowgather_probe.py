#!/usr/bin/env python
"""Probe: XLA row-gather rate on (rows, 128) u32 at 2^28 total.

The rangesweep exchange is DMA-count-bound (~40 us per dynamic-descriptor
copy; K^2 copies — hw_rangesweep6 vs hw_rangesweep4: direct HBM->HBM at
P=K changed nothing).  If XLA's jnp.take(x2, g, axis=0) moves whole
128-lane rows at a usable fraction of HBM BW, the exchange becomes ONE
gather with a device-computed row map (row-granular cuts + a small
boundary-window fix after phase 3).  PROBES.md's 0.11 Gelem/s row was a
FLAT element gather — rows may behave differently.

Patterns: exchange-like (K^2 contiguous runs, K=32) and fully row-random.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gpusorting_tpu.utils import timing


def emit(name, res, extra=None):
    row = {"bench": name, **{k: res[k] for k in (
        "keys_per_sec", "seconds_per_sort", "n", "batch",
        "timing_floored", "spread_min_s", "spread_max_s")}}
    row.update(extra or {})
    print(json.dumps(row), flush=True)


def main():
    n = 1 << 28
    rows = n // 128
    K = 32

    # exchange-like: K buckets x K runs of rows/K^2 contiguous rows
    run = rows // (K * K)
    perm = np.arange(rows, dtype=np.int32).reshape(K, K, run)
    perm = perm.transpose(1, 0, 2).reshape(-1)  # bucket-major pickup
    g_ex = jnp.asarray(perm)

    rng = np.random.RandomState(0)
    g_rand = jnp.asarray(rng.permutation(rows).astype(np.int32))

    for name, g in [("rowgather_exchange_like", g_ex),
                    ("rowgather_random", g_rand)]:
        def fn(codes, g=g):
            x2 = codes.reshape(rows, 128)
            return jnp.take(x2, g, axis=0).reshape(-1)

        res = timing.batch_timing(fn, n, batch=6, seed=10, repeats=2)
        emit(name, res, {"rows": rows})

    # the same as a VMEM-blocked Pallas copy baseline is the relocate
    # kernel already measured; also try gather via x2[g] indexing form
    def fn_idx(codes):
        x2 = codes.reshape(rows, 128)
        return x2[g_ex].reshape(-1)

    res = timing.batch_timing(fn_idx, n, batch=6, seed=10, repeats=2)
    emit("rowgather_getitem_exchange_like", res, {"rows": rows})
    return 0


if __name__ == "__main__":
    sys.exit(main())
