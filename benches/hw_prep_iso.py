#!/usr/bin/env python
"""Round-4h: which PREP op carries the ~43 ms?  (hw_rangesweep11:
prep-only = 43.7 ms over p1+cuts; the fringe element-gather rework did
not move it.)  Each row runs on a 1 GB input inside the standard
fori-loop harness with NO phase-1 sorts, so compiles are quick and the
op under test sits in the same nested-loop position as in the real
pipeline.  All index inputs are data-dependent (x[0] & 0) so nothing
constant-folds.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from gpusorting_tpu.ops import rangesweep
from gpusorting_tpu.utils import timing

LANES = 128


def emit(name, res, extra=None):
    row = {"bench": name, **{k: res[k] for k in (
        "keys_per_sec", "seconds_per_sort", "n", "batch",
        "timing_floored", "spread_min_s", "spread_max_s")}}
    row.update(extra or {})
    print(json.dumps(row), flush=True)


def main():
    n = 1 << 28
    L = 1 << 23
    K = n // L
    rows_total = n // LANES

    def zero_of(x):
        return (x[0] & jnp.uint32(0)).astype(jnp.int32)

    def synth_bounds(x):
        # valid uniform cuts, data-dependent so nothing folds
        b = jnp.arange(K + 1, dtype=jnp.int32) * (L // K)
        return jnp.tile(b[None, :], (K, 1)) + zero_of(x)

    def r_baseline(x):
        return x.at[0].add(x[1])

    def r_rowgather(x):
        idx = jnp.arange(2 * K * K, dtype=jnp.int32) * (
            rows_total // (2 * K * K)) + zero_of(x)
        g = jnp.take(x.reshape(rows_total, LANES), idx, axis=0)
        return x.at[0].add(g[0, 0])

    def r_searchsorted(x):
        z = zero_of(x)
        foff = (jnp.arange(K, dtype=jnp.int32)[None, :]
                * jnp.int32(200) + z) * jnp.ones((K, 1), jnp.int32)
        t = jax.lax.broadcasted_iota(jnp.int32, (K, 4 * K * LANES), 1)
        c = jax.vmap(lambda fo, tt: jnp.searchsorted(
            fo, tt, side="right").astype(jnp.int32))(foff, t)
        return x.at[0].add(jnp.sum(c).astype(jnp.uint32))

    def r_take_along(x):
        z = zero_of(x)
        pairs = x[: K * K * 2 * LANES].reshape(K * K, 2 * LANES)
        idx = (jax.lax.broadcasted_iota(
            jnp.int32, (K * K, 2 * LANES), 1) + z) % (2 * LANES)
        p = jnp.take_along_axis(pairs, idx, axis=1)
        return x.at[0].add(p[0, 0])

    def r_prep_full(x):
        bounds = synth_bounds(x)
        real_build = rangesweep._build_relocate
        rangesweep._build_relocate = (
            lambda *a: lambda ctrl, src, fringe:
            src.at[0, 0].add(ctrl[0] + fringe[0, 0]))
        try:
            out = rangesweep._range_exchange(x, bounds, K, L, False,
                                             method="dma")
        finally:
            rangesweep._build_relocate = real_build
        return out

    def r_exchange_full(x):
        bounds = synth_bounds(x)
        return rangesweep._range_exchange(x, bounds, K, L, False,
                                          method="dma")

    for name, fn in [
        ("baseline", r_baseline),
        ("rowgather2048", r_rowgather),
        ("searchsorted_c", r_searchsorted),
        ("take_along_256", r_take_along),
        ("prep_full_stubbed", r_prep_full),
        ("exchange_full_synth", r_exchange_full),
    ]:
        res = timing.batch_timing(fn, n, batch=8, seed=10, repeats=2)
        emit(f"prep_{name}", res)
    return 0


if __name__ == "__main__":
    sys.exit(main())
