#!/usr/bin/env python
"""Probe: HBM->HBM DMA bandwidth scaling inside a Pallas kernel.

The rangesweep DMA exchange streams at ~37 GB/s effective
(53.8 ms for 2 x 1 GB at seg 2^23) whether bounced or direct, K or K^2
programs — so either single-DMA bandwidth is low or same-semaphore copies
serialize.  Rows (all 1 GB total moved, dynamic starts like the real
exchange):

  - one_copy:        1 program, ONE 2M-row direct copy
  - copies16_sem1:   16 x 128K-row copies, issue-all then drain, 1 sem
  - copies16_sem8:   same, round-robin over 8 sems
  - copies1024_sem8: 1024 x 2K-row copies over 8 sems (exchange-like)
"""

import functools
import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpusorting_tpu.utils import timing

ROWS = 1 << 21  # x 128 lanes x 4B = 1 GB


def build(n_copies: int, n_sems: int):
    rows_per = ROWS // n_copies

    assert n_copies % n_sems == 0
    per = n_copies // n_sems

    def kern(ctrl_ref, src_ref, out_ref, *sems):
        def mk(i, sem):
            s0 = ctrl_ref[i]
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(s0, rows_per), :],
                out_ref.at[pl.ds(s0, rows_per), :],
                sem)

        # static python unroll over sems; fori over each sem's copies
        for s in range(n_sems):
            def start(t, _, s=s):
                mk(s + t * n_sems, sems[s]).start()
                return 0

            jax.lax.fori_loop(0, per, start, 0)
        for s in range(n_sems):
            def drain(t, _, s=s):
                mk(s + t * n_sems, sems[s]).wait()
                return 0

            jax.lax.fori_loop(0, per, drain, 0)

    def call(x):
        ctrl = jnp.arange(n_copies, dtype=jnp.int32) * rows_per
        x2 = x.reshape(ROWS, 128).view(jnp.int32)
        out = pl.pallas_call(
            kern,
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.SMEM),
                pl.BlockSpec(memory_space=pl.ANY),
            ],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.int32),
            scratch_shapes=[pltpu.SemaphoreType.DMA] * n_sems,
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True),
        )(ctrl, x2)
        return out.view(jnp.uint32).reshape(-1)

    return call


def emit(name, res, extra=None):
    row = {"bench": name, **{k: res[k] for k in (
        "keys_per_sec", "seconds_per_sort", "n", "batch",
        "timing_floored", "spread_min_s", "spread_max_s")}}
    gbps = res["n"] * 8 / res["seconds_per_sort"] / 1e9  # 4B r + 4B w
    row["effective_gbps"] = gbps
    row.update(extra or {})
    print(json.dumps(row), flush=True)


def main():
    n = ROWS * 128
    # correctness once (identity relocation)
    x = jnp.arange(n, dtype=jnp.uint32)
    got = np.asarray(build(16, 8)(x)[:1024])
    assert (got == np.arange(1024, dtype=np.uint32)).all(), "copy broken"
    print(json.dumps({"bench": "dma_identity_exact", "exact": True}),
          flush=True)

    for name, copies, sems in [
        ("one_copy", 1, 1),
        ("copies16_sem1", 16, 1),
        ("copies16_sem8", 16, 8),
        ("copies1024_sem8", 1024, 8),
        ("copies1024_sem1", 1024, 1),
    ]:
        fn = build(copies, sems)
        res = timing.batch_timing(fn, n, batch=8, seed=10, repeats=2)
        emit(f"dma_{name}", res, {"copies": copies, "sems": sems})
    return 0


if __name__ == "__main__":
    sys.exit(main())
