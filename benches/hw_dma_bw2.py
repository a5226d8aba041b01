#!/usr/bin/env python
"""Probe 2: WHICH mechanism makes the exchange kernel slow?

hw_dma_bw: 1024 static-size copies (even on one sem) = 250 GB/s.  Yet
every exchange variant lands at the same 53.8 ms (~37 GB/s) — bounced or
direct, K or K^2 programs, dynamic-size or conditional binary-decomposed
static sizes.  Isolate the three mechanism differences on the SAME 1 GB
identity relocation, single program, one sem:

  - dyn_size:     1024 copies, size read from SMEM (dynamically 2048)
  - fori_static:  per-'range' fori of static 256-row copies, trip count
                  read from SMEM (8 per range) — the cond-free quantum form
  - when_static:  1024 static-size copies each wrapped in pl.when(SMEM!=0)
  - grid32_static: static copies split across a 32-program arbitrary grid
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpusorting_tpu.utils import timing

ROWS = 1 << 21  # 1 GB
N_COPIES = 1024
PER = ROWS // N_COPIES  # 2048 rows per copy


def emit(name, res, extra=None):
    row = {"bench": name, **{k: res[k] for k in (
        "keys_per_sec", "seconds_per_sort", "n", "batch",
        "timing_floored", "spread_min_s", "spread_max_s")}}
    row["effective_gbps"] = res["n"] * 8 / res["seconds_per_sort"] / 1e9
    row.update(extra or {})
    print(json.dumps(row), flush=True)


def pcall(kern, ctrl, x2, n_grid=None):
    return pl.pallas_call(
        kern,
        **({"grid": (n_grid,)} if n_grid else {}),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.int32),
        scratch_shapes=[pltpu.SemaphoreType.DMA],
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(ctrl, x2)


def build(mode):
    # ctrl[i] = start row of copy i; ctrl[N_COPIES + i] = size/trip/flag
    def kern(ctrl_ref, src_ref, out_ref, sem):
        if mode == "grid32_static":
            p = pl.program_id(0)
            per_prog = N_COPIES // 32

            def go(t, _):
                i = p * per_prog + t
                s0 = ctrl_ref[i]
                pltpu.make_async_copy(
                    src_ref.at[pl.ds(s0, PER), :],
                    out_ref.at[pl.ds(s0, PER), :], sem).start()
                return 0

            def dr(t, _):
                i = p * per_prog + t
                s0 = ctrl_ref[i]
                pltpu.make_async_copy(
                    src_ref.at[pl.ds(s0, PER), :],
                    out_ref.at[pl.ds(s0, PER), :], sem).wait()
                return 0

            jax.lax.fori_loop(0, per_prog, go, 0)
            jax.lax.fori_loop(0, per_prog, dr, 0)
            return

        def mk(i):
            s0 = ctrl_ref[i]
            v = ctrl_ref[N_COPIES + i]
            if mode == "dyn_size":
                return pltpu.make_async_copy(
                    src_ref.at[pl.ds(s0, v), :],
                    out_ref.at[pl.ds(s0, v), :], sem)
            return pltpu.make_async_copy(
                src_ref.at[pl.ds(s0, PER), :],
                out_ref.at[pl.ds(s0, PER), :], sem)

        if mode == "fori_static":
            Q = 256

            def go(i, _):
                s0 = ctrl_ref[i]
                trips = ctrl_ref[N_COPIES + i] // Q

                def inner(t, _):
                    pltpu.make_async_copy(
                        src_ref.at[pl.ds(s0 + t * Q, Q), :],
                        out_ref.at[pl.ds(s0 + t * Q, Q), :], sem).start()
                    return 0

                jax.lax.fori_loop(0, trips, inner, 0)
                return 0

            def dr(i, _):
                s0 = ctrl_ref[i]
                trips = ctrl_ref[N_COPIES + i] // Q

                def inner(t, _):
                    pltpu.make_async_copy(
                        src_ref.at[pl.ds(s0 + t * Q, Q), :],
                        out_ref.at[pl.ds(s0 + t * Q, Q), :], sem).wait()
                    return 0

                jax.lax.fori_loop(0, trips, inner, 0)
                return 0

            jax.lax.fori_loop(0, N_COPIES, go, 0)
            jax.lax.fori_loop(0, N_COPIES, dr, 0)
            return

        def go(i, _):
            if mode == "when_static":
                @pl.when(ctrl_ref[N_COPIES + i] > 0)
                def _():
                    mk(i).start()
            else:
                mk(i).start()
            return 0

        def dr(i, _):
            if mode == "when_static":
                @pl.when(ctrl_ref[N_COPIES + i] > 0)
                def _():
                    mk(i).wait()
            else:
                mk(i).wait()
            return 0

        jax.lax.fori_loop(0, N_COPIES, go, 0)
        jax.lax.fori_loop(0, N_COPIES, dr, 0)

    def call(x):
        ctrl = jnp.concatenate([
            jnp.arange(N_COPIES, dtype=jnp.int32) * PER,
            jnp.full((N_COPIES,), PER, jnp.int32),
        ])
        x2 = x.reshape(ROWS, 128).view(jnp.int32)
        out = pcall(kern, ctrl, x2,
                    n_grid=32 if mode == "grid32_static" else None)
        return out.view(jnp.uint32).reshape(-1)

    return call


def main():
    n = ROWS * 128
    x = jnp.arange(n, dtype=jnp.uint32)
    for mode in ("dyn_size", "fori_static", "when_static", "grid32_static"):
        fn = build(mode)
        got = np.asarray(fn(x)[:512])
        ok = bool((got == np.arange(512, dtype=np.uint32)).all())
        print(json.dumps({"bench": f"{mode}_exact", "exact": ok}),
              flush=True)
        res = timing.batch_timing(fn, n, batch=8, seed=10, repeats=2)
        emit(f"dma2_{mode}", res)
    return 0


if __name__ == "__main__":
    sys.exit(main())
