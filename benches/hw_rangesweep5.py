#!/usr/bin/env python
"""Rangesweep round-4d: where do the ~70 ms above 2 x p1 live at seg 2^23?

hw_rangesweep4: dense 471.0 ms vs oracle 469.7 (tie); p1 alone 200.7.
Rows here isolate cuts / exchange / phase-3 premium at seg 2^23, probe a
direct HBM->HBM DMA (no VMEM bounce — halves exchange traffic if Mosaic
allows it), and a double-buffered bounce variant if not.
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

from gpusorting_tpu.core import prng
from gpusorting_tpu.ops import rangesweep, xla_sort
from gpusorting_tpu.utils import timing


def emit(name, res=None, extra=None):
    row = {"bench": name}
    if res is not None:
        row.update({k: res[k] for k in (
            "keys_per_sec", "seconds_per_sort", "n", "batch",
            "timing_floored", "spread_min_s", "spread_max_s")})
    row.update(extra or {})
    print(json.dumps(row), flush=True)


def probe_hbm_direct():
    """Does a direct ANY->ANY (HBM->HBM) async copy work on this Mosaic?"""
    rows = 4096

    def kern(src_ref, out_ref, sem):
        cp = pltpu.make_async_copy(
            src_ref.at[pl.ds(0, rows), :], out_ref.at[pl.ds(0, rows), :],
            sem)
        cp.start()
        cp.wait()

    x = jnp.arange(rows * 128, dtype=jnp.int32).reshape(rows, 128)
    try:
        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.int32),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(
                has_side_effects=True),
        )(x)
        ok = bool((np.asarray(out) == np.asarray(x)).all())
        emit("probe_hbm_to_hbm_dma", extra={"works": ok})
        return ok
    except Exception as e:  # noqa: BLE001
        emit("probe_hbm_to_hbm_dma",
             extra={"works": False, "error": str(e)[:200]})
        return False


def stage_fns(L):
    def p1(codes):
        K = codes.shape[0] // L
        x2 = jax.lax.map(
            lambda r: xla_sort.sort_all_keys_unstable((r,))[0],
            codes.reshape(K, L))
        return x2.reshape(-1)

    def p1cuts(codes):
        K = codes.shape[0] // L
        x2 = jax.lax.map(
            lambda r: xla_sort.sort_all_keys_unstable((r,))[0],
            codes.reshape(K, L))
        bounds = rangesweep._exact_cuts(x2, K, L)
        return x2.reshape(-1).at[0].add(
            jnp.sum(bounds).astype(jnp.uint32))

    def p12(codes):
        K = codes.shape[0] // L
        x2 = jax.lax.map(
            lambda r: xla_sort.sort_all_keys_unstable((r,))[0],
            codes.reshape(K, L))
        bounds = rangesweep._exact_cuts(x2, K, L)
        return rangesweep._range_exchange(x2.reshape(-1), bounds, K, L,
                                          False)

    def p1p1(codes):
        return p1(p1(codes))

    return p1, p1cuts, p12, p1p1


def main():
    probe_hbm_direct()
    n = 1 << 28
    L = 1 << 23
    p1, p1cuts, p12, p1p1 = stage_fns(L)
    for name, fn in [("stage_p1", p1), ("stage_p1cuts", p1cuts),
                     ("stage_p12", p12), ("control_p1p1", p1p1)]:
        res = timing.batch_timing(fn, n, batch=6, seed=10, repeats=2)
        emit(f"{name}_seg2^23", res, {"seg": L})
    return 0


if __name__ == "__main__":
    sys.exit(main())
