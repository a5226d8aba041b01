#!/usr/bin/env python
"""Probe 3: is the 250 GB/s an identity-copy illusion?

hw_dma_bw2: every mechanism (dyn size, when, grid, fori) hits 250 GB/s —
but all did IDENTITY relocations (dst == src row), and batch_timing's
chain lets XLA alias the dead 1 GB input to the 1 GB output, so the
"copies" may move nothing.  Rows:

  - identity         (reference, aliasable)
  - identity_noalias (input kept live after the call — distinct buffers)
  - shift_half       dst = (src + ROWS/2) % ROWS
  - transpose_bi     the real exchange pattern: 32x32 blocks, (b,i)->(i,b)
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

ROWS = 1 << 21
N_COPIES = 1024
PER = ROWS // N_COPIES


def emit(name, res, extra=None):
    row = {"bench": name, **{k: res[k] for k in (
        "keys_per_sec", "seconds_per_sort", "n", "batch",
        "timing_floored", "spread_min_s", "spread_max_s")}}
    row["effective_gbps"] = res["n"] * 8 / res["seconds_per_sort"] / 1e9
    row.update(extra or {})
    print(json.dumps(row), flush=True)


def kern(ctrl_ref, src_ref, out_ref, sem):
    def mk(i):
        return pltpu.make_async_copy(
            src_ref.at[pl.ds(ctrl_ref[i], PER), :],
            out_ref.at[pl.ds(ctrl_ref[N_COPIES + i], PER), :], sem)

    def go(i, _):
        mk(i).start()
        return 0

    def dr(i, _):
        mk(i).wait()
        return 0

    jax.lax.fori_loop(0, N_COPIES, go, 0)
    jax.lax.fori_loop(0, N_COPIES, dr, 0)


def build(pattern, noalias=False):
    src = np.arange(N_COPIES, dtype=np.int32) * PER
    if pattern == "identity":
        dst = src.copy()
    elif pattern == "shift_half":
        dst = (src + ROWS // 2) % ROWS
    elif pattern == "transpose_bi":
        d = np.arange(N_COPIES, dtype=np.int32).reshape(32, 32)
        dst = (d.T.reshape(-1) * PER).astype(np.int32)
    ctrl_np = np.concatenate([src, dst])

    def call(x):
        ctrl = jnp.asarray(ctrl_np)
        x2 = x.reshape(ROWS, 128).view(jnp.int32)
        out = pl.pallas_call(
            kern,
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                      pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            out_shape=jax.ShapeDtypeStruct((ROWS, 128), jnp.int32),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(has_side_effects=True),
        )(ctrl, x2)
        out = out.view(jnp.uint32).reshape(-1)
        if noalias:
            # keep x live past the kernel: forces distinct in/out buffers
            out = out.at[0].add(x[-1] & jnp.uint32(0))
        return out

    return call


def main():
    n = ROWS * 128
    x = jnp.arange(n, dtype=jnp.uint32)
    got = np.asarray(build("shift_half")(x)[:256])
    want = (np.arange(256, dtype=np.uint32)
            + (ROWS // 2) * 128).astype(np.uint32)
    print(json.dumps({"bench": "shift_exact",
                      "exact": bool((got == want).all())}), flush=True)

    for name, pattern, noalias in [
        ("identity", "identity", False),
        ("identity_noalias", "identity", True),
        ("shift_half", "shift_half", False),
        ("transpose_bi", "transpose_bi", False),
    ]:
        fn = build(pattern, noalias)
        res = timing.batch_timing(fn, n, batch=8, seed=10, repeats=2)
        emit(f"dma3_{name}", res)
    return 0


if __name__ == "__main__":
    sys.exit(main())
