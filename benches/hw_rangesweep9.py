#!/usr/bin/env python
"""Round-4f: the exchange is fast in EVERY isolated probe (250 GB/s even
for the transpose_bi pattern with distinct buffers, hw_dma_bw3) yet costs
53.8 ms in the pipeline.  In-situ isolation at seg 2^23:

  A p1              mapped sorts                      (known 200.8 ms)
  B p1+cuts                                           (known 212.2 ms)
  C p1+cuts+KERNEL  synthetic uniform ctrl + zero slab — the relocate
                    kernel in pipeline position, real-prep excluded
  D p1+cuts+real exchange                             (known 266.0 ms)

C-B = in-situ kernel cost; D-C = ctrl/fringe prep cost.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from gpusorting_tpu.ops import rangesweep, xla_sort
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
    l_rows = L // LANES
    rows_total = n // LANES
    slab_rows = 2 * K

    def p1(codes):
        return jax.lax.map(
            lambda r: xla_sort.sort_all_keys_unstable((r,))[0],
            codes.reshape(K, L))

    def p1cuts(codes):
        x2 = p1(codes)
        bounds = rangesweep._exact_cuts(x2, K, L)
        return x2.reshape(-1).at[0].add(jnp.sum(bounds).astype(jnp.uint32))

    def p1kernel(codes):
        x2 = p1(codes)
        bounds = rangesweep._exact_cuts(x2, K, L)
        # synthetic uniform ctrl: range (b,i) = chunk i rows
        # [b*l_rows/K, (b+1)*l_rows/K) -> bucket-major packing; fringe
        # slab all-sentinel; sizes exact so the result is a permutation
        per = l_rows // K
        ii = jnp.arange(K, dtype=jnp.int32)
        src_bi = (ii[None, :] * l_rows + ii[:, None] * per)      # (b,i)
        dst_bi = (ii[:, None] * l_rows + ii[None, :] * per)
        nr_bi = jnp.full((K, K), per, jnp.int32)
        bulk_b = jnp.full((K,), l_rows, jnp.int32)
        # keep ctrl DYNAMIC (dependent on data) like the real exchange
        zero = (codes[0] & jnp.uint32(0)).astype(jnp.int32)
        ctrl = jnp.concatenate([
            src_bi.reshape(-1), dst_bi.reshape(-1), nr_bi.reshape(-1),
            bulk_b]) + zero
        fringe = jnp.full((K * slab_rows, LANES), -1, jnp.int32) + zero
        # consume bounds so cuts aren't dead code
        ctrl = ctrl.at[0].add(jnp.sum(bounds) & 0)
        out2 = rangesweep._build_relocate(
            rows_total, K, l_rows, slab_rows, False)(
            ctrl, x2.reshape(rows_total, LANES).view(jnp.int32),
            fringe)
        return out2.view(jnp.uint32).reshape(-1)

    def p1exch(codes):
        x2 = p1(codes)
        bounds = rangesweep._exact_cuts(x2, K, L)
        return rangesweep._range_exchange(
            x2.reshape(-1), bounds, K, L, False, method="dma")

    for name, fn in [("A_p1", lambda c: p1(c).reshape(-1)),
                     ("B_p1cuts", p1cuts),
                     ("C_p1cuts_kernel_synth", p1kernel),
                     ("D_p1cuts_exchange", p1exch)]:
        res = timing.batch_timing(fn, n, batch=6, seed=10, repeats=2)
        emit(name, res)
    return 0


if __name__ == "__main__":
    sys.exit(main())
