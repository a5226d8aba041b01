#!/usr/bin/env python
"""Hardware numbers for the rangesweep flagship composition (VERDICT r4 #1).

1. exactness on the real TPU at 2^26 (on-device compare vs the XLA oracle,
   scalar fetch only — big-array fetches over the axon tunnel are suspect)
2. batch timing at 2^28 for rangesweep AND the XLA flat sort, same harness
   (utils.timing batch rules: warmup excluded, seed-folded regeneration,
   sort-only timing, floored-row retry)

Prints one JSON line per row.  Run with run_in_background + a log file.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import gpusorting_tpu as gst
from gpusorting_tpu.core import prng
from gpusorting_tpu.ops import rangesweep, xla_sort
from gpusorting_tpu.utils import timing


def emit(name, res, extra=None):
    row = {"bench": name, **{k: res[k] for k in (
        "keys_per_sec", "seconds_per_sort", "n", "batch",
        "timing_floored", "spread_min_s", "spread_max_s")}}
    row.update(extra or {})
    print(json.dumps(row), flush=True)


def main():
    info = gst.get_device_info()
    print(json.dumps({"device": info.device_kind,
                      "generation": info.generation}), flush=True)

    # --- exactness at 2^26 (4 chunks of 2^24) + entropy skew ---
    for name, n, ac in [("uniform", 1 << 26, 0), ("E020", 1 << 24, 4)]:
        x = jax.jit(lambda n=n, ac=ac: prng.hybrid_taus_bits(
            n, 3, and_count=ac))()
        out = jax.jit(rangesweep.sort_codes_rangesweep)(x)
        ref = jax.jit(xla_sort.sort_keys_u32)(x)
        ok = bool(np.asarray(jax.jit(
            lambda a, b: jnp.all(a == b))(out, ref)))
        print(json.dumps({"check": f"exact_{name}_{n}", "ok": ok}),
              flush=True)
        if not ok:
            print(json.dumps({"fatal": "mismatch"}), flush=True)
            return 1

    # --- timing at 2^28 ---
    n = 1 << 28
    for name, fn in [
        ("rangesweep_2^28", rangesweep.sort_codes_rangesweep),
        ("xla_flat_2^28", xla_sort.sort_keys_u32),
    ]:
        res = timing.batch_timing(fn, n, batch=3, seed=10, repeats=2)
        if res["timing_floored"]:
            res = timing.batch_timing(fn, n, batch=12, seed=10, repeats=2)
        emit(name, res)

    # entropy skew at 2^28 (the engine is skew-proof by construction;
    # verify the rate holds at E020)
    res = timing.batch_timing(rangesweep.sort_codes_rangesweep, n, batch=3,
                              seed=10, entropy=gst.EntropyPreset.E020,
                              repeats=2)
    emit("rangesweep_2^28_E020", res)
    return 0


if __name__ == "__main__":
    sys.exit(main())
