#!/usr/bin/env python
"""Crossover refinement for sort_batched routing (follow-up to
hw_sort_batched.py, which found keys-only mapped ALREADY wins at L=2^16).

Measures forced-mapped vs forced-batched at 2^24 total:
  keys-only: L in {2^14, 2^15}
  pairs:     L in {2^16, 2^17}
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import gpusorting_tpu as gst
from gpusorting_tpu.ops import xla_sort
from gpusorting_tpu.utils import timing

TOTAL = 1 << 24
BATCH, REPEATS = 5, 2


def keys_batched(c2):
    (sk,) = xla_sort.sort_all_keys_unstable((c2,), dimension=1)
    return sk


def keys_mapped(c2):
    return jax.lax.map(lambda r: xla_sort.sort_all_keys_unstable((r,))[0], c2)


def pairs_batched(c2):
    sk, sv = jax.lax.sort((c2, c2), num_keys=1, is_stable=True, dimension=1)
    return sk ^ sv


def pairs_mapped(c2):
    sk, sv = jax.lax.map(
        lambda ab: jax.lax.sort(ab, num_keys=1, is_stable=True), (c2, c2))
    return sk ^ sv


def row(label, fn, L):
    S = TOTAL // L
    res = timing.batch_timing(
        lambda codes: fn(codes.reshape(S, L)).reshape(-1),
        TOTAL, batch=BATCH, repeats=REPEATS)
    out = {
        "bench": "sort_batched_crossover",
        "label": label,
        "shape": [S, L],
        "gkeys_per_sec": res["keys_per_sec"] / 1e9,
        "seconds_per_sort": res["seconds_per_sort"],
        "timing_floored": res["timing_floored"],
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    print(json.dumps({"device": gst.get_device_info().device_kind}), flush=True)
    for L in (1 << 14, 1 << 15):
        row(f"keys_batched@L={L}", keys_batched, L)
        row(f"keys_mapped@L={L}", keys_mapped, L)
    for L in (1 << 16, 1 << 17):
        row(f"pairs_batched@L={L}", pairs_batched, L)
        row(f"pairs_mapped@L={L}", pairs_mapped, L)


if __name__ == "__main__":
    main()
