#!/usr/bin/env python
"""Hardware rates for the public sort_batched surface (row-sort routing).

Measures, at 2^24 total u32 keys on the attached TPU:
  - sort_batched at (256, 2^16)  -> batched minor-axis route
  - sort_batched at (128, 2^17)  -> lax.map flat-per-row route (>= crossover)
  - the OPPOSITE form at each shape (forced), so the crossover documented in
    the routing tuner (config.RoutingParameters.map_rows_min_*, read via
  xla_sort.map_rows_min) is shown by measurement at this total size,
    not inherited from the 2^22 segsort probe.

Reference harness rules via utils.timing.batch_timing (warmup excluded,
seed-folded regeneration, sort-only timing).  Prints one JSON line per row.
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


def forced_batched(codes2d):
    (sk,) = xla_sort.sort_all_keys_unstable((codes2d,), dimension=1)
    return sk


def forced_mapped(codes2d):
    return jax.lax.map(
        lambda r: xla_sort.sort_all_keys_unstable((r,))[0], codes2d)


def row(label, fn, S, L):
    res = timing.batch_timing(
        lambda codes: fn(codes.reshape(S, L)).reshape(-1),
        TOTAL, batch=BATCH, repeats=REPEATS)
    out = {
        "bench": "sort_batched_routes",
        "label": label,
        "shape": [S, L],
        "gkeys_per_sec": res["keys_per_sec"] / 1e9,
        "seconds_per_sort": res["seconds_per_sort"],
        "timing_floored": res["timing_floored"],
        "batch": res["batch"],
    }
    print(json.dumps(out), flush=True)
    return out


def main():
    info = gst.get_device_info()
    print(json.dumps({"device": info.device_kind, "total": TOTAL}), flush=True)
    auto = lambda x: gst.sort_batched(x)
    rows = [
        row("auto@256x2^16 (batched route)", auto, 256, 1 << 16),
        row("forced_mapped@256x2^16", forced_mapped, 256, 1 << 16),
        row("auto@128x2^17 (mapped route)", auto, 128, 1 << 17),
        row("forced_batched@128x2^17", forced_batched, 128, 1 << 17),
    ]
    # the auto route must win (or tie within noise) at both shapes
    assert rows[0]["gkeys_per_sec"] >= 0.9 * rows[1]["gkeys_per_sec"]
    assert rows[2]["gkeys_per_sec"] >= 0.9 * rows[3]["gkeys_per_sec"]
    print(json.dumps({"routing_validated": True}), flush=True)


if __name__ == "__main__":
    main()
