#!/usr/bin/env python
"""Headline benchmark: keys/s on the reference's flagship workload.

Reference harness (BASELINE.md): 2^28 u32 keys, batch average excluding one
warmup, input regenerated per iteration with seed i+seed, timing covers only
the sort (GPUSortingCUDA.cu:20-49, OneSweepDispatcher.cuh:193-239).  Batch
is 20 (4 timed chains of 5) with the min/max chain spread reported so
round-over-round deltas are attributable (VERDICT r1 #9).

Prints ONE JSON line:
  {"metric": "keys_per_sec_u32_2^28", "value": N, "unit": "keys/s",
   "vs_baseline": N / hbm_speed_of_light_keys_per_sec}

vs_baseline is the fraction of HBM speed-of-light for a 4-pass LSD radix
(8 bytes of HBM traffic per key per pass); BASELINE.json's target is 0.8.
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))


def main():
    import gpusorting_tpu as gst
    from gpusorting_tpu.ops import radix
    from gpusorting_tpu.utils import timing

    info = gst.get_device_info()
    on_tpu = info.platform == "tpu"

    n = 1 << 28 if on_tpu else 1 << 20
    batch, repeats = (5, 4) if on_tpu else (3, 1)

    sorter = gst.OneSweep(gst.SortConfig())
    fn = lambda codes: gst.sort(codes, backend=sorter.config.backend)

    res = timing.batch_timing(fn, n, batch=batch, seed=10, repeats=repeats)

    # speed-of-light: 4 radix passes x (read 4B + write 4B) per key
    sol_keys_per_sec = info.hbm_gbps * 1e9 / 32.0
    value = res["keys_per_sec"]
    out = {
        "metric": f"keys_per_sec_u32_2^{n.bit_length()-1}",
        "value": value,
        "unit": "keys/s",
        "vs_baseline": value / sol_keys_per_sec,
        "detail": {
            "n": n,
            "batch": res["batch"],
            "seconds_per_sort": res["seconds_per_sort"],
            "spread_min_s": res.get("spread_min_s"),
            "spread_max_s": res.get("spread_max_s"),
            "device": info.device_kind,
            "generation": info.generation,
            "backend_native_pallas": radix.is_native(),
            "hbm_sol_keys_per_sec": sol_keys_per_sec,
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
