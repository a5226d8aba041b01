#!/usr/bin/env python
"""Reference-parity benchmark suite (BASELINE.md §6 matrix).

Reproduces the reference's published benchmark families on this chip:
  - size sweep (OneSweep keys/sec for n = 2^10..2^26; reference Tests.h:392)
  - Thearling-Smith entropy sweep (presets 1-5; reference Tests.h:370-419)
  - keys vs pairs (reference GPUSortingCUDA.cu:20-49)
  - SplitSort segment-length sweep, fixed-length bins (reference README.md:13-21,
    Kobus et al. suite shape) + random-length composite path
  - native (PALLAS) vs oracle (XLA) engine at selected sizes

Harness rules follow the reference (utils/timing.py): warmup excluded, input
regenerated per iteration with seed i+seed, sort-only timing.

Emits one JSON line per benchmark to stdout and appends to
benches/results_<device>.jsonl.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np


def main():
    import gpusorting_tpu as gst
    from gpusorting_tpu.core import prng
    from gpusorting_tpu.core.config import Backend, EntropyPreset
    from gpusorting_tpu.ops import radix, xla_sort
    from gpusorting_tpu.core import config as _config
    from gpusorting_tpu.segsort import splitsort
    from gpusorting_tpu.utils import timing

    info = gst.get_device_info()
    on_tpu = info.platform == "tpu"
    tag = info.device_kind.replace(" ", "_")
    outpath = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           f"results_{tag}.jsonl")
    results = []

    def emit(name, res, n, detail=None):
        detail = dict(detail or {})
        if isinstance(res, dict):
            # propagate the harness's noise-floor verdict so a garbage rate
            # (sort chain indistinguishable from the generator chain) can
            # never masquerade as a measurement in the JSONL record
            detail["floored"] = bool(res.get("timing_floored"))
            res = res["keys_per_sec"]
        row = {
            "bench": name,
            "keys_per_sec": res,
            "n": n,
            "device": info.device_kind,
            "detail": detail,
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    def timed(fn, n, **kw):
        res = timing.batch_timing(fn, n, **kw)
        if res.get("timing_floored"):
            # one retry with 4x the batch: short workloads (tiny segsort
            # rows) can finish inside the gen-chain noise at small batches
            kw = dict(kw, batch=4 * kw.get("batch", 10))
            res = timing.batch_timing(fn, n, **kw)
        return res

    def batch_for(n):
        # enough iterations that the timed loop dwarfs harness noise
        return int(max(3, min(20000, (1 << 28) // max(n, 1))))

    # GST_SUITE_SECTIONS: comma list to run a subset
    # (xla,native,rangesweep,segsort); default all — lets a crashed run
    # resume without repeating sections
    sections = set((os.environ.get("GST_SUITE_SECTIONS") or
                    "xla,native,rangesweep,segsort").split(","))

    # --- size sweep, keys-only u32, XLA engine (flagship path) ---
    size_points = ([10, 14, 18, 20, 22, 24, 26]
                   if (on_tpu and "xla" in sections) else
                   ([10, 14] if "xla" in sections else []))
    for logn in size_points:
        n = 1 << logn
        res = timed(
            lambda c: xla_sort.sort_keys_u32(c), n, batch=batch_for(n), seed=10)
        emit(f"size_sweep_keys_2^{logn}", res, n,
             {"engine": "xla", "batch": res["batch"]})

    # --- entropy sweep (Thearling-Smith presets 1-5) ---
    n = 1 << 26 if on_tpu else 1 << 14
    for preset in (EntropyPreset if "xla" in sections else []):
        res = timed(
            lambda c: xla_sort.sort_keys_u32(c), n, batch=3, seed=10,
            entropy=preset)
        emit(f"entropy_{preset.bits_per_bit:.3f}", res, n,
             {"engine": "xla", "preset": int(preset)})

    # --- pairs vs keys ---
    for logn in (([22, 24, 26] if on_tpu else [14])
                 if "xla" in sections else []):
        n = 1 << logn
        res = timed(
            lambda c: xla_sort.sort_pairs_u32(c, c)[0], n,
            batch=batch_for(n), seed=10)
        emit(f"pairs_2^{logn}", res, n, {"engine": "xla"})

    # --- native engines vs oracle (TPU only: interpret mode is emulation) ---
    for logn in ([20, 22, 24] if (on_tpu and "native" in sections) else []):
        n = 1 << logn
        from gpusorting_tpu.ops import bitonic
        res = timed(
            lambda c: bitonic.sort_codes(c), n, batch=batch_for(n) // 2 + 1,
            seed=10)
        emit(f"native_network_keys_2^{logn}", res, n,
             {"engine": "pallas_network"})

    # fused radix-16 (OneSweep analog) + entropy point (pass/bucket skipping
    # should make E020 faster), 3-phase reduce-then-scan, and the FFX slot
    if on_tpu and "native" in sections:
        from gpusorting_tpu.ops import radix16, rts as rts_mod
        for logn in (22, 24):
            n = 1 << logn
            res = timed(
                lambda c: radix16.sort_codes_radix16(c), n, batch=3, seed=10,
                repeats=3)
            emit(f"native_radix16_keys_2^{logn}", res, n,
                 {"engine": "pallas_radix16"})
        n = 1 << 24
        res = timed(
            lambda c: radix16.sort_codes_radix16(c), n, batch=3, seed=10,
            entropy=EntropyPreset.E020, repeats=3)
        emit("native_radix16_keys_2^24_E020", res, n,
             {"engine": "pallas_radix16", "preset": 5})
        res = timed(
            lambda c: rts_mod.sort_codes_rts(c), n, batch=3, seed=10,
            repeats=3)
        emit("native_rts_keys_2^24", res, n,
             {"engine": "pallas_rts_3phase"})
        # the REAL 5-stage FFX pipeline (ops/ffx.py; the round-2 row timed
        # radix16 at tile 256 — the relabel this engine replaced)
        from gpusorting_tpu.ops import ffx as ffx_mod
        res = timed(
            lambda c: ffx_mod.sort_codes_ffx(c), n, batch=3, seed=10,
            repeats=3)
        emit("ffx_baseline_keys_2^24", res, n,
             {"engine": "pallas_ffx_5stage"})

    # --- rangesweep flagship family (round 5): the engine AUTO ships
    #     above the measured crossovers, at the headline size ---
    if on_tpu and "rangesweep" in sections:
        from gpusorting_tpu.ops import rangesweep as rsw
        n = 1 << 28
        res = timed(lambda c: rsw.sort_codes_rangesweep(c), n, batch=3,
                    seed=10, repeats=2)
        emit("rangesweep_keys_2^28", res, n, {"engine": "rangesweep"})
        res = timed(lambda c: rsw.sort_codes_rangesweep(c), n, batch=3,
                    seed=10, entropy=EntropyPreset.E020, repeats=2)
        emit("rangesweep_keys_2^28_E020", res, n,
             {"engine": "rangesweep", "preset": 5,
              "mechanism": "constant-block skip"})
        res = timed(lambda c: rsw.sort_pairs_rangesweep(c, c)[0], n,
                    batch=3, seed=10, repeats=2)
        emit("rangesweep_pairs_2^28", res, n, {"engine": "rangesweep"})
        res = timed(lambda c: rsw.argsort_rangesweep(c)[0], n, batch=3,
                    seed=10, repeats=2)
        emit("rangesweep_argsort_2^28", res, n,
             {"engine": "rangesweep", "planes": 2})
        res = timed(
            lambda c: rsw.sort_pairs_rangesweep_planes(
                c, (c ^ jnp.uint32(0x9E3779B9), c ^ jnp.uint32(0x85EBCA6B)),
                seg_elems=rsw._default_seg_elems_pairs(wide=True))[0],
            n, batch=3, seed=10, repeats=2)
        emit("rangesweep_wide_pairs_2^28", res, n,
             {"engine": "rangesweep", "planes": 4})

    # --- segmented sort sweep (fixed-length bins; Kobus-style) ---
    total = 1 << 22 if on_tpu else 1 << 14
    for L in (([32, 256, 4096] if on_tpu else [32])
              if "segsort" in sections else []):
        offs, S = prng.make_fixed_segments(total, L)

        def seg_fn(codes, offs=offs, S=S):
            k, _ = splitsort.split_sort_pairs(offs, codes, codes, S, total)
            return k

        # short-L batched sorts are faster than the harness resolution at
        # small batches (the generator loop dominates): batch way up
        res = timed(seg_fn, total, batch=200, seed=10,
                                  repeats=2)
        emit(f"segsort_fixed_L{L}_pairs", res, total,
             {"engine": "batched", "segments": int(S)})

    # giant fixed segments: L >= map_rows_min routes to the lax.map
    # per-segment flat sort (r3; the SortGt8192 grid-strided region)
    if on_tpu and "segsort" in sections:
        L = 1 << 18
        offs, S = prng.make_fixed_segments(total, L)

        def seg_fn_g(codes, offs=offs, S=S):
            k, _ = splitsort.split_sort_pairs(offs, codes, codes, S, total)
            return k

        res = timed(seg_fn_g, total, batch=20, seed=10,
                                  repeats=2)
        emit(f"segsort_fixed_L{L}_pairs", res, total,
             {"engine": "mapped_flat", "segments": int(S)})

    # (u32, f64-as-dual-planes) pairs — the reference's 64-bit payload chart
    # (README.md:13-21 benches (u32,u32) AND (u32,f64))
    for L in (([256] if on_tpu else [32]) if "segsort" in sections else []):
        offs, S = prng.make_fixed_segments(total, L)

        def seg_wide_fn(codes, offs=offs, S=S):
            k, _, _ = splitsort.split_sort_pairs_wide(
                offs, codes, codes, codes, S, total)
            return k

        res = timed(seg_wide_fn, total, batch=5, seed=10)
        emit(f"segsort_fixed_L{L}_pairs_f64", res, total,
             {"engine": "batched", "payload": "u32+u32 planes"})

    # random-length sweep (Kobus-style maxlen sweep).  maxlen <= 2048 routes
    # through the two-window batched path (the reference's headline win
    # domain is maxlen < 256, README.md:13-21); >65536 exercises the
    # whole-buffer composite semantics
    for max_len in (([16, 64, 256, 1024, 4096, 8192, 16384, 65536, 262144]
                     if on_tpu else [64])
                    if "segsort" in sections else []):
        offs, S = prng.make_random_segments(total, max_len, seed=3)
        engine = ("windowed"
                  if (splitsort._window_dispatch(offs, total, int(S))
                      or {}).get("ml") is not None
                  and max_len <= _config.get_routing_parameters().window_max_keys
                  else "composite")

        def seg_rand_fn(codes, offs=offs, S=S):
            k, _ = splitsort.split_sort_pairs(offs, codes, codes, S, total)
            return k

        res = timed(seg_rand_fn, total, batch=5, seed=10,
                                  repeats=2)
        emit(f"segsort_random_maxlen{max_len}_pairs", res,
             total, {"engine": engine, "segments": int(S)})

    # bimodal length-class split (small bulk + long tail -> bulk windows +
    # compact/expand tail) vs the same workload forced through the composite
    if "segsort" in sections and on_tpu:
        rng = np.random.RandomState(7)
        lens = []
        longs = [40_000, 30_000]
        rem = total - sum(longs)
        while rem > 0:
            l = min(int(rng.randint(1, 65)), rem)
            lens.append(l)
            rem -= l
        for ll in longs:
            lens.insert(int(rng.randint(0, len(lens))), ll)
        offs = jnp.asarray(
            np.concatenate([[0], np.cumsum(lens)])[:-1].astype(np.uint32))
        S = len(lens)
        plan = splitsort._window_dispatch(offs, total, S)
        routed = plan is not None and "split" in plan

        def seg_split_fn(codes, offs=offs, S=S):
            k, _ = splitsort.split_sort_pairs(offs, codes, codes, S, total)
            return k

        res = timed(seg_split_fn, total, batch=5, seed=10,
                                  repeats=2)
        emit("segsort_bimodal_split_pairs", res, total,
             {"engine": "length_class_split" if routed else "UNROUTED",
              "segments": S, "tail_elems": sum(longs)})

        from gpusorting_tpu.core import codec as _codec

        def seg_comp_fn(codes, offs=offs, S=S):
            k, _ = splitsort._composite_segmented_sort(
                offs, _codec.encode_keys(codes), codes.view(jnp.uint32), S,
                32)
            return k

        res = timed(seg_comp_fn, total, batch=5, seed=10,
                                  repeats=2)
        emit("segsort_bimodal_composite_pairs", res, total,
             {"engine": "composite_forced", "segments": S})

    with open(outpath, "a") as f:
        stamp = {"ts": time.time(), "rows": results}
        f.write(json.dumps(stamp) + "\n")
    print(f"# wrote {len(results)} rows to {outpath}", file=sys.stderr)


if __name__ == "__main__":
    main()
