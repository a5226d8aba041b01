#!/usr/bin/env python
"""Hardware comparison: NextFitBinPacking packed-bins path vs the two-window
path for <=32-length random segments (the reference's SplitSortBins32 bin,
SplitSortVariants.cuh:386-451).

The packed path gathers contiguous bin spans into (bins, 32) rows (halving
the row width vs the L=64 window grid) at the cost of a gather + scatter;
the window path moves no data.  This records which side of that trade wins
on real hardware.  One JSON line per row, appended to results_<device>.jsonl
by hand-transcription into RESULTS.md (same convention as run_suite).
"""

import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax.numpy as jnp

    import gpusorting_tpu as gst
    from gpusorting_tpu.core import prng
    from gpusorting_tpu.segsort import splitsort
    from gpusorting_tpu.utils import timing

    info = gst.get_device_info()
    total = 1 << 22
    for max_len in (16, 32):
        offs, S = prng.make_random_segments(total, max_len, seed=3)
        for strategy in ("auto", "packed"):
            def seg_fn(codes, offs=offs, S=S, strategy=strategy):
                k, _ = splitsort.split_sort_pairs(
                    offs, codes, codes, S, total, strategy=strategy)
                return k

            res = timing.batch_timing(seg_fn, total, batch=5, seed=10,
                                      repeats=2)
            row = {
                "bench": f"segsort_packed_vs_window_maxlen{max_len}",
                "strategy": strategy,
                "keys_per_sec": res["keys_per_sec"],
                "n": total,
                "segments": int(S),
                "device": info.device_kind,
            }
            print(json.dumps(row), flush=True)


if __name__ == "__main__":
    main()
