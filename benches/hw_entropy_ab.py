#!/usr/bin/env python
"""Round-4k: careful entropy-tile A/B — does tile 512 still beat tile
2048 on E020 skew?

Round 3 measured E020@512 = 0.181 G vs E020@2048 = 0.171 G (+6%); the
round-4 validation run showed the REVERSE (0.976x) with a wide spread on
the 512 row.  This re-run uses batch 12 x repeats 3 interleaved per arm
to settle the verdict; the auto-route default follows the result
(measured routing ONLY — CLAUDE.md discipline).
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import gpusorting_tpu as gst
from gpusorting_tpu.utils import timing


def emit(name, res, extra=None):
    row = {"bench": name, **{k: res[k] for k in (
        "keys_per_sec", "seconds_per_sort", "n", "batch",
        "timing_floored", "spread_min_s", "spread_max_s")}}
    row.update(extra or {})
    print(json.dumps(row), flush=True)


def main():
    n = 1 << 24

    def run(preset, tile):
        f = lambda keys: gst.sort(keys, backend=gst.Backend.PALLAS,
                                  variant="device_radix", tile_rows=tile)
        return timing.batch_timing(f, n, batch=12, seed=11, repeats=3,
                                   entropy=preset)

    rows = []
    for rep in range(2):  # interleave arms across process time
        for tile in (512, 2048):
            res = run(gst.EntropyPreset.E020, tile)
            emit(f"e020_tile{tile}_rep{rep}", res, {"tile": tile})
            rows.append((tile, res["seconds_per_sort"]))
    t512 = min(t for tl, t in rows if tl == 512)
    t2048 = min(t for tl, t in rows if tl == 2048)
    print(json.dumps({"bench": "entropy_ab_verdict",
                      "tile512_best_s": t512, "tile2048_best_s": t2048,
                      "tile512_speedup": t2048 / t512}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
