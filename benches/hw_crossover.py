#!/usr/bin/env python
"""Round-4i: rangesweep AUTO crossover — smallest n where the engine
beats the flat XLA sort (final DMA exchange + sort-packed prep).

2^28 seg 2^23: 441.4 ms vs 469.7 (hw_rangesweep12).  Rows: n = 2^26 and
2^27 at the two best seg choices vs the oracle at the same n.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

from gpusorting_tpu.ops import rangesweep, xla_sort
from gpusorting_tpu.utils import timing


def emit(name, res, extra=None):
    row = {"bench": name, **{k: res[k] for k in (
        "keys_per_sec", "seconds_per_sort", "n", "batch",
        "timing_floored", "spread_min_s", "spread_max_s")}}
    row.update(extra or {})
    print(json.dumps(row), flush=True)


def main():
    for lgn, lgs_list in [(27, (23, 22)), (26, (23, 22))]:
        n = 1 << lgn
        for lgs in lgs_list:
            L = 1 << lgs
            fn = lambda codes, L=L: rangesweep.sort_codes_rangesweep(
                codes, seg_elems=L)
            res = timing.batch_timing(fn, n, batch=10, seed=10, repeats=2)
            emit(f"rangesweep_2^{lgn}_seg2^{lgs}", res,
                 {"K": n // L})
        res = timing.batch_timing(
            lambda codes: xla_sort.sort_all_keys_unstable((codes,))[0],
            n, batch=10, seed=10, repeats=2)
        emit(f"xla_oracle_2^{lgn}", res)
    return 0


if __name__ == "__main__":
    sys.exit(main())
