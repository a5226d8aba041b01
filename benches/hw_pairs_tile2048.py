#!/usr/bin/env python
"""Hardware validation of the round-3 PAIRS tuner flip (tile 1024 -> 2048).

The pairs-mode radix tile is now 2048 rows (measured best in the round-3
`ablate_radix16.py 24 --pairs` sweep).  This re-runs the bucketed
traced-size pairs boundary checker of benches/tpu_test_all.py at the NEW
tile's boundary window [tile, 2*tile] residues (tile_elems = 2048*128 =
262144), radix16 + rts, duplicate-heavy keys + distinct payloads so the
oracle comparison checks STABILITY (reference mechanism:
GPUSortBase.h:245-248 boundary sweep + Utility.hlsl pairs validate).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from gpusorting_tpu.core.config import Mode, get_tuning_parameters
from gpusorting_tpu.ops import radix16, rts

from boundary_check import make_pairs_checker, run_ranges

TILE_ROWS = get_tuning_parameters(mode=Mode.PAIRS).radix_tile_rows
assert TILE_ROWS == 2048, f"expected flipped pairs tile, got {TILE_ROWS}"
tile_elems = TILE_ROWS * 128
B = 2 * tile_elems + 128
print(f"pairs tile {TILE_ROWS} rows -> boundary bucket B={B}", flush=True)


ranges = [(tile_elems, 16), (tile_elems + tile_elems // 2 - 4, 8),
          (2 * tile_elems - 8, 10)]
for name, fn in (("radix16", radix16.sort_pairs_radix16),
                 ("rts", rts.sort_pairs_rts)):
    bad, total = run_ranges(make_pairs_checker(fn, B), ranges)
    print(f"[pairs tile2048 boundary {name}] sizes with 0 mismatches: "
          f"{total if bad == 0 else 'FAIL(' + str(bad) + ')'} / {total}",
          flush=True)
