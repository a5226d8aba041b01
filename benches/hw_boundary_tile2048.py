#!/usr/bin/env python
"""Boundary window at the REAL production tile (2048 rows = 262144 elems).

The earlier full-window run used the 512-row bucket [65536, 131073] —
every size in it fits ONE 2048-row tile, so it validated partial-tile
residues but never crossed the production tile boundary.  This sweep
runs the reference window [tile, 2*tile] (GPUSortBase.h:245-248) at the
real tile: [262144, 524290).

  - radix16 keys: FULL window (every size), bucketed traced-size driver
  - rts / splitsweep keys: all 160 residues at each edge + mid-tile cross
  - radix16 pairs: FULL window, duplicate-heavy keys + distinct payloads
    (stability oracle); rts pairs: dense residues

Uses the one-compile bucketed checkers of benches/tpu_test_all.py.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

import jax
import jax.numpy as jnp
import numpy as np

from gpusorting_tpu.core import prng
from gpusorting_tpu.ops import radix16, rts, splitsweep

TILE = 2048 * 128
B = 2 * TILE + 128
CHUNK = 1024
t0 = time.time()
print(f"tile {TILE} bucket {B}", flush=True)


from boundary_check import make_keys_checker, make_pairs_checker


def range_checker(eng):
    return make_keys_checker(eng, B)


def pair_range_checker(fn):
    return make_pairs_checker(fn, B)


def run(tag, checker, ranges):
    bad = total = 0
    for n0, cnt in ranges:
        bad += int(np.asarray(checker(jnp.uint32(n0), cnt)))
        total += cnt
        if total % (CHUNK * 32) == 0:
            print(f"  .. {tag} {total} sizes, bad={bad}, "
                  f"t={time.time()-t0:.0f}s", flush=True)
    print(f"[{tag}] sizes with 0 mismatches: "
          f"{total if bad == 0 else 'FAIL(' + str(bad) + ')'} / {total} "
          f"(t={time.time()-t0:.0f}s)", flush=True)
    return bad


FULL = [(TILE + CHUNK * c, min(CHUNK, TILE + 2 - CHUNK * c))
        for c in range(-(-(TILE + 2) // CHUNK))]
DENSE = [(TILE, 160), (2 * TILE - 160, 162), (TILE + TILE // 2 - 8, 16)]

fail = 0
fail += run("keys radix16 FULL", range_checker(radix16.sort_codes_radix16),
            FULL)
fail += run("keys rts dense", range_checker(rts.sort_codes_rts), DENSE)
fail += run("keys splitsweep dense",
            range_checker(splitsweep.sort_codes_splitsweep), DENSE)
fail += run("pairs radix16 FULL",
            pair_range_checker(radix16.sort_pairs_radix16), FULL)
fail += run("pairs rts dense", pair_range_checker(rts.sort_pairs_rts), DENSE)
print(f"[TOTAL] {'PASS' if fail == 0 else 'FAIL'} wall {time.time()-t0:.0f}s",
      flush=True)
