#!/usr/bin/env python
"""Rangesweep round-4c: dense-slab exchange end-to-end + correctness.

Round-4b lesson (logs/hw_rangesweep3_r4.log): the control probe showed NO
inherent phase-3 premium (two chained mapped sorts = 431.6 ms = 2 x p1),
but padding buckets to L + 2K*128 de-power-of-two'd phase 3 (XLA bitonic
pads back to 2L): 670 ms at seg 2^24.  The dense-slab exchange keeps
buckets at exactly L (bulk*128 + fringes == L is row-aligned), so the
projection is p1 + cuts + exchange + p1:

    seg 2^24:  216.6*2 + ~3 + exch  ~= 450 ms
    seg 2^23:  200.7*2 + cuts + exch ~= 430 ms
    seg 2^22:  188.5*2 + cuts + exch ~= 420 ms   vs XLA 469.7 (same run)

Correctness re-checked on hardware first (uniform + E020 + all-equal at
2^26), then full timing rows.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp
import numpy as np

from gpusorting_tpu.core import prng
from gpusorting_tpu.ops import rangesweep
from gpusorting_tpu.utils import timing


def emit(name, res=None, extra=None):
    row = {"bench": name}
    if res is not None:
        row.update({k: res[k] for k in (
            "keys_per_sec", "seconds_per_sort", "n", "batch",
            "timing_floored", "spread_min_s", "spread_max_s")})
    row.update(extra or {})
    print(json.dumps(row), flush=True)


def main():
    # correctness at 2^26 (odd n to exercise the padded tail chunk)
    n_c = (1 << 26) + 12345
    for tag, arr in [
        ("uniform", prng.hybrid_taus_bits(n_c, seed=5)),
        ("e020", prng.hybrid_taus_bits(n_c, seed=6, and_count=4)),
        ("all_equal", jnp.full((n_c,), 0xFFFFFFFF, jnp.uint32)),
    ]:
        out = np.asarray(rangesweep.sort_codes_rangesweep(
            arr, seg_elems=1 << 23))
        ok = bool((out == np.sort(np.asarray(arr))).all())
        emit(f"rangesweep_dense_exact_{tag}", extra={"exact": ok, "n": n_c})
        if not ok:
            print(f"FAIL {tag}", file=sys.stderr)
            return 1

    n = 1 << 28
    lgs = [int(a) for a in sys.argv[1:]] or [23, 22, 24]
    for lg in lgs:
        L = 1 << lg
        fn = lambda codes, L=L: rangesweep.sort_codes_rangesweep(
            codes, seg_elems=L)
        res = timing.batch_timing(fn, n, batch=6, seed=10, repeats=2)
        emit(f"rangesweep_dense_2^28_seg2^{lg}", res,
             {"seg": L, "K": n // L})
    return 0


if __name__ == "__main__":
    sys.exit(main())
