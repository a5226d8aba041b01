#!/usr/bin/env python
"""Round-5 campaign 10: the crossover floor after the 2^27 flips, the
wide pow2 edge, and the CLEAN autotune reproduce.

  F2. keys + pairs at 2^26 and 3*2^25 (rs default engine vs flat): the
      2^27 pow2 sizes flipped to 6-7% wins under the hier cuts, so the
      floor moved below 2^27 and is unmeasured (r4's 3*2^25 loss was
      the K^2-cuts engine at seg 2^23).
  K3. wide 4-plane at pow2 2^27 (threshold currently (1<<27)+1).
  Y2. gst.autotune_rangesweep reproduce — campaign-8's Y keys rows were
      contaminated by the buggy skip default; the clean sweep must
      reproduce rangesweep_min = 2^27 (it brackets at n_max/2) and
      seg 2^21.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from gpusorting_tpu.ops import rangesweep, xla_sort

from benches.hw_r5_campaign3 import timed


def rs_keys(k):
    return rangesweep.sort_codes_rangesweep(k)


def flat_keys(k):
    return xla_sort.sort_all_keys_unstable((k,))[0]


def rs_pairs(k):
    sk, sv = rangesweep.sort_pairs_rangesweep(k, k ^ jnp.uint32(0x9E3779B9))
    return sk ^ sv


def flat_pairs(k):
    sk, sv = jax.lax.sort((k, k ^ jnp.uint32(0x9E3779B9)), num_keys=1,
                          is_stable=True)
    return sk ^ sv


def rs_wide(k):
    lo = k ^ jnp.uint32(0x9E3779B9)
    hi = k ^ jnp.uint32(0x85EBCA6B)
    sk, slo, shi = rangesweep.sort_pairs_rangesweep_planes(
        k, (lo, hi),
        seg_elems=rangesweep._default_seg_elems_pairs(wide=True))
    return sk ^ slo ^ shi


def flat_wide(k):
    lo = k ^ jnp.uint32(0x9E3779B9)
    hi = k ^ jnp.uint32(0x85EBCA6B)
    sk, slo, shi = jax.lax.sort((k, lo, hi), num_keys=1, is_stable=True)
    return sk ^ slo ^ shi


def main():
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    for m, tag in ((1 << 26, "2^26"), (3 << 25, "3x2^25")):
        timed(f"F2_keys_rs_{tag}", m, rs_keys)
        timed(f"F2_keys_flat_{tag}", m, flat_keys)
        timed(f"F2_pairs_rs_{tag}", m, rs_pairs)
        timed(f"F2_pairs_flat_{tag}", m, flat_pairs)

    m = 1 << 27
    timed("K3_wide_rs_2^27", m, rs_wide)
    timed("K3_wide_flat_2^27", m, flat_wide)

    import gpusorting_tpu as gst

    params, sweep = gst.autotune_rangesweep(n_max=1 << 28, batch=2)
    print(json.dumps({
        "bench": "Y2_autotune_rangesweep",
        "rangesweep_min": params.rangesweep_min,
        "rangesweep_seg_elems": params.rangesweep_seg_elems,
        "rangesweep_min_pairs": params.rangesweep_min_pairs,
        "rangesweep_seg_elems_pairs": params.rangesweep_seg_elems_pairs,
        "reproduces_installed": (
            params.rangesweep_min == 1 << 27
            and params.rangesweep_seg_elems == 1 << 21
            and params.rangesweep_min_pairs == 1 << 27
            and params.rangesweep_seg_elems_pairs == 1 << 21),
        "sweep": {k: {kk: round(vv / 1e6, 1) for kk, vv in v.items()}
                  for k, v in sweep.items()},
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
