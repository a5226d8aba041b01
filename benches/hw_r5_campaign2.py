#!/usr/bin/env python
"""Round-5 campaign 2: merge-probe re-run + non-pow2 crossover + wide rates.

Campaign 1 (hw_r5_campaign1.log) died at section E on a transient
remote-compile failure; this re-runs E and adds the follow-ups its
results opened:

  F. Non-pow2 keys crossover points (campaign-1 C measured rangesweep
     WINNING 11.8% at 3*2^26 while losing 2% at pow2 2^27): bracket the
     non-pow2 win region with n = 2^27 + 2^20 (just past a pow2),
     2^27 + 2^25, and 3*2^25 (non-pow2 below 2^27), each flat vs
     rangesweep.  Decides a rangesweep_min_nonpow2 routing threshold.
  G. 4-plane mapped-chunk rates (prices the u64-payload pairs pipeline,
     VERDICT r4 next #3): (code, idx, lo, hi) 2-key mapped sorts at
     seg 2^22 / 2^21, plus the flat 4-op stable oracle at 2^28.
  E. (re-run) jnp bitonic-merge stage rates at (64, 2^22).
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp

from benches.hw_r5_campaign1 import (
    flat_keys, mapped_1op, merge_digest, probe_merge, probe_prep,
    rs_keys, timed,
)


def mapped_4op(L):
    def body(k):
        n = k.shape[0]
        idx = jax.lax.iota(jnp.uint32, n)
        lo = k ^ jnp.uint32(0x9E3779B9)
        hi = k ^ jnp.uint32(0x85EBCA6B)
        sort2 = lambda t: jax.lax.sort(t, num_keys=2, is_stable=False)
        a, b, c, d = jax.lax.map(sort2, (k.reshape(n // L, L),
                                         idx.reshape(n // L, L),
                                         lo.reshape(n // L, L),
                                         hi.reshape(n // L, L)))
        return (a ^ b ^ c ^ d).reshape(-1)

    return body


def flat_wide(k):
    lo = k ^ jnp.uint32(0x9E3779B9)
    hi = k ^ jnp.uint32(0x85EBCA6B)
    sk, slo, shi = jax.lax.sort((k, lo, hi), num_keys=1, is_stable=True)
    return sk ^ slo ^ shi


def main():
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    n = 1 << 28

    # F. non-pow2 keys crossover
    for p, tag in (((1 << 27) + (1 << 20), "2^27+2^20"),
                   ((1 << 27) + (1 << 25), "2^27+2^25"),
                   (3 << 25, "3x2^25")):
        timed(f"F_keys_flat_{tag}", p, flat_keys)
        timed(f"F_keys_rs_{tag}_seg2^23", p, rs_keys(1 << 23))

    # G. wide-pairs pricing
    timed("G_map4_seg2^22", n, mapped_4op(1 << 22))
    timed("G_map4_seg2^21", n, mapped_4op(1 << 21))
    timed("G_flat_wide_2^28", n, flat_wide)

    # E. merge probe re-run
    merge_digest(1 << 26, 1 << 22)
    timed("E_prep_2^28_L2^22", n, probe_prep(1 << 22))
    timed("E_merge22_2^28_L2^22", n, probe_merge(1 << 22))
    timed("E_merge_rowsonly_2^28_L2^22", n, probe_merge(1 << 22, d_lo=128))
    timed("E_mapsort_2^28_L2^22", n, mapped_1op(1 << 22))
    return 0


if __name__ == "__main__":
    sys.exit(main())
