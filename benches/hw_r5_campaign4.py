#!/usr/bin/env python
"""Round-5 campaign 4: the gather composition + crossover depth.

Campaign-3 measured the 2-plane argsort at 877.0 ms vs the 3-plane pairs
pipeline at 1201.6 (2^28) — one dropped plane is worth 324.6 ms.  If a
full-permutation element gather costs less than that, EVERY payload mode
should ride the 2-plane argsort and gather payloads afterwards:

  M. pairs via argsort+gather: sort_pairs == argsort (2 planes) +
     jnp.take(payload, perm).  Digest identity, then 2^28 vs the 3-plane
     1201.6 and flat 1305.5.  One gather priced in pipeline position is
     the decision number (the round-4 probes saw wildly different gather
     rates depending on index specialization — only end-to-end counts).
  N. wide via argsort + TWO gathers vs the 4-plane 1535.9 / flat 1710.0.
  J2. argsort crossover depth: 2^26, 3*2^25, 2^25 (rs vs flat) — the
     routed threshold is 2^27 (campaign 3); wins at one-plane-less hold
     at pow2 sizes, so the floor may be much lower.
  L2. pairs thin edge: 2^27+2^20 (the smallest non-pow2 above the newly
     installed (1<<27)+1 pairs threshold).
  K2. wide non-pow2: 3*2^26, 2^27+2^25 — decides whether
     rangesweep_min_pairs_wide follows the keys/pairs (1<<27)+1.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gpusorting_tpu.core import prng
from gpusorting_tpu.ops import rangesweep

from benches.hw_r5_campaign1 import flat_pairs, rs_pairs
from benches.hw_r5_campaign3 import (flat_argsort, flat_wide, rs_argsort,
                                     rs_wide, timed)


# ---- M/N: gather compositions ----------------------------------------------

def pairs_via_argsort(L):
    def body(k):
        v = k ^ jnp.uint32(0x9E3779B9)
        sk, perm = rangesweep.argsort_rangesweep(k, seg_elems=L)
        return sk ^ jnp.take(v, perm)

    return body


def wide_via_argsort(L):
    def body(k):
        lo = k ^ jnp.uint32(0x9E3779B9)
        hi = k ^ jnp.uint32(0x85EBCA6B)
        sk, perm = rangesweep.argsort_rangesweep(k, seg_elems=L)
        return sk ^ jnp.take(lo, perm) ^ jnp.take(hi, perm)

    return body


def gather_digest(n, L, seed=93):
    """pairs-via-argsort+gather == stable pair oracle (two-multiplier)."""
    @jax.jit
    def both():
        k = prng.hybrid_taus_bits(n, seed) & jnp.uint32(0xFFFF)  # heavy dups
        v = jax.lax.iota(jnp.uint32, n) * jnp.uint32(2654435769)
        ek, ev = jax.lax.sort((k, v), num_keys=1, is_stable=True)
        sk, perm = rangesweep.argsort_rangesweep(k, seg_elems=L)
        gv = jnp.take(v, perm)
        w1 = jax.lax.iota(jnp.uint32, n) | jnp.uint32(1)
        w2 = w1 * jnp.uint32(0x9E3779B9) | jnp.uint32(1)
        f = lambda a, b: jnp.stack(
            [jnp.sum(a * w1, dtype=jnp.uint32),
             jnp.sum(a * w2, dtype=jnp.uint32),
             jnp.sum(b * w1, dtype=jnp.uint32),
             jnp.sum(b * w2, dtype=jnp.uint32)])
        return f(ek, ev), f(sk, gv)

    e, g = jax.device_get(both())
    ok = bool((np.asarray(e) == np.asarray(g)).all())
    print(json.dumps({"bench": f"M_gather_digest_n{n}_L{L}",
                      "exact": ok}), flush=True)
    return ok


def main():
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    n = 1 << 28

    # M. pairs via argsort+gather
    gather_digest((1 << 26) + 12345, 1 << 22)
    timed("M_pairs_argsort_gather_2^28_seg2^22", n,
          pairs_via_argsort(1 << 22))
    # N. wide via argsort + two gathers
    timed("N_wide_argsort_gather_2^28_seg2^22", n, wide_via_argsort(1 << 22))

    # J2. argsort crossover depth
    for m, tag in ((1 << 26, "2^26"), (3 << 25, "3x2^25"), (1 << 25, "2^25")):
        timed(f"J2_argsort_rs_{tag}_seg2^22", m,
              rs_argsort(min(1 << 22, m // 8)))
        timed(f"J2_argsort_flat_{tag}", m, flat_argsort)

    # L2. pairs thin edge above the new (1<<27)+1 threshold
    p = (1 << 27) + (1 << 20)
    timed("L2_pairs_flat_2^27+2^20", p, flat_pairs)
    timed("L2_pairs_rs_2^27+2^20_seg2^22", p, rs_pairs(1 << 22))

    # K2. wide non-pow2
    for p, tag in ((3 << 26, "3x2^26"), ((1 << 27) + (1 << 25), "2^27+2^25")):
        timed(f"K2_wide_flat_{tag}", p, flat_wide)
        timed(f"K2_wide_rs_{tag}_seg2^22", p, rs_wide(1 << 22))
    return 0


if __name__ == "__main__":
    sys.exit(main())
