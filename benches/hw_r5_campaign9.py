#!/usr/bin/env python
"""Round-5 campaign 9: the REAL adaptive entropy skip A/B (the campaign
7/8 rows measured the min/max per-block form — see RESULTS.md
correction).  Keys 2^28, default seg 2^21 + hier cuts.

  Z0. digests: adaptive skip ON for E020-class dup + all-equal.
  Z.  E100 skip=True (adaptive)  — is the outer scalar cond free?
      E100 skip=False            — the 395.1 baseline re-pinned
      all-equal skip=True        — expect ~120 ms (the skipping branch)
      all-equal skip=False       — the 250.2 baseline
      E020 skip=True             — must equal skip-off (plain branch)
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gpusorting_tpu.core import prng
from gpusorting_tpu.ops import rangesweep, xla_sort

from benches.hw_r5_campaign3 import timed


def digest(n, mode, seed=107):
    @jax.jit
    def both():
        if mode == "alleq":
            k = jnp.full((n,), jnp.uint32(0xABCD1234))
        else:
            k = prng.hybrid_taus_bits(n, seed, and_count=4)
        e = xla_sort.sort_all_keys_unstable((k,))[0]
        g = rangesweep.sort_codes_rangesweep(k, entropy_skip=True)
        w1 = jax.lax.iota(jnp.uint32, n) | jnp.uint32(1)
        w2 = w1 * jnp.uint32(0x9E3779B9) | jnp.uint32(1)
        f = lambda a: jnp.stack([jnp.sum(a * w1, dtype=jnp.uint32),
                                 jnp.sum(a * w2, dtype=jnp.uint32)])
        return f(e), f(g)

    e, g = jax.device_get(both())
    ok = bool((np.asarray(e) == np.asarray(g)).all())
    print(json.dumps({"bench": f"Z0_{mode}_n{n}", "exact": ok}), flush=True)
    return ok


def body(mode, skip):
    def fn(k):
        if mode == "alleq":
            k = jnp.full_like(k, jnp.uint32(0xABCD1234))
        elif mode == "E020":
            for i in range(4):
                k = k & prng.hybrid_taus_bits(k.shape[0], 7919 + i)
        return rangesweep.sort_codes_rangesweep(k, entropy_skip=skip)

    return fn


def main():
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    n = 1 << 28
    ok = digest((1 << 26) + 12345, "E020dup")
    ok &= digest(1 << 26, "alleq")
    if not ok:
        print(json.dumps({"fatal": "digest mismatch"}))
        return 1
    timed("Z_E100_adaptive_on", n, body("E100", True))
    timed("Z_E100_off", n, body("E100", False))
    timed("Z_alleq_adaptive_on", n, body("alleq", True))
    timed("Z_alleq_off", n, body("alleq", False))
    timed("Z_E020_adaptive_on", n, body("E020", True))

    # P2. pow2-2^27 re-test with the hier cuts (K=64 -> hier now): the
    # r4 crossover said flat wins 2% at exactly 2^27 (212.8 vs 208.6,
    # old K^2 cuts); campaign-8's CLEAN pairs rows already flipped it
    # for pairs (538.4 vs 585.6).  If keys flips too, rangesweep_min
    # becomes 2^27 inclusive.
    m = 1 << 27
    timed("P2_keys_rs_2^27", m,
          lambda k: rangesweep.sort_codes_rangesweep(k))
    timed("P2_keys_flat_2^27", m,
          lambda k: xla_sort.sort_all_keys_unstable((k,))[0])

    def rs_pairs(k):
        sk, sv = rangesweep.sort_pairs_rangesweep(
            k, k ^ jnp.uint32(0x9E3779B9))
        return sk ^ sv

    def flat_pairs(k):
        sk, sv = jax.lax.sort((k, k ^ jnp.uint32(0x9E3779B9)), num_keys=1,
                              is_stable=True)
        return sk ^ sv

    timed("P2_pairs_rs_2^27", m, rs_pairs)
    timed("P2_pairs_flat_2^27", m, flat_pairs)
    return 0


if __name__ == "__main__":
    sys.exit(main())
