#!/usr/bin/env python
"""Round-5 campaign 7: the entropy signature, measured (VERDICT r4 #8).

The reference family sorts LOW-entropy inputs FASTER (README.md:25-27;
Tests.h:370-419).  Round 3's tile-reroute attempt reversed under the
careful r4 A/B and was deleted; round 5's mechanism is ON-DEVICE: the
rangesweep phases reduce each block to min/max and `lax.cond` away the
sort when the block is constant (entropy_skip, keys only).  E020's most
common value (0) covers ~(31/32)^32 = 36% of keys, so ~1/3 of phase-3
buckets are constant; all-equal inputs skip every block sort.

Rows (keys 2^28, default seg 2^21, hier cuts; A/B = skip on vs off):
  W0. digests: E020 + all-equal with skip ON (bit-exact before timing)
  W. E100 (uniform) on/off — the regression gate (tolerate <= ~1%)
     E033 / E020 on/off — the signature
     all-equal on/off — the degenerate floor
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


def digest(n, and_count, tag, seed=101):
    @jax.jit
    def both():
        if and_count < 0:
            k = jnp.full((n,), jnp.uint32(0xABCD1234))
        else:
            k = prng.hybrid_taus_bits(n, seed, and_count=and_count)
        e = xla_sort.sort_all_keys_unstable((k,))[0]
        g = rangesweep.sort_codes_rangesweep(k, entropy_skip=True)
        w1 = jax.lax.iota(jnp.uint32, n) | jnp.uint32(1)
        w2 = w1 * jnp.uint32(0x9E3779B9) | jnp.uint32(1)
        f = lambda a: jnp.stack([jnp.sum(a * w1, dtype=jnp.uint32),
                                 jnp.sum(a * w2, dtype=jnp.uint32)])
        return f(e), f(g)

    e, g = jax.device_get(both())
    ok = bool((np.asarray(e) == np.asarray(g)).all())
    print(json.dumps({"bench": f"W0_{tag}_n{n}", "exact": ok}), flush=True)
    return ok


def body(and_count, skip):
    def fn(k):
        if and_count > 0:
            for i in range(and_count):
                k = k & prng.hybrid_taus_bits(
                    k.shape[0], 7919 + i, and_count=0)
        elif and_count < 0:
            k = jnp.full_like(k, jnp.uint32(0xABCD1234))
        return rangesweep.sort_codes_rangesweep(k, entropy_skip=skip)

    return fn


def main():
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    n = 1 << 28

    ok = digest((1 << 26) + 12345, 4, "E020")
    ok &= digest(1 << 26, -1, "alleq")
    if not ok:
        print(json.dumps({"fatal": "digest mismatch — not timing"}))
        return 1

    for tag, ac in (("E100", 0), ("E033", 3), ("E020", 4), ("alleq", -1)):
        for skip in (True, False):
            timed(f"W_{tag}_skip{'on' if skip else 'off'}", n,
                  body(ac, skip))
    return 0


if __name__ == "__main__":
    sys.exit(main())
