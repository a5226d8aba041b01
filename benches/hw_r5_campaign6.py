#!/usr/bin/env python
"""Round-5 campaign 6: the new defaults, end to end on the PUBLIC path.

Campaign-5 installed hier cuts (K >= 64) and seg 2^21 defaults.  Those
were measured through the engine entry points; this campaign re-checks
the PUBLIC AUTO surface (gst.sort / gst.sort_pairs / gst.argsort) with
the installed routing, plus the open seg question for wide:

  U0. AUTO digests: gst.sort at 2^28 and 2^27+2^20 (keys, vs the XLA
      oracle), gst.sort_pairs + gst.argsort at 2^27+2^20 — the installed
      route must be bit-exact through the public dispatch.
  U.  AUTO timing spots with the installed defaults (flat baselines from
      campaigns 1-4 in parens):
        keys 2^27+2^20 (270.0) and 3*2^26 (372.3)
        pairs 2^27+2^20 (777.3)
        argsort 2^26 (259.9) and 2^25 (115.3) — the threshold sizes,
        now at default seg 2^21 (J2 measured them at seg 2^22/bisect)
  V.  wide 4-plane, cuts=hier, seg 2^21 at 2^28 — campaign-5 T measured
      2^22 = 1503.6; hier removed the K^2 wall that made 2^21 lose.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import gpusorting_tpu as gst
from gpusorting_tpu.core import codec, prng
from gpusorting_tpu.ops import rangesweep

from benches.hw_r5_campaign3 import timed
from benches.hw_r5_campaign5 import rs_wide_h


def auto_keys_digest(n, seed=98):
    @jax.jit
    def both():
        k = prng.hybrid_taus_bits(n, seed)
        e = jax.lax.sort(k)
        g = codec.encode_keys(gst.sort(k))
        w1 = jax.lax.iota(jnp.uint32, n) | jnp.uint32(1)
        w2 = w1 * jnp.uint32(0x9E3779B9) | jnp.uint32(1)
        f = lambda a: jnp.stack([jnp.sum(a * w1, dtype=jnp.uint32),
                                 jnp.sum(a * w2, dtype=jnp.uint32)])
        return f(e), f(g)

    e, g = jax.device_get(both())
    ok = bool((np.asarray(e) == np.asarray(g)).all())
    print(json.dumps({"bench": f"U0_auto_keys_n{n}", "exact": ok}),
          flush=True)
    return ok


def auto_pairs_argsort_digest(n, seed=99):
    @jax.jit
    def both():
        k = prng.hybrid_taus_bits(n, seed) & jnp.uint32(0xFFFF)
        v = jax.lax.iota(jnp.uint32, n) * jnp.uint32(2654435769)
        ek, ev = jax.lax.sort((k, v), num_keys=1, is_stable=True)
        gk, gv = gst.sort_pairs(k, v)
        ak, perm = gst.argsort(k, return_keys=True)
        idx = jax.lax.iota(jnp.uint32, n)
        eik, eiv = jax.lax.sort((k, idx), num_keys=1, is_stable=True)
        w1 = jax.lax.iota(jnp.uint32, n) | jnp.uint32(1)
        w2 = w1 * jnp.uint32(0x9E3779B9) | jnp.uint32(1)
        f = lambda *t: jnp.stack(
            [jnp.sum(a * w, dtype=jnp.uint32) for a in t for w in (w1, w2)])
        return (f(ek, ev, eik, eiv.astype(jnp.uint32)),
                f(codec.encode_keys(gk), gv,
                  codec.encode_keys(ak), perm.astype(jnp.uint32)))

    e, g = jax.device_get(both())
    ok = bool((np.asarray(e) == np.asarray(g)).all())
    print(json.dumps({"bench": f"U0_auto_pairs_argsort_n{n}", "exact": ok}),
          flush=True)
    return ok


def auto_keys(k):
    return codec.encode_keys(gst.sort(k))


def auto_pairs(k):
    v = k ^ jnp.uint32(0x9E3779B9)
    sk, sv = gst.sort_pairs(k, v)
    return codec.encode_keys(sk) ^ sv


def auto_argsort(k):
    sk, perm = gst.argsort(k, return_keys=True)
    return codec.encode_keys(sk) ^ perm.astype(jnp.uint32)


def main():
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    thin = (1 << 27) + (1 << 20)

    ok = True
    ok &= auto_keys_digest(1 << 28)
    ok &= auto_keys_digest(thin)
    ok &= auto_pairs_argsort_digest(thin)
    if not ok:
        print(json.dumps({"fatal": "AUTO digest mismatch — not timing"}))
        return 1

    timed("U_auto_keys_2^27+2^20", thin, auto_keys)
    timed("U_auto_keys_3x2^26", 3 << 26, auto_keys)
    timed("U_auto_pairs_2^27+2^20", thin, auto_pairs)
    timed("U_auto_argsort_2^26", 1 << 26, auto_argsort)
    timed("U_auto_argsort_2^25", 1 << 25, auto_argsort)

    timed("V_wide_hier_2^28_seg2^21", 1 << 28, rs_wide_h(1 << 21))
    return 0


if __name__ == "__main__":
    sys.exit(main())
