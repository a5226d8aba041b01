#!/usr/bin/env python
"""Round-5 campaign 8: the fused-composite segsort route + the autotuner
reproducing the flagship crossovers live.

  X. fused composite segsort at flagship total (the VERDICT-r4 #9
     midrange shot, measured): total 2^28, random segments maxlen 2^16,
     bits_to_sort=16 (segBits + bits <= 32 -> ONE u32 composite sort).
     A/B: the installed rangesweep route vs auto_engine forced to XLA —
     keys-only and 1-payload forms.  Digest identity first.
  Y. gst.autotune_rangesweep(n_max=2^28) live on v5e: the VERDICT-r4
     missing-#6 done-criterion — the sweep must reproduce the installed
     v5e routing (rangesweep_min = (1<<27)+1 via the half/3q bracket,
     best seg 2^21) from measurements alone.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gpusorting_tpu.core import config as cfg
from gpusorting_tpu.core import prng
from gpusorting_tpu.segsort import splitsort

from benches.hw_r5_campaign3 import timed


BITS = 16
MAXLEN = 1 << 16


def composite_body(total, offs, S, payload, force_xla):
    def fn(k):
        k = k & jnp.uint32((1 << BITS) - 1)
        payloads = (k ^ jnp.uint32(0x9E3779B9),) if payload else ()
        real = cfg.auto_engine
        if force_xla:
            cfg.auto_engine = lambda *a, **kw: "xla"
        try:
            sc, ps = splitsort._composite_multi(offs, k, payloads, S, BITS)
        finally:
            cfg.auto_engine = real
        out = sc
        for p in ps:
            out = out ^ p
        return out

    return fn


def composite_digest(total, offs, S, seed=103):
    @jax.jit
    def both():
        k = prng.hybrid_taus_bits(total, seed) & jnp.uint32((1 << BITS) - 1)
        p = k ^ jnp.uint32(0x9E3779B9)
        real = cfg.auto_engine
        cfg.auto_engine = lambda *a, **kw: "xla"
        try:
            ek, eps = splitsort._composite_multi(offs, k, (p,), S, BITS)
        finally:
            cfg.auto_engine = real
        gk, gps = splitsort._composite_multi(offs, k, (p,), S, BITS)
        w1 = jax.lax.iota(jnp.uint32, total) | jnp.uint32(1)
        w2 = w1 * jnp.uint32(0x9E3779B9) | jnp.uint32(1)
        f = lambda a, b: jnp.stack(
            [jnp.sum(a * w1, dtype=jnp.uint32),
             jnp.sum(a * w2, dtype=jnp.uint32),
             jnp.sum(b * w1, dtype=jnp.uint32),
             jnp.sum(b * w2, dtype=jnp.uint32)])
        return f(ek, eps[0]), f(gk, gps[0])

    e, g = jax.device_get(both())
    ok = bool((np.asarray(e) == np.asarray(g)).all())
    print(json.dumps({"bench": f"X_composite_digest_total{total}",
                      "exact": ok}), flush=True)
    return ok


def main():
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    total = 1 << 28
    offs, S = prng.make_random_segments(total, MAXLEN, seed=17)
    S = int(S)
    print(json.dumps({"segments": S, "maxlen": MAXLEN, "bits": BITS}),
          flush=True)

    if not composite_digest((1 << 26) + 12345,
                            *(lambda o, s: (o, int(s)))(
                                *prng.make_random_segments(
                                    (1 << 26) + 12345, MAXLEN, seed=18))):
        print(json.dumps({"fatal": "composite digest mismatch"}))
        return 1

    for payload in (False, True):
        tag = "pairs" if payload else "keys"
        timed(f"X_composite_{tag}_rs_2^28", total,
              composite_body(total, offs, S, payload, force_xla=False))
        timed(f"X_composite_{tag}_xla_2^28", total,
              composite_body(total, offs, S, payload, force_xla=True))

    # W2. the ADAPTIVE entropy skip (one scalar cond picks plain vs
    # skipping map at >= 90% constant buckets): uniform must match
    # skip-off (395.1), all-equal must keep the 2x (121.2 per-bucket)
    from gpusorting_tpu.ops import rangesweep

    timed("W2_E100_adaptive", total,
          lambda k: rangesweep.sort_codes_rangesweep(k, entropy_skip=True))
    timed("W2_alleq_adaptive", total,
          lambda k: rangesweep.sort_codes_rangesweep(
              jnp.full_like(k, jnp.uint32(0xABCD1234)), entropy_skip=True))

    # Y. the autotuner reproduces the installed routing from live sweeps
    import gpusorting_tpu as gst

    params, sweep = gst.autotune_rangesweep(n_max=1 << 28, batch=2)
    print(json.dumps({
        "bench": "Y_autotune_rangesweep",
        "rangesweep_min": params.rangesweep_min,
        "rangesweep_seg_elems": params.rangesweep_seg_elems,
        "rangesweep_min_pairs": params.rangesweep_min_pairs,
        "rangesweep_seg_elems_pairs": params.rangesweep_seg_elems_pairs,
        "reproduces_installed": (
            params.rangesweep_min == (1 << 27) + 1
            and params.rangesweep_seg_elems == 1 << 21
            and params.rangesweep_min_pairs == (1 << 27) + 1
            and params.rangesweep_seg_elems_pairs == 1 << 21),
        "sweep": {k: {kk: round(vv / 1e6, 1) for kk, vv in v.items()}
                  for k, v in sweep.items()},
    }), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
