#!/usr/bin/env python
"""Round-5 campaign 13: the 3-D phase-boundary engine, end to end.

Campaign 12 found the flagship's hidden cost: flat (K, L) lax.map
boundaries relayout ~38 ms/pass at 2^28 (TPU tiles the last two dims,
interleaving chunks); (K, l_rows, 128) bodies dodge it (D4 sandwich
286.8 vs D3 380.7).  The engine now keeps chunk-major 2-D shapes at
every phase boundary.  Rows:

  P0. digests vs the stable oracle at 2^26+12345: keys uni/dup,
      all-equal 2^24 (exercises the skip branch), pairs dup, argsort
      dup, wide dup — bit-exact before timing.
  Q.  full keys at 2^28, seg 2^21 / 2^22 / 2^20 (the knee may move).
  R/S/T. argsort / pairs / wide at 2^28 seg 2^21 (wide also 2^22).
  X.  crossover re-probes (the ~20% speedup should move every
      threshold down): keys rs at 2^27 / 2^26; pairs rs at 2^27 /
      2^26; argsort rs at 2^24; wide rs at 2^27.  Flat-oracle
      comparators from campaigns 9/10 (flat keys 2^27=208.1,
      2^26=93.0; pairs 2^27=585.9, 2^26=260.7; argsort 2^24=46.3;
      wide 2^27=831.8*) — * re-measured here where missing.

Decides: RoutingParameters v5e rangesweep_min* and seg defaults.
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


def digest(name, fn_pair):
    @jax.jit
    def both():
        e, g = fn_pair()
        w1 = jax.lax.iota(jnp.uint32, e[0].shape[0]) | jnp.uint32(1)
        w2 = w1 * jnp.uint32(0x9E3779B9) | jnp.uint32(1)
        f = lambda arrs: jnp.stack(
            [jnp.sum(a * w, dtype=jnp.uint32) for a in arrs
             for w in (w1, w2)])
        return f(e), f(g)

    e, g = jax.device_get(both())
    ok = bool((np.asarray(e) == np.asarray(g)).all())
    print(json.dumps({"bench": name, "exact": ok}), flush=True)
    return ok


def main():
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    n28 = 1 << 28
    nd = (1 << 26) + 12345
    L = 1 << 21

    ok = True

    def keys_pair(mask, seed=95):
        def go():
            k = prng.hybrid_taus_bits(nd, seed) & jnp.uint32(mask)
            e = xla_sort.sort_all_keys_unstable((k,))[0]
            g = rangesweep.sort_codes_rangesweep(k, seg_elems=L)
            return (e,), (g,)

        return go

    def alleq_pair():
        def go():
            k = jnp.full((1 << 24,), jnp.uint32(0xABCD1234))
            e = k
            g = rangesweep.sort_codes_rangesweep(k, seg_elems=1 << 20)
            return (e,), (g,)

        return go

    def pairs_pair(seed=97):
        def go():
            k = prng.hybrid_taus_bits(nd, seed) & jnp.uint32(0xFFFF)
            v = jax.lax.iota(jnp.uint32, nd) * jnp.uint32(2654435769)
            ek, ev = jax.lax.sort((k, v), num_keys=1, is_stable=True)
            gk, gv = rangesweep.sort_pairs_rangesweep(k, v, seg_elems=L)
            return (ek, ev), (gk, gv)

        return go

    def argsort_pair(seed=91):
        def go():
            k = prng.hybrid_taus_bits(nd, seed) & jnp.uint32(0xFFFF)
            idx = jax.lax.iota(jnp.uint32, nd)
            ek, ev = jax.lax.sort((k, idx), num_keys=1, is_stable=True)
            gk, gv = rangesweep.argsort_rangesweep(k, seg_elems=L)
            return (ek, ev), (gk, gv)

        return go

    def wide_pair(seed=92):
        def go():
            k = prng.hybrid_taus_bits(nd, seed) & jnp.uint32(0xFFFF)
            lo = k ^ jnp.uint32(0x9E3779B9)
            hi = jax.lax.iota(jnp.uint32, nd)
            ek, elo, ehi = jax.lax.sort((k, lo, hi), num_keys=1,
                                        is_stable=True)
            gk, glo, ghi = rangesweep.sort_pairs_rangesweep_planes(
                k, (lo, hi), seg_elems=L)
            return (ek, elo, ehi), (gk, glo, ghi)

        return go

    ok &= digest("P0_keys_uni", keys_pair(0xFFFFFFFF))
    ok &= digest("P0_keys_dup", keys_pair(0xFFFF))
    ok &= digest("P0_alleq", alleq_pair())
    ok &= digest("P0_pairs_dup", pairs_pair())
    ok &= digest("P0_argsort_dup", argsort_pair())
    ok &= digest("P0_wide_dup", wide_pair())
    if not ok:
        print(json.dumps({"fatal": "digest mismatch — not timing"}))
        return 1

    def rs_keys(L):
        return lambda k: rangesweep.sort_codes_rangesweep(k, seg_elems=L)

    def rs_pairs(L):
        def body(k):
            v = k ^ jnp.uint32(0x9E3779B9)
            sk, sv = rangesweep.sort_pairs_rangesweep(k, v, seg_elems=L)
            return sk ^ sv

        return body

    def rs_argsort(L):
        def body(k):
            sk, sv = rangesweep.argsort_rangesweep(k, seg_elems=L)
            return sk ^ sv

        return body

    def rs_wide(L):
        def body(k):
            lo = k ^ jnp.uint32(0x9E3779B9)
            hi = k ^ jnp.uint32(0x85EBCA6B)
            sk, slo, shi = rangesweep.sort_pairs_rangesweep_planes(
                k, (lo, hi), seg_elems=L)
            return sk ^ slo ^ shi

        return body

    def flat_wide(k):
        lo = k ^ jnp.uint32(0x9E3779B9)
        hi = k ^ jnp.uint32(0x85EBCA6B)
        sk, slo, shi = jax.lax.sort((k, lo, hi), num_keys=1,
                                    is_stable=True)
        return sk ^ slo ^ shi

    # Q. flagship keys, seg sweep
    for lg in (21, 22, 20):
        timed(f"Q_keys3d_2^28_seg2^{lg}", n28, rs_keys(1 << lg))

    # R/S/T
    timed("R_argsort3d_2^28_seg2^21", n28, rs_argsort(1 << 21))
    timed("S_pairs3d_2^28_seg2^21", n28, rs_pairs(1 << 21))
    timed("T_wide3d_2^28_seg2^22", n28, rs_wide(1 << 22))
    timed("T_wide3d_2^28_seg2^21", n28, rs_wide(1 << 21))

    # X. crossover re-probes (rs side; flat baselines from camp 9/10)
    timed("X_keys3d_2^27", 1 << 27, rs_keys(1 << 21))
    timed("X_keys3d_2^26", 1 << 26, rs_keys(1 << 20))
    timed("X_pairs3d_2^27", 1 << 27, rs_pairs(1 << 21))
    timed("X_pairs3d_2^26", 1 << 26, rs_pairs(1 << 20))
    timed("X_argsort3d_2^24", 1 << 24, rs_argsort(1 << 21))
    timed("X_wide3d_2^27", 1 << 27, rs_wide(1 << 21))
    timed("X_wide_flat_2^27", 1 << 27, flat_wide)
    return 0


if __name__ == "__main__":
    sys.exit(main())
