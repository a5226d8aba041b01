#!/usr/bin/env python
"""Round-5 campaign 5: the hierarchical cuts on hardware.

Campaign-3 H rows localized the flagship's scaling wall: the cuts
bisection costs ~K^2 (8/37/156 ms at K=32/64/128) while the mapped
phase keeps improving as seg shrinks (176.1 at 2^21, 165.1 at 2^20,
153.5 at 2^19).  _exact_cuts_hier holds cuts ~flat in K, so smaller
segs become viable end-to-end.  Ordered:

  P0. hardware digests: hier keys/argsort/pairs at 2^26+12345 (uniform
      AND heavy-dup), all-equal keys at 2^24 — bit-exact before timing.
  P.  isolated p1+cuts A/B at 2^28 keys: bisect vs hier at seg
      2^23/2^22/2^21 (+2^20 hier-only; bisect already known to blow up).
  Q.  full keys engine, cuts=hier: seg 2^22 / 2^21 / 2^20 at 2^28
      (the flagship attack — target < 441.4; bound ~2x mapped + exch).
  R.  full argsort, cuts=hier: seg 2^22 / 2^21 at 2^28 (vs 877.0).
  S.  full pairs, cuts=hier: seg 2^22 / 2^21 at 2^28 (vs 1201.6).
  T.  full wide, cuts=hier: seg 2^22 at 2^28 (vs 1535.9).

K=256 rows (seg 2^20) run LAST within their section and are individually
guarded: the relocate ctrl table is 4K^2+K i32 in SMEM (~1 MB at K=256)
and may exceed the part's SMEM — a skip is a result, not a failure.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gpusorting_tpu.core import prng
from gpusorting_tpu.ops import rangesweep, xla_sort

from benches.hw_r5_campaign3 import rs_argsort, timed


def keys_digest(n, L, mask, tag, seed=95):
    @jax.jit
    def both():
        k = prng.hybrid_taus_bits(n, seed) & jnp.uint32(mask)
        e = xla_sort.sort_all_keys_unstable((k,))[0]
        g = rangesweep.sort_codes_rangesweep(k, seg_elems=L, cuts="hier")
        w1 = jax.lax.iota(jnp.uint32, n) | jnp.uint32(1)
        w2 = w1 * jnp.uint32(0x9E3779B9) | jnp.uint32(1)
        f = lambda a: jnp.stack([jnp.sum(a * w1, dtype=jnp.uint32),
                                 jnp.sum(a * w2, dtype=jnp.uint32)])
        return f(e), f(g)

    e, g = jax.device_get(both())
    ok = bool((np.asarray(e) == np.asarray(g)).all())
    print(json.dumps({"bench": f"P0_keys_{tag}_n{n}_L{L}", "exact": ok}),
          flush=True)
    return ok


def alleq_digest(n, L, seed=96):
    @jax.jit
    def both():
        k = jnp.full((n,), jnp.uint32(0xABCD1234))
        g = rangesweep.sort_codes_rangesweep(k, seg_elems=L, cuts="hier")
        return jnp.stack([jnp.sum(g != jnp.uint32(0xABCD1234),
                                  dtype=jnp.uint32),
                          jnp.uint32(g.shape[0] - n)])

    bad = np.asarray(jax.device_get(both()))
    ok = bool((bad == 0).all())
    print(json.dumps({"bench": f"P0_alleq_n{n}_L{L}", "exact": ok}),
          flush=True)
    return ok


def pairs_digest(n, L, seed=97):
    @jax.jit
    def both():
        k = prng.hybrid_taus_bits(n, seed) & jnp.uint32(0xFFFF)
        v = jax.lax.iota(jnp.uint32, n) * jnp.uint32(2654435769)
        ek, ev = jax.lax.sort((k, v), num_keys=1, is_stable=True)
        gk, gv = rangesweep.sort_pairs_rangesweep(k, v, seg_elems=L,
                                                  cuts="hier")
        w1 = jax.lax.iota(jnp.uint32, n) | jnp.uint32(1)
        w2 = w1 * jnp.uint32(0x9E3779B9) | jnp.uint32(1)
        f = lambda a, b: jnp.stack(
            [jnp.sum(a * w1, dtype=jnp.uint32),
             jnp.sum(a * w2, dtype=jnp.uint32),
             jnp.sum(b * w1, dtype=jnp.uint32),
             jnp.sum(b * w2, dtype=jnp.uint32)])
        return f(ek, ev), f(gk, gv)

    e, g = jax.device_get(both())
    ok = bool((np.asarray(e) == np.asarray(g)).all())
    print(json.dumps({"bench": f"P0_pairs_n{n}_L{L}", "exact": ok}),
          flush=True)
    return ok


def p1_cuts(L, cuts):
    def body(k):
        n = k.shape[0]
        K = n // L

        def _p1(r):
            s = xla_sort.sort_all_keys_unstable((r,))[0]
            return s, s.reshape(-1, 128)[:, 0]

        x2, heads = jax.lax.map(_p1, k.reshape(K, L))
        bounds = rangesweep._cuts(x2, K, L, method=cuts, heads=heads)
        return bounds.reshape(-1).astype(jnp.uint32)

    return body


def rs_keys(L):
    return lambda k: rangesweep.sort_codes_rangesweep(
        k, seg_elems=L, cuts="hier")


def rs_pairs_h(L):
    def body(k):
        v = k ^ jnp.uint32(0x9E3779B9)
        sk, sv = rangesweep.sort_pairs_rangesweep(k, v, seg_elems=L,
                                                  cuts="hier")
        return sk ^ sv

    return body


def rs_argsort_h(L):
    def body(k):
        sk, sv = rangesweep.argsort_rangesweep(k, seg_elems=L, cuts="hier")
        return sk ^ sv

    return body


def rs_wide_h(L):
    def body(k):
        lo = k ^ jnp.uint32(0x9E3779B9)
        hi = k ^ jnp.uint32(0x85EBCA6B)
        sk, slo, shi = rangesweep.sort_pairs_rangesweep_planes(
            k, (lo, hi), seg_elems=L, cuts="hier")
        return sk ^ slo ^ shi

    return body


def main():
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    n = 1 << 28
    nd = (1 << 26) + 12345

    # P0. digests first — a timing row for a wrong engine is worthless
    ok = True
    ok &= keys_digest(nd, 1 << 22, 0xFFFFFFFF, "uni")
    ok &= keys_digest(nd, 1 << 22, 0xFFFF, "dup")
    ok &= alleq_digest(1 << 24, 1 << 20)
    ok &= pairs_digest(nd, 1 << 22)
    if not ok:
        print(json.dumps({"fatal": "digest mismatch — not timing"}))
        return 1

    # Q. full keys engine with hier cuts (flagship attack)
    for lg in (22, 21):
        timed(f"Q_keys_hier_2^28_seg2^{lg}", n, rs_keys(1 << lg))

    # P. isolated p1+cuts A/B
    for lg in (23, 22, 21):
        timed(f"P_p1cuts_hier_seg2^{lg}", n, p1_cuts(1 << lg, "hier"))

    # R/S/T. the plane engines
    for lg in (22, 21):
        timed(f"R_argsort_hier_2^28_seg2^{lg}", n, rs_argsort_h(1 << lg))
    for lg in (22, 21):
        timed(f"S_pairs_hier_2^28_seg2^{lg}", n, rs_pairs_h(1 << lg))
    timed("T_wide_hier_2^28_seg2^22", n, rs_wide_h(1 << 22))

    # J3. argsort crossover floor (campaign-4: wins at 2^25 already)
    for m, tag in ((1 << 24, "2^24"), (3 << 23, "3x2^23")):
        timed(f"J3_argsort_rs_{tag}", m, rs_argsort(min(1 << 22, m // 8)))
        from benches.hw_r5_campaign3 import flat_argsort
        timed(f"J3_argsort_flat_{tag}", m, flat_argsort)

    # K=256 rows, individually guarded (SMEM ctrl table may not fit)
    for name, fn in (("Q_keys_hier_2^28_seg2^20", rs_keys(1 << 20)),
                     ("P_p1cuts_hier_seg2^20", p1_cuts(1 << 20, "hier"))):
        try:
            timed(name, n, fn)
        except Exception as e:  # noqa: BLE001 — a skip is a result
            print(json.dumps({"bench": name,
                              "skipped": str(e)[:200]}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
