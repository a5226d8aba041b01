#!/usr/bin/env python
"""Round-5 campaign 14: new routing floors for the 3-D engine + the
3-D-body trick on the other mapped-sort routes.

Campaign 13: the 3-D phase-boundary engine wins 2^28 keys 299.0 (1.57x
flat), pairs 856.0 (1.53x), argsort 622.3 (2.11x), wide 1057.5 @seg2^21
(1.62x), and the old crossovers collapsed (keys 2^26: 68.6 vs 93.0
flat; pairs 2^26: 196.0 vs 260.7; argsort 2^24: 37.8 vs 46.3).  Rows:

  F. floors: keys rs/flat at 2^25 and 2^24; pairs rs/flat at 2^25 and
     2^24; argsort rs/flat at 2^23; wide rs/flat at 2^26.  rs segs
     chosen so K >= 8 (n/8 cap).
  G. the relayout fix elsewhere:
     G1 giant-L mapped segsort shape (flat-derived (S, L) pairs,
        S=16 x L=2^20 at 2^24): current flat bodies vs 3-D bodies.
     G2 sort_batched user-2-D keys (16, 2^24): flat bodies vs 3-D
        bodies (here the input reshape is a REAL relayout — does the
        boundary still pay off?).

Decides: RoutingParameters v5e rangesweep_min* floors; whether
xla_sort/sort_batched + segsort mapped routes adopt 3-D bodies.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gpusorting_tpu.ops import rangesweep, xla_sort
from gpusorting_tpu.ops.rangesweep import LANES

from benches.hw_r5_campaign3 import timed


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
    sk, slo, shi = jax.lax.sort((k, lo, hi), num_keys=1, is_stable=True)
    return sk ^ slo ^ shi


def flat_keys(k):
    return xla_sort.sort_all_keys_unstable((k,))[0]


def flat_pairs(k):
    v = k ^ jnp.uint32(0x9E3779B9)
    sk, sv = jax.lax.sort((k, v), num_keys=1, is_stable=True)
    return sk ^ sv


def flat_argsort(k):
    idx = jax.lax.iota(jnp.uint32, k.shape[0])
    sk, sv = jax.lax.sort((k, idx), num_keys=1, is_stable=True)
    return sk ^ sv


def main():
    print(json.dumps({"devices": str(jax.devices())}), flush=True)

    # F. floors (rs seg = min(2^21, n // 8))
    for lg in (25, 24):
        n = 1 << lg
        seg = min(1 << 21, n // 8)
        timed(f"F_keys3d_2^{lg}", n, rs_keys(seg))
        timed(f"F_keys_flat_2^{lg}", n, flat_keys)
    for lg in (25, 24):
        n = 1 << lg
        seg = min(1 << 21, n // 8)
        timed(f"F_pairs3d_2^{lg}", n, rs_pairs(seg))
        timed(f"F_pairs_flat_2^{lg}", n, flat_pairs)
    n = 1 << 23
    timed("F_argsort3d_2^23", n, rs_argsort(n // 8))
    timed("F_argsort_flat_2^23", n, flat_argsort)
    n = 1 << 26
    timed("F_wide3d_2^26", n, rs_wide(min(1 << 21, n // 8)))
    timed("F_wide_flat_2^26", n, flat_wide)

    # G1. giant-L mapped segsort shape: flat vs 3-D bodies
    S, L = 16, 1 << 20
    l_rows = L // LANES
    n = S * L

    def seg_flat(k):
        v = k ^ jnp.uint32(0x9E3779B9)
        sk, sv = jax.lax.map(
            lambda ab: jax.lax.sort(ab, num_keys=1, is_stable=True),
            (k.reshape(S, L), v.reshape(S, L)))
        return (sk ^ sv).reshape(-1)

    def seg_3d(k):
        v = k ^ jnp.uint32(0x9E3779B9)

        def body(t):
            a, b = (x.reshape(-1) for x in t)
            sa, sb = jax.lax.sort((a, b), num_keys=1, is_stable=True)
            return (sa.reshape(l_rows, LANES), sb.reshape(l_rows, LANES))

        sk, sv = jax.lax.map(
            body, (k.reshape(S, l_rows, LANES), v.reshape(S, l_rows, LANES)))
        return (sk ^ sv).reshape(-1)

    timed("G1_segmap_flat_16xL2^20_pairs", n, seg_flat)
    timed("G1_segmap_3d_16xL2^20_pairs", n, seg_3d)

    # G2. user-2-D row sort (the sort_batched giant-row shape), keys
    S, L = 16, 1 << 24
    l_rows = L // LANES
    n = S * L

    def rows_flat(k):
        k2 = k.reshape(S, L)  # stands in for a user-provided 2-D array
        sk = jax.lax.map(
            lambda r: xla_sort.sort_all_keys_unstable((r,))[0], k2)
        return sk.reshape(-1)

    def rows_3d(k):
        k2 = k.reshape(S, L)

        def body(r2):
            s = xla_sort.sort_all_keys_unstable((r2.reshape(-1),))[0]
            return s.reshape(l_rows, LANES)

        sk = jax.lax.map(body, k2.reshape(S, l_rows, LANES))
        return sk.reshape(S, L).reshape(-1)

    timed("G2_rows_flat_16x2^24_keys", n, rows_flat)
    timed("G2_rows_3d_16x2^24_keys", n, rows_3d)
    return 0


if __name__ == "__main__":
    sys.exit(main())
