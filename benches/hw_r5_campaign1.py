#!/usr/bin/env python
"""Round-5 campaign 1: the measurements that gate every round-5 decision.

Ordered so the highest-value rows print first (the tunnel can die):

  A. PAIRS crossover at 2^27 (VERDICT r4 next #2, ADVICE A1/A2): rangesweep
     seg 2^21 / 2^22 vs the flat stable oracle, same process.  Decides
     RoutingParameters.rangesweep_min_pairs.
  B. 2^28 pairs at seg 2^21 (unmeasured; 2^22 won at 1201.6 ms, the
     2^23->2^22 step was -480 ms — the cliff may continue).
  C. Non-pow2 keys (new): flat XLA sort at 3*2^26 vs rangesweep 3*2^26
     (K=24 chunks of 2^23).  PROBES round-4 landmine says XLA pads
     non-pow2 sorts up to 2x — if flat 3*2^26 costs ~2^28's 469 ms while
     rangesweep pays ~3/4 of its 441, the non-pow2 crossover is far below
     the pow2 one and AUTO should know.
  D. Mapped-chunk sort rates at 2^28 (cost-sheet rows for the round-5
     designs): 1-op unstable seg 2^21; 2-op 2-key seg 2^22/2^21 (prices
     the argsort fast path: payload==index collapses the pairs pipeline
     to TWO planes); 3-op 2-key seg 2^21 (prices pairs seg 2^21).
  E. The VERDICT #1 gate: pure-jnp bitonic merge stage rate inside
     lax.map at (64, 2^22) — a 22-stage full bitonic merge (correctness-
     checked against the sort) vs the mapped lax.sort.  Phase 3 of
     rangesweep could merge K sorted runs in ~117 stages instead of
     re-sorting (~253-stage-equivalent); the merge wins ONLY if the
     jnp stage rate beats lax.sort's internal stage rate (Sheet 1 says
     the Pallas comparator is 3-4x off that rate; this prices the XLA
     route).  Also times the row-stage-only (d>=128) prefix to split
     row vs lane stage costs.
"""

import json
import sys
import time
from functools import partial

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gpusorting_tpu.core import prng
from gpusorting_tpu.ops import rangesweep


def _sync(x):
    return float(np.asarray(jax.device_get(x)))


def _gen(n, i, seed):
    return prng.hybrid_taus_bits(n, 0) ^ (i + jnp.uint32(seed))


def _chain(n, batch, seed, body):
    def step(i, acc):
        k = _gen(n, i, seed)
        out = body(k)
        return acc ^ out[0] ^ out[n // 2] ^ out[-1]

    return jax.lax.fori_loop(0, batch, step, jnp.uint32(0))


def timed(name, n, body, batch=3, repeats=2, seed=10):
    """body: (n,) u32 -> (m,) u32 fold source; gen-subtracted chain timing."""
    with_fn = jax.jit(partial(_chain, n, batch, seed, body))
    gen_fn = jax.jit(partial(_chain, n, batch, seed, lambda k: k))
    t0 = time.perf_counter()
    _sync(with_fn())
    compile_s = time.perf_counter() - t0
    _sync(gen_fn())
    per = []
    for _ in range(repeats):
        t0 = time.perf_counter()
        _sync(gen_fn())
        t_gen = time.perf_counter() - t0
        t0 = time.perf_counter()
        _sync(with_fn())
        per.append(max(time.perf_counter() - t0 - t_gen, 1e-9) / batch)
    row = {
        "bench": name, "ms": round(1e3 * float(np.mean(per)), 1),
        "spread_ms": [round(1e3 * float(np.min(per)), 1),
                      round(1e3 * float(np.max(per)), 1)],
        "n": n, "batch": batch * repeats, "compile_s": round(compile_s, 1),
    }
    print(json.dumps(row), flush=True)
    return row


# ---- bodies ----------------------------------------------------------------

def flat_keys(k):
    return jax.lax.sort((k,), num_keys=1, is_stable=False)[0]


def rs_keys(L):
    return lambda k: rangesweep.sort_codes_rangesweep(k, seg_elems=L)


def flat_pairs(k):
    v = k ^ jnp.uint32(0x9E3779B9)
    sk, sv = jax.lax.sort((k, v), num_keys=1, is_stable=True)
    return sk ^ sv


def rs_pairs(L):
    def body(k):
        v = k ^ jnp.uint32(0x9E3779B9)
        sk, sv = rangesweep.sort_pairs_rangesweep(k, v, seg_elems=L)
        return sk ^ sv

    return body


def mapped_1op(L):
    def body(k):
        n = k.shape[0]
        x = k.reshape(n // L, L)
        y = jax.lax.map(lambda r: jax.lax.sort((r,), num_keys=1,
                                               is_stable=False)[0], x)
        return y.reshape(-1)

    return body


def mapped_2op(L):
    """(code, index) 2-key unstable — the argsort-fast-path phase sort."""
    def body(k):
        n = k.shape[0]
        idx = jax.lax.iota(jnp.uint32, n)
        sort2 = lambda t: jax.lax.sort(t, num_keys=2, is_stable=False)
        a, b = jax.lax.map(sort2, (k.reshape(n // L, L),
                                   idx.reshape(n // L, L)))
        return (a ^ b).reshape(-1)

    return body


def mapped_3op(L):
    def body(k):
        n = k.shape[0]
        idx = jax.lax.iota(jnp.uint32, n)
        v = k ^ jnp.uint32(0x9E3779B9)
        sort2 = lambda t: jax.lax.sort(t, num_keys=2, is_stable=False)
        a, b, c = jax.lax.map(sort2, (k.reshape(n // L, L),
                                      idx.reshape(n // L, L),
                                      v.reshape(n // L, L)))
        return (a ^ b ^ c).reshape(-1)

    return body


# ---- E: jnp bitonic merge probe --------------------------------------------

def _make_bitonic(r):
    h = r.shape[0] // 2
    a = jax.lax.sort((r[:h],), num_keys=1, is_stable=False)[0]
    b = jax.lax.sort((r[h:],), num_keys=1, is_stable=False)[0]
    return jnp.concatenate([a, jnp.flip(b)])


def _merge_stage(r, d):
    a = r.reshape(-1, 2, d)
    lo = jnp.minimum(a[:, 0, :], a[:, 1, :])
    hi = jnp.maximum(a[:, 0, :], a[:, 1, :])
    return jnp.stack([lo, hi], axis=1).reshape(r.shape)


def _bitonic_merge(r, d_lo=1):
    d = r.shape[0] // 2
    while d >= d_lo:
        r = _merge_stage(r, d)
        d //= 2
    return r


def probe_prep(L):
    def body(k):
        n = k.shape[0]
        y = jax.lax.map(_make_bitonic, k.reshape(n // L, L))
        return y.reshape(-1)

    return body


def probe_merge(L, d_lo=1):
    def body(k):
        n = k.shape[0]
        y = jax.lax.map(lambda r: _bitonic_merge(_make_bitonic(r), d_lo),
                        k.reshape(n // L, L))
        return y.reshape(-1)

    return body


def merge_digest(n, L, seed=77):
    @jax.jit
    def both():
        k = prng.hybrid_taus_bits(n, seed)
        x = k.reshape(n // L, L)
        ref = jax.lax.map(lambda r: jax.lax.sort((r,), num_keys=1,
                                                 is_stable=False)[0], x)
        got = jax.lax.map(lambda r: _bitonic_merge(_make_bitonic(r)), x)
        w = jax.lax.iota(jnp.uint32, n) | jnp.uint32(1)
        return jnp.stack([jnp.sum(ref.reshape(-1) * w, dtype=jnp.uint32),
                          jnp.sum(got.reshape(-1) * w, dtype=jnp.uint32)])

    d = np.asarray(jax.device_get(both()))
    ok = bool(d[0] == d[1])
    print(json.dumps({"bench": f"merge_digest_n{n}_L{L}",
                      "digests": [int(x) for x in d], "exact": ok}),
          flush=True)
    return ok


def main():
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    n = 1 << 28

    # A. pairs crossover at 2^27
    m = 1 << 27
    timed("A_pairs_rs_2^27_seg2^21", m, rs_pairs(1 << 21))
    timed("A_pairs_rs_2^27_seg2^22", m, rs_pairs(1 << 22))
    timed("A_pairs_flat_2^27", m, flat_pairs)

    # B. 2^28 pairs seg 2^21
    timed("B_pairs_rs_2^28_seg2^21", n, rs_pairs(1 << 21))

    # C. non-pow2 keys: 3*2^26
    p = 3 << 26
    timed("C_keys_flat_3x2^26", p, flat_keys)
    timed("C_keys_rs_3x2^26_seg2^23", p, rs_keys(1 << 23))

    # D. mapped-chunk rates at 2^28
    timed("D_map1_seg2^21", n, mapped_1op(1 << 21))
    timed("D_map2_seg2^22", n, mapped_2op(1 << 22))
    timed("D_map2_seg2^21", n, mapped_2op(1 << 21))
    timed("D_map3_seg2^21", n, mapped_3op(1 << 21))

    # E. merge probe (correctness at 2^26 first, then rates at 2^28)
    merge_digest(1 << 26, 1 << 22)
    timed("E_prep_2^28_L2^22", n, probe_prep(1 << 22))
    timed("E_merge22_2^28_L2^22", n, probe_merge(1 << 22))
    timed("E_merge_rowsonly_2^28_L2^22", n, probe_merge(1 << 22, d_lo=128))
    timed("E_mapsort_2^28_L2^22", n, mapped_1op(1 << 22))
    return 0


if __name__ == "__main__":
    sys.exit(main())
