#!/usr/bin/env python
"""Round-5 campaign 3: route decisions + the phase-2 cost decomposition.

Ordered highest-value first (the tunnel can die):

  J. ARGSORT 2-plane fast path end-to-end (new engine this round):
     digest identity first, then 2^28 at seg 2^22 / 2^21 and 2^27 at
     seg 2^22, each vs the flat 2-op stable oracle.  Decides
     RoutingParameters.rangesweep_min_index (+ its seg).  Pricing said
     ~2x392 + phase2 vs 1305.5 flat (hw_r5_campaign1 D rows).
  K. WIDE (4-plane) pairs end-to-end: digest identity, then 2^28 at
     seg 2^21 / 2^22 vs the flat 4-op stable oracle (1709.8 ms,
     hw_r5_campaign2 G).  Decides rangesweep_min_pairs_wide.
  L. PAIRS non-pow2: 3*2^26 and 2^27+2^25, rs seg 2^22 vs flat.  The
     keys crossover dropped to (1<<27)+1 on the same mechanism (flat
     pads non-pow2); decides whether rangesweep_min_pairs follows.
  H. Phase-2 decomposition at seg 2^23/2^22/2^21 (keys, 2^28): time
     phase1 alone, phase1+cuts, phase1+cuts+exchange, full engine.
     Subtractions localize the ~K^2 cost (cuts bisection vs fringe
     machinery vs relocate) — the gate for a cuts rewrite that would
     unlock symmetric seg 2^21 (2x175.8 + phase2 ~= 370 ms at 2^28).
  I. Mapped 1-op rates at seg 2^20 / 2^19 (below campaign-1's 2^21 =
     175.8): does the phase rate keep improving?
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

from benches.hw_r5_campaign1 import _gen, flat_pairs, mapped_1op, rs_pairs


def _sync(x):
    return float(np.asarray(jax.device_get(x)))


def _chain(n, batch, seed, body):
    def step(i, acc):
        k = _gen(n, i, seed)
        out = body(k)
        m = out.shape[0]
        return acc ^ out[0] ^ out[m // 2] ^ out[-1]

    return jax.lax.fori_loop(0, batch, step, jnp.uint32(0))


def timed(name, n, body, batch=3, repeats=2, seed=10):
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


# ---- J: argsort ------------------------------------------------------------

def flat_argsort(k):
    idx = jax.lax.iota(jnp.uint32, k.shape[0])
    sk, sv = jax.lax.sort((k, idx), num_keys=1, is_stable=True)
    return sk ^ sv


def rs_argsort(L):
    def body(k):
        sk, sv = rangesweep.argsort_rangesweep(k, seg_elems=L)
        return sk ^ sv

    return body


def argsort_digest(n, L, seed=91):
    @jax.jit
    def both():
        k = prng.hybrid_taus_bits(n, seed) & jnp.uint32(0xFFFF)  # heavy dups
        idx = jax.lax.iota(jnp.uint32, n)
        ek, ev = jax.lax.sort((k, idx), num_keys=1, is_stable=True)
        gk, gv = rangesweep.argsort_rangesweep(k, seg_elems=L)
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
    print(json.dumps({"bench": f"J_argsort_digest_n{n}_L{L}",
                      "exact": ok}), flush=True)
    return ok


# ---- K: wide pairs ---------------------------------------------------------

def flat_wide(k):
    lo = k ^ jnp.uint32(0x9E3779B9)
    hi = k ^ jnp.uint32(0x85EBCA6B)
    sk, slo, shi = jax.lax.sort((k, lo, hi), num_keys=1, is_stable=True)
    return sk ^ slo ^ shi


def rs_wide(L):
    def body(k):
        lo = k ^ jnp.uint32(0x9E3779B9)
        hi = k ^ jnp.uint32(0x85EBCA6B)
        sk, slo, shi = rangesweep.sort_pairs_rangesweep_planes(
            k, (lo, hi), seg_elems=L)
        return sk ^ slo ^ shi

    return body


def wide_digest(n, L, seed=92):
    @jax.jit
    def both():
        k = prng.hybrid_taus_bits(n, seed) & jnp.uint32(0xFFFF)
        lo = jax.lax.iota(jnp.uint32, n)
        hi = k ^ jnp.uint32(0xDEADBEEF)
        e = jax.lax.sort((k, lo, hi), num_keys=1, is_stable=True)
        g = rangesweep.sort_pairs_rangesweep_planes(k, (lo, hi), seg_elems=L)
        w1 = jax.lax.iota(jnp.uint32, n) | jnp.uint32(1)
        w2 = w1 * jnp.uint32(0x9E3779B9) | jnp.uint32(1)
        f = lambda t: jnp.stack([jnp.sum(a * w, dtype=jnp.uint32)
                                 for a in t for w in (w1, w2)])
        return f(e), f(g)

    e, g = jax.device_get(both())
    ok = bool((np.asarray(e) == np.asarray(g)).all())
    print(json.dumps({"bench": f"K_wide_digest_n{n}_L{L}",
                      "exact": ok}), flush=True)
    return ok


# ---- H: phase-2 decomposition ----------------------------------------------

def p1_only(L):
    def body(k):
        n = k.shape[0]
        from gpusorting_tpu.ops import xla_sort

        x2 = jax.lax.map(
            lambda r: xla_sort.sort_all_keys_unstable((r,))[0],
            k.reshape(n // L, L))
        return x2.reshape(-1)

    return body


def p1_cuts(L):
    def body(k):
        n = k.shape[0]
        K = n // L
        from gpusorting_tpu.ops import xla_sort

        x2 = jax.lax.map(
            lambda r: xla_sort.sort_all_keys_unstable((r,))[0],
            k.reshape(K, L))
        bounds = rangesweep._exact_cuts(x2, K, L)
        return bounds.reshape(-1).astype(jnp.uint32)

    return body


def p1_cuts_exchange(L):
    def body(k):
        n = k.shape[0]
        K = n // L
        from gpusorting_tpu.ops import xla_sort

        x2 = jax.lax.map(
            lambda r: xla_sort.sort_all_keys_unstable((r,))[0],
            k.reshape(K, L))
        bounds = rangesweep._exact_cuts(x2, K, L)
        (out,) = rangesweep._range_exchange(
            (x2.reshape(-1),), bounds, K, L, False)
        return out

    return body


def main():
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    n = 1 << 28
    m = 1 << 27

    # J. argsort
    argsort_digest((1 << 26) + 12345, 1 << 22)
    timed("J_argsort_rs_2^28_seg2^22", n, rs_argsort(1 << 22))
    timed("J_argsort_rs_2^28_seg2^21", n, rs_argsort(1 << 21))
    timed("J_argsort_flat_2^28", n, flat_argsort)
    timed("J_argsort_rs_2^27_seg2^22", m, rs_argsort(1 << 22))
    timed("J_argsort_flat_2^27", m, flat_argsort)

    # K. wide pairs
    wide_digest((1 << 26) + 12345, 1 << 21)
    timed("K_wide_rs_2^28_seg2^21", n, rs_wide(1 << 21))
    timed("K_wide_rs_2^28_seg2^22", n, rs_wide(1 << 22))
    timed("K_wide_flat_2^28", n, flat_wide)

    # L. pairs non-pow2
    for p, tag in ((3 << 26, "3x2^26"), ((1 << 27) + (1 << 25), "2^27+2^25")):
        timed(f"L_pairs_flat_{tag}", p, flat_pairs)
        timed(f"L_pairs_rs_{tag}_seg2^22", p, rs_pairs(1 << 22))

    # H. phase-2 decomposition (keys)
    for lg in (23, 22, 21):
        L = 1 << lg
        timed(f"H_p1_seg2^{lg}", n, p1_only(L))
        timed(f"H_p1cuts_seg2^{lg}", n, p1_cuts(L))
        timed(f"H_p1cutsex_seg2^{lg}", n, p1_cuts_exchange(L))
        timed(f"H_full_seg2^{lg}", n,
              lambda k, L=L: rangesweep.sort_codes_rangesweep(k, seg_elems=L))

    # I. mapped fine rates
    timed("I_map1_seg2^20", n, mapped_1op(1 << 20))
    timed("I_map1_seg2^19", n, mapped_1op(1 << 19))
    return 0


if __name__ == "__main__":
    sys.exit(main())
