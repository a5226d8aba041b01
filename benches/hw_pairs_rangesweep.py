#!/usr/bin/env python
"""Round-4j: pairs rangesweep end-to-end vs the flat stable oracle.

Probe (hw_pairs_probe_r4.log) priced the race:
  flat lax.sort((k,v), stable) at 2^28:          1308.5 ms
  mapped 3-op 2-key chunk sorts seg 2^22:         534.8 ms  (x2 phases)
  -> pipeline wins iff exchange+cuts+prep < 239 ms.

This measures the REAL engine (ops/rangesweep.sort_pairs_rangesweep) at
seg 2^23/2^22, plus a hardware digest-identity check vs the oracle at an
odd sentinel-colliding size.
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


def _digest(k, v):
    # order-sensitive DIGEST (advisor r4: this is digest identity, not
    # elementwise bit-exactness — that lives in the CPU interpret tests):
    # two independent odd multipliers per plane; a collision needs a
    # permutation diff invisible to BOTH weighted folds simultaneously
    i = jax.lax.iota(jnp.uint32, k.shape[0])
    w1 = i | jnp.uint32(1)
    w2 = i * jnp.uint32(0x9E3779B1) | jnp.uint32(1)
    return (jnp.sum(k * w1, dtype=jnp.uint32),
            jnp.sum(k * w2, dtype=jnp.uint32),
            jnp.sum(v * w1, dtype=jnp.uint32),
            jnp.sum(v * w2, dtype=jnp.uint32))


def _chain(n, batch, seed, mode, L=None):
    def body(i, acc):
        k = prng.hybrid_taus_bits(n, 0) ^ (i + jnp.uint32(seed))
        v = k ^ jnp.uint32(0x9E3779B9)
        if mode == "flat":
            k, v = jax.lax.sort((k, v), num_keys=1, is_stable=True)
        elif mode == "rangesweep":
            k, v = rangesweep.sort_pairs_rangesweep(k, v, seg_elems=L)
        return acc ^ k[0] ^ k[n - 1] ^ v[0] ^ v[n - 1]

    return jax.lax.fori_loop(0, batch, body, jnp.uint32(0))


def timed(n, batch, mode, L=None, repeats=2, seed=10):
    with_fn = jax.jit(partial(_chain, n, batch, seed, mode, L))
    gen_fn = jax.jit(partial(_chain, n, batch, seed, "gen"))
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
        "bench": f"{mode}_2^{n.bit_length() - 1}"
                 + (f"_seg2^{L.bit_length() - 1}" if L else ""),
        "ms_per_sort": 1e3 * float(np.mean(per)),
        "spread_ms": [1e3 * float(np.min(per)), 1e3 * float(np.max(per))],
        "n": n, "batch": batch * repeats, "compile_s": round(compile_s, 1),
    }
    print(json.dumps(row), flush=True)
    return row


def digest_check(n, L, seed=77, and_count=4):
    @jax.jit
    def both():
        k = prng.hybrid_taus_bits(n, seed, and_count=and_count)
        v = prng.hybrid_taus_bits(n, seed + 1)
        ek, ev = jax.lax.sort((k, v), num_keys=1, is_stable=True)
        ok, ov = rangesweep.sort_pairs_rangesweep(k, v, seg_elems=L)
        return jnp.stack(list(_digest(ek, ev)) + list(_digest(ok, ov)))

    d = np.asarray(jax.device_get(both()))
    ok = bool((d[:4] == d[4:]).all())
    print(json.dumps({"bench": f"digest_identity_{n}", "n": n, "seg": L,
                      "digests": [int(x) for x in d], "identical": ok}),
          flush=True)
    return ok


def main():
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    n = 1 << 28
    # hardware bit-exactness first (odd size, sentinel-colliding entropy)
    ok = digest_check((1 << 26) + 12345, 1 << 22)
    r22 = timed(n, 3, "rangesweep", L=1 << 22)
    r23 = timed(n, 3, "rangesweep", L=1 << 23)
    flat = timed(n, 3, "flat")
    best = min(r22, r23, key=lambda r: r["ms_per_sort"])
    print(json.dumps({
        "verdict_pairs_2^28": {
            "exact": ok,
            "flat_ms": flat["ms_per_sort"],
            "best_ms": best["ms_per_sort"],
            "best": best["bench"],
            "win": bool(best["ms_per_sort"] < flat["ms_per_sort"]),
        }}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
