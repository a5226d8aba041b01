#!/usr/bin/env python
"""Round-4j probe: is a PAIRS rangesweep priced under the flat oracle?

The keys-only rangesweep won 441.4 vs 469.7 ms at 2^28 because `lax.map`
chunk sorts hold the VMEM-resident rate while the flat sort does not.
For stable pairs the pipeline needs an index plane (2-key sorts make
every stage deterministic and the count-split provably delivers the
(code, idx) rank partition — see ops/rangesweep.py round-4j notes), so
BOTH sides get more expensive:

  flat baseline: lax.sort((codes, payload), num_keys=1, is_stable=True)
  pipeline phases 1+3: lax.map of 3-op num_keys=2 chunk sorts

This probe prices both BEFORE building the engine.  Build signal:
2 * mapped_phase + ~150 ms (3-plane exchange + cuts + prep) < flat.
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


def _sync(x):
    return float(np.asarray(jax.device_get(x)))


def _chain(n, batch, seed, mode, L=None):
    """mode: 'gen' | 'flat' (stable pair sort) | 'mapped' (3-op 2-key)."""

    def body(i, acc):
        k = prng.hybrid_taus_bits(n, 0) ^ (i + jnp.uint32(seed))
        v = k ^ jnp.uint32(0x9E3779B9)
        if mode == "flat":
            k, v = jax.lax.sort((k, v), num_keys=1, is_stable=True)
        elif mode == "mapped":
            K = n // L
            idx = jax.lax.iota(jnp.uint32, n)
            k3, i3, v3 = jax.lax.map(
                lambda t: jax.lax.sort(t, num_keys=2, is_stable=False),
                (k.reshape(K, L), idx.reshape(K, L), v.reshape(K, L)))
            k = k3.reshape(-1)
            v = v3.reshape(-1) ^ i3.reshape(-1)
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
        t_with = time.perf_counter() - t0
        per.append(max(t_with - t_gen, 1e-9) / batch)
    row = {
        "bench": f"{mode}_2^{n.bit_length() - 1}"
                 + (f"_seg2^{L.bit_length() - 1}" if L else ""),
        "ms_per_sort": 1e3 * float(np.mean(per)),
        "spread_ms": [1e3 * float(np.min(per)), 1e3 * float(np.max(per))],
        "n": n, "batch": batch * repeats, "compile_s": round(compile_s, 1),
    }
    print(json.dumps(row), flush=True)
    return row


def main():
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    n = 1 << 28
    flat = timed(n, 4, "flat")
    m23 = timed(n, 4, "mapped", L=1 << 23)
    m22 = timed(n, 4, "mapped", L=1 << 22)
    timed(1 << 27, 6, "flat")
    timed(1 << 27, 6, "mapped", L=1 << 22)
    best = min(m23["ms_per_sort"], m22["ms_per_sort"])
    print(json.dumps({
        "verdict_2^28": {
            "flat_ms": flat["ms_per_sort"],
            "two_phases_plus_150": 2 * best + 150.0,
            "build": bool(2 * best + 150.0 < flat["ms_per_sort"]),
        }}), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
