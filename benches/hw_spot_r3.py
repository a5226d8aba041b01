#!/usr/bin/env python
"""Round-3 hardware spot checks: segsort fused window mode + expand kernel.

1. Fused single-key window mode (the SplitSortRadixFine analog) on real
   hardware: random maxlen 8192 with bits_to_sort=16 must route "fused"
   and match the composite engine bit-exactly.
2. `stitch.expand_ops` (new in round 3, the compact inverse): hardware
   bit-exactness vs numpy at 2^22 and dependent-chain rate for the
   RESULTS.md kernel table.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("GST_SPOT_SMALL") == "1":  # CPU smoke mode
    jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

from gpusorting_tpu.core import prng
from gpusorting_tpu.ops import stitch
from gpusorting_tpu.segsort import splitsort

_tiny = jax.jit(lambda a: (a + 1).sum())
float(_tiny(jnp.zeros((8, 128), jnp.int32)))
t0 = time.perf_counter()
for _ in range(5):
    float(_tiny(jnp.zeros((8, 128), jnp.int32)))
OVERHEAD = (time.perf_counter() - t0) / 5
print(f"fetch overhead {OVERHEAD*1e3:.1f} ms", flush=True)

SMALL = os.environ.get("GST_SPOT_SMALL") == "1"  # CPU smoke mode

# --- 1. fused window mode spot check (maxlen 8192, bits_to_sort=16) ---
total = 1 << (15 if SMALL else 22)
offs, S = prng.make_random_segments(total, 1024 if SMALL else 8192, seed=3)
plan = splitsort._window_dispatch(offs, total, int(S))
mode = None
if plan and "ml" in plan:
    mode = splitsort._pick_window_mode(plan["ml"], plan["sid_bits"], 16, True)
print(f"dispatch: plan={'none' if not plan else sorted(plan)} mode={mode}",
      flush=True)
keys = prng.hybrid_taus_bits(total, seed=7) & jnp.uint32(0xFFFF)
vals = jnp.arange(total, dtype=jnp.uint32)
sk, sv = splitsort.split_sort_pairs(offs, keys, vals, int(S), total,
                                    bits_to_sort=16)
ck, cv = splitsort._composite_segmented_sort(offs, keys, vals, int(S), 16)
ok = ((np.asarray(sk) == np.asarray(ck)).all()
      and (np.asarray(sv) == np.asarray(cv)).all())
print(f"[fused window maxlen8192 bits16] routed={mode} "
      f"{'PASS' if ok else 'FAIL'}", flush=True)

# --- 2. expand kernel: exactness + rate ---
n = 1 << (15 if SMALL else 22)
m_np = np.random.RandomState(11).rand(n) < 0.5
k = int(m_np.sum())
src_np = np.random.RandomState(12).randint(0, 2**32, size=n,
                                           dtype=np.uint64).astype(np.uint32)
m = jnp.asarray(m_np)
src = jnp.asarray(src_np)
(out,) = stitch.expand_ops((src,), m)
exp = np.zeros(n, np.uint32)
exp[m_np] = src_np[:k]
eok = (np.asarray(out) == exp).all()
print(f"[expand 2^22 exact] {'PASS' if eok else 'FAIL'}", flush=True)

ITERS = 2 if SMALL else 10


@jax.jit
def chain(s, mm):
    def body(i, a):
        return a ^ stitch.expand_ops((s ^ a,), mm)[0][0]
    return jax.lax.fori_loop(0, ITERS, body, jnp.uint32(0))


float(chain(src, m))
t0 = time.perf_counter()
float(chain(src, m))
dt = (time.perf_counter() - t0 - OVERHEAD) / ITERS
print(f"[expand rate] {dt*1e3:.2f} ms / 2^22 = {n/dt/1e9:.2f} Gelem/s",
      flush=True)
