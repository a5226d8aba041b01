#!/usr/bin/env python
"""Hardware revalidation of the shared downsweep chunk driver (commit
7c6e14a refactored rts/ffx onto rts.run_downsweep_chunks after the round-3
hardware window closed).

Checks on the real chip, keys AND stable pairs, at an odd partial-tile
size: rts and ffx outputs must be bit-exact with jax.lax.sort stable.
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
from gpusorting_tpu.ops import ffx, rts

SMALL = os.environ.get("GST_SPOT_SMALL") == "1"
n = (1 << 15) + 321 if SMALL else (1 << 22) + 12345
print(f"devices={jax.devices()} n={n}", flush=True)

codes = prng.hybrid_taus_bits(n, seed=101)
payload = jnp.arange(n, dtype=jnp.uint32)
ref_k, ref_v = jax.lax.sort((codes, payload), num_keys=1, is_stable=True)
ref_k, ref_v = np.asarray(ref_k), np.asarray(ref_v)

failures = 0
for name, keys_fn, pairs_fn in (
    ("rts", rts.sort_codes_rts, rts.sort_pairs_rts),
    ("ffx", ffx.sort_codes_ffx, ffx.sort_pairs_ffx),
):
    t0 = time.perf_counter()
    out_k = np.asarray(keys_fn(codes))
    ok_k = (out_k == ref_k).all()
    t1 = time.perf_counter()
    pk, pv = pairs_fn(codes, payload)
    ok_p = (np.asarray(pk) == ref_k).all() and (np.asarray(pv) == ref_v).all()
    t2 = time.perf_counter()
    print(f"[{name}] keys {'PASS' if ok_k else 'FAIL'} ({t1-t0:.1f}s incl "
          f"compile)  pairs {'PASS' if ok_p else 'FAIL'} ({t2-t1:.1f}s)",
          flush=True)
    failures += (not ok_k) + (not ok_p)

print(f"hw_spot_r3c: {'ALL PASS' if not failures else f'{failures} FAILURES'}",
      flush=True)
sys.exit(1 if failures else 0)
