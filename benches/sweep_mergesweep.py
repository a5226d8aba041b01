"""Hardware sweep: mergesweep segment length vs XLA flat (keys-only).

Usage: python benches/sweep_mergesweep.py [log2_n ...]
Writes one line per (n, L) via the reference-rules timing harness.
"""
import sys

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402

from gpusorting_tpu.ops import mergesweep, xla_sort  # noqa: E402
from gpusorting_tpu.utils.timing import batch_timing  # noqa: E402

logns = [int(a) for a in sys.argv[1:]] or [26]

for logn in logns:
    n = 1 << logn
    r = batch_timing(lambda c: xla_sort.sort_keys_u32(c), n,
                     batch=3, repeats=2)
    print(f"n=2^{logn} XLA flat: {r['seconds_per_sort']*1e3:.1f} ms "
          f"({r['keys_per_sec']/1e9:.3f} G) "
          f"[{r['spread_min_s']*1e3:.1f}-{r['spread_max_s']*1e3:.1f}]",
          flush=True)
    for logL in (20, 21, 22, 23, 24):
        if logL >= logn:
            continue
        L = 1 << logL
        r = batch_timing(
            lambda c, L=L: mergesweep.sort_codes(c, seg_elems=L), n,
            batch=3, repeats=2)
        print(f"n=2^{logn} mergesweep L=2^{logL}: "
              f"{r['seconds_per_sort']*1e3:.1f} ms "
              f"({r['keys_per_sec']/1e9:.3f} G) "
              f"[{r['spread_min_s']*1e3:.1f}-{r['spread_max_s']*1e3:.1f}]",
              flush=True)
