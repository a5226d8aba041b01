"""Hardware timing + bit-exactness for the radix16 engine (round-2 trims).

Usage: python benches/ablate_radix16.py [n_log2=24]

Prints per-sort ms and Gkeys/s at full entropy and at E020 skew (the
empty-block skip should make skew FASTER), and verifies bit-exactness
against np.sort / stable lax.sort.
"""
import sys
import time

sys.path.insert(0, __file__.rsplit("/", 2)[0])

import jax
import jax.numpy as jnp
import numpy as np

from gpusorting_tpu.core import prng
from gpusorting_tpu.ops import radix16

_tiny = jax.jit(lambda a: (a + 1).sum())
float(_tiny(jnp.zeros((8, 128), jnp.int32)))
t0 = time.perf_counter()
for _ in range(5):
    float(_tiny(jnp.zeros((8, 128), jnp.int32)))
OVERHEAD = (time.perf_counter() - t0) / 5
print(f"fetch overhead {OVERHEAD*1e3:.1f} ms")

LOG2N = int(sys.argv[1]) if len(sys.argv) > 1 else 24
N = 1 << LOG2N
ITERS = 3


def timed_sort(x, label, tile_rows=512):
    fn = jax.jit(lambda y: radix16.sort_codes_radix16(
        y, tile_rows=tile_rows)[:1])

    @jax.jit
    def chain(y):
        def body(i, a):
            return a ^ fn(y ^ a)[0]
        return jax.lax.fori_loop(0, ITERS, body, jnp.uint32(0))

    float(chain(x))  # compile + warmup
    t0 = time.perf_counter()
    float(chain(x))
    dt = (time.perf_counter() - t0 - OVERHEAD) / ITERS
    print(f"{label}: {dt*1e3:.2f} ms/sort = {N/dt/1e9:.3f} Gkeys/s",
          flush=True)
    return dt


def check(x, label):
    out = np.asarray(radix16.sort_codes_radix16(x))
    ref = np.sort(np.asarray(x))
    ok = (out == ref).all()
    print(f"exact {label}: {'OK' if ok else 'MISMATCH'}", flush=True)
    if not ok:
        bad = np.nonzero(out != ref)[0]
        print("  first diffs at", bad[:5], out[bad[:5]], ref[bad[:5]])
    return ok


x100 = prng.make_test_keys(N, 3, jnp.uint32, prng.EntropyPreset.E100)
x020 = prng.make_test_keys(N, 4, jnp.uint32, prng.EntropyPreset.E020)

ok = check(x100, "uniform 2^%d" % LOG2N)
ok &= check(x020, "E020 skew")

# pairs stability at 2^20 (smaller: 2x compile)
n2 = 1 << 20
k = prng.hybrid_taus_bits(n2, seed=5) & jnp.uint32(0xFFFF)
v = jnp.arange(n2, dtype=jnp.uint32)
sk, sv = radix16.sort_pairs_radix16(k, v)
rk, rv = jax.lax.sort((k, v), num_keys=1, is_stable=True)
pairs_ok = (np.asarray(sk) == np.asarray(rk)).all() and \
    (np.asarray(sv) == np.asarray(rv)).all()
print(f"exact pairs-stable 2^20: {'OK' if pairs_ok else 'MISMATCH'}",
      flush=True)

timed_sort(x100, f"uniform 2^{LOG2N} tile512")
timed_sort(x020, f"E020    2^{LOG2N} tile512")
for tr in (256, 1024, 2048):
    timed_sort(x100, f"uniform 2^{LOG2N} tile{tr}", tile_rows=tr)


# --- pairs-mode tile sweep (run with --pairs; flips the tuner's v5e PAIRS
# measured flag once recorded in config.py / RESULTS.md) ---
if "--pairs" in sys.argv:
    NP_ = 1 << 22  # pairs carry 2x accumulators; sweep at 2^22
    kx = prng.make_test_keys(NP_, 5, jnp.uint32, prng.EntropyPreset.E100)
    vx = jnp.arange(NP_, dtype=jnp.uint32)

    def timed_pairs(tile_rows):
        fn = jax.jit(lambda k, v: radix16.sort_pairs_radix16(
            k, v, tile_rows=tile_rows)[0][:1])

        @jax.jit
        def chain(k, v):
            def body(i, a):
                return a ^ fn(k ^ a, v)[0]
            return jax.lax.fori_loop(0, ITERS, body, jnp.uint32(0))

        float(chain(kx, vx))
        t0 = time.perf_counter()
        float(chain(kx, vx))
        dt = (time.perf_counter() - t0 - OVERHEAD) / ITERS
        print(f"pairs tile {tile_rows}: {dt*1e3:.2f} ms/sort = "
              f"{NP_/dt/1e9:.3f} Gpairs/s", flush=True)
        return dt

    for tr in (256, 512, 1024, 2048):
        timed_pairs(tr)
