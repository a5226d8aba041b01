"""Round-2 probe: XLA batched minor-axis row sort as the grouping primitive.

Questions (ROADMAP_perf.md round-2 attack plan):
  1. How fast is `jax.lax.sort(dimension=1)` at L in {128..4096} for keys-only
     i32 at flagship scale?  This is the candidate replacement for the
     in-kernel bitonic-28 row pack (measured 1.8 ms at 2^24).
  2. How fast is the packed trick: sort a SINGLE i32 key (digit<<7 | lane),
     then apply the recovered lane permutation to 1-2 operands with
     take_along_axis?  (Avoids the slow multi-operand stable sort.)
  3. How much slower is the honest multi-operand stable sort?

Run on the real TPU:  python probes/probe12_rowsort.py
"""
import time

import jax
import jax.numpy as jnp
import numpy as np

_tiny = jax.jit(lambda a: (a + 1).sum())
_x0 = jnp.zeros((8, 128), jnp.int32)
float(_tiny(_x0))
_t0 = time.perf_counter()
for _ in range(5):
    float(_tiny(_x0))
OVERHEAD = (time.perf_counter() - _t0) / 5
print(f"fetch overhead: {OVERHEAD*1e3:.1f} ms")


def bench(name, f, x, iters, items, unit="elem"):
    try:
        @jax.jit
        def run(y):
            return jax.lax.fori_loop(0, iters, lambda i, a: f(a), y)[0][0].astype(jnp.int32).sum() if isinstance(x, tuple) else jax.lax.fori_loop(0, iters, lambda i, a: f(a), y).sum()

        float(run(x))
        t0 = time.perf_counter()
        float(run(x))
        dt = time.perf_counter() - t0 - OVERHEAD
        per = dt / iters
        print(f"[OK ] {name}: {per*1e3:.3f} ms/iter = "
              f"{items/per/1e9:.2f} G{unit}/s", flush=True)
        return per
    except Exception as e:
        print(f"[ERR] {name}: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:110]}", flush=True)
        return None


N = 1 << 24  # probe scale; multiply ms by 16 for 2^28

key = jax.random.PRNGKey(0)
flat = jax.random.randint(key, (N,), 0, 1 << 30, dtype=jnp.int32)

print(f"\n== keys-only unstable batched sort, N=2^24, varying L ==")
for L in (128, 256, 512, 1024, 2048, 4096):
    x = flat.reshape(N // L, L)
    bench(f"sort rows L={L}",
          lambda y: jax.lax.sort((y,), num_keys=1, is_stable=False,
                                 dimension=1)[0] ^ 1,
          x, 8, N)

print(f"\n== packed digit-grouping trick at L=128 ==")
R = N // 128
lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
x2 = flat.reshape(R, 128)


def group_pack_only(y):
    packed = ((y & 15) << 7) | lane
    sp = jax.lax.sort((packed,), num_keys=1, is_stable=False, dimension=1)[0]
    return sp ^ 1


def group_pack_apply1(y):
    packed = ((y & 15) << 7) | lane
    sp = jax.lax.sort((packed,), num_keys=1, is_stable=False, dimension=1)[0]
    src = sp & 127
    return jnp.take_along_axis(y, src, axis=1) ^ 1


def group_pack_apply2(y):
    packed = ((y & 15) << 7) | lane
    sp = jax.lax.sort((packed,), num_keys=1, is_stable=False, dimension=1)[0]
    src = sp & 127
    a = jnp.take_along_axis(y, src, axis=1)
    b = jnp.take_along_axis(y ^ 7, src, axis=1)
    return a ^ b ^ 1


bench("pack+sort only (digit<<7|lane)", group_pack_only, x2, 8, N)
bench("pack+sort+apply x1", group_pack_apply1, x2, 8, N)
bench("pack+sort+apply x2", group_pack_apply2, x2, 8, N)

print(f"\n== packed trick at L=512 (digit<<9|idx) ==")
R5 = N // 512
lane5 = jax.lax.broadcasted_iota(jnp.int32, (R5, 512), 1)
x5 = flat.reshape(R5, 512)


def group5_apply1(y):
    packed = ((y & 15) << 9) | lane5
    sp = jax.lax.sort((packed,), num_keys=1, is_stable=False, dimension=1)[0]
    src = sp & 511
    return jnp.take_along_axis(y, src, axis=1) ^ 1


bench("pack+sort+apply x1 (L=512)", group5_apply1, x5, 8, N)

print(f"\n== honest stable pair sort at L=128 (for comparison) ==")


def stable2(y):
    d = y & 15
    sd, sy = jax.lax.sort((d, y), num_keys=1, is_stable=True, dimension=1)
    return sy ^ sd ^ 1


bench("stable (digit,key) rows L=128", stable2, x2, 6, N)


print(f"\n== full-key row sort (sample-sort primitive): rows fully sorted ==")
bench("full sort rows L=128",
      lambda y: jax.lax.sort((y,), num_keys=1, is_stable=False,
                             dimension=1)[0] ^ 1, x2, 8, N)
bench("full sort rows L=512",
      lambda y: jax.lax.sort((y,), num_keys=1, is_stable=False,
                             dimension=1)[0] ^ 1, x5, 8, N)

print(f"\n== take_along_axis apply rate (reference) ==")
perm = jnp.flip(lane, 1)
bench("gather apply (R,128)", lambda y: jnp.take_along_axis(y, perm, axis=1) ^ 1,
      x2, 10, N)
