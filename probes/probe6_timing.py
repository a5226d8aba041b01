"""Figure out how to time correctly under the axon platform."""
import time

import jax
import jax.numpy as jnp
import numpy as np


def bench(name, f, x, iters=3, fetch=True):
    r = f(x)
    jax.block_until_ready(r)
    # method A: block_until_ready
    t0 = time.perf_counter()
    for _ in range(iters):
        r = f(x)
    jax.block_until_ready(r)
    ta = (time.perf_counter() - t0) / iters
    # method B: force a tiny fetch each iter (sum -> scalar -> host)
    g = jax.jit(lambda a: f(a).sum())
    _ = float(g(x))
    t0 = time.perf_counter()
    for _ in range(iters):
        v = float(g(x))
    tb = (time.perf_counter() - t0) / iters
    print(f"{name}: block={ta*1e3:.2f} ms  fetch={tb*1e3:.2f} ms")


sort1 = jax.jit(lambda a: jax.lax.sort((a,), num_keys=1, is_stable=True)[0])
for logn in [20, 24, 26]:
    n = 1 << logn
    x = jax.random.randint(jax.random.PRNGKey(0), (n,), 0, 1 << 30, dtype=jnp.int32).astype(jnp.uint32)
    bench(f"lax.sort 2^{logn}", sort1, x)

copy = jax.jit(lambda a: a + jnp.uint32(1))
for logn in [26, 28]:
    n = 1 << logn
    x = jnp.zeros((n,), jnp.uint32)
    bench(f"add 2^{logn}", copy, x)

mm = jax.jit(lambda a: (a @ a))
x = jnp.ones((8192, 8192), jnp.bfloat16)
bench("matmul 8192^3 (1.1 Tflop)", mm, x)
