import time, jax, jax.numpy as jnp, numpy as np

def timeit(f, *a, n=5):
    r = f(*a); jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
    jax.block_until_ready(r)
    return (time.perf_counter()-t0)/n

key = jax.random.PRNGKey(0)
for N in [1<<22, 1<<24, 1<<26]:
    x = jax.random.randint(key, (N,), 0, 1<<30, dtype=jnp.uint32)
    f = jax.jit(jnp.sort)
    t = timeit(f, x)
    print(f"jnp.sort      N=2^{N.bit_length()-1}: {t*1e3:8.2f} ms  {N/t/1e9:.3f} Gkeys/s")
    # gather throughput
    idx = jax.random.permutation(key, N).astype(jnp.int32)
    g = jax.jit(lambda x, i: jnp.take(x, i))
    t = timeit(g, x, idx)
    print(f"jnp.take      N=2^{N.bit_length()-1}: {t*1e3:8.2f} ms  {N/t/1e9:.3f} Gelem/s")
    # argsort
    h = jax.jit(lambda x: jnp.argsort(x, stable=True))
    t = timeit(h, x)
    print(f"argsort       N=2^{N.bit_length()-1}: {t*1e3:8.2f} ms  {N/t/1e9:.3f} Gkeys/s")
    # sort_key_val pairs
    v = x
    skv = jax.jit(lambda x, v: jax.lax.sort((x, v), num_keys=1, is_stable=True))
    t = timeit(skv, x, v)
    print(f"sort pairs    N=2^{N.bit_length()-1}: {t*1e3:8.2f} ms  {N/t/1e9:.3f} Gkeys/s")
