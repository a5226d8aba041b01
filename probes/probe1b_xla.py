import time, jax, jax.numpy as jnp, numpy as np

def timeit(f, *a, n=3):
    # force full materialization by pulling a scalar to host
    r = f(*a); _ = np.asarray(r[:1])
    t0 = time.perf_counter()
    for _ in range(n):
        r = f(*a)
        _ = np.asarray(r[:1])
    return (time.perf_counter()-t0)/n

key = jax.random.PRNGKey(0)
# overhead of the host pull alone
x0 = jnp.zeros((8,), jnp.uint32)
iden = jax.jit(lambda x: x + 1)
t = timeit(iden, x0, n=10)
print(f"host-pull overhead: {t*1e3:.3f} ms")

for N in [1<<24, 1<<26]:
    x = jax.random.randint(key, (N,), 0, 1<<30, dtype=jnp.uint32)
    f = jax.jit(lambda x: jnp.sort(x))
    t = timeit(f, x)
    print(f"jnp.sort   N=2^{N.bit_length()-1}: {t*1e3:8.2f} ms  {N/t/1e9:.3f} Gkeys/s")
    idx = jax.random.permutation(key, N).astype(jnp.int32)
    g = jax.jit(lambda x, i: jnp.take(x, i))
    t = timeit(g, x, idx)
    print(f"jnp.take   N=2^{N.bit_length()-1}: {t*1e3:8.2f} ms  {N/t/1e9:.3f} Gelem/s")
    # memcpy-bound op for reference (copy via add)
    c = jax.jit(lambda x: x + jnp.uint32(1))
    t = timeit(c, x)
    print(f"x+1 (BW)   N=2^{N.bit_length()-1}: {t*1e3:8.2f} ms  {N*8/t/1e9:.1f} GB/s")
    skv = jax.jit(lambda x, v: jax.lax.sort((x, v), num_keys=1, is_stable=True)[0])
    t = timeit(skv, x, x)
    print(f"sortpairs  N=2^{N.bit_length()-1}: {t*1e3:8.2f} ms  {N/t/1e9:.3f} Gkeys/s")
