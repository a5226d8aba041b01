import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 8192


def t(name, kernel, dtype=jnp.uint32):
    try:
        x = jnp.zeros((M, 128), dtype)
        r = pl.pallas_call(kernel, out_shape=jax.ShapeDtypeStruct((M, 128), dtype))(x)
        jax.block_until_ready(r)
        print(f"[OK ] {name}")
    except Exception as e:
        print(f"[ERR] {name}: {str(e).splitlines()[0][:100]}")


t("minimum u32", lambda a, o: o.__setitem__(slice(None), jnp.minimum(a[:], a[:])))
t("minimum i32", lambda a, o: o.__setitem__(slice(None), jnp.minimum(a[:], a[:])), jnp.int32)
t("u32 add const", lambda a, o: o.__setitem__(slice(None), a[:] + jnp.uint32(1)))
t("where 2 arrays u32", lambda a, o: o.__setitem__(
    slice(None), jnp.where((jax.lax.broadcasted_iota(jnp.int32, (M, 128), 1) & 1) == 0, a[:], a[:] + jnp.uint32(1))))
t("min+max+where i32", lambda a, o: o.__setitem__(
    slice(None), jnp.where((jax.lax.broadcasted_iota(jnp.int32, (M, 128), 1) & 1) == 0,
                           jnp.minimum(a[:], a[:] + 1), jnp.maximum(a[:], a[:] - 1))), jnp.int32)
t("min u32 of a, a+1", lambda a, o: o.__setitem__(slice(None), jnp.minimum(a[:], a[:] + jnp.uint32(1))))
t("max u32 of a, a-1", lambda a, o: o.__setitem__(slice(None), jnp.maximum(a[:], a[:] - jnp.uint32(1))))
t("roll+min u32", lambda a, o: o.__setitem__(slice(None), jnp.minimum(a[:], pltpu.roll(a[:], 1, axis=1))))
t("roll+min+max u32", lambda a, o: o.__setitem__(
    slice(None), jnp.minimum(a[:], pltpu.roll(a[:], 1, axis=1)) + jnp.maximum(a[:], pltpu.roll(a[:], 1, axis=1))))
t("full bitonic stage i32", lambda a, o: o.__setitem__(
    slice(None), jnp.where((jax.lax.broadcasted_iota(jnp.int32, (M, 128), 1) & 1) == 0,
                           jnp.minimum(a[:], pltpu.roll(a[:], 1, axis=1)),
                           jnp.maximum(a[:], pltpu.roll(a[:], 1, axis=1)))), jnp.int32)
t("full bitonic stage u32-as-i32 xor", lambda a, o: o.__setitem__(
    slice(None), jnp.where((jax.lax.broadcasted_iota(jnp.int32, (M, 128), 1) & 1) == 0,
                           jnp.minimum(a[:], pltpu.roll(a[:], 1, axis=1)),
                           jnp.maximum(a[:], pltpu.roll(a[:], 1, axis=1)))))
