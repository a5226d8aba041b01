"""Bisect Mosaic HTTP-500 crashes: which op combination kills the compiler."""
import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

M = 8192


def t(name, kernel, *args, out=None):
    try:
        out = out or jax.ShapeDtypeStruct((M, 128), jnp.uint32)
        r = pl.pallas_call(kernel, out_shape=out)(*args)
        jax.block_until_ready(r)
        print(f"[OK ] {name}")
    except Exception as e:
        print(f"[ERR] {name}: {str(e).splitlines()[0][:110]}")


x = jnp.zeros((M, 128), jnp.uint32)
xi = jnp.zeros((M, 128), jnp.int32)

# individual suspects
t("roll static axis=1 u32", lambda a, o: o.__setitem__(slice(None), pltpu.roll(a[:], 1, axis=1)), x)
t("roll static axis=0 u32", lambda a, o: o.__setitem__(slice(None), pltpu.roll(a[:], 1, axis=0)), x)
t("roll static axis=1 i32", lambda a, o: o.__setitem__(slice(None), pltpu.roll(a[:], 1, axis=1).astype(jnp.uint32)), xi)
t("iota dim=1", lambda a, o: o.__setitem__(slice(None), jax.lax.broadcasted_iota(jnp.uint32, (M, 128), 1)), x)
t("min/max/where", lambda a, o: o.__setitem__(slice(None), jnp.where((jax.lax.broadcasted_iota(jnp.int32, (M, 128), 1) & 1) == 0, jnp.minimum(a[:], a[:] + 1), jnp.maximum(a[:], a[:] - 1))), x)


def bitonic1(a, o):
    y = a[:]
    z = pltpu.roll(y, 1, axis=1)
    lane = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
    o[:] = jnp.where((lane & 1) == 0, jnp.minimum(y, z), jnp.maximum(y, z))

t("one bitonic stage (roll+iota+minmax+where)", bitonic1, x)


def bitonic3(a, o):
    y = a[:]
    for s in [1, 2, 4]:
        z = pltpu.roll(y, s, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
        y = jnp.where((lane & s) == 0, jnp.minimum(y, z), jnp.maximum(y, z))
    o[:] = y

t("three bitonic stages", bitonic3, x)

# one-hot pieces
R = 2048
xr = jnp.zeros((R, 128), jnp.uint32)


def oh1(a, o):
    d = (a[:] & jnp.uint32(15)).astype(jnp.int32)
    oh = (d == 3).astype(jnp.int32)
    o[:] = oh.astype(jnp.uint32)

t("onehot single cmp", oh1, xr, out=jax.ShapeDtypeStruct((R, 128), jnp.uint32))


def ohpref(a, o):
    d = (a[:] & jnp.uint32(15)).astype(jnp.int32)
    p = (d == 3).astype(jnp.int32)
    for s in [1, 2, 4, 8, 16, 32, 64]:
        sh = pltpu.roll(p, s, axis=1)
        lane = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
        p = p + jnp.where(lane >= s, sh, 0)
    o[:] = p.astype(jnp.uint32)

t("onehot + 7-step lane prefix (one digit)", ohpref, xr, out=jax.ShapeDtypeStruct((R, 128), jnp.uint32))

# masked roll-add prefix without where (select via multiply)
def ohpref2(a, o):
    d = (a[:] & jnp.uint32(15)).astype(jnp.int32)
    p = (d == 3).astype(jnp.int32)
    lane = jax.lax.broadcasted_iota(jnp.int32, (R, 128), 1)
    for s in [1, 2, 4, 8, 16, 32, 64]:
        sh = pltpu.roll(p, s, axis=1)
        p = p + sh * (lane >= s).astype(jnp.int32)
    o[:] = p.astype(jnp.uint32)

t("prefix via mult-mask", ohpref2, xr, out=jax.ShapeDtypeStruct((R, 128), jnp.uint32))

# the sub-row DMA crash: (1,k) dyn start+size
def t_subrow(start_dyn, size_dyn):
    def k(s_ref, x_hbm, o_hbm, sem):
        st = s_ref[0] if start_dyn else 3
        n = s_ref[1] if size_dyn else 37
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(0, 1), pl.ds(st, n)],
            o_hbm.at[pl.ds(1, 1), pl.ds(st, n)], sem)
        cp.start(); cp.wait()
    xx = jnp.arange(4 * 128, dtype=jnp.uint32).reshape(4, 128)
    s = jnp.array([3, 37], jnp.int32)
    try:
        r = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((4, 128), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA(())],
            compiler_params=pltpu.CompilerParams(has_side_effects=True))(s, xx)
        print(f"[OK ] sub-row DMA start_dyn={start_dyn} size_dyn={size_dyn}: {np.asarray(r)[1,3:6]}")
    except Exception as e:
        print(f"[ERR] sub-row DMA start_dyn={start_dyn} size_dyn={size_dyn}: {str(e).splitlines()[0][:90]}")

t_subrow(False, False)
t_subrow(True, False)
t_subrow(False, True)
t_subrow(True, True)

# lane-dynamic full-row DMA: rows fixed, lane slice static 128 (sanity)
def t_lanes_static():
    def k(x_hbm, o_hbm, sem):
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(0, 2), pl.ds(0, 64)],
                                   o_hbm.at[pl.ds(0, 2), pl.ds(64, 64)], sem)
        cp.start(); cp.wait()
    xx = jnp.arange(4 * 128, dtype=jnp.uint32).reshape(4, 128)
    try:
        r = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((4, 128), jnp.uint32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA(())],
            compiler_params=pltpu.CompilerParams(has_side_effects=True))(xx)
        print(f"[OK ] static sub-row DMA 64 lanes: {np.asarray(r)[0,64:66]}")
    except Exception as e:
        print(f"[ERR] static sub-row DMA 64 lanes: {str(e).splitlines()[0][:90]}")

t_lanes_static()
