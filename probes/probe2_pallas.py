import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
import traceback

def try_case(name, fn):
    try:
        r = fn()
        print(f"[OK ] {name}: {r}")
    except Exception as e:
        msg = str(e).split('\n')[0][:160]
        print(f"[ERR] {name}: {type(e).__name__}: {msg}")

# 1. in-kernel take_along_axis (gather along sublanes)
def t_gather():
    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)
    x = jnp.arange(1024, dtype=jnp.int32).reshape(8, 128)
    i = jnp.flip(jax.lax.broadcasted_iota(jnp.int32, (8,128), 0), 0)
    r = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8,128), jnp.int32))(x, i)
    return np.asarray(r)[0,0]
try_case("take_along_axis axis=0 (8,128)", t_gather)

def t_gather_lane():
    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)
    x = jnp.arange(1024, dtype=jnp.int32).reshape(8, 128)
    i = jnp.flip(jax.lax.broadcasted_iota(jnp.int32, (8,128), 1), 1)
    r = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8,128), jnp.int32))(x, i)
    return np.asarray(r)[0,0]
try_case("take_along_axis axis=1 (lanes)", t_gather_lane)

def t_gather_big():
    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)
    M = 1024
    x = jnp.arange(M*128, dtype=jnp.int32).reshape(M, 128)
    i = jnp.flip(jax.lax.broadcasted_iota(jnp.int32, (M,128), 0), 0)
    r = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((M,128), jnp.int32))(x, i)
    return np.asarray(r)[0,0]
try_case("take_along_axis axis=0 (1024,128)", t_gather_big)

# dynamic-size DMA
def t_dyn_dma():
    def k(x_hbm, o_hbm, sem):
        n = 64
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(0, n)], o_hbm.at[pl.ds(0, n)], sem)
        cp.start(); cp.wait()
    x = jnp.arange(256, dtype=jnp.int32)
    r = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((256,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True))(x)
    return np.asarray(r)[0]
try_case("static-size DMA HBM->HBM 1D", t_dyn_dma)

def t_dyn_dma2():
    def k(n_ref, x_hbm, o_hbm, sem):
        n = n_ref[0]
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(0, n)], o_hbm.at[pl.ds(0, n)], sem)
        cp.start(); cp.wait()
    x = jnp.arange(256, dtype=jnp.int32)
    n = jnp.array([64], dtype=jnp.int32)
    r = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((256,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True))(n, x)
    return np.asarray(r)[0]
try_case("DYNAMIC-size DMA (pl.ds traced size)", t_dyn_dma2)

# dynamic-start static-size DMA
def t_dynstart():
    def k(n_ref, x_hbm, o_hbm, sem):
        s = n_ref[0]
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(s, 64)], o_hbm.at[pl.ds(s, 64)], sem)
        cp.start(); cp.wait()
    x = jnp.arange(256, dtype=jnp.int32)
    n = jnp.array([32], dtype=jnp.int32)
    r = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((256,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(memory_space=pltpu.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True))(n, x)
    return np.asarray(r)[32]
try_case("dynamic-START static-size DMA", t_dynstart)

# pltpu.roll dynamic shift
def t_roll_dyn():
    def k(x_ref, s_ref, o_ref):
        o_ref[:] = pltpu.roll(x_ref[:], s_ref[0], axis=1)
    x = jnp.arange(1024, dtype=jnp.int32).reshape(8,128)
    s = jnp.array([5], dtype=jnp.int32)
    r = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8,128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.SMEM)])(x, s)
    return np.asarray(r)[0,:3]
try_case("pltpu.roll dynamic shift", t_roll_dyn)

# in-kernel scatter: o_ref[idx] = val in fori loop (element store via dynamic index, VMEM)
def t_elem_store():
    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.zeros_like(o_ref)
        def body(j, _):
            o_ref[i_ref[j], 0] = x_ref[j, 0]
            return 0
        jax.lax.fori_loop(0, 8, body, 0)
    x = jnp.arange(8, dtype=jnp.int32).reshape(8,1)
    i = jnp.array([[7],[6],[5],[4],[3],[2],[1],[0]], jnp.int32)[:,0]
    r = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8,1), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM), pl.BlockSpec(memory_space=pltpu.SMEM)])(x, i)
    return np.asarray(r).ravel()
try_case("per-elem dynamic store VMEM", t_elem_store)

# lax.sort inside kernel
def t_sort_inker():
    def k(x_ref, o_ref):
        o_ref[:] = jnp.sort(x_ref[:], axis=1)
    x = jax.random.randint(jax.random.PRNGKey(0), (8,128), 0, 100, dtype=jnp.int32)
    r = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8,128), jnp.int32))(x)
    return np.asarray(r)[0,:3]
try_case("jnp.sort inside kernel", t_sort_inker)

# cumsum inside kernel
def t_cumsum():
    def k(x_ref, o_ref):
        o_ref[:] = jnp.cumsum(x_ref[:], axis=0)
    x = jnp.ones((256,256), jnp.int32)
    r = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((256,256), jnp.int32))(x)
    return np.asarray(r)[255,0]
try_case("cumsum axis=0 (256,256)", t_cumsum)
