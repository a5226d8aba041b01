import jax, jax.numpy as jnp, numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def try_case(name, fn):
    try:
        r = fn()
        print(f"[OK ] {name}: {r}")
    except Exception as e:
        msg = str(e).split('\n')[0][:140]
        print(f"[ERR] {name}: {type(e).__name__}: {msg}")

# 2D HBM->HBM DMA static
def t_dma2d():
    def k(x_hbm, o_hbm, sem):
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(0, 8), :], o_hbm.at[pl.ds(0, 8), :], sem)
        cp.start(); cp.wait()
    x = jnp.arange(16*128, dtype=jnp.int32).reshape(16,128)
    r = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((16,128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True))(x)
    return np.asarray(r)[0,0]
try_case("2D DMA HBM->HBM static", t_dma2d)

def t_dma2d_dynstart():
    def k(s_ref, x_hbm, o_hbm, sem):
        s = s_ref[0]
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(s, 8), :], o_hbm.at[pl.ds(s, 8), :], sem)
        cp.start(); cp.wait()
    x = jnp.arange(16*128, dtype=jnp.int32).reshape(16,128)
    s = jnp.array([4], jnp.int32)
    r = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((16,128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True))(s, x)
    return np.asarray(r)[4,0]
try_case("2D DMA dyn-start static-size", t_dma2d_dynstart)

def t_dma2d_dynsize():
    def k(s_ref, x_hbm, o_hbm, sem):
        n = s_ref[0]
        cp = pltpu.make_async_copy(x_hbm.at[pl.ds(0, n), :], o_hbm.at[pl.ds(0, n), :], sem)
        cp.start(); cp.wait()
    x = jnp.arange(16*128, dtype=jnp.int32).reshape(16,128)
    s = jnp.array([4], jnp.int32)
    r = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((16,128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True))(s, x)
    return np.asarray(r)[3,0]
try_case("2D DMA DYNAMIC-size", t_dma2d_dynsize)

# 1D VMEM->HBM dma
def t_dma_1d_vmem_hbm():
    def k(x_ref, o_hbm, sem):
        cp = pltpu.make_async_copy(x_ref.at[pl.ds(0, 128)], o_hbm.at[pl.ds(128, 128)], sem)
        cp.start(); cp.wait()
    x = jnp.arange(256, dtype=jnp.int32)
    r = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((256,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True))(x)
    return np.asarray(r)[128:131]
try_case("1D DMA VMEM->HBM static", t_dma_1d_vmem_hbm)

def t_dma_1d_dynboth():
    def k(s_ref, x_ref, o_hbm, sem):
        st = s_ref[0]; n = s_ref[1]
        cp = pltpu.make_async_copy(x_ref.at[pl.ds(0, n)], o_hbm.at[pl.ds(st, n)], sem)
        cp.start(); cp.wait()
    x = jnp.arange(256, dtype=jnp.int32)
    s = jnp.array([64, 32], jnp.int32)
    r = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((256,), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True))(s, x)
    return np.asarray(r)[63:67]
try_case("1D DMA VMEM->HBM dyn start+size", t_dma_1d_dynboth)

# gather size limits: axis=0 with growing sublane dim
for M in [16, 32, 64, 128, 256]:
    def t_g(M=M):
        def k(x_ref, i_ref, o_ref):
            o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=0)
        x = jnp.arange(M*128, dtype=jnp.int32).reshape(M, 128)
        i = jnp.flip(jax.lax.broadcasted_iota(jnp.int32, (M,128), 0), 0)
        r = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((M,128), jnp.int32))(x, i)
        return np.asarray(r)[0,0]
    try_case(f"take_along_axis axis=0 ({M},128)", t_g)
