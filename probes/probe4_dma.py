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

# (1, N) lane-axis dynamic start+size DMA HBM->HBM
def t_lane_dyn():
    def k(s_ref, x_hbm, o_hbm, sem):
        st = s_ref[0]; n = s_ref[1]; dst = s_ref[2]
        cp = pltpu.make_async_copy(x_hbm.at[0, pl.ds(st, n)], o_hbm.at[0, pl.ds(dst, n)], sem)
        cp.start(); cp.wait()
    x = jnp.arange(1024, dtype=jnp.int32).reshape(1, 1024)
    s = jnp.array([37, 101, 3], jnp.int32)
    r = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((1,1024), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True))(s, x)
    out = np.asarray(r)
    ok = (out[0, 3:104] == np.arange(37, 138)).all()
    return f"correct={ok}"
try_case("(1,N) lane-axis dyn start+size unaligned HBM->HBM", t_lane_dyn)

# VMEM->HBM 2D dynamic both, unaligned sublane start
def t_vmem_hbm():
    def k(s_ref, x_ref, o_hbm, sem):
        st = s_ref[0]; n = s_ref[1]
        cp = pltpu.make_async_copy(x_ref.at[pl.ds(0, n), :], o_hbm.at[pl.ds(st, n), :], sem)
        cp.start(); cp.wait()
    x = jnp.arange(64*128, dtype=jnp.int32).reshape(64,128)
    s = jnp.array([5, 17], jnp.int32)
    r = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((64,128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True))(s, x)
    out = np.asarray(r)
    ok = (out[5:22] == np.arange(17*128).reshape(17,128)).all()
    return f"correct={ok}"
try_case("VMEM->HBM 2D dyn start(unaligned 5)+size", t_vmem_hbm)

# VMEM source with dynamic sublane start (unaligned src)
def t_vmem_src_dyn():
    def k(s_ref, x_ref, o_hbm, sem):
        st = s_ref[0]; n = s_ref[1]
        cp = pltpu.make_async_copy(x_ref.at[pl.ds(st, n), :], o_hbm.at[pl.ds(0, n), :], sem)
        cp.start(); cp.wait()
    x = jnp.arange(64*128, dtype=jnp.int32).reshape(64,128)
    s = jnp.array([3, 9], jnp.int32)
    r = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((64,128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True))(s, x)
    out = np.asarray(r)
    ok = (out[0:9] == np.arange(3*128, 12*128).reshape(9,128)).all()
    return f"correct={ok}"
try_case("VMEM dyn-start src -> HBM", t_vmem_src_dyn)

# many DMAs in a fori_loop with dynamic offsets (the run-scatter shape)
def t_loop_dma():
    def k(s_ref, x_ref, o_hbm, sem):
        def body(i, _):
            st = s_ref[i]
            cp = pltpu.make_async_copy(x_ref.at[pl.ds(i*8, 8), :], o_hbm.at[pl.ds(st, 8), :], sem)
            cp.start(); cp.wait()
            return 0
        jax.lax.fori_loop(0, 8, body, 0)
    x = jnp.arange(64*128, dtype=jnp.int32).reshape(64,128)
    s = jnp.array([56, 48, 40, 32, 24, 16, 8, 0], jnp.int32)
    r = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((64,128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True))(s, x)
    out = np.asarray(r)
    exp = np.arange(64*128).reshape(8, 8, 128)[::-1].reshape(64,128)
    return f"correct={(out==exp).all()}"
try_case("8 DMAs in fori_loop dyn dst", t_loop_dma)

# (1,N) VMEM->HBM lane dyn: VMEM (1, 16384)? VMEM lane dim large
def t_vmem_lane():
    def k(s_ref, x_ref, o_hbm, sem):
        st = s_ref[0]; n = s_ref[1]
        cp = pltpu.make_async_copy(x_ref.at[0, pl.ds(0, n)], o_hbm.at[0, pl.ds(st, n)], sem)
        cp.start(); cp.wait()
    x = jnp.arange(4096, dtype=jnp.int32).reshape(1, 4096)
    s = jnp.array([37, 1000], jnp.int32)
    r = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((1, 4096), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True))(s, x)
    out = np.asarray(r)
    ok = (out[0, 37:1037] == np.arange(1000)).all()
    return f"correct={ok}"
try_case("VMEM(1,4096) lane-dyn -> HBM(1,N) unaligned", t_vmem_lane)
