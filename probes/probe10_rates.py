"""True in-kernel rates: loop the op inside one kernel to amortize overheads."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def bench(name, build, items_per_call, unit="elem", iters=5):
    try:
        f = build()
        r = f()
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = f()
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / iters
        print(f"[OK ] {name}: {dt*1e3:.2f} ms = {items_per_call/dt/1e9:.2f} G{unit}/s")
    except Exception as e:
        print(f"[ERR] {name}: {type(e).__name__}: {str(e).splitlines()[0][:110]}")


M = 8192  # rows; 1M elements, 4MB
LOOPS = 100

# 1. empty kernel overhead
def b_empty():
    def k(x_ref, o_ref):
        o_ref[0, 0] = x_ref[0, 0]
    x = jnp.zeros((8, 128), jnp.int32)
    pc = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((8, 128), jnp.int32))
    g = jax.jit(lambda a: pc(a))
    return lambda: g(x)
bench("empty kernel (call overhead)", b_empty, 1, "call", iters=20)

# 2. bitonic stage i32, LOOPS stages in-kernel
def b_bitonic():
    def k(x_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (M, 128), 1)
        def body(i, y):
            z = pltpu.roll(y, 1, axis=1)
            return jnp.where((lane & 1) == 0, jnp.minimum(y, z), jnp.maximum(y, z))
        o_ref[:] = jax.lax.fori_loop(0, LOOPS, body, x_ref[:])
    x = jnp.zeros((M, 128), jnp.int32)
    pc = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((M, 128), jnp.int32))
    g = jax.jit(lambda a: pc(a))
    return lambda: g(x)
bench(f"bitonic stage i32 ({M},128) x{LOOPS}", b_bitonic, M * 128 * LOOPS, "cmpex")

# 3. lane gather, LOOPS in-kernel
def b_gather():
    def k(x_ref, i_ref, o_ref):
        idx = i_ref[:]
        def body(i, y):
            return jnp.take_along_axis(y, idx, axis=1)
        o_ref[:] = jax.lax.fori_loop(0, LOOPS, body, x_ref[:])
    x = jnp.zeros((M, 128), jnp.int32)
    idx = jnp.flip(jax.lax.broadcasted_iota(jnp.int32, (M, 128), 1), 1)
    pc = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((M, 128), jnp.int32))
    g = jax.jit(lambda a, b: pc(a, b))
    return lambda: g(x, idx)
bench(f"lane-gather ({M},128) x{LOOPS}", b_gather, M * 128 * LOOPS)

# 4. plain VPU op chain (add+xor+and = 3 ops) x LOOPS
def b_vpu():
    def k(x_ref, o_ref):
        def body(i, y):
            return ((y + 1) ^ y) & jnp.int32(0x7FFFFFFF)
        o_ref[:] = jax.lax.fori_loop(0, LOOPS, body, x_ref[:])
    x = jnp.zeros((M, 128), jnp.int32)
    pc = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((M, 128), jnp.int32))
    g = jax.jit(lambda a: pc(a))
    return lambda: g(x)
bench(f"VPU 3-op chain ({M},128) x{LOOPS}", b_vpu, 3 * M * 128 * LOOPS, "op")

# 5. MXU bf16 in kernel: (1024,512)@(512,512) x LOOPS/5
def b_mxu():
    A, K, B = 1024, 512, 512
    L = 20
    def k(a_ref, b_ref, o_ref):
        bm = b_ref[:]
        def body(i, y):
            return jax.lax.dot_general(y, bm, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.bfloat16)
        o_ref[:] = jax.lax.fori_loop(0, L, body, a_ref[:])
    a = jnp.zeros((A, K), jnp.bfloat16)
    b2 = jnp.zeros((K, B), jnp.bfloat16)
    pc = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((A, B), jnp.bfloat16))
    g = jax.jit(lambda p, q: pc(p, q))
    return lambda: g(a, b2)
bench("MXU bf16 (1024,512)@(512,512) x20", b_mxu, 20 * 1024 * 512 * 512, "mac")

# 6. int8 MXU
def b_mxu8():
    A, K, B = 1024, 512, 512
    L = 20
    def k(a_ref, b_ref, o_ref):
        bm = b_ref[:]
        def body(i, y):
            r = jax.lax.dot_general(y, bm, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32)
            return (r & 127).astype(jnp.int8)
        o_ref[:] = jax.lax.fori_loop(0, L, body, a_ref[:])
    a = jnp.zeros((A, K), jnp.int8)
    b2 = jnp.zeros((K, B), jnp.int8)
    pc = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((A, B), jnp.int8))
    g = jax.jit(lambda p, q: pc(p, q))
    return lambda: g(a, b2)
bench("MXU int8 (1024,512)@(512,512) x20", b_mxu8, 20 * 1024 * 512 * 512, "mac")

# 7. DMA issue rate: NDMA row-copies HBM->HBM inside one kernel
def b_dma(ndma, rows):
    def build():
        R = ndma * rows
        def k(x_hbm, o_hbm, sems):
            def start(i, _):
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(i * rows, rows), :],
                    o_hbm.at[pl.ds(i * rows, rows), :], sems.at[i % 16]).start()
                return 0
            def startwait(i, _):
                @pl.when(i >= 16)
                def _():
                    pltpu.make_async_copy(
                        x_hbm.at[pl.ds((i - 16) * rows, rows), :],
                        o_hbm.at[pl.ds((i - 16) * rows, rows), :], sems.at[(i - 16) % 16]).wait()
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds(i * rows, rows), :],
                    o_hbm.at[pl.ds(i * rows, rows), :], sems.at[i % 16]).start()
                return 0
            jax.lax.fori_loop(0, ndma, startwait, 0)
            def waittail(i, _):
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds((ndma - 16 + i) * rows, rows), :],
                    o_hbm.at[pl.ds((ndma - 16 + i) * rows, rows), :], sems.at[(ndma - 16 + i) % 16]).wait()
                return 0
            jax.lax.fori_loop(0, 16, waittail, 0)
        x = jnp.zeros((R, 128), jnp.int32)
        pc = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
            out_specs=pl.BlockSpec(memory_space=pl.ANY),
            scratch_shapes=[pltpu.SemaphoreType.DMA((16,))],
            compiler_params=pltpu.CompilerParams(has_side_effects=True))
        g = jax.jit(lambda a: pc(a))
        return lambda: g(x)
    return build
for nd, rw in [(2048, 1), (2048, 8), (512, 64), (128, 512)]:
    bench(f"DMA hbm->hbm {nd} x {rw}rows ({rw*512}B)", b_dma(nd, rw), nd, "dma")
    # also report achieved bandwidth
