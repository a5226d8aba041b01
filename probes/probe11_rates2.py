"""Trustworthy rates: chain K dependent iterations inside one jit, force a
scalar fetch, subtract fetch overhead, divide by K."""
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# measure fetch overhead once: tiny computation + fetch
_tiny = jax.jit(lambda a: (a + 1).sum())
_x0 = jnp.zeros((8, 128), jnp.int32)
float(_tiny(_x0))
_t0 = time.perf_counter()
for _ in range(5):
    float(_tiny(_x0))
OVERHEAD = (time.perf_counter() - _t0) / 5
print(f"fetch overhead: {OVERHEAD*1e3:.1f} ms")


def bench(name, f, x, iters, items, unit="elem"):
    """f: y -> y (same shape). Chained in one jit; returns per-iter seconds."""
    try:
        @jax.jit
        def run(y):
            return jax.lax.fori_loop(0, iters, lambda i, a: f(a), y).sum()

        float(run(x))
        t0 = time.perf_counter()
        v = float(run(x))
        dt = time.perf_counter() - t0 - OVERHEAD
        per = dt / iters
        print(f"[OK ] {name}: {per*1e3:.3f} ms/iter = {items/per/1e9:.2f} G{unit}/s")
        return per
    except Exception as e:
        print(f"[ERR] {name}: {type(e).__name__}: {str(e).splitlines()[0][:110]}")
        return None


M = 8192
E = M * 128  # 1M elements

# bitonic stage (10 stages per kernel call, chained calls)
def mk_bitonic(stages):
    lane_const = None
    def k(x_ref, o_ref):
        lane = jax.lax.broadcasted_iota(jnp.int32, (M, 128), 1)
        y = x_ref[:]
        for i in range(stages):
            z = pltpu.roll(y, 1, axis=1)
            y = jnp.where((lane & 1) == 0, jnp.minimum(y, z), jnp.maximum(y, z))
        o_ref[:] = y
    pc = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((M, 128), jnp.int32))
    return lambda y: pc(y)
p = bench("bitonic 10 stages/call (8192,128)", mk_bitonic(10), jnp.zeros((M, 128), jnp.int32), 30, 10 * E, "cmpex")

# lane gather
idxg = jnp.flip(jax.lax.broadcasted_iota(jnp.int32, (M, 128), 1), 1)
def mk_gather():
    def k(x_ref, i_ref, o_ref):
        y = x_ref[:]
        for _ in range(10):
            y = jnp.take_along_axis(y, i_ref[:], axis=1)
        o_ref[:] = y
    pc = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((M, 128), jnp.int32))
    return lambda y: pc(y, idxg)
bench("lane-gather x10/call (8192,128)", mk_gather(), jnp.zeros((M, 128), jnp.int32), 30, 10 * E)

# VPU 1-op
def mk_vpu():
    def k(x_ref, o_ref):
        y = x_ref[:]
        for _ in range(20):
            y = y + jnp.int32(1)
        o_ref[:] = y
    pc = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((M, 128), jnp.int32))
    return lambda y: pc(y)
bench("VPU add x20/call (8192,128)", mk_vpu(), jnp.zeros((M, 128), jnp.int32), 30, 20 * E, "op")

# MXU int8: y (1024,512) @ W (512,512), 10 chained per call
def mk_mxu8():
    W = jnp.eye(512, dtype=jnp.int8)
    def k(a_ref, w_ref, o_ref):
        y = a_ref[:]
        w = w_ref[:]
        for _ in range(10):
            y = jax.lax.dot_general(y, w, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.int32).astype(jnp.int8)
        o_ref[:] = y.astype(jnp.int32)
    pc = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((1024, 512), jnp.int32))
    return lambda y: pc(y.astype(jnp.int8), W).astype(jnp.int32) * 0 + y
bench("MXU int8 (1024,512)@(512,512) x10/call", mk_mxu8(),
      jnp.zeros((1024, 512), jnp.int32), 20, 10 * 1024 * 512 * 512, "mac")

# f32 MXU TRI-prefix style: (128,128)@(128,4096)
def mk_mxuf():
    W = jnp.tril(jnp.ones((128, 128), jnp.float32))
    def k(a_ref, w_ref, o_ref):
        y = a_ref[:]
        w = w_ref[:]
        for _ in range(10):
            y = jax.lax.dot_general(w, y, (((1,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32) * 0.007
        o_ref[:] = y
    pc = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((128, 4096), jnp.float32))
    return lambda y: pc(y, W)
bench("MXU f32 TRI (128,128)@(128,4096) x10/call", mk_mxuf(),
      jnp.zeros((128, 4096), jnp.float32), 20, 10 * 128 * 128 * 4096, "mac")

# DMA rates: copy (R,128) hbm->hbm in runs of `rows`, 16-deep pipeline
def mk_dma(ndma, rows):
    R = ndma * rows
    def k(x_hbm, o_hbm, sems):
        def startwait(i, _):
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(i * rows, rows), :],
                o_hbm.at[pl.ds(i * rows, rows), :], sems.at[i % 16]).start()
            @pl.when(i >= 16)
            def _():
                pltpu.make_async_copy(
                    x_hbm.at[pl.ds((i - 16) * rows, rows), :],
                    o_hbm.at[pl.ds((i - 16) * rows, rows), :], sems.at[(i - 16) % 16]).wait()
            return 0
        jax.lax.fori_loop(0, ndma, startwait, 0)
        def waittail(i, _):
            j = ndma - 16 + i
            pltpu.make_async_copy(
                x_hbm.at[pl.ds(j * rows, rows), :],
                o_hbm.at[pl.ds(j * rows, rows), :], sems.at[j % 16]).wait()
            return 0
        jax.lax.fori_loop(0, 16, waittail, 0)
    pc = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((16,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True))
    return pc

for nd, rw in [(4096, 1), (4096, 4), (2048, 16), (1024, 64), (256, 256), (64, 1024)]:
    f = mk_dma(nd, rw)
    x = jnp.zeros((nd * rw, 128), jnp.int32)
    per = bench(f"DMA {nd} x {rw}rows ({rw*0.5:.0f}KB each)", f, x, 10, nd, "dma")
    if per:
        bw = nd * rw * 128 * 4 * 2 / per / 1e9
        print(f"      -> {per/nd*1e6:.2f} us/dma, {bw:.0f} GB/s effective")

# plain big copy bandwidth via pipelined blockspec grid
def mk_copy(R, tile):
    def k(x_ref, o_ref):
        o_ref[:] = x_ref[:]
    pc = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((R, 128), jnp.int32),
        grid=(R // tile,),
        in_specs=[pl.BlockSpec((tile, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((tile, 128), lambda i: (i, 0)))
    return pc
R = 1 << 17  # 16M elements, 64MB
f = mk_copy(R, 2048)
per = bench("grid copy 64MB (tile 2048 rows)", f, jnp.zeros((R, 128), jnp.int32), 10, R * 128)
if per:
    print(f"      -> {R*128*4*2/per/1e9:.0f} GB/s")
