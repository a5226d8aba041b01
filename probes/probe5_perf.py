"""Perf landscape on the real chip: XLA sort baseline, Pallas copy BW,
lane gather at scale, sub-row DMA, MXU throughput."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def timeit(fn, *args, iters=5):
    fn(*args)[0].block_until_ready() if isinstance(fn(*args), tuple) else jax.block_until_ready(fn(*args))
    t0 = time.perf_counter()
    for _ in range(iters):
        r = fn(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters


def try_case(name, fn):
    try:
        print(f"[OK ] {name}: {fn()}")
    except Exception as e:
        print(f"[ERR] {name}: {type(e).__name__}: {str(e).splitlines()[0][:140]}")


# ---- 1. XLA sort baseline at sizes ----
for logn in [20, 24, 26, 28]:
    n = 1 << logn
    try:
        x = jax.random.randint(jax.random.PRNGKey(0), (n,), 0, 1 << 30, dtype=jnp.int32).astype(jnp.uint32)
        f = jax.jit(lambda a: jax.lax.sort((a,), num_keys=1, is_stable=True)[0])
        dt = timeit(f, x, iters=3)
        print(f"[OK ] lax.sort n=2^{logn}: {dt*1e3:.1f} ms = {n/dt/1e9:.3f} Gkeys/s")
    except Exception as e:
        print(f"[ERR] lax.sort n=2^{logn}: {str(e).splitlines()[0][:100]}")

# ---- 2. Pallas streaming copy bandwidth (read+write) ----
def copy_kernel(x_ref, o_ref):
    o_ref[:] = x_ref[:]

def copy_bw(logn, rows_per_tile):
    n = 1 << logn
    R = n // 128
    x = jnp.arange(n, dtype=jnp.uint32).reshape(R, 128)
    f = jax.jit(lambda a: pl.pallas_call(
        copy_kernel,
        out_shape=jax.ShapeDtypeStruct((R, 128), jnp.uint32),
        grid=(R // rows_per_tile,),
        in_specs=[pl.BlockSpec((rows_per_tile, 128), lambda i: (i, 0))],
        out_specs=pl.BlockSpec((rows_per_tile, 128), lambda i: (i, 0)),
    )(a))
    dt = timeit(f, x)
    gb = 2 * n * 4 / 1e9
    return f"{dt*1e3:.2f} ms = {gb/dt:.0f} GB/s"

for rpt in [256, 1024, 4096]:
    try_case(f"pallas copy 2^26 tile={rpt}x128", functools.partial(copy_bw, 26, rpt))

# ---- 3. lane gather (take_along_axis axis=1) at scale ----
def lane_gather(M):
    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)
    x = jnp.arange(M * 128, dtype=jnp.uint32).reshape(M, 128)
    i = jnp.flip(jax.lax.broadcasted_iota(jnp.int32, (M, 128), 1), 1)
    f = jax.jit(lambda a, b: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((M, 128), jnp.uint32))(a, b))
    np.testing.assert_array_equal(np.asarray(f(x, i))[0, 0], 127)
    dt = timeit(f, x, i)
    return f"{dt*1e6:.0f} us = {M*128/dt/1e9:.2f} Gelem/s"

for M in [8, 512, 8192]:
    try_case(f"lane-gather ({M},128)", functools.partial(lane_gather, M))

# ---- 4. sub-row DMA: (1,k) dynamic lane start+size, HBM->HBM ----
def t_subrow():
    def k(s_ref, x_hbm, o_hbm, sem):
        st, n = s_ref[0], s_ref[1]
        cp = pltpu.make_async_copy(
            x_hbm.at[pl.ds(0, 1), pl.ds(st, n)],
            o_hbm.at[pl.ds(1, 1), pl.ds(st, n)], sem)
        cp.start(); cp.wait()
    x = jnp.arange(4 * 128, dtype=jnp.uint32).reshape(4, 128)
    s = jnp.array([3, 37], jnp.int32)
    r = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((4, 128), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True))(s, x)
    return np.asarray(r)[1, 3:6]
try_case("sub-row DMA (1,k) dyn lane start+size", t_subrow)

# ---- 5. many dynamic DMAs issue rate: 256 row-runs VMEM->HBM ----
def t_dma_rate():
    R, RUNS = 2048, 256
    def k(off_ref, x_ref, o_hbm, sem):
        def body(i, _):
            st = off_ref[i]
            cp = pltpu.make_async_copy(
                x_ref.at[pl.ds(i * (R // RUNS), R // RUNS), :],
                o_hbm.at[pl.ds(st, R // RUNS), :], sem)
            cp.start(); cp.wait()
            return 0
        jax.lax.fori_loop(0, RUNS, body, 0)
    x = jnp.arange(R * 128, dtype=jnp.uint32).reshape(R, 128)
    off = (jnp.flip(jnp.arange(RUNS, dtype=jnp.int32)) * (R // RUNS))
    f = jax.jit(lambda o, a: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((R, 128), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM), pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA(())],
        compiler_params=pltpu.CompilerParams(has_side_effects=True))(o, a))
    r = f(off, x)
    np.testing.assert_array_equal(np.asarray(r)[0, 0], (R - R // RUNS) * 128)
    dt = timeit(f, off, x)
    return f"{dt*1e6:.0f} us for {RUNS} seq DMAs of {(R//RUNS)*512}B = {dt/RUNS*1e6:.2f} us/DMA"
try_case("256 sequential dyn-start row DMAs", t_dma_rate)

# ---- 6. MXU int8 / bf16 matmul rate ----
def mm_rate(dt_in, dt_acc, M=4096, K=4096, N=4096):
    a = jnp.ones((M, K), dt_in)
    b = jnp.ones((K, N), dt_in)
    f = jax.jit(lambda x, y: jax.lax.dot_general(x, y, (((1,), (0,)), ((), ())),
                                                  preferred_element_type=dt_acc))
    dt = timeit(f, a, b)
    return f"{2*M*K*N/dt/1e12:.1f} Tflop/s"
try_case("matmul bf16", functools.partial(mm_rate, jnp.bfloat16, jnp.float32))
try_case("matmul int8->int32", functools.partial(mm_rate, jnp.int8, jnp.int32))

# ---- 7. in-kernel iota-compare one-hot + matmul histogram rate ----
def t_hist():
    R = 4096  # tile rows; 512K elements
    def k(x_ref, o_ref):
        x = x_ref[:]
        lo = (x & 15).astype(jnp.int8)
        hi = ((x >> 4) & 15).astype(jnp.int8)
        io = jax.lax.broadcasted_iota(jnp.int8, (1, 16), 1)
        oh_lo = (lo.reshape(R * 128 // 256, 256, 1) == io.reshape(1, 1, 16))
        # build (E,16) one-hots then (16,E)@(E,16) on MXU
        ohl = (lo.reshape(-1, 1) == jax.lax.broadcasted_iota(jnp.int8, (R * 128, 16), 1) * 0 + jax.lax.broadcasted_iota(jnp.int8, (R * 128, 16), 1)).astype(jnp.int8)
        ohh = (hi.reshape(-1, 1) == jax.lax.broadcasted_iota(jnp.int8, (R * 128, 16), 1)).astype(jnp.int8)
        o_ref[:] = jax.lax.dot_general(ohh.T, ohl, (((1,), (0,)), ((), ())),
                                       preferred_element_type=jnp.int32)
    x = jnp.arange(R * 128, dtype=jnp.int32).reshape(R, 128) & 255
    f = jax.jit(lambda a: pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((16, 16), jnp.int32))(a))
    r = np.asarray(f(x))
    assert r.sum() == R * 128, r.sum()
    dt = timeit(f, x)
    return f"{dt*1e6:.0f} us for {R*128} elems = {R*128/dt/1e9:.2f} Gelem/s histogram"
try_case("hist via nibble one-hot matmul (512K)", t_hist)
