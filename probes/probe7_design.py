"""Design-driving microbenchmarks, all with chained in-jit iteration to beat
the ~11ms dispatch overhead of the axon tunnel."""
import functools
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def chain_time(name, make_fn, x, iters=20, per_iter_items=None, unit="elem"):
    """make_fn() -> f(y)->y ; time K chained applications inside one jit."""
    try:
        f = make_fn()

        @jax.jit
        def run(y):
            return jax.lax.fori_loop(0, iters, lambda i, a: f(a), y)

        r = run(x)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = run(x)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / iters
        msg = f"{dt*1e3:.3f} ms/iter"
        if per_iter_items:
            msg += f" = {per_iter_items/dt/1e9:.2f} G{unit}/s"
        print(f"[OK ] {name}: {msg}")
    except Exception as e:
        print(f"[ERR] {name}: {type(e).__name__}: {str(e).splitlines()[0][:130]}")


N = 1 << 24

# 1. XLA gather 1D random
idx = jax.random.randint(jax.random.PRNGKey(1), (N,), 0, N, dtype=jnp.int32)
x = jnp.arange(N, dtype=jnp.uint32)
chain_time("XLA gather x[idx] 2^24", lambda: (lambda y: y[idx] + 1), x, 5, N)

# 2. XLA scatter 1D
perm = jax.random.permutation(jax.random.PRNGKey(2), N).astype(jnp.int32)
chain_time(
    "XLA scatter .at[perm].set 2^24",
    lambda: (lambda y: jnp.zeros_like(y).at[perm].set(y)), x, 3, N)

# 3. VPU baseline: chained adds on (131072,128) = 2^24
x2 = jnp.zeros((N // 128, 128), jnp.uint32)
def mk_vpu():
    def f(y):
        for _ in range(10):
            y = y + jnp.uint32(1)
        return y
    return f
chain_time("VPU 10 adds on 2^24 (per-add rate)", mk_vpu, x2, 20, 10 * N, "op")

# 4. Pallas lane-gather chained: (8192,128) within-row permute
M = 8192
gidx = jnp.flip(jax.lax.broadcasted_iota(jnp.int32, (M, 128), 1), 1)
def mk_lg():
    def k(x_ref, i_ref, o_ref):
        o_ref[:] = jnp.take_along_axis(x_ref[:], i_ref[:], axis=1)
    pc = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((M, 128), jnp.uint32))
    return lambda y: pc(y, gidx)
chain_time(f"pallas lane-gather ({M},128)", mk_lg, jnp.zeros((M, 128), jnp.uint32), 50, M * 128)

# 5. Pallas bitonic stage cost: roll+min/max+select on (8192,128)
def mk_bstage():
    def k(x_ref, o_ref):
        y = x_ref[:]
        for s in [1, 2, 4]:
            z = pltpu.roll(y, s, axis=1)
            lo = jnp.minimum(y, z)
            hi = jnp.maximum(y, z)
            lane = jax.lax.broadcasted_iota(jnp.int32, y.shape, 1)
            y = jnp.where((lane & s) == 0, lo, hi)
        o_ref[:] = y
    pc = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((M, 128), jnp.uint32))
    return lambda y: pc(y)
chain_time("pallas 3 bitonic stages (8192,128) per-stage", mk_bstage,
           jnp.zeros((M, 128), jnp.uint32), 30, 3 * M * 128, "cmpex")

# 6. one-hot16 + lane log-prefix cost on (2048,128)
R = 2048
def mk_oh():
    def k(x_ref, o_ref):
        d = (x_ref[:] & jnp.uint32(15)).astype(jnp.int32)
        acc = jnp.zeros((R, 128), jnp.int32)
        for dd in range(16):
            oh = (d == dd).astype(jnp.int32)
            # lane exclusive prefix: 7 log steps
            p = oh
            for s in [1, 2, 4, 8, 16, 32, 64]:
                sh = pltpu.roll(p, s, axis=1)
                lane = jax.lax.broadcasted_iota(jnp.int32, p.shape, 1)
                p = p + jnp.where(lane >= s, sh, 0)
            acc = acc + jnp.where(d == dd, p - oh, 0)
        o_ref[:] = acc.astype(jnp.uint32)
    pc = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((R, 128), jnp.uint32))
    return lambda y: pc(y)
chain_time("onehot16+laneprefix (2048,128)", mk_oh, jnp.zeros((R, 128), jnp.uint32), 20, R * 128)

# 7. pipelined DMA issue rate: 128 starts then waits (VMEM->HBM rows)
def mk_dma(n_dmas, rows_each):
    RR = n_dmas * rows_each
    xsrc = jnp.zeros((RR, 128), jnp.uint32)
    off = jnp.flip(jnp.arange(n_dmas, dtype=jnp.int32)) * rows_each
    def k(off_ref, x_ref, o_hbm, sems):
        def start(i, _):
            pltpu.make_async_copy(
                x_ref.at[pl.ds(i * rows_each, rows_each), :],
                o_hbm.at[pl.ds(off_ref[i], rows_each), :],
                sems.at[i]).start()
            return 0
        jax.lax.fori_loop(0, n_dmas, start, 0)
        def wait(i, _):
            pltpu.make_async_copy(
                x_ref.at[pl.ds(i * rows_each, rows_each), :],
                o_hbm.at[pl.ds(off_ref[i], rows_each), :],
                sems.at[i]).wait()
            return 0
        jax.lax.fori_loop(0, n_dmas, wait, 0)
    pc = pl.pallas_call(
        k, out_shape=jax.ShapeDtypeStruct((RR, 128), jnp.uint32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA((n_dmas,))],
        compiler_params=pltpu.CompilerParams(has_side_effects=True))
    return lambda y: pc(off, y)
for nd, re in [(128, 4), (128, 32), (256, 16)]:
    chain_time(f"pipelined {nd} DMAs x {re} rows", functools.partial(mk_dma, nd, re),
               jnp.zeros((nd * re, 128), jnp.uint32), 20, nd, "dma")

# 8. MXU TRI prefix: (128,128) @ (128, 2048*16) bf16
def mk_tri():
    TRI = jnp.tril(jnp.ones((128, 128), jnp.bfloat16), -1)
    def k(x_ref, o_ref):
        o_ref[:] = jax.lax.dot_general(
            TRI, x_ref[:], (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
    pc = pl.pallas_call(k, out_shape=jax.ShapeDtypeStruct((128, 32768), jnp.float32))
    return lambda y: pc(y.astype(jnp.bfloat16)).astype(jnp.bfloat16)
chain_time("MXU TRI (128,128)@(128,32768)", mk_tri,
           jnp.zeros((128, 32768), jnp.bfloat16), 20, 128 * 32768 * 128, "mac")

# 9. VMEM size probe
for mb in [16, 32, 64, 100, 120]:
    try:
        rows = mb * (1 << 20) // (128 * 4)
        def k(o_ref, scr):
            scr[0, :] = jnp.zeros((128,), jnp.uint32)
            o_ref[:] = scr[0:1, :]
        r = pl.pallas_call(
            k, out_shape=jax.ShapeDtypeStruct((1, 128), jnp.uint32),
            scratch_shapes=[pltpu.VMEM((rows, 128), jnp.uint32)],
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=128 << 20))()
        jax.block_until_ready(r)
        print(f"[OK ] VMEM scratch {mb} MB")
    except Exception as e:
        print(f"[ERR] VMEM scratch {mb} MB: {str(e).splitlines()[0][:90]}")
