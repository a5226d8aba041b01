#!/usr/bin/env python
"""Probe 14: does this Mosaic lower `pltpu.make_async_remote_copy`?

The remote-DMA exchange (parallel/remote_exchange.py) is interpret-tested
on the CPU mesh; this probe checks the COMPILED path on the 1 real chip:

  1. the module's D=1 degenerate kernel (local copies + VMEM RMW masking
     + semaphore arrays) under shard_map over a 1-device mesh
  2. a self-targeted make_async_remote_copy (device_id = own id) — the
     actual remote-copy op through the Mosaic lowering, executable on one
     chip because source and destination coincide

Either failing would be a new PROBES.md landmine for the exchange path.
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu
from jax.sharding import PartitionSpec as P

print("devices:", jax.devices(), flush=True)

# --- 1. module kernel, D=1 degenerate, compiled ---
from gpusorting_tpu.parallel.remote_exchange import remote_exchange

mesh = jax.make_mesh((1,), ("x",))
O, R = 3, 4
rng = np.random.RandomState(5)
send = rng.randint(0, 1 << 31, size=(1, O * R, 128)).astype(np.uint32)
counts = np.array([300], np.int32)

fn = jax.jit(jax.shard_map(
    lambda s, c: remote_exchange(s, c, axis="x", n_dev=1, num_ops=O),
    mesh=mesh, in_specs=(P("x"), P("x")), out_specs=(P("x"), P("x")),
    check_vma=False))
t0 = time.perf_counter()
data, rc = fn(jnp.asarray(send), jnp.asarray(counts))
data, rc = np.asarray(data), np.asarray(rc)
pos = np.arange(R * 128).reshape(R, 128)
ok = rc[0] == 300
for o in range(O):
    fill = 0xFFFFFFFF if o < 2 else 0
    exp = np.where(pos < 300, send[0, o * R:(o + 1) * R], fill)
    ok &= (data[0, o * R:(o + 1) * R] == exp).all()
print(f"[1] D=1 compiled module kernel: {'PASS' if ok else 'FAIL'} "
      f"({time.perf_counter()-t0:.1f}s incl compile)", flush=True)


# --- 2. self-targeted remote copy (true remote-DMA lowering) ---
def self_copy_kernel(x_ref, o_ref, send_sem, recv_sem):
    my_id = lax.axis_index("x")
    op = pltpu.make_async_remote_copy(
        src_ref=x_ref, dst_ref=o_ref, send_sem=send_sem, recv_sem=recv_sem,
        device_id=(my_id,), device_id_type=pltpu.DeviceIdType.MESH)
    op.start()
    op.wait()


def self_copy(x):
    return pl.pallas_call(
        self_copy_kernel,
        out_shape=jax.ShapeDtypeStruct((8, 128), jnp.uint32,
                                       vma=frozenset({"x"})),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[pltpu.SemaphoreType.DMA, pltpu.SemaphoreType.DMA],
    )(x)


x = jnp.arange(8 * 128, dtype=jnp.uint32).reshape(8, 128)
t0 = time.perf_counter()
try:
    out = jax.jit(jax.shard_map(
        self_copy, mesh=mesh, in_specs=P("x"), out_specs=P("x"),
        check_vma=False))(x)
    ok2 = (np.asarray(out) == np.asarray(x)).all()
    print(f"[2] self-targeted make_async_remote_copy: "
          f"{'PASS' if ok2 else 'FAIL (wrong data)'} "
          f"({time.perf_counter()-t0:.1f}s)", flush=True)
except Exception as e:  # noqa: BLE001 - probe records the failure mode
    print(f"[2] self-targeted make_async_remote_copy: CRASH {e!r:.300}",
          flush=True)
