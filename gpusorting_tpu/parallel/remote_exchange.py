"""Pallas remote-DMA all-to-all exchange for the distributed sort.

This is the BASELINE.json north-star exchange mechanism (SNIPPETS.md §1
pattern): instead of `lax.all_to_all`, every device posts one async remote
DMA per destination (`pltpu.make_async_remote_copy` over the ICI mesh) and
then processes arrivals source-by-source — the receive-side validity
masking for source s runs while transfers from later sources are still in
flight, so exchange and compute overlap *inside one kernel* rather than
relying on XLA's collective scheduler.

Design (one kernel, no grid):

  send side   for each dst (ring order, nearest neighbour first):
                - remote-copy the (1,128) count row   -> dst's rc output
                - remote-copy the (O*R,128) data block -> dst's data output
              the local row is two plain async copies.
  recv side   for k = 1..D-1, src = my_id - k:
                - wait count arrival, stage it in VMEM
                - wait data arrival (one byte-counted wait for the block)
                - mask the block in place, chunk by chunk, through a VMEM
                  scratch: element positions >= count are overwritten with
                  the operand's fill (sentinel for the two sort keys,
                  zero for payload planes)
              while this masking runs, DMAs from sources my_id-k-1.. are
              still in flight — that is the overlap.

Counts ride IN-BAND as a broadcast (1,128) row per (src,dst) cell, so the
kernel has no dependency on a prior `lax.all_to_all` of counts and returns
the receive-count matrix as a second output (the caller needs it anyway).

Semaphore budget: 2(D-1) send + 2D recv + 2 local DMA semaphores; fine for
the mesh sizes this layer targets (<=64 devices per axis).

Testable WITHOUT multi-chip hardware: under `pltpu.InterpretParams` the
whole kernel (remote DMAs, semaphores, arrival masking) executes on the
CPU mesh used by the test suite and the driver's multi-chip dry-run, and
`detect_races=True` turns the interpreter into a race detector over the
DMA/compute schedule (tests/test_remote_exchange.py).

Reference provenance: GPUSorting is single-GPU (SURVEY.md §2.7 — no comm
code anywhere); this layer exists for BASELINE.json configs[4]/north_star.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANES = 128
_SENTINEL = 0xFFFFFFFF
# Masking scratch height (rows of 128 lanes).  Compiled: 256 rows =
# 128 KiB of VMEM.  Interpret mode uses a SMALL scratch: the interpreter
# initializes scratch buffers with an in-program jnp.full whose
# materialization can deadlock XLA:CPU's multi-device schedule on
# low-core hosts once the fill is big enough to be a real scheduled op
# (measured on a 1-CPU host, 8-device mesh: 192 rows fine, 256 rows
# deadlocks at buffer allocation; single-device interpret kernels are
# unaffected because nothing cross-device waits on them).
_CHUNK_ROWS = 256
_CHUNK_ROWS_INTERPRET = 64


def _is_tpu() -> bool:
    try:
        return jax.devices()[0].platform == "tpu"
    except Exception:  # pragma: no cover - backend init failure
        return False


def _mask_block(data_ref, rc_vmem, scratch, sem, src, rows_per_op: int,
                num_ops: int, chunk_rows: int):
    """In-place mask of the (num_ops*rows_per_op, 128) block data_ref.at[src].

    Positions >= count (read from the staged rc row) get the operand fill.
    Chunked through `scratch` so VMEM stays bounded at any cap.
    """
    count = rc_vmem[0:1, :].astype(jnp.int32)  # (1,128) broadcast count
    for o in range(num_ops):
        fill = jnp.uint32(_SENTINEL if o < 2 else 0)
        base = o * rows_per_op
        done = 0
        while done < rows_per_op:
            cw = min(chunk_rows, rows_per_op - done)
            rows = slice(base + done, base + done + cw)
            cp_in = pltpu.make_async_copy(
                data_ref.at[src, rows], scratch.at[0:cw], sem)
            cp_in.start()
            cp_in.wait()
            pos = (lax.broadcasted_iota(jnp.int32, (cw, LANES), 0)
                   + done) * LANES + lax.broadcasted_iota(
                       jnp.int32, (cw, LANES), 1)
            masked = jnp.where(pos < count, scratch[0:cw], fill)
            scratch[0:cw] = masked
            cp_out = pltpu.make_async_copy(
                scratch.at[0:cw], data_ref.at[src, rows], sem)
            cp_out.start()
            cp_out.wait()
            done += cw


def _exchange_kernel(axis: str, n_dev: int, num_ops: int, rows_per_op: int,
                     chunk_rows: int,
                     send_ref, counts_ref, data_out, rc_out,
                     rc_vmem, scratch,
                     send_sems, csend_sems, recv_sems, crecv_sems,
                     local_sem, chunk_sem):
    my_id = lax.axis_index(axis)

    # ---- post everything: local copies + one (count,data) pair per peer
    loc_data = pltpu.make_async_copy(
        send_ref.at[my_id], data_out.at[my_id], local_sem)
    loc_data.start()
    loc_rc = pltpu.make_async_copy(
        counts_ref.at[pl.ds(my_id, 1)], rc_out.at[pl.ds(my_id, 1)], local_sem)
    loc_rc.start()
    for k in range(1, n_dev):
        dst = lax.rem(my_id + k, n_dev)
        pltpu.make_async_remote_copy(
            src_ref=counts_ref.at[pl.ds(dst, 1)],
            dst_ref=rc_out.at[pl.ds(my_id, 1)],
            send_sem=csend_sems.at[k - 1],
            recv_sem=crecv_sems.at[my_id],
            device_id=(dst,),
            device_id_type=pltpu.DeviceIdType.MESH,
        ).start()
        pltpu.make_async_remote_copy(
            src_ref=send_ref.at[dst],
            dst_ref=data_out.at[my_id],
            send_sem=send_sems.at[k - 1],
            recv_sem=recv_sems.at[my_id],
            device_id=(dst,),
            device_id_type=pltpu.DeviceIdType.MESH,
        ).start()

    # ---- own row: mask as soon as the local copies land
    loc_data.wait()
    loc_rc.wait()
    stage = pltpu.make_async_copy(
        rc_out.at[pl.ds(my_id, 1)], rc_vmem, local_sem)
    stage.start()
    stage.wait()
    _mask_block(data_out, rc_vmem, scratch, chunk_sem, my_id,
                rows_per_op, num_ops, chunk_rows)

    # ---- arrivals: process source-by-source while later DMAs fly.
    # Iteration k first retires OUR round-k sends (so every send is
    # drained before the kernel exits; under the interpreter's on_wait
    # DMA execution this is also what makes round-k sends execute before
    # anyone blocks on a round-k receive — deferring all wait_sends to
    # the end deadlocks the mesh there), then waits the round-k arrival.
    for k in range(1, n_dev):
        dst = lax.rem(my_id + k, n_dev)
        src = lax.rem(my_id + n_dev - k, n_dev)
        pltpu.make_async_remote_copy(
            src_ref=counts_ref.at[pl.ds(dst, 1)], dst_ref=rc_out.at[pl.ds(my_id, 1)],
            send_sem=csend_sems.at[k - 1], recv_sem=crecv_sems.at[my_id],
            device_id=(dst,), device_id_type=pltpu.DeviceIdType.MESH,
        ).wait_send()
        pltpu.make_async_remote_copy(
            src_ref=send_ref.at[dst], dst_ref=data_out.at[my_id],
            send_sem=send_sems.at[k - 1], recv_sem=recv_sems.at[my_id],
            device_id=(dst,), device_id_type=pltpu.DeviceIdType.MESH,
        ).wait_send()
        # wait the count row from src, stage it in VMEM
        pltpu.make_async_remote_copy(
            src_ref=counts_ref.at[pl.ds(my_id, 1)],
            dst_ref=rc_out.at[pl.ds(src, 1)],
            send_sem=csend_sems.at[k - 1],
            recv_sem=crecv_sems.at[src],
            device_id=(src,),
            device_id_type=pltpu.DeviceIdType.MESH,
        ).wait_recv()
        stage = pltpu.make_async_copy(rc_out.at[pl.ds(src, 1)], rc_vmem, local_sem)
        stage.start()
        stage.wait()
        # wait the data block from src, then mask it in place
        pltpu.make_async_remote_copy(
            src_ref=send_ref.at[my_id],
            dst_ref=data_out.at[src],
            send_sem=send_sems.at[k - 1],
            recv_sem=recv_sems.at[src],
            device_id=(src,),
            device_id_type=pltpu.DeviceIdType.MESH,
        ).wait_recv()
        _mask_block(data_out, rc_vmem, scratch, chunk_sem, src,
                    rows_per_op, num_ops, chunk_rows)


def remote_exchange(send: jnp.ndarray, counts: jnp.ndarray, *, axis: str,
                    n_dev: int, num_ops: int,
                    interpret: bool | None = None,
                    detect_races: bool = False):
    """All-to-all + receive-side masking via direct remote DMAs.

    Must be called INSIDE shard_map over `axis`.  Per device:

      send    (n_dev, num_ops*R, 128) u32 — row-blocked send matrix; the
              rows of operand o for destination d live at
              send[d, o*R:(o+1)*R, :], flattened row-major per cell
      counts  (n_dev,) int32/uint32 — elements destined to each device
              (values above the cell capacity mean sender truncation; the
              whole cell is then valid, which the masking honours)

    Returns (data, rc):
      data    (n_dev, num_ops*R, 128) u32 — block s = masked arrival from
              source s (positions >= rc[s] filled with 0xFFFFFFFF for
              operands 0,1 and 0 for the rest)
      rc      (n_dev,) uint32 — counts received from each source
    """
    if interpret is None:
        interpret = not _is_tpu()
    d, orows, lanes = send.shape
    if d != n_dev or lanes != LANES or orows % num_ops:
        raise ValueError(f"bad send shape {send.shape} for n_dev={n_dev}, "
                         f"num_ops={num_ops}")
    rows_per_op = orows // num_ops
    counts_row = jnp.broadcast_to(
        counts.astype(jnp.uint32)[:, None], (n_dev, LANES))

    chunk_rows = _CHUNK_ROWS_INTERPRET if interpret else _CHUNK_ROWS
    kernel = functools.partial(
        _exchange_kernel, axis, n_dev, num_ops, rows_per_op, chunk_rows)
    interp = False
    if interpret:
        interp = pltpu.InterpretParams(detect_races=detect_races)
    vma = frozenset({axis})
    data, rc = pl.pallas_call(
        kernel,
        out_shape=(
            jax.ShapeDtypeStruct((n_dev, orows, LANES), jnp.uint32, vma=vma),
            jax.ShapeDtypeStruct((n_dev, LANES), jnp.uint32, vma=vma),
        ),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=(pl.BlockSpec(memory_space=pl.ANY),
                   pl.BlockSpec(memory_space=pl.ANY)),
        scratch_shapes=[
            pltpu.VMEM((1, LANES), jnp.uint32),
            pltpu.VMEM((chunk_rows, LANES), jnp.uint32),
            pltpu.SemaphoreType.DMA((max(n_dev - 1, 1),)),
            pltpu.SemaphoreType.DMA((max(n_dev - 1, 1),)),
            pltpu.SemaphoreType.DMA((n_dev,)),
            pltpu.SemaphoreType.DMA((n_dev,)),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interp,
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
    )(send, counts_row)
    return data, rc[:, 0]
