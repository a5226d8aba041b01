"""Remote-DMA exchange tests (parallel/remote_exchange.py) on the 8-device
virtual CPU mesh via Pallas TPU interpret mode.

The interpret machinery executes the REAL kernel — remote DMAs,
semaphores, per-source arrival masking — across the mesh devices, and
`detect_races=True` turns it into a race detector over the DMA/compute
schedule (the aux race-detection subsystem, SURVEY.md §5, applied to the
one component with genuine cross-agent hazards).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpusorting_tpu.parallel import dist_sort
from gpusorting_tpu.parallel.remote_exchange import remote_exchange

P = jax.sharding.PartitionSpec


def _run_exchange(send, counts, n_dev, num_ops, mesh, detect_races=False):
    fn = jax.jit(jax.shard_map(
        lambda s, c: remote_exchange(
            s.reshape(s.shape[1:]), c.reshape(-1), axis="x", n_dev=n_dev,
            num_ops=num_ops, detect_races=detect_races),
        mesh=mesh, in_specs=(P("x"), P("x")), out_specs=(P("x"), P("x")),
        check_vma=False))
    o_rows = send.shape[2]
    data, rc = fn(jnp.asarray(send), jnp.asarray(counts))
    return (np.asarray(data).reshape(n_dev, n_dev, o_rows, 128),
            np.asarray(rc).reshape(n_dev, n_dev))


def _reference(send, counts, num_ops, rows_per_op):
    """data[d, s] = send[s, d] masked at counts[s, d]."""
    n_dev = send.shape[0]
    pos = np.arange(rows_per_op * 128).reshape(rows_per_op, 128)
    data = np.empty_like(send)
    for d in range(n_dev):
        for s in range(n_dev):
            for o in range(num_ops):
                fill = 0xFFFFFFFF if o < 2 else 0
                rows = slice(o * rows_per_op, (o + 1) * rows_per_op)
                data[d, s, rows] = np.where(
                    pos < counts[s, d], send[s, d, rows], fill)
    return data, counts.T


def test_exchange_matches_reference(cpu_mesh):
    n_dev, num_ops, r = 8, 3, 2
    rng = np.random.RandomState(7)
    send = rng.randint(0, 1 << 31, size=(n_dev, n_dev, num_ops * r, 128)
                       ).astype(np.uint32)
    # counts cover: empty cell, partial, exactly full, sender-truncated
    counts = rng.randint(0, r * 128 + 100, size=(n_dev, n_dev)
                         ).astype(np.int32)
    counts[0, 1] = 0
    counts[2, 3] = r * 128
    counts[4, 5] = r * 128 + 57
    data, rc = _run_exchange(send, counts, n_dev, num_ops, cpu_mesh)
    exp_data, exp_rc = _reference(send, counts, num_ops, r)
    np.testing.assert_array_equal(rc, exp_rc)
    np.testing.assert_array_equal(data, exp_data)


def test_exchange_race_detector(cpu_mesh):
    """detect_races=True re-executes the schedule under the vector-clock
    race detector; a racy DMA/compute overlap raises inside the call."""
    n_dev, num_ops, r = 8, 2, 1
    rng = np.random.RandomState(3)
    send = rng.randint(0, 1 << 31, size=(n_dev, n_dev, num_ops * r, 128)
                       ).astype(np.uint32)
    counts = rng.randint(0, r * 128, size=(n_dev, n_dev)).astype(np.int32)
    data, rc = _run_exchange(send, counts, n_dev, num_ops, cpu_mesh,
                             detect_races=True)
    exp_data, exp_rc = _reference(send, counts, num_ops, r)
    np.testing.assert_array_equal(rc, exp_rc)
    np.testing.assert_array_equal(data, exp_data)


def test_distributed_sort_remote_dma_pairs(cpu_mesh):
    """End-to-end distributed pair sort over the remote-DMA exchange is
    bit-exact with the stable oracle (fixed cap => one kernel shape)."""
    n = 1 << 13
    keys = (jnp.arange(n, dtype=jnp.uint32)
            * jnp.uint32(2654435761)) & jnp.uint32(0xFF)
    vals = jnp.arange(n, dtype=jnp.uint32)
    cap = n // 8  # full shard bound: overflow structurally impossible
    (out_k, out_v), overflow = dist_sort.distributed_sort_gather(
        keys, vals, mesh=cpu_mesh, cap_elems=cap, exchange="remote_dma")
    assert overflow == 0
    perm = np.argsort(np.asarray(keys), kind="stable")
    np.testing.assert_array_equal(np.asarray(out_k), np.asarray(keys)[perm])
    np.testing.assert_array_equal(np.asarray(out_v), np.asarray(vals)[perm])


def test_distributed_sort_remote_dma_all_equal(cpu_mesh):
    """All-equal keys: one destination takes everything; the masking and
    truncation accounting must survive the degenerate split."""
    n = 1 << 12
    keys = jnp.full((n,), 42, jnp.uint32)
    cap = n // 8
    out, overflow = dist_sort.distributed_sort_gather(
        keys, mesh=cpu_mesh, cap_elems=cap, exchange="remote_dma")
    assert overflow == 0
    np.testing.assert_array_equal(np.asarray(out), np.asarray(keys))


def test_exchange_rejects_bad_shape(cpu_mesh):
    with pytest.raises(ValueError, match="bad send shape"):
        remote_exchange(jnp.zeros((8, 5, 128), jnp.uint32),
                        jnp.zeros((8,), jnp.int32), axis="x", n_dev=8,
                        num_ops=2)


def test_distributed_sort_remote_dma_cap_ladder(cpu_mesh):
    """Remote-DMA exchange under the on-device cap ladder: every rung's
    kernel lives in a lax.switch branch (pallas_call inside cond under
    interpret mode) and the picked rung must produce the exact output."""
    n = 1 << 12
    keys = (jnp.arange(n, dtype=jnp.uint32)
            * jnp.uint32(2246822519)) & jnp.uint32(0x3F)
    out, overflow = dist_sort.distributed_sort_gather(
        keys, mesh=cpu_mesh, exchange="remote_dma")
    assert overflow == 0
    np.testing.assert_array_equal(
        np.asarray(out), np.sort(np.asarray(keys), kind="stable"))
