"""Distributed multi-device sort: sampled splitters + all-to-all exchange.

This layer has NO reference counterpart — GPUSorting is strictly single-GPU
(SURVEY.md §2.7: no NCCL/MPI anywhere).  It implements the BASELINE.json
north-star design:

  1. every device draws a strided sample of its local key codes; samples are
     all-gathered and sorted; D-1 quantile splitters define code ranges
  2. each element's destination device = searchsorted(splitters, code);
     equal codes always map to one device, so stability reduces to carrying
     the global index as a tiebreaker
  3. a padded bucket matrix rides `lax.all_to_all` over the mesh axis (ICI);
     oversampling plus a slack factor bounds bucket overflow, and an
     on-device overflow counter reports capacity violations
  4. each device stably sorts its received range locally (per-chip radix /
     XLA path) by (code, global index)

Output convention: each device holds a sorted, left-packed (cap,)-padded
range plus a valid count; concatenating valid prefixes in device order yields
the globally sorted array.  `distributed_sort_gather` materializes that
(for tests / small n).

Works on any mesh, including the CPU `--xla_force_host_platform_device_count`
mesh used by the test suite and the driver's multi-chip dry-run.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..core import codec
from ..ops import xla_sort

_SENTINEL = jnp.uint32(0xFFFFFFFF)


def make_mesh(n_devices: int | None = None, axis: str = "x") -> Mesh:
    devs = jax.devices()
    n = n_devices or len(devs)
    return jax.make_mesh(
        (n,), (axis,), axis_types=(jax.sharding.AxisType.Auto,)
    )


def _splitters_from_sample(sample_codes: jnp.ndarray,
                           sample_gidx: jnp.ndarray, n_dev: int):
    """(code, global-index) quantile splitters.

    The index tiebreak makes the splitter key a TOTAL order, so duplicate-
    heavy keys (zipf, low-entropy presets) still split evenly across devices
    instead of landing on one — the load-balance property that lets the
    per-(src,dst) bucket capacity be ~n_local/D instead of ~n_local.
    Stability survives: device ranges are lexicographic (code, gidx) ranges,
    so concatenating per-device stable sorts yields the global stable order.
    """
    sc, sg = jax.lax.sort((sample_codes, sample_gidx), num_keys=2,
                          is_stable=False)
    m = sc.shape[0]
    idx = (jnp.arange(1, n_dev, dtype=jnp.int32) * m) // n_dev
    return sc[idx], sg[idx]


def _bucket_of(codes: jnp.ndarray, gidx: jnp.ndarray,
               spl_c: jnp.ndarray, spl_g: jnp.ndarray) -> jnp.ndarray:
    """Destination device id in [0, D): count of splitters <= (code, gidx).

    Broadcast-compare sum instead of searchsorted: D-1 vectorized compares
    beat TPU's per-element binary search (PROBES.md) for small D.
    """
    ge = (codes[None, :] > spl_c[:, None]) | (
        (codes[None, :] == spl_c[:, None]) & (gidx[None, :] >= spl_g[:, None]))
    return jnp.sum(ge, axis=0, dtype=jnp.int32)


def _pack_buckets(codes, aux, bucket, n_dev: int, cap: int):
    """Scatter local elements into a (n_dev, cap) padded send matrix.

    Returns (send_codes, send_aux..., overflow_count).  Elements are packed
    in local order within each bucket (stability preserved via the carried
    global index anyway).
    """
    n = codes.shape[0]
    # rank of each element within its bucket, in local order:
    # stable sort by bucket, then position-in-run
    order = jnp.argsort(bucket, stable=True)
    sorted_bucket = bucket[order]
    pos = jnp.arange(n, dtype=jnp.int32)
    # first index of each bucket run via a running max over change points
    # (replaces searchsorted: TPU binary-searches per element)
    change = jnp.concatenate(
        [jnp.ones((1,), jnp.bool_), sorted_bucket[1:] != sorted_bucket[:-1]])
    run_start = jax.lax.associative_scan(jnp.maximum, jnp.where(change, pos, 0))
    rank_sorted = pos - run_start
    rank = jnp.zeros((n,), jnp.int32).at[order].set(rank_sorted)

    overflow = jnp.sum(rank >= cap, dtype=jnp.uint32)
    slot = jnp.clip(rank, 0, cap - 1)
    flat = bucket * cap + slot

    def scatter(x, fill):
        buf = jnp.full((n_dev * cap,), fill, x.dtype)
        # drop overflowed elements rather than corrupting slot cap-1
        keep = rank < cap
        return buf.at[jnp.where(keep, flat, n_dev * cap)].set(
            x, mode="drop"
        ).reshape(n_dev, cap)

    send_codes = scatter(codes, _SENTINEL)
    # pad gidx with the max index so pad rows sort AFTER real elements even
    # when a real key's code is 0xFFFFFFFF (legal u32 max)
    send_aux = (scatter(aux[0], _SENTINEL),) + tuple(
        scatter(a, jnp.zeros((), a.dtype)) for a in aux[1:])
    # exact per-destination send counts (replaces sentinel-based counting,
    # which miscounts real 0xFFFFFFFF keys as padding)
    dst = jax.lax.broadcasted_iota(jnp.int32, (n_dev, bucket.shape[0]), 0)
    send_counts = jnp.sum(bucket[None, :] == dst, axis=1, dtype=jnp.uint32)
    return send_codes, send_aux, send_counts, overflow


def _local_shard_sort(codes, gidx, payload, spl_c, spl_g, n_dev, cap, axis):
    """Body run per device under shard_map."""
    me = jax.lax.axis_index(axis)
    n_local = codes.shape[0]

    bucket = _bucket_of(codes, gidx, spl_c, spl_g)
    aux = (gidx,) if payload is None else (gidx, payload)
    send_c, send_aux, send_counts, overflow = _pack_buckets(
        codes, aux, bucket, n_dev, cap)

    recv_c = jax.lax.all_to_all(send_c, axis, 0, 0, tiled=True)
    recv_aux = tuple(
        jax.lax.all_to_all(a, axis, 0, 0, tiled=True) for a in send_aux
    )
    # column `me` of the (src, dst) count matrix, summed across sources
    recv_counts = jax.lax.all_to_all(send_counts, axis, 0, 0, tiled=True)

    rc = recv_c.reshape(-1)
    rg = recv_aux[0].reshape(-1)
    # stable order: (code, original global index); pads carry max gidx so
    # they sort last even among real max-code keys
    ops_in = (rc, rg) + tuple(a.reshape(-1) for a in recv_aux[1:])
    out = jax.lax.sort(ops_in, num_keys=2, is_stable=False)
    count = jnp.sum(recv_counts, dtype=jnp.uint32)
    total_overflow = jax.lax.psum(overflow, axis)
    return out, count, total_overflow


def distributed_sort(
    keys: jnp.ndarray,
    values: jnp.ndarray | None = None,
    mesh: Mesh | None = None,
    axis: str = "x",
    oversample: int = 32,
    slack: float = 2.0,
):
    """Sort a globally sharded key (and optional payload) array.

    `keys` is 1-D with length divisible by the mesh size.  Returns
    (sorted_codes_padded [D*cap], global_index [D*cap], payload or None,
    counts [D], overflow_total) with device-sharded leading axes; see module
    docstring for the output convention.
    """
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    n = keys.shape[0]
    if n % n_dev:
        raise ValueError(f"n={n} must be divisible by mesh size {n_dev}")
    n_local = n // n_dev
    # Per-(src,dst) bucket capacity.  Tie-broken splitters balance loads to
    # ~n_local/D per DESTINATION, but a single (src,dst) cell can still hold
    # all n_local elements of a source (pre-sorted or all-equal input maps a
    # device's whole contiguous gidx range to one destination), so the cell
    # cap must be n_local to guarantee zero drops.  `slack` only pads the
    # receive-side sort width.
    cap = max(128, -(-n_local // 128) * 128)

    kt = codec.key_type_of(keys)
    codes = codec.encode_keys(keys)
    gidx = jnp.arange(n, dtype=jnp.uint32)
    pbits = None if values is None else codec.payload_to_bits(values)

    # splitters from a global sample (computed replicated, outside shard_map)
    stride = max(1, n // (n_dev * oversample))
    spl_c, spl_g = _splitters_from_sample(
        codes[::stride], gidx[::stride], n_dev)

    spec = P(axis)
    rep = P()

    def body(codes_l, gidx_l, *rest):
        payload_l = rest[0] if values is not None else None
        spl_c_l, spl_g_l = rest[-2], rest[-1]
        out, count, overflow = _local_shard_sort(
            codes_l, gidx_l, payload_l, spl_c_l, spl_g_l, n_dev, cap, axis
        )
        return out + (count[None], overflow[None])

    in_specs = [spec, spec] + ([spec] if values is not None else []) + [rep, rep]
    n_out = 3 if values is None else 4
    out_specs = tuple([spec] * (n_out - 1)) + (spec, spec)

    args = [codes, gidx] + ([pbits] if values is not None else []) + [spl_c, spl_g]
    results = jax.shard_map(
        body, mesh=mesh, in_specs=tuple(in_specs), out_specs=out_specs
    )(*args)

    sorted_codes = results[0]
    sorted_gidx = results[1]
    sorted_payload = results[2] if values is not None else None
    counts = results[-2]
    overflow = results[-1]
    return {
        "codes": sorted_codes,
        "global_index": sorted_gidx,
        "payload_bits": sorted_payload,
        "counts": counts,
        "overflow": overflow,
        "cap": cap,
        "key_type": kt,
        "n": n,
    }


def distributed_sort_gather(keys, values=None, mesh=None, **kw):
    """Run distributed_sort and materialize the dense global result (tests)."""
    res = distributed_sort(keys, values, mesh=mesh, **kw)
    codes = np.asarray(res["codes"])
    counts = np.asarray(res["counts"])
    cap = res["cap"]
    n_dev = counts.shape[0]
    chunk = n_dev * cap  # each device holds a sorted (n_dev*cap,) range
    parts_k, parts_v = [], []
    payload = (
        np.asarray(res["payload_bits"]) if res["payload_bits"] is not None else None
    )
    for d in range(n_dev):
        c = int(counts[d])
        parts_k.append(codes[d * chunk : d * chunk + c])
        if payload is not None:
            parts_v.append(payload[d * chunk : d * chunk + c])
    out_codes = jnp.asarray(np.concatenate(parts_k))
    out_k = codec.decode_keys(out_codes, res["key_type"])
    if values is None:
        return out_k, int(np.asarray(res["overflow"])[0])
    out_v = codec.bits_to_payload(jnp.asarray(np.concatenate(parts_v)), values.dtype)
    return (out_k, out_v), int(np.asarray(res["overflow"])[0])
