"""Distributed multi-device sort: sampled splitters + all-to-all exchange.

This layer has NO reference counterpart — GPUSorting is strictly single-GPU
(SURVEY.md §2.7: no NCCL/MPI anywhere).  It implements the BASELINE.json
north-star design:

  1. every device draws a strided sample of its local key codes; samples are
     all-gathered and sorted; D-1 quantile splitters — tie-broken by global
     index — define lexicographic (code, gidx) ranges, one per device
  2. each device STABLY SORTS ITS SHARD LOCALLY first; destination ranges
     are then CONTIGUOUS RUNS of the sorted shard, so building the send
     matrix is D dynamic slices — no gather, no scatter, no argsort (XLA's
     scatter paths run at ~0.1 Gelem/s on TPU, probes/PROBES.md; the
     round-1 argsort+scatter packer was correctness-only)
  3. the (D, cap) send matrix rides `lax.all_to_all` over the mesh axis
     (ICI).  With `cap_elems=None` (default) the capacity is computed EXACTLY
     first (a tiny per-cell count matrix + host max), so overflow is
     structurally impossible; a fixed integer cap skips that sync and
     reports overflow, and `distributed_sort_gather` retries with a doubled
     cap rather than ever returning dropped elements
  4. each device merges its received runs with one local sort by
     (code, global index) — stability reduces to the gidx tiebreak

Output convention: each device holds a sorted, left-packed (D*cap,)-padded
range plus a valid count; concatenating valid prefixes in device order
yields the globally sorted array.  `distributed_sort_gather` materializes
that (for tests / small n).

Works on any mesh, including the CPU `--xla_force_host_platform_device_count`
mesh used by the test suite and the driver's multi-chip dry-run.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from ..core import codec

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
    instead of landing on one.  Stability survives: device ranges are
    lexicographic (code, gidx) ranges, so concatenating per-device stable
    sorts yields the global stable order.
    """
    sc, sg = jax.lax.sort((sample_codes, sample_gidx), num_keys=2,
                          is_stable=False)
    m = sc.shape[0]
    idx = (jnp.arange(1, n_dev, dtype=jnp.int32) * m) // n_dev
    return sc[idx], sg[idx]


def _cell_counts(codes, gidx, spl_c, spl_g, n_dev: int) -> jnp.ndarray:
    """(D,) counts of local elements destined to each device.

    Destination = number of splitters <= (code, gidx); counts come from
    D-1 vectorized compare-reductions (no searchsorted: TPU binary-searches
    per element, PROBES.md).
    """
    at_or_above = (codes[None, :] > spl_c[:, None]) | (
        (codes[None, :] == spl_c[:, None]) &
        (gidx[None, :] >= spl_g[:, None]))
    above = jnp.sum(at_or_above, axis=1, dtype=jnp.int32)     # (D-1,)
    n = jnp.int32(codes.shape[0])
    # boundary[d] = first element index of destination d = n - above[d-1]
    bounds = jnp.concatenate([
        jnp.zeros((1,), jnp.int32), n - above,
        jnp.full((1,), n, jnp.int32)])
    return bounds[1:] - bounds[:-1]


def _local_phase1(codes, gidx, payload, spl_c, spl_g, n_dev):
    """Sort the shard by (code, gidx); return sorted ops + cell counts."""
    ops_in = (codes, gidx) + (() if payload is None else (payload,))
    out = jax.lax.sort(ops_in, num_keys=2, is_stable=False)
    counts = _cell_counts(out[0], out[1], spl_c, spl_g, n_dev)
    return out, counts


def _pack_and_exchange(sorted_ops, counts, n_dev: int, cap: int, axis):
    """Slice contiguous destination runs into (D, cap), exchange, merge."""
    bounds = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), jnp.cumsum(counts)])
    pos = jax.lax.broadcasted_iota(jnp.int32, (n_dev, cap), 1)
    overflow = jnp.sum(
        jnp.maximum(counts - cap, 0).astype(jnp.uint32))

    def pack(x, fill):
        xp = jnp.concatenate([x, jnp.full((cap,), fill, x.dtype)])
        rows = [jax.lax.dynamic_slice_in_dim(xp, bounds[d], cap)
                for d in range(n_dev)]
        mat = jnp.stack(rows)
        return jnp.where(pos < counts[:, None], mat, fill)

    send = [pack(sorted_ops[0], _SENTINEL),
            pack(sorted_ops[1], _SENTINEL)]
    send += [pack(x, jnp.zeros((), x.dtype)) for x in sorted_ops[2:]]

    recv = [jax.lax.all_to_all(s, axis, 0, 0, tiled=True) for s in send]
    recv_counts = jax.lax.all_to_all(
        counts.astype(jnp.uint32), axis, 0, 0, tiled=True)

    flat = [r.reshape(-1) for r in recv]
    out = jax.lax.sort(tuple(flat), num_keys=2, is_stable=False)
    # overflowed cells were truncated at cap on the send side
    count = jnp.sum(jnp.minimum(recv_counts, jnp.uint32(cap)),
                    dtype=jnp.uint32)
    total_overflow = jax.lax.psum(overflow, axis)
    return out, count, total_overflow


def distributed_sort(
    keys: jnp.ndarray,
    values: jnp.ndarray | None = None,
    mesh: Mesh | None = None,
    axis: str = "x",
    oversample: int = 32,
    cap_elems: int | None = None,
):
    """Sort a globally sharded key (and optional payload) array.

    `keys` is 1-D with length divisible by the mesh size.  With
    `cap_elems=None` the per-(src,dst) cell capacity is measured exactly
    before the exchange (one tiny collective + host scalar), so no element
    can ever be dropped; an integer `cap_elems` (rounded up to a 128-lane
    row multiple, matching the exact-cap path) skips that round trip and
    reports `overflow` instead (see distributed_sort_gather for the retry
    discipline).  Returns a dict; see module docstring for the output
    convention.
    """
    mesh = mesh or make_mesh()
    n_dev = mesh.devices.size
    n = keys.shape[0]
    if n % n_dev:
        raise ValueError(f"n={n} must be divisible by mesh size {n_dev}")

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
    has_payload = values is not None

    def phase1(codes_l, gidx_l, *rest):
        payload_l = rest[0] if has_payload else None
        spl_c_l, spl_g_l = rest[-2], rest[-1]
        sorted_ops, counts = _local_phase1(
            codes_l, gidx_l, payload_l, spl_c_l, spl_g_l, n_dev)
        return sorted_ops + (counts,)

    n_sorted = 3 if has_payload else 2
    in_specs = [spec, spec] + ([spec] if has_payload else []) + [rep, rep]
    args = [codes, gidx] + ([pbits] if has_payload else []) + [spl_c, spl_g]
    p1 = jax.shard_map(
        phase1, mesh=mesh, in_specs=tuple(in_specs),
        out_specs=tuple([spec] * n_sorted) + (spec,),
    )(*args)
    sorted_ops, counts = p1[:n_sorted], p1[n_sorted]

    if cap_elems is None:
        try:
            # exact capacity: overflow structurally impossible
            cell_max = int(np.asarray(jnp.max(counts)))
            cap = max(128, -(-cell_max // 128) * 128)
        except (jax.errors.ConcretizationTypeError,
                jax.errors.TracerArrayConversionError):
            # under an outer jit the counts are traced and the shape must
            # be static: fall back to the never-drop bound (a cell can
            # hold at most the whole source shard)
            cap = max(128, -(-(n // n_dev) // 128) * 128)
    else:
        cap = max(128, -(-int(cap_elems) // 128) * 128)

    def phase2(counts_l, *ops_l):
        out, count, ovf = _pack_and_exchange(
            ops_l, counts_l.reshape(-1), n_dev, cap, axis)
        return out, count[None], ovf[None]

    results = jax.shard_map(
        phase2, mesh=mesh,
        in_specs=tuple([spec] * (1 + n_sorted)),
        out_specs=(tuple([spec] * n_sorted), spec, spec),
    )(counts, *sorted_ops)

    out, count, overflow = results
    return {
        "codes": out[0],
        "global_index": out[1],
        "payload_bits": out[2] if has_payload else None,
        "counts": count,
        "overflow": overflow,
        "cap": cap,
        "key_type": kt,
        "n": n,
    }


def distributed_sort_gather(keys, values=None, mesh=None, **kw):
    """Run distributed_sort and materialize the dense global result.

    Never returns dropped data: if a fixed `cap_elems` overflows, the cap is
    doubled and the sort re-run (ending at the exact-cap mode).
    """
    attempts = 0
    while True:
        res = distributed_sort(keys, values, mesh=mesh, **kw)
        if int(np.asarray(res["overflow"])[0]) == 0:
            break
        attempts += 1
        cap = kw.get("cap_elems")
        kw["cap_elems"] = None if cap is None or attempts > 4 else 2 * cap
    codes = np.asarray(res["codes"])
    counts = np.asarray(res["counts"])
    cap = res["cap"]
    n_dev = counts.shape[0]
    chunk = n_dev * cap  # each device holds a sorted (n_dev*cap,) range
    parts_k, parts_v = [], []
    payload = (
        np.asarray(res["payload_bits"])
        if res["payload_bits"] is not None else None
    )
    for d in range(n_dev):
        c = int(counts[d])
        parts_k.append(codes[d * chunk: d * chunk + c])
        if payload is not None:
            parts_v.append(payload[d * chunk: d * chunk + c])
    out_codes = jnp.asarray(np.concatenate(parts_k))
    out_k = codec.decode_keys(out_codes, res["key_type"])
    overflow = int(np.asarray(res["overflow"])[0])
    if values is None:
        return out_k, overflow
    out_v = codec.bits_to_payload(
        jnp.asarray(np.concatenate(parts_v)), values.dtype)
    return (out_k, out_v), overflow
