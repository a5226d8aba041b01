"""Splitsweep — splitter-partition + sub-sort hybrid (flagship candidate).

Why this shape: on this part every sort is VPU-bound and XLA's flat sort
decays log-quadratically with n (2.65 Gkeys/s at 2^18 down to 0.575 at
2^28 — benches/RESULTS.md), while the native binning pass moves all data at
a roughly size-independent per-element cost.  So the fastest full sort
splits the array ONCE (or twice) into balanced buckets with the native
pass, then runs the sub-sorts at the size where the underlying sort
primitive is at its sweet spot — a sample-sort whose "local sort" is XLA's
own network, exactly how the reference leans on CUB block primitives inside
its own kernels.

Mechanism (keys-only):
  1. splitters: a strided sample of (code, position) pairs, sorted; 15
     quantiles.  The POSITION tiebreak makes splitters a total order, so
     duplicate-heavy inputs (Thearling-Smith presets, all-equal keys) still
     split into balanced buckets — and concatenating bucket ranges in
     order remains correct because equal codes split by position.
  2. bucketize: 15 fused compare-accumulates (no searchsorted — PROBES.md).
  3. partition: the radix16 binning kernel with EXTERNAL packed rows
     (bucket<<7 | lane, row-sorted by XLA) and row-aligned bucket regions
     (base_d = d * cap); the final partial-row flush plain-writes since
     each output row belongs to exactly one bucket.
  4. gap masking: positions >= count_d become 0xFFFFFFFF sentinels.
  5. sub-sorts: lax.map of XLA flat sorts over the (16, cap) regions.
     One level leaves ~2^24 buckets (XLA at 0.94 G); two levels reach
     ~2^20 (XLA at 2.2 G) by recursing the same machinery inside each
     bucket.
  6. assembly: ops.stitch.compact drops the per-bucket sentinel tails.

Bucket capacity is STATIC (slack over n/16).  The position tiebreak bounds
bucket skew by sampling error only; the sample scales with n and
`oversample` controls the tail.  Overflow is handled IN-GRAPH (round 3): a
`lax.cond` on max(counts) > cap routes pathological samples to an exact
flat-sort fallback, so the engine is safe under jit — it can never
truncate buckets (the round-2 behavior; VERDICT r2 weak #2).

Reference analog: none structurally (OneSweep.cu is a pure LSD engine);
this plays the flagship role OneSweep plays — the engine AUTO should pick
when it wins the headline benchmark.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from . import stitch
from .radix16 import (
    LANES,
    NBUCKETS,
    _build_pass,
    _is_tpu,
    _within_row_sort_schedule,
)

_SENTINEL = jnp.uint32(0xFFFFFFFF)


def _sample_splitters(codes, pos, oversample: int):
    n = codes.shape[0]
    # scale the sample with n (advisor r2: a fixed 1024-element sample
    # leaves a non-negligible overflow tail at 2^24+); the sample sort is
    # O(m log m) on m <= 2^16 — negligible against the partition pass
    m = min(n, max(NBUCKETS * oversample, min(65536, n // 256)))
    # multiplicative-hash sample positions: a fixed stride aliases with
    # periodic inputs (e.g. every 3rd key equal), silently skewing buckets
    sidx = (jnp.arange(m, dtype=jnp.uint32)
            * jnp.uint32(2654435761)) % jnp.uint32(n)
    sc, sp_ = jax.lax.sort((codes[sidx], pos[sidx]), num_keys=2,
                           is_stable=False)
    idx = (jnp.arange(1, NBUCKETS, dtype=jnp.int32) * m) // NBUCKETS
    return sc[idx], sp_[idx]


def _bucketize(codes, pos, spl_c, spl_p):
    """Bucket id in [0,16) = #splitters <= (code, pos); sequential fused
    compare-accumulates avoid a (15, n) broadcast intermediate."""
    b = jnp.zeros(codes.shape, jnp.int32)
    for i in range(NBUCKETS - 1):
        gt = (codes > spl_c[i]) | ((codes == spl_c[i]) & (pos >= spl_p[i]))
        b = b + gt.astype(jnp.int32)
    return b


def _partition_16(ops2d, bucket2d, cap_rows: int, tile_rows: int,
                  interpret: bool):
    """Scatter rows of each operand into 16 row-aligned regions."""
    rows = ops2d[0].shape[0]
    lane = jax.lax.broadcasted_iota(jnp.int32, (rows, LANES), 1)
    packed = (bucket2d << 7) | lane
    sp = jax.lax.sort((packed,), num_keys=1, is_stable=False, dimension=1)[0]
    bases = jnp.arange(NBUCKETS, dtype=jnp.int32) * (cap_rows * LANES)
    ctrl = jnp.concatenate([bases, jnp.zeros((1,), jnp.int32)])
    sched = jnp.asarray(_within_row_sort_schedule())
    call = _build_pass(rows, tile_rows, len(ops2d), interpret,
                       external_sp=True, flush_write=True,
                       out_rows=NBUCKETS * cap_rows)
    res = call(sched, ctrl, sp, *ops2d)
    return tuple(r[:NBUCKETS * cap_rows] for r in res[:len(ops2d)])


def sort_codes_splitsweep(codes: jnp.ndarray, tile_rows: int | None = None,
                          oversample: int = 64, slack: float = 1.35,
                          sub_sort=None,
                          interpret: bool | None = None) -> jnp.ndarray:
    """Flagship keys-only sort of u32 codes via 16-way splitter partition.

    `sub_sort(flat_u32) -> sorted flat_u32` sorts each bucket (default:
    XLA unstable flat sort); pass `sort_codes_splitsweep` itself (wrapped)
    for a second partition level.
    """
    if interpret is None:
        interpret = not _is_tpu()
    if tile_rows is None:
        from .radix16 import _default_tile_rows

        tile_rows = _default_tile_rows()
    n = codes.shape[0]
    rows = max(tile_rows, -(-n // LANES))
    rows = -(-rows // tile_rows) * tile_rows
    pad = rows * LANES - n
    x = codes
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,), _SENTINEL, jnp.uint32)])
    np_total = rows * LANES

    pos = jnp.arange(np_total, dtype=jnp.uint32)
    spl_c, spl_p = _sample_splitters(x, pos, oversample)
    bucket = _bucketize(x, pos, spl_c, spl_p)
    # 16 fused masked reductions (a one_hot matrix would materialize 16n)
    counts = jnp.stack(
        [jnp.sum(bucket == d, dtype=jnp.int32) for d in range(NBUCKETS)])

    cap_rows = -(-int(np.ceil(rows * slack / NBUCKETS)) // 8) * 8
    cap = cap_rows * LANES

    if sub_sort is None:
        def sub_sort(r):
            # keys-only on bare codes: the all-keys invariant holds
            from . import xla_sort as _xs

            return _xs.sort_all_keys_unstable((r,))[0]

    def run_partition(xf):
        (out,) = _partition_16(
            (xf.reshape(rows, LANES).view(jnp.int32),),
            bucket.reshape(rows, LANES), cap_rows, tile_rows, interpret)
        regions = out.reshape(NBUCKETS, cap).view(jnp.uint32)
        in_idx = jax.lax.broadcasted_iota(jnp.int32, (NBUCKETS, cap), 1)
        valid = in_idx < counts[:, None]
        regions = jnp.where(valid, regions, _SENTINEL)
        # (cap_rows, LANES) map bodies dodge the flat (16, cap) boundary
        # relayout (campaign 12/14 mechanism); cap is always row-aligned
        sorted_regions = jax.lax.map(
            lambda r2: sub_sort(r2.reshape(-1)).reshape(cap_rows, LANES),
            regions.reshape(NBUCKETS, cap_rows, LANES))
        packed, _cnt = stitch.compact(
            sorted_regions.reshape(-1), valid.reshape(-1),
            interpret=interpret)
        return packed[:NBUCKETS * cap]

    def run_fallback(xf):
        # pathological sample (bucket overflow): the partition kernel would
        # truncate buckets, so sort flat instead — exact, in-graph, safe
        # under jit (round-3 fix; advisor r2 / VERDICT r2 weak #2)
        s = jax.lax.sort((xf,), num_keys=1, is_stable=False)[0]
        return jnp.concatenate(
            [s, jnp.full((NBUCKETS * cap - np_total,), _SENTINEL,
                         jnp.uint32)])

    overflow = jnp.max(counts) > jnp.int32(cap)
    packed = jax.lax.cond(overflow, run_fallback, run_partition, x)
    return packed[:n]


def sort_stable_with_splitsweep(codes: jnp.ndarray, *ride: jnp.ndarray,
                                tile_rows: int | None = None,
                                oversample: int = 64, slack: float = 1.35,
                                interpret: bool | None = None):
    """STABLE sort of u32 codes with any number of u32 ride-along operands.

    Stability: the partition preserves in-bucket relative order (rows in
    order, tiles in order; boundary ties split by position), and each
    bucket's sub-sort uses its in-bucket index as the tiebreak — so equal
    keys keep original order end to end.  Gap sentinels carry the largest
    indices and sort strictly last, so count-prefix assembly is exact even
    with real 0xFFFFFFFF keys.  Bit-exact with
    jax.lax.sort((codes, *ride), is_stable=True).

    The ride count is unbounded (the partition kernel and the bucket
    sub-sorts carry operand tuples); 2 rides = the lo/hi planes of a 64-bit
    payload (SplitSort payload V in {uint32_t, double}, SplitSort.cuh:702).
    Returns (sorted_codes, *permuted_rides).
    """
    if interpret is None:
        interpret = not _is_tpu()
    if tile_rows is None:
        from .radix16 import _default_tile_rows

        tile_rows = _default_tile_rows()
    n = codes.shape[0]
    rows = max(tile_rows, -(-n // LANES))
    rows = -(-rows // tile_rows) * tile_rows
    pad = rows * LANES - n
    x = codes
    ps = tuple(r.view(jnp.uint32) for r in ride)
    if pad:
        x = jnp.concatenate([x, jnp.full((pad,), _SENTINEL, jnp.uint32)])
        ps = tuple(jnp.concatenate([p, jnp.zeros((pad,), jnp.uint32)])
                   for p in ps)
    np_total = rows * LANES

    pos = jnp.arange(np_total, dtype=jnp.uint32)
    spl_c, spl_p = _sample_splitters(x, pos, oversample)
    bucket = _bucketize(x, pos, spl_c, spl_p)
    counts = jnp.stack(
        [jnp.sum(bucket == d, dtype=jnp.int32) for d in range(NBUCKETS)])

    cap_rows = -(-int(np.ceil(rows * slack / NBUCKETS)) // 8) * 8
    cap = cap_rows * LANES

    def run_partition(args):
        b2 = bucket.reshape(rows, LANES)
        outs = _partition_16(
            tuple(a.reshape(rows, LANES).view(jnp.int32) for a in args),
            b2, cap_rows, tile_rows, interpret)

        kreg = outs[0].reshape(NBUCKETS, cap).view(jnp.uint32)
        pregs = tuple(o.reshape(NBUCKETS, cap).view(jnp.uint32)
                      for o in outs[1:])
        in_idx = jax.lax.broadcasted_iota(jnp.int32, (NBUCKETS, cap), 1)
        valid = in_idx < counts[:, None]
        kreg = jnp.where(valid, kreg, _SENTINEL)

        def sub_sort(args2):
            # (cap_rows, LANES) bodies — see the keys path note
            iota = jax.lax.iota(jnp.int32, cap)
            flat = tuple(a.reshape(-1) for a in args2)
            res = jax.lax.sort((flat[0], iota) + flat[1:],
                               num_keys=2, is_stable=False)
            return tuple(a.reshape(cap_rows, LANES)
                         for a in (res[0],) + tuple(res[2:]))

        sorted_regions = jax.lax.map(
            sub_sort, tuple(a.reshape(NBUCKETS, cap_rows, LANES)
                            for a in (kreg,) + pregs))
        packed, _cnt = stitch.compact_ops(
            tuple(s.reshape(-1) for s in sorted_regions),
            valid.reshape(-1), interpret=interpret)
        return tuple(pk[:NBUCKETS * cap] for pk in packed)

    def run_fallback(args):
        # overflowed sample: exact stable flat sort instead (see keys path)
        iota = jax.lax.iota(jnp.int32, np_total)
        res = jax.lax.sort((args[0], iota) + tuple(args[1:]), num_keys=2,
                           is_stable=False)
        tail = NBUCKETS * cap - np_total
        outs = [jnp.concatenate(
            [res[0], jnp.full((tail,), _SENTINEL, jnp.uint32)])]
        outs += [jnp.concatenate([r, jnp.zeros((tail,), jnp.uint32)])
                 for r in res[2:]]
        return tuple(outs)

    overflow = jnp.max(counts) > jnp.int32(cap)
    outs = jax.lax.cond(overflow, run_fallback, run_partition, (x,) + ps)
    return tuple(o[:n] for o in outs)


def sort_pairs_splitsweep(codes: jnp.ndarray, payload: jnp.ndarray,
                          tile_rows: int | None = None,
                          oversample: int = 64, slack: float = 1.35,
                          interpret: bool | None = None):
    """STABLE pair sort via the splitter partition (single-ride form of
    `sort_stable_with_splitsweep`; bit-exact with lax.sort stable)."""
    return sort_stable_with_splitsweep(
        codes, payload, tile_rows=tile_rows, oversample=oversample,
        slack=slack, interpret=interpret)
