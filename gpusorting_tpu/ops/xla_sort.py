"""XLA-backed sort path: the portable baseline and cross-backend oracle.

Role in this framework = the role CUB plays in the reference (bit-exact
ground truth: SplitSortTests.cuh:527-566, CubDispatcher.cuh) plus the role of
the "portable" DeviceRadixSort variant (runs on any backend, CPU included).

All sorting happens on the uint32 key codes from core.codec, so the ordering
(including NaN placement for float keys) is identical to the radix kernels'.
Stability comes from `jax.lax.sort(..., is_stable=True)`.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core import codec
from ..core.config import Order


# Size bucketing: pad sorts up to ~12.5%-granularity size buckets with MAX
# sentinels so nearby sizes share one compiled program.  On this rig each
# distinct shape costs a 5-20 s remote AOT compile, which makes the
# reference's boundary-exhaustive size sweeps (one sort per size,
# GPUSortBase.h:245-248) pathological without bucketing.  Outputs are
# identical: sentinels sort to the padded tail (stable sorts keep real
# MAX-code elements ahead of appended pads) and are sliced off.
SIZE_BUCKETING = True


def _bucket_n(n: int) -> int:
    if not SIZE_BUCKETING or n <= 2048:
        return n
    g = max(2048, 1 << (n.bit_length() - 4))  # 1/8 of the octave
    return -(-n // g) * g


def _pad(arr: jnp.ndarray, b: int, fill) -> jnp.ndarray:
    n = arr.shape[0]
    if b == n:
        return arr
    return jnp.concatenate([arr, jnp.full((b - n,), fill, arr.dtype)])


def sort_all_keys_unstable(operands: tuple, num_keys: int | None = None,
                           dimension: int = -1) -> tuple:
    """`lax.sort` with is_stable=False where instability CANNOT be observed.

    THE INVARIANT (do not call this unless it holds): every operand is part
    of the comparator key (num_keys == len(operands)).  Two elements that
    compare equal are then bit-identical in every operand, so any
    permutation of equal elements yields the same output arrays — unstable
    output == stable output, and unstable is ~2x faster on this part
    (probes/PROBES.md).  Typical holders: keys-only sorts on bare codes,
    and sorts whose last key is a unique index (a total order).

    One shared helper because the same argument was previously repeated at
    5 call sites (splitsort x2, splitsweep, xla_sort, radix dispatch) and
    a single wrong future edit to any of them would silently break the
    cross-engine bit-exactness contract (VERDICT r2 weak #8).
    """
    nk = len(operands) if num_keys is None else num_keys
    assert nk == len(operands), (
        "sort_all_keys_unstable requires ALL operands to be comparator "
        "keys; ride-along payloads need is_stable=True (or an index "
        "tiebreak key)")
    return jax.lax.sort(operands, num_keys=nk, is_stable=False,
                        dimension=dimension)


def sort_keys_u32(codes: jnp.ndarray) -> jnp.ndarray:
    """Ascending sort of uint32 key codes.

    Unstable: equal u32 codes are indistinguishable, so the output is
    identical to a stable sort — and XLA's unstable sort is 2.0x faster on
    TPU (92 vs 185 ms at 2^26 on v5e; benches/RESULTS.md).
    """
    n = codes.shape[0]
    b = _bucket_n(n)
    out = jax.lax.sort(
        (_pad(codes, b, jnp.uint32(0xFFFFFFFF)),), num_keys=1,
        is_stable=False)[0]
    return out[:n]


def sort_pairs_u32(codes: jnp.ndarray, payload_bits: jnp.ndarray):
    """Stable ascending sort of (u32 code, payload-bit-carrier) pairs."""
    n = codes.shape[0]
    b = _bucket_n(n)
    sc, sb = jax.lax.sort(
        (_pad(codes, b, jnp.uint32(0xFFFFFFFF)),
         _pad(payload_bits, b, jnp.zeros((), payload_bits.dtype))),
        num_keys=1, is_stable=True)
    return sc[:n], sb[:n]


def sort_keys(keys: jnp.ndarray, order: Order = Order.ASCENDING) -> jnp.ndarray:
    """Sort typed keys (u32/i32/f32).

    Descending = element-wise reverse of the stable ascending result, matching
    the reference's final-pass index flip (SortCommon.hlsl `DescendingIndex`).
    """
    kt = codec.key_type_of(keys)
    out = codec.decode_keys(sort_keys_u32(codec.encode_keys(keys)), kt)
    if order == Order.DESCENDING:
        out = jnp.flip(out, axis=0)
    return out


def sort_pairs(
    keys: jnp.ndarray, values: jnp.ndarray, order: Order = Order.ASCENDING
):
    """Sort typed (key, payload) pairs, stable, payload moved by bit pattern."""
    kt = codec.key_type_of(keys)
    codes = codec.encode_keys(keys)
    bits = codec.payload_to_bits(values)
    sc, sb = sort_pairs_u32(codes, bits)
    out_k = codec.decode_keys(sc, kt)
    out_v = codec.bits_to_payload(sb, values.dtype)
    if order == Order.DESCENDING:
        out_k = jnp.flip(out_k, axis=0)
        out_v = jnp.flip(out_v, axis=0)
    return out_k, out_v


def map_rows_min(has_payload: bool) -> int:
    """Measured mapped-vs-batched row-sort crossover for this mode.

    Beyond it a `lax.map` of flat per-row sorts beats one batched
    minor-axis sort because each mapped sort stays VMEM-resident (the
    mechanism that also holds the flat 2^24 chunk rate at any total size).
    Mode-specific, measured on v5e (benches/logs/hw_sort_batched2_r3.log):
      keys  — batched wins at L=2^14 (2.21 vs 1.66 G), mapped at L=2^15
              (2.37 vs 1.86 G) -> threshold 2^15
      pairs — mapped wins at L=2^16 (0.89 vs 0.57 G); at L=2^16 the
              segsort probe (S=64 rows) measured the two within noise ->
              2^16 is the earliest measured-safe switch
    Shared by the public sort_batched surface and segsort's fixed-length
    dispatch (identical code shape) — this helper is the ONE source of the
    crossover (ADVICE r3: it used to be dead code beside module constants
    that could drift); the values live in the routing tuner
    (core.config.RoutingParameters) so other generations can override or
    re-measure them (utils.autotune.autotune_routing).
    """
    from ..core.config import get_routing_parameters

    r = get_routing_parameters()
    return r.map_rows_min_pairs if has_payload else r.map_rows_min_keys


def map_rows_sort(ops: tuple, keys_only_unstable: bool) -> tuple:
    """`lax.map` of per-row sorts over (S, L) operand rows, the giant-row
    form beyond `map_rows_min`.  When L % 128 == 0 the map bodies
    take/return (l_rows, 128) chunk SHAPES and flatten in-VMEM: the flat
    (S, L) map boundary makes XLA relayout the tiled buffer around every
    pass (TPU tiles the last two dims, interleaving rows), measured
    ~18% of the mapped pass at giant L (campaign 14 G rows: 16 x 2^24
    keys 178.6 vs 216.5 ms; 16 x 2^20 pairs 23.7 vs 27.5 —
    benches/logs/hw_r5_campaign14.log; same mechanism as the flagship's
    3-D phase boundaries, hw_r5_campaign12.log D rows).  Non-multiples
    of 128 keep the flat bodies.

    keys_only_unstable=True sorts ops[0] alone via the unstable all-keys
    form (equal u32 codes interchangeable); otherwise one stable
    num_keys=1 sort moves all trailing operands.  Returns (S, L) outputs.
    """
    S, L = ops[0].shape
    if L % 128 == 0:
        lr = L // 128
        if keys_only_unstable:
            def body(r2):
                return sort_all_keys_unstable(
                    (r2.reshape(-1),))[0].reshape(lr, 128)

            sk = jax.lax.map(body, ops[0].reshape(S, lr, 128))
            return (sk.reshape(S, L),)

        def body(t):
            s = jax.lax.sort(tuple(a.reshape(-1) for a in t),
                             num_keys=1, is_stable=True)
            return tuple(a.reshape(lr, 128) for a in s)

        res = jax.lax.map(body, tuple(a.reshape(S, lr, 128) for a in ops))
        return tuple(a.reshape(S, L) for a in res)
    if keys_only_unstable:
        return (jax.lax.map(
            lambda r: sort_all_keys_unstable((r,))[0], ops[0]),)
    return tuple(jax.lax.map(
        lambda t: jax.lax.sort(t, num_keys=1, is_stable=True), ops))


def sort_batched(keys: jnp.ndarray, values: jnp.ndarray | None = None,
                 order: Order = Order.ASCENDING):
    """Sort each row of a 2-D (S, L) array independently (stable per row).

    The many-independent-arrays workload shape; descending is the per-row
    element-wise reverse of the stable ascending result (reference
    DescendingIndex semantics applied row-wise).  Routes by the measured
    VMEM-residency crossover (map_rows_min): giant rows run as a `lax.map`
    of flat per-row sorts (~1.3-2x the batched minor-axis form on v5e),
    shorter rows as one batched dimension sort.
    """
    kt = codec.key_type_of(keys)
    codes = codec.encode_keys(keys)
    L = codes.shape[1]
    if values is None:
        if L >= map_rows_min(False):
            (sk,) = map_rows_sort((codes,), True)
        else:
            (sk,) = sort_all_keys_unstable((codes,), dimension=1)
        out = codec.decode_keys(sk, kt)
        if order == Order.DESCENDING:
            out = jnp.flip(out, axis=1)
        return out
    bits = codec.payload_to_bits(values)
    if L >= map_rows_min(True):
        sk, sb = map_rows_sort((codes, bits), False)
    else:
        sk, sb = jax.lax.sort((codes, bits), num_keys=1, is_stable=True,
                              dimension=1)
    out_k = codec.decode_keys(sk, kt)
    out_v = codec.bits_to_payload(sb, values.dtype)
    if order == Order.DESCENDING:
        out_k = jnp.flip(out_k, axis=1)
        out_v = jnp.flip(out_v, axis=1)
    return out_k, out_v


def segment_ids_from_offsets(seg_offsets: jnp.ndarray, n: int) -> jnp.ndarray:
    """Per-element segment id from exclusive-prefix starts.

    Scatter-ones + cumsum instead of searchsorted: TPU searchsorted
    binary-searches per element (~0.01 Gelem/s measured); the scatter touches
    only seg_count elements and the cumsum is a fast vector op.
    """
    marks = jnp.zeros((n,), jnp.uint32).at[seg_offsets].add(
        jnp.uint32(1), mode="drop")
    return jnp.cumsum(marks, dtype=jnp.uint32) - 1


def sort_pairs_wide(keys: jnp.ndarray, lo: jnp.ndarray, hi: jnp.ndarray,
                    order: Order = Order.ASCENDING):
    """Stable pair sort with a 64-bit payload carried as two u32 planes.

    TPU has no 64-bit vector lanes and JAX truncates 64-bit dtypes unless
    x64 is enabled, so (lo, hi) planes are the native representation of the
    reference's 64-bit payloads (SplitSort payload V in {uint32_t, double},
    SplitSort.cuh:702).  Both planes ride the same stable sort.
    """
    kt = codec.key_type_of(keys)
    codes = codec.encode_keys(keys)
    n = codes.shape[0]
    b = _bucket_n(n)
    z = jnp.zeros((), jnp.uint32)
    sc, slo, shi = jax.lax.sort(
        (_pad(codes, b, jnp.uint32(0xFFFFFFFF)),
         _pad(lo.view(jnp.uint32), b, z), _pad(hi.view(jnp.uint32), b, z)),
        num_keys=1, is_stable=True)
    sc, slo, shi = sc[:n], slo[:n], shi[:n]
    out_k = codec.decode_keys(sc, kt)
    if order == Order.DESCENDING:
        out_k = jnp.flip(out_k, axis=0)
        slo = jnp.flip(slo, axis=0)
        shi = jnp.flip(shi, axis=0)
    return out_k, slo.view(lo.dtype), shi.view(hi.dtype)


def segmented_sort_pairs(
    seg_offsets: jnp.ndarray,
    keys: jnp.ndarray,
    values: jnp.ndarray | None,
    total_length: int | None = None,
):
    """Segmented stable sort (the CUB DeviceSegmentedSort oracle analog).

    ``seg_offsets`` is the exclusive-prefix starts array, as in the reference
    SplitSort API (SplitSort.cuh:702-934).  Implemented as one stable
    two-key sort on (segment id, key code) — the same composite trick the
    reference's large-segment path uses (SplitSortLarge.cuh:1198-1289).
    """
    n = keys.shape[0] if total_length is None else total_length
    seg_ids = segment_ids_from_offsets(seg_offsets, n)
    kt = codec.key_type_of(keys)
    codes = codec.encode_keys(keys)
    if values is None:
        # keys-only: all operands are comparator keys (see helper contract)
        _, sc = sort_all_keys_unstable((seg_ids, codes))
        return codec.decode_keys(sc, kt)
    bits = codec.payload_to_bits(values)
    _, sc, sb = jax.lax.sort((seg_ids, codes, bits), num_keys=2, is_stable=True)
    return codec.decode_keys(sc, kt), codec.bits_to_payload(sb, values.dtype)
