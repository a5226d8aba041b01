"""Public sort ops with backend dispatch.

`backend=AUTO` runs the fastest measured engine for the platform and size:
on TPU, sorts at/above the generation's measured rangesweep crossover run
the native range-exchange engine (ops/rangesweep.py); everything else runs
the flat XLA sort.  The one routing decision is `core.config.auto_engine`.
Every backend sorts the same uint32 key codes (core.codec), so outputs are
bit-exact across backends.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.config import Backend, Mode, Order, auto_engine, get_device_info
from . import xla_sort


def _check_lengths(keys, *others):
    """Friendly shape errors (the reference asserts sizes, GPUSortBase.cs)."""
    if keys.ndim != 1:
        raise ValueError(f"keys must be 1-D, got shape {keys.shape}")
    for o in others:
        if o.shape != keys.shape:
            raise ValueError(
                f"payload shape {o.shape} != keys shape {keys.shape}")


def _resolve(backend: Backend) -> Backend:
    """Explicit-dispatch family for non-size-aware entry points: AUTO's
    size-dependent rangesweep route is applied by sort/sort_pairs via
    `auto_engine`; everything else AUTO falls to XLA, and PALLAS stays
    the explicit native-variant opt-in (ops/radix.py)."""
    if backend == Backend.AUTO:
        return Backend.XLA
    return backend


def sort(
    keys: jnp.ndarray,
    order: Order = Order.ASCENDING,
    backend: Backend = Backend.AUTO,
    variant: str = "onesweep",
    tile_rows: int | None = None,
) -> jnp.ndarray:
    """Sort a 1-D array of u32/i32/f32 keys.

    variant: "onesweep" (fused single-pass-scan analog), "device_radix"
    (reduce-then-scan analog), "forward_sweep" (portable alias) or "ffx"
    (4-bit x 8-pass FidelityFX-style baseline) — reference algorithm families
    (README.md:5-15).  Backends may implement variants identically when the
    distinction is meaningless on TPU; outputs are identical by contract.

    tile_rows: manual tuning override for the PALLAS radix engines (the
    reference's manual TuningParameters constructors, GPUSortBase.h:57-155);
    ignored by the XLA backend.
    """
    _check_lengths(keys)
    b = _resolve(backend)
    if b == Backend.PALLAS:
        from . import radix

        return radix.sort(keys, order=order, variant=variant,
                          tile_rows=tile_rows)
    if (backend == Backend.AUTO
            and auto_engine(keys.shape[0]) == "rangesweep"):
        # measured AUTO route: keys-only sorts at/above the generation's
        # rangesweep crossover run the range-exchange engine (Pallas DMA
        # exchange over mapped chunk sorts); explicit backend=XLA stays
        # the pure oracle
        from ..core import codec
        from . import rangesweep

        out = codec.decode_keys(
            rangesweep.sort_codes_rangesweep(codec.encode_keys(keys)),
            codec.key_type_of(keys))
        if order == Order.DESCENDING:
            out = jnp.flip(out, axis=0)
        return out
    return xla_sort.sort_keys(keys, order=order)


def sort_pairs_wide(
    keys: jnp.ndarray,
    lo: jnp.ndarray,
    hi: jnp.ndarray,
    order: Order = Order.ASCENDING,
    backend: Backend = Backend.AUTO,
    variant: str = "onesweep",
    tile_rows: int | None = None,
):
    """Stable pair sort with a 64-bit payload as two u32 planes (lo, hi).

    The TPU-native 64-bit payload representation: works regardless of the
    jax x64 flag (64-bit dtypes silently truncate without it).  Every
    variant carries the two planes through its own engine
    (radix.sort_codes_with_rides — the same dispatch 32-bit payloads get).
    """
    _check_lengths(keys, lo, hi)
    b = _resolve(backend)
    if b == Backend.PALLAS:
        from . import radix

        return radix.sort_pairs_wide(keys, lo, hi, order=order,
                                     variant=variant, tile_rows=tile_rows)
    if (backend == Backend.AUTO
            and auto_engine(keys.shape[0], Mode.PAIRS,
                            payload_bits=64) == "rangesweep"):
        # measured AUTO route: the 4-plane pairs rangesweep moves the
        # already-split (lo, hi) planes directly (no u64 pack round-trip)
        from ..core import codec
        from ..core.config import get_routing_parameters
        from . import rangesweep

        sc, slo, shi = rangesweep.sort_pairs_rangesweep_planes(
            codec.encode_keys(keys),
            (lo.view(jnp.uint32), hi.view(jnp.uint32)),
            seg_elems=get_routing_parameters().rangesweep_seg_elems_pairs_wide)
        out_k = codec.decode_keys(sc, codec.key_type_of(keys))
        if order == Order.DESCENDING:
            out_k = jnp.flip(out_k, axis=0)
            slo = jnp.flip(slo, axis=0)
            shi = jnp.flip(shi, axis=0)
        return out_k, slo.view(lo.dtype), shi.view(hi.dtype)
    return xla_sort.sort_pairs_wide(keys, lo, hi, order=order)


def sort_batched(
    keys: jnp.ndarray,
    values: jnp.ndarray | None = None,
    order: Order = Order.ASCENDING,
    backend: Backend = Backend.AUTO,
    variant: str = "onesweep",
    tile_rows: int | None = None,
):
    """Sort each row of a 2-D (batch, L) array independently.

    Stable per row; any u32/i32/f32 key dtype, optional same-shape payload;
    descending = per-row reverse of stable ascending.  AUTO/XLA take the
    measured route (one batched minor-axis sort vs a `lax.map` of flat
    per-row sorts beyond the VMEM-residency crossover,
    xla_sort.map_rows_min) — that route IS the winner on this workload
    shape (benches/RESULTS.md round-3 mapped-vs-batched probes), and
    segsort's fixed-length path rides the same mechanism.

    backend=PALLAS maps each row through the named native engine (a
    `lax.map` of 1-D native sorts) — the experimental escape hatch the
    1-D surface has always had (VERDICT r3 weak #7: the asymmetry
    surprised API users); expect it to lose to the measured route.
    """
    if keys.ndim != 2:
        raise ValueError(f"sort_batched takes a 2-D array, got {keys.shape}")
    if values is not None and values.shape != keys.shape:
        raise ValueError(
            f"payload shape {values.shape} != keys shape {keys.shape}")
    if _resolve(backend) == Backend.PALLAS:
        from . import radix

        if values is None:
            return jax.lax.map(
                lambda r: radix.sort(r, order=order, variant=variant,
                                     tile_rows=tile_rows), keys)
        return jax.lax.map(
            lambda kv: radix.sort_pairs(kv[0], kv[1], order=order,
                                        variant=variant,
                                        tile_rows=tile_rows),
            (keys, values))
    return xla_sort.sort_batched(keys, values, order=order)


def argsort(
    keys: jnp.ndarray,
    order: Order = Order.ASCENDING,
    backend: Backend = Backend.AUTO,
    variant: str = "onesweep",
    tile_rows: int | None = None,
    return_keys: bool = False,
):
    """Stable argsort: the permutation that sorts `keys`.

    The reference idiom for this is a pair sort with an iota payload
    (GPUSortBase.h CreateTestInput fills payload = index; the stability
    validator relies on it) — this wraps that pattern as a first-class op.
    Matches `jnp.argsort(keys, stable=True)` for ascending; descending is
    the element-wise reverse of the stable ascending permutation (reference
    DescendingIndex semantics, SortCommon.hlsl:594-597).

    Returns int32 indices (jnp.argsort convention); with return_keys=True
    returns (sorted_keys, indices) and saves the caller a gather.
    """
    _check_lengths(keys)
    if (backend == Backend.AUTO
            and auto_engine(keys.shape[0], Mode.PAIRS,
                            index_payload=True) == "rangesweep"):
        # measured AUTO route (round 5): payload == index collapses the
        # pairs rangesweep to TWO planes — the index plane the stable
        # pipeline already rides IS the payload, so both mapped phases
        # and the exchange drop a full plane vs routing through
        # sort_pairs (mapped 2-op vs 3-op phase: 392.0 vs 502.2 ms at
        # 2^28 — hw_r5_campaign1.log D rows)
        from ..core import codec
        from . import rangesweep

        sc, sv = rangesweep.argsort_rangesweep(codec.encode_keys(keys))
        perm = sv.view(jnp.int32)
        if order == Order.DESCENDING:
            perm = jnp.flip(perm, axis=0)
        if return_keys:
            out_k = codec.decode_keys(sc, codec.key_type_of(keys))
            if order == Order.DESCENDING:
                out_k = jnp.flip(out_k, axis=0)
            return out_k, perm
        return perm
    idx = jnp.arange(keys.shape[0], dtype=jnp.uint32)
    k, v = sort_pairs(keys, idx, order=order, backend=backend,
                      variant=variant, tile_rows=tile_rows)
    perm = v.view(jnp.int32)  # bit-identical; n < 2^31 always
    if return_keys:
        return k, perm
    return perm


def sort_pairs(
    keys: jnp.ndarray,
    values: jnp.ndarray,
    order: Order = Order.ASCENDING,
    backend: Backend = Backend.AUTO,
    variant: str = "onesweep",
    tile_rows: int | None = None,
):
    """Stable sort of (keys, payload) pairs; payload moved by bit pattern.

    tile_rows: manual tuning override for the PALLAS radix engines (see
    `sort`); ignored by the XLA backend.
    """
    _check_lengths(keys, values)
    b = _resolve(backend)
    if b == Backend.PALLAS:
        from . import radix

        return radix.sort_pairs(keys, values, order=order, variant=variant,
                                tile_rows=tile_rows)
    if backend == Backend.AUTO:
        # measured AUTO route (round 4j): large stable pair sorts run the
        # pairs rangesweep — the flat oracle's 3-operand working set
        # spills far earlier than keys-only (1308.5 vs 469.7 ms at 2^28
        # on v5e), so the mapped-chunk engine's edge is larger here; the
        # 64-bit-payload (4-plane) form routes by its own threshold
        from ..core import codec

        bits = codec.payload_to_bits(values)
        pbits = 64 if bits.dtype == jnp.uint64 else 32
        if auto_engine(keys.shape[0], Mode.PAIRS,
                       payload_bits=pbits) == "rangesweep":
            from . import rangesweep

            sc, sb = rangesweep.sort_pairs_rangesweep(
                codec.encode_keys(keys), bits)
            out_k = codec.decode_keys(sc, codec.key_type_of(keys))
            out_v = codec.bits_to_payload(sb, values.dtype)
            if order == Order.DESCENDING:
                out_k = jnp.flip(out_k, axis=0)
                out_v = jnp.flip(out_v, axis=0)
            return out_k, out_v
    return xla_sort.sort_pairs(keys, values, order=order)
