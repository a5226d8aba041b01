"""On-device output validation — the test oracle.

Reference mechanisms reproduced (SURVEY.md §4):
  - adjacent-pair order check counting violations into an error counter
    (Shaders/Utility.hlsl:147-231; CUDA UtilityKernels.cuh:403-479)
  - pairs mode additionally checks payload order; with payload == key by
    construction this verifies stability + correct payload permutation
  - bit-exact identity vs an independent oracle (the reference uses CUB:
    SplitSortTests.cuh:527-566; we use the XLA backend / numpy)
  - segmented validation: order within each segment only
  - scan unit check: all-ones input must scan to iota
    (DeviceRadixSort.cpp:308-340)

Checks run on device and reduce to a tiny error count, mirroring the
reference's single-u32 readback.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import codec
from ..core.config import Order


def _code_order_violations(codes: jnp.ndarray, order: Order) -> jnp.ndarray:
    if codes.shape[0] < 2:
        return jnp.uint32(0)
    a, b = codes[:-1], codes[1:]
    bad = (a > b) if order == Order.ASCENDING else (a < b)
    return jnp.sum(bad, dtype=jnp.uint32)


def count_order_violations(keys: jnp.ndarray, order: Order = Order.ASCENDING):
    """Validate-kernel analog: number of adjacent out-of-order pairs."""
    return _code_order_violations(codec.encode_keys(keys), order)


def count_pair_violations(
    keys: jnp.ndarray, values: jnp.ndarray, order: Order = Order.ASCENDING
):
    """Pairs-mode validation: key order + payload order (stability oracle).

    Requires the fixture convention payload == key bit pattern.  As in the
    reference ("Reinterpret the payload to match the type of the key it was
    sorted on", Utility.hlsl:163-192), the payload's bits are compared in the
    KEY's total order — here via the key codec, which is stricter than the
    reference's typed compare (it also orders NaN bit patterns).
    """
    errs = _code_order_violations(codec.encode_keys(keys), order)
    if values.dtype in (jnp.dtype(jnp.uint64), jnp.dtype(jnp.float64)):
        # 64-bit payloads carry the u32 key bits value-preservingly
        vbits = values.astype(jnp.uint32)
    else:
        vbits = codec.payload_to_bits(values)
    vcodes = codec.encode_keys(vbits.view(keys.dtype))
    errs = errs + _code_order_violations(vcodes, order)
    return errs


def count_segmented_violations(
    seg_offsets: jnp.ndarray, keys: jnp.ndarray, order: Order = Order.ASCENDING
):
    """Order check that resets at segment boundaries."""
    n = keys.shape[0]
    if n < 2:
        return jnp.uint32(0)
    codes = codec.encode_keys(keys)
    a, b = codes[:-1], codes[1:]
    bad = (a > b) if order == Order.ASCENDING else (a < b)
    # positions i, i+1 straddle a boundary iff i+1 is a segment start
    pos = jnp.arange(1, n, dtype=jnp.uint32)
    is_start = jnp.isin(pos, seg_offsets) if seg_offsets.shape[0] < (1 << 16) else None
    if is_start is None:
        starts = jnp.zeros((n,), dtype=jnp.bool_).at[seg_offsets].set(True)
        is_start = starts[1:]
    return jnp.sum(bad & ~is_start, dtype=jnp.uint32)


def identical(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Element-wise identity count of mismatches (CUB-identity analog).

    Bit-pattern comparison so float NaNs compare equal to themselves.
    """
    if a.dtype != b.dtype or a.shape != b.shape:
        raise ValueError(f"shape/dtype mismatch: {a.dtype}{a.shape} vs {b.dtype}{b.shape}")
    if a.dtype in (jnp.dtype(jnp.float32), jnp.dtype(jnp.float64)):
        a = codec.payload_to_bits(a)
        b = codec.payload_to_bits(b)
    return jnp.sum(a != b, dtype=jnp.uint32)
