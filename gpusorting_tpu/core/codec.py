"""Order-preserving key bijections into uint32 radix space.

Semantics of the reference transforms (SortCommon.hlsl:134-154, "Radix Tricks"
by Michael Herf):

  float32 -> u32 : flip all bits if the sign bit is set, else set the sign bit
  int32   -> u32 : xor 0x80000000
  uint32  -> u32 : identity

These are total orders on the raw bit patterns; NaNs get a deterministic
position (negative NaNs below -inf, positive NaNs above +inf) — identical to
the reference's radix behavior, and intentionally different from IEEE
comparison semantics used by jnp.sort on floats.  All backends in this package
sort via these codes so every backend is bit-exact with every other.
"""

from __future__ import annotations

import jax.numpy as jnp

from .config import KeyType


def encode_keys(keys: jnp.ndarray) -> jnp.ndarray:
    """Map keys to uint32 so unsigned ordering == the key type's sort order."""
    dt = keys.dtype
    if dt == jnp.uint32:
        return keys
    if dt == jnp.int32:
        return (keys ^ jnp.int32(-0x80000000)).astype(jnp.uint32)
    if dt == jnp.float32:
        u = keys.view(jnp.uint32)
        sign = u >> jnp.uint32(31)
        mask = jnp.where(sign == 1, jnp.uint32(0xFFFFFFFF), jnp.uint32(0x80000000))
        return u ^ mask
    raise TypeError(f"unsupported key dtype {dt}")


def decode_keys(codes: jnp.ndarray, key_type: KeyType) -> jnp.ndarray:
    """Inverse of :func:`encode_keys` (reference: UintToFloat/UintToInt)."""
    if key_type == KeyType.UINT32:
        return codes
    if key_type == KeyType.INT32:
        return (codes ^ jnp.uint32(0x80000000)).view(jnp.int32)
    if key_type == KeyType.FLOAT32:
        mask = ((codes >> jnp.uint32(31)) - jnp.uint32(1)) | jnp.uint32(0x80000000)
        return (codes ^ mask).view(jnp.float32)
    raise TypeError(f"unsupported key type {key_type}")


def key_type_of(keys: jnp.ndarray) -> KeyType:
    dt = keys.dtype
    if dt == jnp.uint32:
        return KeyType.UINT32
    if dt == jnp.int32:
        return KeyType.INT32
    if dt == jnp.float32:
        return KeyType.FLOAT32
    raise TypeError(f"unsupported key dtype {dt}")


# Payloads are moved, never compared: carry them through sorts by bit pattern.
_PAYLOAD_BITS = {
    jnp.dtype(jnp.uint32): jnp.uint32,
    jnp.dtype(jnp.int32): jnp.uint32,
    jnp.dtype(jnp.float32): jnp.uint32,
    jnp.dtype(jnp.uint64): jnp.uint64,
    jnp.dtype(jnp.float64): jnp.uint64,
}


def payload_to_bits(values: jnp.ndarray) -> jnp.ndarray:
    """Bitcast payload to an unsigned carrier type (movement only)."""
    carrier = _PAYLOAD_BITS.get(values.dtype)
    if carrier is None:
        raise TypeError(f"unsupported payload dtype {values.dtype}")
    return values.view(carrier)


def bits_to_payload(bits: jnp.ndarray, dtype) -> jnp.ndarray:
    return bits.view(dtype)
