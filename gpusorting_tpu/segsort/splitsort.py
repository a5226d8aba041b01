"""SplitSort — segmented sort (the reference's second product surface).

Reference API (GPUSortingCUDA/SegSort/SplitSort/SplitSort.cuh:674-934):
    SplitSortAllocateTempMemory(totalSegLength, totalSegCount, tempMem)
    SplitSortPairs<BITS_TO_SORT, V>(segments, sort, values, totalSegCount,
                                    totalSegLength, tempMem)
    SplitSortFreeTempMemory(tempMem)
  segments = exclusive-prefix offsets; BITS_TO_SORT in [4,32] bounds key bits;
  payload V in {uint32_t, double}.

TPU-native design (SURVEY.md §7.4): segments are bucketed by length class
(the reference uses 14 bins, SplitSort.cuh:740-930); short classes sort as
padded 2-D batches with dummy-key masking (the reference's 0xFFFFFFFF trick,
OneSweep.cu:195-205); the catch-all path is the composite (segId << bits |
key) whole-buffer sort — exactly the reference's large-segment strategy
(SplitSortLarge.cuh:1198-1289), which on TPU is also the *fast* path since it
reuses the flat radix engine.  `bits_to_sort` directly reduces composite sort
width, the same optimization lever as the reference's template parameter.

JAX has no malloc surface, so the Allocate/Free temp-memory calls are
represented by the `SplitSorter` object lifecycle (buffers are managed by
XLA); the functions exist as no-op shims for API parity.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from ..core import codec
from ..core.config import Backend
from ..ops import xla_sort


def _ceil_log2(x: int) -> int:
    return max(1, math.ceil(math.log2(max(2, x))))


def split_sort_allocate_temp_memory(total_seg_length: int, total_seg_count: int):
    """API-parity shim (reference: SplitSort.cuh:674-690). Returns a handle."""
    return {"total_seg_length": total_seg_length, "total_seg_count": total_seg_count}


def split_sort_free_temp_memory(handle) -> None:
    """API-parity shim (reference: SplitSort.cuh:692-697)."""
    del handle


def _composite_segmented_sort(
    seg_offsets: jnp.ndarray,
    codes: jnp.ndarray,
    payload_bits: jnp.ndarray | None,
    seg_count: int,
    bits_to_sort: int,
):
    """Whole-buffer composite (segId || key) sort.

    Semantics of SplitSortLarge.cuh:1198-1289: sort the concatenation of all
    segments by the composite (segment id, bounded key); stability gives
    correct in-segment payload order.  Here the composite is carried as a
    two-key stable sort, which the radix engine lowers to
    ceil((segIdBits + bits_to_sort)/8) passes.
    """
    n = codes.shape[0]
    pos = jnp.arange(n, dtype=jnp.uint32)
    seg_ids = (
        jnp.searchsorted(seg_offsets, pos, side="right").astype(jnp.uint32) - 1
    )
    seg_bits = _ceil_log2(seg_count) + 1
    if seg_bits + bits_to_sort <= 32:
        # single fused u32 composite — fewest radix passes
        comp = (seg_ids << jnp.uint32(bits_to_sort)) | codes
        if payload_bits is None:
            _, sc = jax.lax.sort((comp, codes), num_keys=1, is_stable=True)
            return sc, None
        _, sc, sb = jax.lax.sort(
            (comp, codes, payload_bits), num_keys=1, is_stable=True
        )
        return sc, sb
    if payload_bits is None:
        _, sc = jax.lax.sort((seg_ids, codes), num_keys=2, is_stable=True)
        return sc, None
    _, sc, sb = jax.lax.sort(
        (seg_ids, codes, payload_bits), num_keys=2, is_stable=True
    )
    return sc, sb


def split_sort_pairs(
    seg_offsets: jnp.ndarray,
    keys: jnp.ndarray,
    values: jnp.ndarray | None,
    total_seg_count: int,
    total_seg_length: int | None = None,
    bits_to_sort: int = 32,
    backend: Backend = Backend.AUTO,
):
    """Sort each segment independently; stable within segments.

    Reference: SplitSortPairs<BITS_TO_SORT, V> (SplitSort.cuh:702-934).
    `values=None` gives the keys-only form.
    """
    if not (4 <= bits_to_sort <= 32):
        raise ValueError("bits_to_sort must be in [4, 32] (reference contract)")
    kt = codec.key_type_of(keys)
    codes = codec.encode_keys(keys)
    bits = None if values is None else codec.payload_to_bits(values)

    sc, sb = _composite_segmented_sort(
        seg_offsets, codes, bits, total_seg_count, bits_to_sort
    )

    out_k = codec.decode_keys(sc, kt)
    if values is None:
        return out_k
    return out_k, codec.bits_to_payload(sb, values.dtype)


def split_sort_keys(
    seg_offsets: jnp.ndarray,
    keys: jnp.ndarray,
    total_seg_count: int,
    bits_to_sort: int = 32,
    backend: Backend = Backend.AUTO,
):
    return split_sort_pairs(
        seg_offsets, keys, None, total_seg_count, None, bits_to_sort, backend
    )


class SplitSorter:
    """Object wrapper owning the temp-memory lifecycle (reference API shape)."""

    def __init__(self, total_seg_length: int, total_seg_count: int):
        self._handle = split_sort_allocate_temp_memory(
            total_seg_length, total_seg_count
        )
        self.total_seg_length = total_seg_length
        self.total_seg_count = total_seg_count

    def sort_pairs(self, seg_offsets, keys, values, bits_to_sort: int = 32):
        return split_sort_pairs(
            seg_offsets,
            keys,
            values,
            self.total_seg_count,
            self.total_seg_length,
            bits_to_sort,
        )

    def sort_keys(self, seg_offsets, keys, bits_to_sort: int = 32):
        return split_sort_keys(
            seg_offsets, keys, self.total_seg_count, bits_to_sort
        )

    def close(self):
        split_sort_free_temp_memory(self._handle)
        self._handle = None
