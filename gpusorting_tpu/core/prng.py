"""Test-input generators: hybrid Tausworthe PRNG + Thearling–Smith entropy.

Reference semantics (Shaders/Utility.hlsl:57-117; CUDA UtilityKernels.cuh:53-117):
  - per element, four PRNG lanes are seeded from the element slot and the run
    seed: z_k = (slot*4 + k) * seed
  - each draw advances three Tausworthe generators and one LCG and XORs them
    (GPU Gems 3 ch. 37, Lee Howes & David Thomas — public algorithm)
  - entropy reduction ANDs (and_count + 1) successive draws
    (Thearling & Smith, "An Improved Supercomputer Sorting Benchmark"):
      and_count 0..4 -> 1.0 / .811 / .544 / .337 / .201 bits per bit

This is a TPU-first re-implementation: one fully vectorized jnp computation
per array instead of a strided GPU kernel, seeded per element index so the
stream is deterministic and independent of tiling.  Also provides the
segmented-sort fixtures (fixed-length, random-length-under-budget, masked
random values) mirroring UtilityKernels.cuh:121-400.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from .config import EntropyPreset


def _taus_step(z, s1, s2, s3, m):
    b = ((z << s1) ^ z) >> s2
    return ((z & jnp.uint32(m)) << s3) ^ b


def _hybrid_taus_draw(z1, z2, z3, z4):
    """One draw: advance all four lanes, return (value, new state)."""
    z1 = _taus_step(z1, 13, 19, 12, 4294967294)
    z2 = _taus_step(z2, 2, 25, 4, 4294967288)
    z3 = _taus_step(z3, 3, 11, 17, 4294967280)
    z4 = z4 * jnp.uint32(1664525) + jnp.uint32(1013904223)
    return z1 ^ z2 ^ z3 ^ z4, (z1, z2, z3, z4)


def hybrid_taus_bits(
    n: int, seed: int, and_count: int = 0, warmup: int = 2
) -> jnp.ndarray:
    """Generate n uint32 values with the given entropy reduction.

    ``warmup`` extra draws decorrelate the affine seeding (the reference gets
    its decorrelation from the per-thread strided loop instead).
    """
    idx = jnp.arange(n, dtype=jnp.uint32)
    # (seed << 1) | 1 is odd and injective on 31 bits, so nearby seeds
    # (the reference uses seed = i + baseSeed per iteration) stay distinct.
    seed = jnp.uint32((np.uint32(seed) << np.uint32(1)) | np.uint32(1))
    z1 = (idx * jnp.uint32(4) + jnp.uint32(0)) * seed + jnp.uint32(0x9E3779B9)
    z2 = (idx * jnp.uint32(4) + jnp.uint32(1)) * seed + jnp.uint32(0x85EBCA6B)
    z3 = (idx * jnp.uint32(4) + jnp.uint32(2)) * seed + jnp.uint32(0xC2B2AE35)
    z4 = (idx * jnp.uint32(4) + jnp.uint32(3)) * seed + jnp.uint32(0x27D4EB2F)
    state = (z1, z2, z3, z4)
    for _ in range(warmup):
        _, state = _hybrid_taus_draw(*state)
    t = jnp.full((n,), 0xFFFFFFFF, dtype=jnp.uint32)
    for _ in range(and_count + 1):
        v, state = _hybrid_taus_draw(*state)
        t = t & v
    return t


def make_test_keys(
    n: int,
    seed: int,
    key_dtype=jnp.uint32,
    entropy: EntropyPreset = EntropyPreset.E100,
) -> jnp.ndarray:
    """InitSortInput analog (Utility.hlsl:82-117): random bits viewed as keys."""
    bits = hybrid_taus_bits(n, seed, entropy.and_count)
    return bits.view(key_dtype)


def make_test_pairs(
    n: int,
    seed: int,
    key_dtype=jnp.uint32,
    payload_dtype=jnp.uint32,
    entropy: EntropyPreset = EntropyPreset.E100,
):
    """Keys plus payload initialized to the same bit pattern.

    payload == key (by bit pattern) is the reference's stability oracle: a
    stable, correctly permuted payload must come out ordered exactly like the
    keys (Utility.hlsl:147-231, pairs branch).
    """
    bits = hybrid_taus_bits(n, seed, entropy.and_count)
    keys = bits.view(key_dtype)
    if jnp.dtype(payload_dtype).itemsize == 8:
        # 64-bit payloads carry the key bits value-preservingly so the
        # payload-order stability oracle still applies.
        if not jax.config.jax_enable_x64:
            raise ValueError(
                "64-bit payload fixtures need jax_enable_x64 (JAX silently "
                "truncates 64-bit dtypes otherwise); use the dual-u32-plane "
                "APIs (sort_pairs_wide / split_sort_pairs_wide) instead")
        wide = bits.astype(jnp.uint64)
        if jnp.dtype(payload_dtype) == jnp.float64:
            return keys, wide.astype(jnp.float64)
        return keys, wide
    return keys, bits.view(payload_dtype)


def make_descending_keys(n: int, dtype=jnp.uint32) -> jnp.ndarray:
    """InitDescending analog (UtilityKernels.cuh:36-40): n-1, n-2, ..., 0."""
    return (jnp.uint32(n) - 1 - jnp.arange(n, dtype=jnp.uint32)).view(dtype)


# ---------------------------------------------------------------------------
# Segmented-sort fixtures (UtilityKernels.cuh:121-400)
# ---------------------------------------------------------------------------


def make_fixed_segments(total_length: int, seg_length: int):
    """Equal-length segments covering total_length (UtilityKernels.cuh:121-135).

    Returns (offsets, seg_count): offsets is the exclusive-prefix array of
    segment starts, length seg_count (+ implicit end at total_length).
    """
    if seg_length <= 0:
        raise ValueError("seg_length must be positive")
    seg_count = max(1, total_length // seg_length)
    offsets = jnp.arange(seg_count, dtype=jnp.uint32) * jnp.uint32(seg_length)
    return offsets, seg_count


def make_random_segments(total_length: int, max_seg_length: int, seed: int):
    """Random segment lengths under a global budget (UtilityKernels.cuh:340-400).

    The reference draws lengths on-GPU under an atomicCAS budget; here we draw
    lengths host-side (numpy, deterministic by seed) until the budget is
    filled — same distributional intent, simpler and exact.
    """
    rng = np.random.RandomState(np.uint32(seed))
    lens = []
    used = 0
    while used < total_length:
        l = int(rng.randint(1, max_seg_length + 1))
        l = min(l, total_length - used)
        lens.append(l)
        used += l
    offsets = np.zeros(len(lens), dtype=np.uint32)
    if len(lens) > 1:
        offsets[1:] = np.cumsum(lens[:-1], dtype=np.uint64).astype(np.uint32)
    return jnp.asarray(offsets), len(lens)


def make_masked_random_values(n: int, bits_to_sort: int, seed: int) -> jnp.ndarray:
    """Random u32 keys masked to bits_to_sort bits (UtilityKernels.cuh:170-248)."""
    mask = jnp.uint32((1 << bits_to_sort) - 1) if bits_to_sort < 32 else jnp.uint32(0xFFFFFFFF)
    return hybrid_taus_bits(n, seed) & mask


def make_unique_shuffled(n: int, seed: int) -> jnp.ndarray:
    """Shuffle of 0..n-1 (UtilityKernels.cuh:251-324 unique-value fixtures)."""
    return jax.random.permutation(jax.random.PRNGKey(seed), n).astype(jnp.uint32)
