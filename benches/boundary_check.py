"""Shared bucketed traced-size boundary checkers for the hardware drivers.

ONE compile for EVERY size: the engine under test runs at a fixed bucket
shape B; the size n is a TRACED scalar realized as sentinel masking
(0xFFFFFFFF pads sort last and compare equal against the identically
padded XLA oracle), and a fori_loop chains `count` consecutive sizes per
scalar readback.  This is the glue-bucketing that makes the reference's
full [partition, 2*partition] sweep (GPUSortBase.h:245-248) affordable on
this rig (round-2 cost was a ~13 s XLA glue compile PER SIZE).

The pairs checker uses duplicate-heavy keys (masked to 10 bits) with
distinct iota payloads so the oracle comparison checks STABILITY, not
just order (Utility.hlsl:147-231 pairs validate mechanism).

One module because the same two checkers were previously pasted verbatim
into tpu_test_all.py, hw_boundary_tile2048.py and hw_pairs_tile2048.py
(r3 review): a future fix to the pad/sentinel or oracle construction now
lands in every driver at once.
"""

import jax
import jax.numpy as jnp
import numpy as np

from gpusorting_tpu.core import prng


def make_keys_checker(eng, bucket: int):
    """check_range(n0, count) -> mismatch count vs the XLA keys oracle.

    `eng` maps a (bucket,) u32 code array to its ascending sort.
    """

    @jax.jit
    def check_range(n0, count):
        iota = jax.lax.iota(jnp.uint32, bucket)

        def body(i, acc):
            nn = n0 + i
            bits = prng.hybrid_taus_bits(bucket, seed=0) ^ nn
            padded = jnp.where(iota < nn, bits, jnp.uint32(0xFFFFFFFF))
            a = eng(padded)
            b = jax.lax.sort((padded,), num_keys=1, is_stable=False)[0]
            return acc + jnp.sum(a != b, dtype=jnp.uint32)

        return jax.lax.fori_loop(0, count, body, jnp.uint32(0))

    return check_range


def make_pairs_checker(fn, bucket: int):
    """check_range(n0, count) -> mismatch count vs the stable pairs oracle.

    `fn` maps (codes, payload) arrays of shape (bucket,) to the stably
    sorted (codes, payload).
    """

    @jax.jit
    def check_range(n0, count):
        iota = jax.lax.iota(jnp.uint32, bucket)

        def body(i, acc):
            nn = n0 + i
            bits = (prng.hybrid_taus_bits(bucket, seed=1) ^ nn) & jnp.uint32(
                0x3FF)
            kk = jnp.where(iota < nn, bits, jnp.uint32(0xFFFFFFFF))
            vv = iota
            sk, sv = fn(kk, vv)
            rk, rv = jax.lax.sort((kk, vv), num_keys=1, is_stable=True)
            return acc + jnp.sum(sk != rk, dtype=jnp.uint32) + jnp.sum(
                sv != rv, dtype=jnp.uint32)

        return jax.lax.fori_loop(0, count, body, jnp.uint32(0))

    return check_range


def run_ranges(checker, ranges) -> tuple[int, int]:
    """Run (n0, count) ranges through a checker; return (bad, total)."""
    bad = total = 0
    for n0, cnt in ranges:
        bad += int(np.asarray(checker(jnp.uint32(n0), cnt)))
        total += cnt
    return bad, total
