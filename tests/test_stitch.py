"""Banded-placement compaction primitive tests (CPU interpret mode).

`compact` is the ragged-stitch building block for future radix/sample-sort
passes (docs/ROADMAP_perf.md §1); validated on real TPU at 3.1 Gelem/s.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from gpusorting_tpu.ops import stitch

RNG = np.random.RandomState(42)


@pytest.mark.parametrize("n,density", [
    (1, 1.0), (127, 0.5), (128, 0.0), (1000, 0.5), (4096, 1.0),
    (70000, 0.1), (66000, 0.93),
])
def test_compact_matches_numpy(n, density):
    x = jnp.asarray(RNG.randint(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32))
    m = jnp.asarray(RNG.rand(n) < density)
    out, cnt = stitch.compact(x, m)
    ref = np.asarray(x)[np.asarray(m)]
    assert int(cnt) == ref.shape[0]
    np.testing.assert_array_equal(np.asarray(out)[:int(cnt)], ref)


def test_compact_order_preserved_runs():
    """Block-structured masks exercise full/empty rows and carry handoff."""
    n = 50_000
    x = jnp.arange(n, dtype=jnp.uint32)
    pattern = np.zeros(n, bool)
    pattern[0:5000] = True          # dense run
    pattern[20000:20001] = True     # single element
    pattern[30000:45000:3] = True   # strided
    m = jnp.asarray(pattern)
    out, cnt = stitch.compact(x, m)
    ref = np.arange(n, dtype=np.uint32)[pattern]
    assert int(cnt) == ref.shape[0]
    np.testing.assert_array_equal(np.asarray(out)[:int(cnt)], ref)


def test_compact_int32_negative_values():
    n = 3000
    x = jnp.asarray(RNG.randint(-2**31, 2**31, size=n, dtype=np.int64).astype(np.int32))
    m = jnp.asarray(RNG.rand(n) < 0.7)
    out, cnt = stitch.compact(x, m)
    ref = np.asarray(x)[np.asarray(m)]
    np.testing.assert_array_equal(np.asarray(out)[:int(cnt)], ref)


@pytest.mark.parametrize("n,density", [
    (1, 1.0), (257, 0.0), (1000, 0.3), (16384, 0.9), (40000, 0.05),
])
def test_expand_matches_numpy(n, density):
    """expand is the inverse of compact: dense stream -> masked positions."""
    m = RNG.rand(n) < density
    x = RNG.randint(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    k = int(m.sum())
    stream = RNG.randint(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    stream[:k] = x[m]            # tail beyond k is garbage and must be ignored
    (out,) = stitch.expand_ops((jnp.asarray(stream),), jnp.asarray(m))
    exp = np.zeros(n, np.uint32)
    exp[m] = x[m]
    np.testing.assert_array_equal(np.asarray(out), exp)


def test_expand_multi_op_and_short_stream():
    """Operands move by one shared mask; streams may be length-k (< n)."""
    n = 30_000
    m = RNG.rand(n) < 0.4
    k = int(m.sum())
    a = RNG.randint(0, 2**32, size=k, dtype=np.uint64).astype(np.uint32)
    b = RNG.randint(-2**31, 2**31, size=k, dtype=np.int64).astype(np.int32)
    oa, ob = stitch.expand_ops((jnp.asarray(a), jnp.asarray(b)),
                               jnp.asarray(m))
    ea = np.zeros(n, np.uint32); ea[m] = a
    eb = np.zeros(n, np.int32); eb[m] = b
    np.testing.assert_array_equal(np.asarray(oa), ea)
    np.testing.assert_array_equal(np.asarray(ob), eb)


def test_expand_compact_roundtrip():
    """where(mask, expand(compact(x)), x) == x under any mask."""
    n = 20_000
    m = RNG.rand(n) < 0.6
    x = RNG.randint(0, 2**32, size=n, dtype=np.uint64).astype(np.uint32)
    packed, cnt = stitch.compact(jnp.asarray(x), jnp.asarray(m))
    (back,) = stitch.expand_ops((packed,), jnp.asarray(m))
    out = np.where(m, np.asarray(back), x)
    np.testing.assert_array_equal(out, x)
