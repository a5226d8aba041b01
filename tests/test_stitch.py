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
