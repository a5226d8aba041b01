"""Distributed-sort tests on the 8-device virtual CPU mesh (SURVEY.md §5)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpusorting_tpu.core import codec, prng
from gpusorting_tpu.parallel import dist_sort


def test_mesh_has_8():
    assert len(jax.devices()) == 8


def test_distributed_keys_uniform(cpu_mesh):
    n = 1 << 14
    keys = prng.make_test_keys(n, seed=2)
    out, overflow = dist_sort.distributed_sort_gather(keys, mesh=cpu_mesh)
    assert overflow == 0
    np.testing.assert_array_equal(
        np.asarray(out), np.sort(np.asarray(keys), kind="stable")
    )


def test_distributed_pairs_stable(cpu_mesh):
    n = 1 << 13
    keys = (prng.hybrid_taus_bits(n, seed=4) & jnp.uint32(0x3F)).view(jnp.uint32)
    vals = jnp.arange(n, dtype=jnp.uint32)
    (out_k, out_v), overflow = dist_sort.distributed_sort_gather(
        keys, vals, mesh=cpu_mesh
    )
    assert overflow == 0
    perm = np.argsort(np.asarray(keys), kind="stable")
    np.testing.assert_array_equal(np.asarray(out_k), np.asarray(keys)[perm])
    np.testing.assert_array_equal(np.asarray(out_v), np.asarray(vals)[perm])


def test_distributed_skewed_zipf(cpu_mesh):
    """Zipf-skewed keys: capacity slack must absorb the skew or report it."""
    rng = np.random.RandomState(0)
    n = 1 << 13
    keys = jnp.asarray(
        np.minimum(rng.zipf(1.3, n), 0xFFFFFFF).astype(np.uint32)
    )
    out, overflow = dist_sort.distributed_sort_gather(
        keys, mesh=cpu_mesh
    )
    assert overflow == 0
    np.testing.assert_array_equal(
        np.asarray(out), np.sort(np.asarray(keys), kind="stable")
    )


def test_distributed_low_entropy(cpu_mesh):
    """Thearling–Smith .201 bits/bit — adversarially duplicate-heavy."""
    n = 1 << 13
    keys = prng.make_test_keys(
        n, seed=6, entropy=prng.EntropyPreset.E020
    )
    out, overflow = dist_sort.distributed_sort_gather(
        keys, mesh=cpu_mesh, oversample=64
    )
    assert overflow == 0
    np.testing.assert_array_equal(
        np.asarray(out), np.sort(np.asarray(keys), kind="stable")
    )


def test_distributed_presorted(cpu_mesh):
    """Pre-sorted input: each device's whole shard maps to ONE destination
    (src,dst) cell — the adversarial case for per-cell capacity."""
    n = 1 << 13
    keys = jnp.arange(n, dtype=jnp.uint32)
    out, overflow = dist_sort.distributed_sort_gather(keys, mesh=cpu_mesh)
    assert overflow == 0
    np.testing.assert_array_equal(np.asarray(out), np.asarray(keys))


def test_distributed_all_equal(cpu_mesh):
    """All-equal keys: only the gidx tiebreak spreads the load; no drops."""
    n = 1 << 13
    keys = jnp.full((n,), jnp.uint32(42))
    vals = jnp.arange(n, dtype=jnp.uint32)
    (out_k, out_v), overflow = dist_sort.distributed_sort_gather(
        keys, vals, mesh=cpu_mesh
    )
    assert overflow == 0
    np.testing.assert_array_equal(np.asarray(out_k), np.asarray(keys))
    np.testing.assert_array_equal(np.asarray(out_v), np.asarray(vals))


def test_distributed_max_code_keys(cpu_mesh):
    """Real 0xFFFFFFFF keys must not be counted as padding."""
    n = 1 << 12
    base = prng.make_test_keys(n, seed=11)
    keys = jnp.where(jnp.arange(n) % 5 == 0, jnp.uint32(0xFFFFFFFF), base)
    out, overflow = dist_sort.distributed_sort_gather(keys, mesh=cpu_mesh)
    assert overflow == 0
    np.testing.assert_array_equal(
        np.asarray(out), np.sort(np.asarray(keys), kind="stable")
    )


def test_distributed_overflow_injection_and_recovery(cpu_mesh):
    """A too-small fixed cap must FLAG dropped elements (never silently
    wrong), and the gather wrapper must recover by retrying with a bigger
    cap until nothing is dropped (VERDICT round-1: overflow recovery)."""
    n = 1 << 12
    keys = jnp.arange(n, dtype=jnp.uint32)  # pre-sorted: worst-case cells
    res = dist_sort.distributed_sort(keys, mesh=cpu_mesh, cap_elems=128)
    assert int(np.asarray(res["overflow"])[0]) > 0  # injection detected
    out, overflow = dist_sort.distributed_sort_gather(
        keys, mesh=cpu_mesh, cap_elems=128)  # retry path
    assert overflow == 0
    np.testing.assert_array_equal(np.asarray(out), np.asarray(keys))


def test_distributed_max_skew_bounded_memory(cpu_mesh):
    """max_skew truncates the ladder (the at-scale memory mode): uniform
    inputs sort exactly within the bounded rungs; an adversarial
    all-to-one skew overflows the bound, is REPORTED, and the gather
    retry escalates to the unbounded ladder and recovers exactly."""
    n = 1 << 13
    keys = prng.make_test_keys(n, seed=9)
    res = dist_sort.distributed_sort(keys, mesh=cpu_mesh, max_skew=4.0)
    assert int(np.asarray(res["overflow"])[0]) == 0
    assert res["cap"] < n // 8  # the ladder top really is truncated
    out, overflow = dist_sort.distributed_sort_gather(
        keys, mesh=cpu_mesh, max_skew=4.0)
    assert overflow == 0
    np.testing.assert_array_equal(
        np.asarray(out), np.sort(np.asarray(keys), kind="stable"))

    # adversarial vs the strided sampler: the sample stride is
    # n/(D*oversample)=32 here, so keys at positions = 0 mod 32 are tiny
    # (the only ones sampled) and all others huge — every splitter lands
    # below the huge mass, which then overflows the truncated top rung
    pos = jnp.arange(n, dtype=jnp.uint32)
    base = prng.hybrid_taus_bits(n, seed=11)
    skew = jnp.where(pos % 32 == 0, base & jnp.uint32(0xFF),
                     base | jnp.uint32(0xF0000000))
    res = dist_sort.distributed_sort(skew, mesh=cpu_mesh, max_skew=2.0)
    assert int(np.asarray(res["overflow"])[0]) > 0  # reported, not dropped
    out, overflow = dist_sort.distributed_sort_gather(
        skew, mesh=cpu_mesh, max_skew=2.0)
    assert overflow == 0
    np.testing.assert_array_equal(
        np.asarray(out), np.sort(np.asarray(skew), kind="stable"))


def test_distributed_exact_cap_never_overflows(cpu_mesh):
    """Default mode measures the exact cell capacity first."""
    n = 1 << 12
    for seed in (1, 2):
        keys = prng.make_test_keys(n, seed=seed)
        res = dist_sort.distributed_sort(keys, mesh=cpu_mesh)
        assert int(np.asarray(res["overflow"])[0]) == 0


def test_distributed_under_jit(cpu_mesh):
    """distributed_sort must be traceable (the exact-cap host fetch falls
    back to the never-drop bound under an outer jit)."""
    n = 1 << 12
    keys = prng.make_test_keys(n, seed=13)

    @jax.jit
    def run(k):
        res = dist_sort.distributed_sort(k, mesh=cpu_mesh)
        return res["codes"], res["counts"], res["overflow"]

    codes, counts, overflow = run(keys)
    assert int(np.asarray(overflow)[0]) == 0
    total = int(np.asarray(counts).sum())
    assert total == n


def test_distributed_f32(cpu_mesh):
    n = 1 << 12
    keys = prng.make_test_keys(n, seed=8, key_dtype=jnp.float32)
    out, overflow = dist_sort.distributed_sort_gather(keys, mesh=cpu_mesh)
    assert overflow == 0
    codes = np.asarray(codec.encode_keys(keys))
    ref_codes = np.sort(codes, kind="stable")
    np.testing.assert_array_equal(
        np.asarray(codec.encode_keys(out)), ref_codes
    )


def test_distributed_empty_raises(cpu_mesh):
    with pytest.raises(ValueError, match="non-empty"):
        dist_sort.distributed_sort(jnp.zeros((0,), jnp.uint32), mesh=cpu_mesh)


def test_cell_counts_blocked_tail():
    """Non-2^20-multiple shard sizes use full blocks + a masked tail slice
    (never a single O(n_local) block): counts must equal the unblocked
    reference computation."""
    n_local = (1 << 20) + 257
    codes = prng.hybrid_taus_bits(n_local, seed=5)
    gidx = jnp.arange(n_local, dtype=jnp.uint32)
    spl_c = jnp.asarray([1 << 30, 3 << 30], jnp.uint32)
    spl_g = jnp.asarray([n_local // 3, n_local // 2], jnp.uint32)
    counts = np.asarray(dist_sort._cell_counts(codes, gidx, spl_c, spl_g, 3))
    c = np.asarray(codes)
    g = np.asarray(gidx)
    sc, sg = np.asarray(spl_c), np.asarray(spl_g)
    above = np.array([
        ((c > sc[d]) | ((c == sc[d]) & (g >= sg[d]))).sum()
        for d in range(2)])
    bounds = np.concatenate([[0], n_local - above, [n_local]])
    np.testing.assert_array_equal(counts, bounds[1:] - bounds[:-1])


def test_default_max_skew_derivation():
    """The HBM-derived skew default (VERDICT r3 weak #4): small n keeps the
    drop-proof ladder (None); beyond-budget n truncates it, floored at 4."""
    # small n: full-shard top fits any budget
    assert dist_sort._default_max_skew(1 << 16, 8, 3) is None
    # configs[4] scale: 1B keys on 8 devices must truncate
    skew = dist_sort._default_max_skew(1 << 30, 8, 3)
    assert skew is not None and 4.0 <= skew < 8.0
    caps = dist_sort._cap_ladder(1 << 30, 8, skew)
    mean = (1 << 30) // 64
    assert caps[-1] < (1 << 30) // 8          # not the full-shard bound
    assert caps[-1] <= int(skew * mean) + 128
    # inf forces the unbounded drop-proof ladder
    caps_inf = dist_sort._cap_ladder(1 << 30, 8, float("inf"))
    assert caps_inf[-1] == (1 << 30) // 8


def test_configs4_shape_trace(cpu_mesh):
    """configs[4]-shaped dry-run (1B keys / 8 devices, shapes only): the
    default ladder traces WITHOUT the global-n-per-device buffer."""
    n = 1 << 30
    spec = jax.ShapeDtypeStruct((n,), jnp.uint32)
    out = jax.eval_shape(
        lambda k, v: dist_sort.distributed_sort(k, v, mesh=cpu_mesh)[
            "codes"],
        spec, spec)
    # derived skew=4 -> top rung 4x the mean cell; global codes buffer is
    # n_dev * (n_dev * cap) = 2^32, HALF the unbounded ladder's 2^33
    per_dev = out.shape[0] // 8
    assert per_dev < n                        # strictly below global-n
    assert per_dev == 8 * dist_sort._cap_ladder(
        n, 8, dist_sort._default_max_skew(n, 8, 3))[-1]
