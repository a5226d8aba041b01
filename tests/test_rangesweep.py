"""Rangesweep engine tests (CPU interpret mode).

The relocate kernel (bulk rows + static fringe rows + sentinel gap fill)
runs under the Pallas interpreter; phases 1/3 are lax.map + lax.sort.
Oracle identity against numpy, plus exact-cut balance properties.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gpusorting_tpu.core import prng
from gpusorting_tpu.ops import rangesweep


@pytest.mark.parametrize("method", ["gather", "dma"])
@pytest.mark.parametrize("n,L", [
    (1000, 2048),        # single chunk: passthrough flat sort
    (2048, 256),         # K=8, exact multiple
    (5000, 512),         # K=10, padded tail chunk
    (33_000, 1024),      # K=33 (>32 programs), padded
])
def test_keys_oracle(n, L, method):
    x = prng.hybrid_taus_bits(n, seed=n % 97)
    out = np.asarray(rangesweep.sort_codes_rangesweep(
        x, seg_elems=L, method=method))
    np.testing.assert_array_equal(out, np.sort(np.asarray(x)))


@pytest.mark.parametrize("method", ["gather", "dma"])
def test_adversarial_inputs(method):
    # skew kills sampled-splitter schemes; exact cuts must not care.
    n, L = 6000, 512
    for arr in (jnp.full((n,), 7, jnp.uint32),
                jnp.arange(n, dtype=jnp.uint32),
                jnp.arange(n, dtype=jnp.uint32)[::-1],
                # real 0xFFFFFFFF keys collide with the pad sentinel:
                # equal values are interchangeable, multiset must survive
                jnp.full((n,), 0xFFFFFFFF, jnp.uint32),
                jnp.where(jnp.arange(n) % 3 == 0,
                          jnp.uint32(0xFFFFFFFF),
                          jnp.arange(n, dtype=jnp.uint32)),
                prng.hybrid_taus_bits(n, seed=5, and_count=4)):
        out = np.asarray(rangesweep.sort_codes_rangesweep(
            arr, seg_elems=L, method=method))
        np.testing.assert_array_equal(out, np.sort(np.asarray(arr)))


def test_jit_safe():
    n, L = 4096, 512
    x = prng.hybrid_taus_bits(n, seed=11)
    out = np.asarray(jax.jit(
        lambda a: rangesweep.sort_codes_rangesweep(a, seg_elems=L))(x))
    np.testing.assert_array_equal(out, np.sort(np.asarray(x)))


def test_exact_cuts_balance():
    # every bucket must be exactly L elements for ANY distribution
    K, L = 8, 512
    for seed, and_count in ((1, 1), (2, 4), (3, 6)):
        x = prng.hybrid_taus_bits(K * L, seed=seed, and_count=and_count)
        x2 = jnp.sort(x.reshape(K, L), axis=1)
        bounds = np.asarray(rangesweep._exact_cuts(x2, K, L))
        sizes = (bounds[:, 1:] - bounds[:, :-1]).sum(axis=0)
        np.testing.assert_array_equal(sizes, np.full(K, L))
        # cuts are monotone per chunk and within [0, L]
        assert (bounds[:, 0] == 0).all() and (bounds[:, -1] == L).all()
        assert (np.diff(bounds, axis=1) >= 0).all()


def test_bucket_value_ordering():
    # bucket b's max <= bucket b+1's min (ranges really partition values)
    K, L = 4, 512
    x = prng.hybrid_taus_bits(K * L, seed=9)
    out = np.asarray(
        rangesweep.sort_codes_rangesweep(x, seg_elems=L)).reshape(K, L)
    assert (out[:-1, -1] <= out[1:, 0]).all()


def test_bad_seg_elems():
    x = prng.hybrid_taus_bits(1000, seed=1)
    with pytest.raises(ValueError):
        rangesweep.sort_codes_rangesweep(x, seg_elems=300)


def _stable_oracle(k, v):
    return jax.lax.sort((k, v), num_keys=1, is_stable=True)


@pytest.mark.parametrize("method", ["gather", "dma"])
@pytest.mark.parametrize("n,L,and_count", [
    (1000, 2048, 0),     # single chunk: passthrough stable flat sort
    (2048, 256, 0),      # K=8, exact multiple
    (5000, 512, 4),      # padded tail + heavy duplicates (stability bites)
    (33_000, 1024, 6),   # K=33, extreme duplication: long straddling runs
])
def test_pairs_stable_oracle(n, L, and_count, method):
    k = prng.hybrid_taus_bits(n, seed=n % 89, and_count=and_count)
    v = prng.hybrid_taus_bits(n, seed=(n % 89) + 1)
    ok, ov = rangesweep.sort_pairs_rangesweep(k, v, seg_elems=L,
                                              method=method)
    ek, ev = _stable_oracle(k, v)
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ek))
    np.testing.assert_array_equal(np.asarray(ov), np.asarray(ev))


@pytest.mark.parametrize("method", ["gather", "dma"])
def test_pairs_adversarial_stability(method):
    # the count-split's stability proof is exercised hardest when ONE
    # value straddles every bucket (all-equal) and when real keys
    # collide with the pad sentinel
    n, L = 6000, 512
    v = jnp.arange(n, dtype=jnp.uint32)
    for k in (jnp.full((n,), 7, jnp.uint32),
              jnp.full((n,), 0xFFFFFFFF, jnp.uint32),
              jnp.where(jnp.arange(n) % 3 == 0,
                        jnp.uint32(0xFFFFFFFF),
                        jnp.uint32(42)),
              prng.hybrid_taus_bits(n, seed=5, and_count=5)):
        ok, ov = rangesweep.sort_pairs_rangesweep(k, v, seg_elems=L,
                                                  method=method)
        ek, ev = _stable_oracle(k, v)
        np.testing.assert_array_equal(np.asarray(ok), np.asarray(ek))
        np.testing.assert_array_equal(np.asarray(ov), np.asarray(ev))


def test_pairs_jit_safe():
    n, L = 4096, 512
    k = prng.hybrid_taus_bits(n, seed=3, and_count=4)
    v = prng.hybrid_taus_bits(n, seed=4)
    ok, ov = jax.jit(lambda a, b: rangesweep.sort_pairs_rangesweep(
        a, b, seg_elems=L))(k, v)
    ek, ev = _stable_oracle(k, v)
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ek))
    np.testing.assert_array_equal(np.asarray(ov), np.asarray(ev))


def test_auto_route_gate():
    """The AUTO flagship route is gated on platform AND the measured
    crossover: on CPU is_native() stays False even with rangesweep_min
    installed, and AUTO output below the crossover equals the oracle."""
    from gpusorting_tpu.core import config
    from gpusorting_tpu.ops import radix

    override = config.RoutingParameters(rangesweep_min=1 << 10)
    config.set_routing_override(override)
    try:
        assert radix.is_native() is False  # platform gate (CPU here)
        import gpusorting_tpu as gst

        x = prng.hybrid_taus_bits(5000, seed=4)
        out = np.asarray(gst.sort(x))
        np.testing.assert_array_equal(out, np.sort(np.asarray(x)))
    finally:
        config.clear_routing_override()


def test_default_seg_elems_from_routing():
    from gpusorting_tpu.core import config

    assert (rangesweep._default_seg_elems()
            == config.get_routing_parameters().rangesweep_seg_elems)


def test_pairs_auto_route_gate():
    """The AUTO pairs route is gated on platform + measured crossover:
    on CPU it must stay the stable oracle even with rangesweep_min_pairs
    installed, and output equality holds either way.  f32 payloads ride
    by bit pattern."""
    from gpusorting_tpu.core import config
    from gpusorting_tpu import ops

    override = config.RoutingParameters(rangesweep_min_pairs=1 << 10)
    config.set_routing_override(override)
    try:
        k = prng.hybrid_taus_bits(5000, seed=6, and_count=4)
        v = prng.hybrid_taus_bits(5000, seed=7).view(jnp.float32)
        ok, ov = ops.sort_pairs(k, v)
        ek, ev = jax.lax.sort((k, v.view(jnp.uint32)), num_keys=1,
                              is_stable=True)
        np.testing.assert_array_equal(np.asarray(ok), np.asarray(ek))
        np.testing.assert_array_equal(np.asarray(ov).view(np.uint32),
                                      np.asarray(ev))
    finally:
        config.clear_routing_override()


# ---- round 5: 4-plane (64-bit payload) form + routing consolidation -------


@pytest.mark.parametrize("method", ["gather", "dma"])
@pytest.mark.parametrize("n,L,and_count", [
    (2048, 256, 0),      # K=8, exact multiple
    (5000, 512, 4),      # padded tail + heavy duplicates
])
def test_wide_pairs_planes_oracle(n, L, and_count, method):
    """4-plane exchange: (codes, idx, lo, hi) through one plan — the
    engine behind the 64-bit-payload AUTO route (VERDICT r4 next #3)."""
    k = prng.hybrid_taus_bits(n, seed=n % 83, and_count=and_count)
    lo = jnp.arange(n, dtype=jnp.uint32)
    hi = prng.hybrid_taus_bits(n, seed=(n % 83) + 1)
    ok, olo, ohi = rangesweep.sort_pairs_rangesweep_planes(
        k, (lo, hi), seg_elems=L, method=method)
    ek, elo, ehi = jax.lax.sort((k, lo, hi), num_keys=1, is_stable=True)
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ek))
    np.testing.assert_array_equal(np.asarray(olo), np.asarray(elo))
    np.testing.assert_array_equal(np.asarray(ohi), np.asarray(ehi))


def test_wide_pairs_planes_adversarial():
    n, L = 4096, 512
    lo = jnp.arange(n, dtype=jnp.uint32)
    hi = lo ^ jnp.uint32(0xDEADBEEF)
    for k in (jnp.full((n,), 7, jnp.uint32),
              jnp.full((n,), 0xFFFFFFFF, jnp.uint32)):
        ok, olo, ohi = rangesweep.sort_pairs_rangesweep_planes(
            k, (lo, hi), seg_elems=L)
        ek, elo, ehi = jax.lax.sort((k, lo, hi), num_keys=1, is_stable=True)
        np.testing.assert_array_equal(np.asarray(olo), np.asarray(elo))
        np.testing.assert_array_equal(np.asarray(ohi), np.asarray(ehi))


def test_pairs_default_seg_is_pairs_tuned():
    """A no-arg pairs call must take the PAIRS-measured chunk length
    field, never silently inherit the keys field (advisor r4 finding;
    since campaign 5/6 all three MEASURE to 2^21, so independence is
    proven through an override with distinct values)."""
    import gpusorting_tpu as gst
    from gpusorting_tpu.core import config

    r = config.get_routing_parameters()
    assert rangesweep._default_seg_elems_pairs() == r.rangesweep_seg_elems_pairs
    assert (rangesweep._default_seg_elems_pairs(wide=True)
            == r.rangesweep_seg_elems_pairs_wide)
    config.set_routing_override(gst.RoutingParameters(
        rangesweep_seg_elems=1 << 10, rangesweep_seg_elems_pairs=1 << 11,
        rangesweep_seg_elems_pairs_wide=1 << 12,
        rangesweep_seg_elems_index=1 << 13))
    try:
        assert rangesweep._default_seg_elems() == 1 << 10
        assert rangesweep._default_seg_elems_pairs() == 1 << 11
        assert rangesweep._default_seg_elems_pairs(wide=True) == 1 << 12
        assert rangesweep._default_seg_elems_index() == 1 << 13
    finally:
        config.clear_routing_override()


def test_auto_engine_single_decision():
    """core.config.auto_engine is THE routing decision (VERDICT r4 weak
    #4): thresholds gate by mode and payload width; CPU always says xla."""
    from gpusorting_tpu.core import config

    info_tpu = config.DeviceInfo("tpu", "fake v5e", "v5e", 1, 16 << 30,
                                 16 << 20, 819.0)
    info_cpu = config.DeviceInfo("cpu", "cpu", "cpu", 1, 8 << 30,
                                 16 << 20, 50.0)
    override = config.RoutingParameters(
        rangesweep_min=1 << 20, rangesweep_min_pairs=1 << 21,
        rangesweep_min_pairs_wide=None)
    config.set_routing_override(override)
    try:
        # NOTE: auto_engine(info=...) reads the override only when info is
        # None in get_routing_parameters; pass info and read the table --
        # so exercise the override through the info=None path on CPU:
        assert config.auto_engine(1 << 28) == "xla"  # platform gate (CPU)
    finally:
        config.clear_routing_override()
    # table-path decisions with an explicit TPU info (v5e row, all
    # hardware-measured: keys AND pairs 2^27 INCLUSIVE — the hier cuts
    # flipped the pow2-2^27 losses (keys 194.9 vs 208.1, pairs 546.2 vs
    # 585.9 — campaign9 P2); wide (1<<27)+1 (campaign4 K2, pow2 2^27
    # unmeasured); argsort 2^25 (campaign3 J, campaign4 J2))
    assert config.auto_engine(1 << 28, info=info_tpu) == "rangesweep"
    assert config.auto_engine(1 << 27, info=info_tpu) == "rangesweep"
    assert config.auto_engine((1 << 27) - 1, info=info_tpu) == "xla"
    assert config.auto_engine(1 << 28, config.Mode.PAIRS,
                              info=info_tpu) == "rangesweep"
    assert config.auto_engine(1 << 27, config.Mode.PAIRS,
                              info=info_tpu) == "rangesweep"
    # (1<<27)-1 is NON-pow2 and inside the measured non-pow2 pairs band
    assert config.auto_engine((1 << 27) - 1, config.Mode.PAIRS,
                              info=info_tpu) == "rangesweep"
    assert config.auto_engine(1 << 27, config.Mode.PAIRS,
                              payload_bits=64,
                              info=info_tpu) == "rangesweep"
    assert config.auto_engine((1 << 27) - 1, config.Mode.PAIRS,
                              payload_bits=64,
                              info=info_tpu) == "xla"  # wide min 2^27
    # non-pow2 pairs band: 3*2^25 routes, pow2 2^26 does not
    assert config.auto_engine(3 << 25, config.Mode.PAIRS,
                              info=info_tpu) == "rangesweep"
    assert config.auto_engine(1 << 26, config.Mode.PAIRS,
                              info=info_tpu) == "xla"
    assert config.auto_engine(1 << 25, config.Mode.PAIRS,
                              index_payload=True,
                              info=info_tpu) == "rangesweep"
    assert config.auto_engine((1 << 25) - 1, config.Mode.PAIRS,
                              index_payload=True,
                              info=info_tpu) == "xla"  # index min = 2^25
    assert config.auto_engine(1 << 30, info=info_cpu) == "xla"


def test_resolve_backend_size_aware():
    from gpusorting_tpu.core import config

    cfg = config.SortConfig(backend=config.Backend.AUTO)
    assert cfg.resolve_backend() == config.Backend.XLA  # n-less: family
    assert cfg.resolve_backend(1 << 28) == config.Backend.XLA  # CPU rig
    cfg2 = config.SortConfig(backend=config.Backend.PALLAS)
    assert cfg2.resolve_backend(1) == config.Backend.PALLAS


# ---- round 5: argsort 2-plane fast path ------------------------------------


def _argsort_oracle(k):
    idx = jnp.arange(k.shape[0], dtype=jnp.uint32)
    return jax.lax.sort((k, idx), num_keys=1, is_stable=True)


@pytest.mark.parametrize("method", ["gather", "dma"])
@pytest.mark.parametrize("n,L,and_count", [
    (1000, 2048, 0),     # single chunk: passthrough stable flat sort
    (2048, 256, 0),      # K=8, exact multiple
    (5000, 512, 4),      # padded tail + heavy duplicates (stability bites)
])
def test_argsort_fast_path_oracle(n, L, and_count, method):
    """2-plane argsort (payload == index): bit-exact with the stable
    oracle — the index plane the stable pipeline rides IS the payload."""
    k = prng.hybrid_taus_bits(n, seed=n % 71, and_count=and_count)
    ok, operm = rangesweep.argsort_rangesweep(k, seg_elems=L, method=method)
    ek, eperm = _argsort_oracle(k)
    np.testing.assert_array_equal(np.asarray(ok), np.asarray(ek))
    np.testing.assert_array_equal(np.asarray(operm), np.asarray(eperm))


def test_argsort_fast_path_adversarial():
    # all-equal (one value straddles every bucket) and sentinel collision:
    # the permutation must stay exactly iota / stable order
    n, L = 6000, 512
    for k in (jnp.full((n,), 7, jnp.uint32),
              jnp.full((n,), 0xFFFFFFFF, jnp.uint32),
              jnp.where(jnp.arange(n) % 3 == 0,
                        jnp.uint32(0xFFFFFFFF),
                        jnp.uint32(42))):
        ok, operm = rangesweep.argsort_rangesweep(k, seg_elems=L)
        ek, eperm = _argsort_oracle(k)
        np.testing.assert_array_equal(np.asarray(ok), np.asarray(ek))
        np.testing.assert_array_equal(np.asarray(operm), np.asarray(eperm))


def test_argsort_auto_route_gate_cpu():
    """ops.argsort under AUTO stays the oracle on CPU even with the index
    threshold installed (platform gate), and matches jnp.argsort stable;
    descending is the element-wise reverse."""
    from gpusorting_tpu.core import config
    from gpusorting_tpu import ops

    override = config.RoutingParameters(rangesweep_min_index=1 << 10)
    config.set_routing_override(override)
    try:
        k = prng.hybrid_taus_bits(5000, seed=31, and_count=4)
        perm = ops.argsort(k)
        np.testing.assert_array_equal(
            np.asarray(perm), np.argsort(np.asarray(k), kind="stable"))
        sk, perm2 = ops.argsort(k, return_keys=True)
        np.testing.assert_array_equal(np.asarray(perm2), np.asarray(perm))
        np.testing.assert_array_equal(np.asarray(sk),
                                      np.sort(np.asarray(k)))
        pdesc = ops.argsort(k, order=config.Order.DESCENDING)
        np.testing.assert_array_equal(np.asarray(pdesc),
                                      np.asarray(perm)[::-1])
    finally:
        config.clear_routing_override()


def test_wide_auto_route_gate_cpu():
    """sort_pairs_wide under AUTO stays the XLA oracle on CPU even with
    the wide threshold installed (platform gate), and output is exact."""
    from gpusorting_tpu.core import config
    from gpusorting_tpu import ops

    override = config.RoutingParameters(rangesweep_min_pairs_wide=1 << 10)
    config.set_routing_override(override)
    try:
        n = 3000
        k = prng.hybrid_taus_bits(n, seed=21, and_count=3)
        lo = jnp.arange(n, dtype=jnp.uint32)
        hi = prng.hybrid_taus_bits(n, seed=22)
        ok, olo, ohi = ops.sort_pairs_wide(k, lo, hi)
        ek, elo, ehi = jax.lax.sort((k, lo, hi), num_keys=1, is_stable=True)
        np.testing.assert_array_equal(np.asarray(ok), np.asarray(ek))
        np.testing.assert_array_equal(np.asarray(olo), np.asarray(elo))
        np.testing.assert_array_equal(np.asarray(ohi), np.asarray(ehi))
    finally:
        config.clear_routing_override()


# ---- round 5: hierarchical cuts (head-window exact selection) --------------


def _gen_cuts_case(kind, n, seed):
    rng = np.random.default_rng(seed)
    if kind == "rand":
        return rng.integers(0, 2**32, n, dtype=np.uint32)
    if kind == "dup16":
        return rng.integers(0, 16, n, dtype=np.uint32)
    if kind == "alleq":
        return np.full(n, 0xABCD1234, np.uint32)
    if kind == "lowhi":
        return np.where(np.arange(n) % 2 == 0, 0,
                        0xFFFFFFFF).astype(np.uint32)
    return np.arange(n, dtype=np.uint32)  # iota


@pytest.mark.parametrize("kind", ["rand", "dup16", "alleq", "lowhi", "iota"])
@pytest.mark.parametrize("K,L", [(2, 256), (8, 1024), (16, 2048),
                                 (33, 128), (8, 131072)])
def test_hier_cuts_equal_bisect(kind, K, L):
    """The head-window cuts are BIT-IDENTICAL to the flat bisection on
    every distribution (the total-order rank semantics is unique) —
    including all-equal keys (rank windows survive duplicate heads),
    K > rows-per-chunk (33, 128 -> R=1), and small-K/large-L."""
    x = _gen_cuts_case(kind, K * L, seed=K * 7 + L % 97)
    x2 = jnp.sort(jnp.asarray(x).reshape(K, L), axis=1)
    old = np.asarray(rangesweep._exact_cuts(x2, K, L))
    new = np.asarray(rangesweep._exact_cuts_hier(x2, K, L))
    np.testing.assert_array_equal(old, new)


def test_hier_cuts_engine_oracle():
    """End-to-end engines with cuts="hier": keys unstable-oracle, pairs
    and argsort stable-oracle identity (heavy duplicates so run splits
    actually straddle chunk boundaries)."""
    n, L = 33_000, 1024
    k = prng.hybrid_taus_bits(n, seed=3) & jnp.uint32(0xFF)
    out = np.asarray(rangesweep.sort_codes_rangesweep(
        k, seg_elems=L, cuts="hier"))
    np.testing.assert_array_equal(out, np.sort(np.asarray(k)))
    v = jnp.arange(n, dtype=jnp.uint32)
    ek, ev = jax.lax.sort((k, v), num_keys=1, is_stable=True)
    gk, gv = rangesweep.sort_pairs_rangesweep(k, v, seg_elems=L, cuts="hier")
    np.testing.assert_array_equal(np.asarray(gk), np.asarray(ek))
    np.testing.assert_array_equal(np.asarray(gv), np.asarray(ev))
    sk, perm = rangesweep.argsort_rangesweep(k, seg_elems=L, cuts="hier")
    np.testing.assert_array_equal(np.asarray(perm), np.asarray(ev))


def test_cuts_dispatch():
    """None -> auto by K (_CUTS_HIER_MIN_K); unknown method raises."""
    K, L = 4, 512
    x2 = jnp.sort(jnp.asarray(
        _gen_cuts_case("rand", K * L, 5)).reshape(K, L), axis=1)
    np.testing.assert_array_equal(
        np.asarray(rangesweep._cuts(x2, K, L)),
        np.asarray(rangesweep._exact_cuts(x2, K, L)))
    with pytest.raises(ValueError):
        rangesweep._cuts(x2, K, L, method="nope")
