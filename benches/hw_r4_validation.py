#!/usr/bin/env python
"""Round-4 hardware validation: the VERDICT r3 'Done' criteria that need
a real chip.

  1. multi-class segsort dispatch (VERDICT #2): random pairs maxlen 32768
     and 65536 at 2^22 total — auto route (histogram plan -> per-class
     padded row sorts) vs the same workload forced through the whole-buffer
     composite.  Done = >= 2x composite, oracle-exact.
  2. entropy auto-route (VERDICT #9): gst.sort PALLAS device_radix at 2^24
     through the PUBLIC api, E020 vs uniform — E020 must win with no
     manual tuning, uniform unregressed vs the explicit production tile.
  3. u64-payload variant routing (VERDICT #5): sort_pairs_wide
     variant=device_radix runs radix16 3-operand, bit-exact vs lax.sort.
  4. megacore-safe rts downsweep (VERDICT #6): GST_MEGACORE=1 forces the
     edge-side-buffer + parallel-grid mode on this single-core v5e —
     bit-exact vs the default sequential-RMW form (run separately with
     the env var; this script checks whichever mode the env selects).

Sections select with argv, e.g. `hw_r4_validation.py segsort entropy`.


HISTORICAL (round 4): section (a) exercises the host entropy peek
(radix._entropy_tile_hint), which round 5 DELETED after the A/B
reversal — this script documents the r4 campaign and no longer runs at
HEAD.  The entropy signature now comes from rangesweep's on-device
constant-block skip (hw_r5_campaign7).
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

import gpusorting_tpu as gst
from gpusorting_tpu.core import codec, config, prng
from gpusorting_tpu.ops import radix
from gpusorting_tpu.segsort import splitsort
from gpusorting_tpu.utils import timing


def emit(name, res=None, extra=None):
    row = {"bench": name}
    if res is not None:
        row.update({k: res[k] for k in (
            "keys_per_sec", "seconds_per_sort", "n", "batch",
            "timing_floored", "spread_min_s", "spread_max_s")})
    row.update(extra or {})
    print(json.dumps(row), flush=True)


def check_exact(tag, got, want):
    ok = bool((np.asarray(got) == np.asarray(want)).all())
    emit(tag, extra={"exact": ok})
    if not ok:
        print(f"FAIL: {tag} mismatch", file=sys.stderr)
        sys.exit(1)


def sec_segsort(total=1 << 22):
    for max_len in (32768, 65536):
        offs, S = prng.make_random_segments(total, max_len, seed=3)
        plan = splitsort._window_dispatch(offs, total, int(S))
        # correctness once, vs the composite oracle
        k0 = prng.hybrid_taus_bits(total, seed=77)
        v0 = jnp.arange(total, dtype=jnp.uint32)
        rk, rv = splitsort.split_sort_pairs(offs, k0, v0, int(S), total)
        ck, cv = splitsort._composite_segmented_sort(
            offs, k0, v0, int(S), 32)
        check_exact(f"segsort_mc_maxlen{max_len}_exact_keys", rk,
                    codec.decode_keys(ck, codec.key_type_of(k0)))
        check_exact(f"segsort_mc_maxlen{max_len}_exact_vals", rv, cv)

        def auto_fn(codes, offs=offs, S=S):
            k, _ = splitsort.split_sort_pairs(offs, codes, codes, int(S),
                                              total)
            return k

        def comp_fn(codes, offs=offs, S=S):
            sc, _ = splitsort._composite_segmented_sort(
                offs, codes, codes, int(S), 32)
            return sc

        res_a = timing.batch_timing(auto_fn, total, batch=5, seed=10,
                                    repeats=2)
        res_c = timing.batch_timing(comp_fn, total, batch=5, seed=10,
                                    repeats=2)
        emit(f"segsort_mc_maxlen{max_len}_auto", res_a,
             {"segments": int(S),
              "route": "multi_class" if plan else "composite"})
        emit(f"segsort_mc_maxlen{max_len}_composite", res_c,
             {"segments": int(S)})
        emit(f"segsort_mc_maxlen{max_len}_speedup", extra={
            "x": res_c["seconds_per_sort"] / res_a["seconds_per_sort"]})


def sec_entropy(n=1 << 24):
    """PUBLIC api, no manual tuning: the host entropy peek routes E020 to
    the small tile.  The peek is a host decision on CONCRETE inputs (under
    jit the static default holds), so the validation decomposes:

      a. routing: _entropy_tile_hint picks entropy_tile_rows for concrete
         E020 codes and None (tuner default) for uniform — checked on the
         live device with real generated inputs;
      b. timing: the two tiles measured jit-chained (the honest harness on
         this rig) at both entropies — E020 must win on the routed tile,
         uniform must not lose on its default.

    Note the peek itself costs one ~2048-element host fetch (~30 ms
    through THIS tunnel, ~us on a local attachment) — per-call overhead a
    wall-clock A/B here would mis-attribute, which is why the route is
    gated on entropy_peek_min and validated decomposed."""
    # the route defaults OFF since the r4 A/B (hw_entropy_ab_r4.log);
    # install a routed tile so the DECISION machinery stays testable
    config.set_routing_override(gst.RoutingParameters(
        entropy_tile_rows=512))
    r = config.get_routing_parameters()
    prod_tile = config.get_tuning_parameters().radix_tile_rows

    e_codes = prng.make_test_keys(n, 3, jnp.uint32, gst.EntropyPreset.E020)
    u_codes = prng.make_test_keys(n, 3, jnp.uint32, gst.EntropyPreset.E100)
    hint_e = radix._entropy_tile_hint(e_codes)
    hint_u = radix._entropy_tile_hint(u_codes)
    emit("entropy_route_decision", extra={
        "e020_hint": hint_e, "uniform_hint": hint_u,
        "expected_e020": r.entropy_tile_rows,
        "routes_correctly": hint_e == r.entropy_tile_rows
                            and hint_u is None})

    def run(preset, tile_rows):
        f = lambda keys: gst.sort(keys, backend=gst.Backend.PALLAS,
                                  variant="device_radix",
                                  tile_rows=tile_rows)
        return timing.batch_timing(f, n, batch=4, seed=11, repeats=2,
                                   entropy=preset)

    res_e_routed = run(gst.EntropyPreset.E020, r.entropy_tile_rows)
    res_e_prod = run(gst.EntropyPreset.E020, prod_tile)
    res_u_prod = run(gst.EntropyPreset.E100, prod_tile)
    res_u_small = run(gst.EntropyPreset.E100, r.entropy_tile_rows)
    emit("entropy_E020_routed_tile", res_e_routed,
         {"tile": r.entropy_tile_rows})
    emit("entropy_E020_prodtile", res_e_prod, {"tile": prod_tile})
    emit("entropy_uniform_prodtile", res_u_prod, {"tile": prod_tile})
    emit("entropy_uniform_smalltile", res_u_small,
         {"tile": r.entropy_tile_rows})
    emit("entropy_route_verdict", extra={
        "e020_speedup_on_routed_tile":
            res_e_prod["seconds_per_sort"]
            / res_e_routed["seconds_per_sort"],
        "uniform_default_ok":
            res_u_prod["seconds_per_sort"]
            <= res_u_small["seconds_per_sort"] * 1.02,
    })
    config.clear_routing_override()


def sec_u64(n=(1 << 20) + 12345):
    k = prng.hybrid_taus_bits(n, seed=5) & jnp.uint32(0xFFFF)
    lo = prng.hybrid_taus_bits(n, seed=6)
    hi = prng.hybrid_taus_bits(n, seed=7)
    sk, slo, shi = gst.sort_pairs_wide(k, lo, hi,
                                       backend=gst.Backend.PALLAS,
                                       variant="device_radix")
    rk, rlo, rhi = jax.lax.sort((k, lo, hi), num_keys=1, is_stable=True)
    check_exact("u64_variant_device_radix_keys", sk, rk)
    check_exact("u64_variant_device_radix_lo", slo, rlo)
    check_exact("u64_variant_device_radix_hi", shi, rhi)


def sec_megacore(n=(1 << 21) + 777):
    from gpusorting_tpu.ops import rts

    mode = config.megacore_parallel()
    x = prng.hybrid_taus_bits(n, seed=9)
    out = np.asarray(rts.sort_codes_rts(x))
    np_ref = np.sort(np.asarray(x))
    check_exact(f"rts_megacore_parallel_{mode}", out, np_ref)
    # pairs through the same downsweep
    v = jnp.arange(n, dtype=jnp.uint32)
    sk, sv = rts.sort_pairs_rts(x, v)
    rk, rv = jax.lax.sort((x, v), num_keys=1, is_stable=True)
    check_exact(f"rts_megacore_parallel_{mode}_pairs_k", sk, rk)
    check_exact(f"rts_megacore_parallel_{mode}_pairs_v", sv, rv)


def main():
    sections = set(sys.argv[1:]) or {"segsort", "entropy", "u64",
                                     "megacore"}
    if "segsort" in sections:
        sec_segsort()
    if "entropy" in sections:
        sec_entropy()
    if "u64" in sections:
        sec_u64()
    if "megacore" in sections:
        sec_megacore()
    return 0


if __name__ == "__main__":
    sys.exit(main())
