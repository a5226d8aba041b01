"""Console driver: `python -m gpusorting_tpu <command>`.

The reference ships executable entry points that construct sorters and run
the test/timing suites — `main()` in GPUSortingD3D12.cpp:118-160 (D3D12
demo: TestAll + BatchTiming per algorithm) and GPUSortingCUDA.cu:16-58
(CUDA: OneSweep/DVR/CUB keys+pairs tests and 2^28 timings, then SplitSort
tests).  This module is that L5 driver for the TPU framework: the same
suites, driven from the installed package instead of a compiled binary.

Commands:
  info      device probe + tuning row dump (Tuner.h:916-923 analog)
  test      boundary-exhaustive TestAll for one sorter config
  supertest 18-config matrix (Tests.h:6-368 analog)
  bench     BatchTiming at a given size; one JSON line per run
  segsort   SplitSort property + oracle test (SplitSortTests.cuh analog)
  autotune  live tile sweep -> measured tuning row (utils/autotune.py)

Unlike the reference (exit code always 0, SURVEY.md §4), failing suites
exit non-zero so the driver composes with CI.
"""

from __future__ import annotations

import argparse
import dataclasses
import json
import sys


def _parse_size(s: str) -> int:
    """Accept plain ints and the 2^k form used throughout the benches."""
    s = s.strip()
    if "^" in s:
        base, exp = s.split("^", 1)
        return int(base) ** int(exp)
    return int(s)


def _sorter_cls(name: str):
    import gpusorting_tpu as gst

    table = {
        "onesweep": gst.OneSweep,
        "device_radix": gst.DeviceRadixSort,
        "forward_sweep": gst.ForwardSweep,
        "emulated_deadlocking": gst.EmulatedDeadlocking,
        "ffx": gst.FFXParallelSort,
    }
    return table[name]


def _config(args):
    import gpusorting_tpu as gst

    kt = {"u32": gst.KeyType.UINT32, "i32": gst.KeyType.INT32,
          "f32": gst.KeyType.FLOAT32}[args.key]
    order = gst.Order.ASCENDING if args.order == "asc" else gst.Order.DESCENDING
    backend = {"auto": gst.Backend.AUTO, "xla": gst.Backend.XLA,
               "pallas": gst.Backend.PALLAS}[args.backend]
    mode = gst.Mode.PAIRS if args.mode == "pairs" else gst.Mode.KEYS_ONLY
    return gst.SortConfig(mode=mode, order=order, key_type=kt, backend=backend)


def _add_config_args(p):
    p.add_argument("--algorithm", default="onesweep",
                   choices=["onesweep", "device_radix", "forward_sweep",
                            "emulated_deadlocking", "ffx"])
    p.add_argument("--mode", default="keys", choices=["keys", "pairs"])
    p.add_argument("--key", default="u32", choices=["u32", "i32", "f32"])
    p.add_argument("--order", default="asc", choices=["asc", "desc"])
    p.add_argument("--backend", default="auto",
                   choices=["auto", "xla", "pallas"])


def cmd_info(args) -> int:
    import gpusorting_tpu as gst

    info = gst.get_device_info()
    rows = {
        mode.value: dataclasses.asdict(gst.get_tuning_parameters(info, mode))
        for mode in (gst.Mode.KEYS_ONLY, gst.Mode.PAIRS)
    }
    from gpusorting_tpu.core.config import get_routing_parameters

    routing = dataclasses.asdict(get_routing_parameters(info))
    print(json.dumps({"device": dataclasses.asdict(info), "tuning": rows,
                      "routing": routing},
                     indent=None if args.json else 2))
    return 0


def cmd_test(args) -> int:
    sorter = _sorter_cls(args.algorithm)(_config(args))
    report = sorter.test_all(
        boundary_window=args.window,
        boundary_stride=args.stride,
        large_sizes=tuple(_parse_size(s) for s in args.large),
    )
    print(f"{args.algorithm}: {report}")
    return 0 if report.all_passed else 1


def cmd_supertest(args) -> int:
    from gpusorting_tpu import api

    report = api.super_test(
        sorter_cls=_sorter_cls(args.algorithm),
        sizes=tuple(_parse_size(s) for s in args.sizes),
    )
    print(f"supertest {args.algorithm}: {report}")
    return 0 if report.all_passed else 1


def cmd_bench(args) -> int:
    import gpusorting_tpu as gst

    sorter = _sorter_cls(args.algorithm)(_config(args))
    res = sorter.batch_timing(
        _parse_size(args.n), batch=args.batch, seed=args.seed,
        entropy=gst.EntropyPreset(args.entropy),
    )
    print(json.dumps(res))
    if res.get("timing_floored"):
        print("warning: sort time below measurement noise at this n/batch; "
              "raise --n or --batch for a meaningful rate", file=sys.stderr)
    return 0


def cmd_segsort(args) -> int:
    import numpy as np
    import jax.numpy as jnp

    from gpusorting_tpu import segsort
    from gpusorting_tpu.core import prng
    from gpusorting_tpu.ops import xla_sort

    total = _parse_size(args.total)
    offs, count = prng.make_random_segments(total, args.maxlen, seed=args.seed)
    keys = prng.make_test_keys(total, seed=args.seed + 1)
    if args.bits < 32:
        # bits_to_sort contract: caller guarantees keys < 2^bits
        # (SplitSort.cuh:702; generators mask the same way,
        # UtilityKernels.cuh:170-248)
        keys = keys & jnp.uint32((1 << args.bits) - 1)
    vals = jnp.arange(total, dtype=jnp.uint32)
    k, v = segsort.split_sort_pairs(offs, keys, vals, int(count),
                                    bits_to_sort=args.bits)
    rk, rv = xla_sort.segmented_sort_pairs(offs, keys, vals)
    ok = (np.asarray(k) == np.asarray(rk)).all() and (
        np.asarray(v) == np.asarray(rv)).all()
    print(f"segsort total={total} maxlen={args.maxlen} segs={int(count)} "
          f"bits={args.bits}: {'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


def cmd_dist(args) -> int:
    # platform shaping must precede first backend use (the axon plugin
    # overrides the JAX_PLATFORMS env var — CLAUDE.md rig notes)
    if args.cpu_mesh:
        import jax

        jax.config.update("jax_platforms", "cpu")
        jax.config.update("jax_num_cpu_devices", args.cpu_mesh)

    import numpy as np
    import jax.numpy as jnp

    from gpusorting_tpu.core import prng
    from gpusorting_tpu.parallel import dist_sort

    mesh = dist_sort.make_mesh()
    n_dev = mesh.devices.size
    n = -(-_parse_size(args.n) // n_dev) * n_dev
    keys = prng.make_test_keys(n, seed=args.seed, key_dtype=jnp.uint32)
    out, overflow = dist_sort.distributed_sort_gather(
        keys, mesh=mesh, exchange=args.exchange)
    ok = overflow == 0 and (
        np.asarray(out) == np.sort(np.asarray(keys), kind="stable")).all()
    print(f"dist n={n} devices={n_dev} exchange={args.exchange}: "
          f"{'PASS' if ok else 'FAIL'} (overflow={overflow})")
    return 0 if ok else 1


def cmd_autotune(args) -> int:
    import gpusorting_tpu as gst

    if args.rangesweep:
        params, sweep = gst.autotune_rangesweep(
            n_max=_parse_size(args.n), batch=args.batch,
            install=args.install)
        print(json.dumps({
            "sweep": sweep,
            "rangesweep_min": params.rangesweep_min,
            "rangesweep_seg_elems": params.rangesweep_seg_elems,
            "rangesweep_min_pairs": params.rangesweep_min_pairs,
            "rangesweep_seg_elems_pairs": params.rangesweep_seg_elems_pairs,
            "installed": args.install,
        }))
        return 0
    if args.routing:
        params, sweep = gst.autotune_routing(
            n=_parse_size(args.n), batch=args.batch, install=args.install)
        print(json.dumps({
            "sweep": sweep,
            "map_rows_min_keys": params.map_rows_min_keys,
            "map_rows_min_pairs": params.map_rows_min_pairs,
            "window_max_pairs": params.window_max_pairs,
            "measured": params.measured,
            "installed": args.install,
        }))
        return 0
    mode = gst.Mode.PAIRS if args.mode == "pairs" else gst.Mode.KEYS_ONLY
    params, sweep = gst.autotune(
        mode, n=_parse_size(args.n), tiles=tuple(args.tiles),
        batch=args.batch, install=args.install, engine=args.engine,
    )
    print(json.dumps({
        "sweep_keys_per_sec": sweep,
        "best_tile": params.radix_tile_rows,
        "engine": args.engine,
        "measured": params.measured,
        "installed": args.install,
    }))
    return 0


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m gpusorting_tpu",
        description=__doc__.split("\n\n")[0],
    )
    sub = p.add_subparsers(dest="command", required=True)

    sp = sub.add_parser("info", help="device probe + tuning rows")
    sp.add_argument("--json", action="store_true", help="one-line JSON")
    sp.set_defaults(fn=cmd_info)

    sp = sub.add_parser("test", help="boundary-exhaustive TestAll")
    _add_config_args(sp)
    sp.add_argument("--window", type=int, default=None,
                    help="boundary window start (default: tuner partition)")
    sp.add_argument("--stride", type=int, default=257,
                    help="sweep stride; 1 = the exhaustive reference sweep "
                         "(GPUSortBase.h:245-248 — at the default 2^18 "
                         "partition that is 262k sizes, hours-to-weeks of "
                         "wall time; the default prime stride covers every "
                         "mod-128 lane residue in ~1k sizes)")
    sp.add_argument("--large", nargs="*", default=["2^21"],
                    help="large sizes (accepts 2^k)")
    sp.set_defaults(fn=cmd_test)

    sp = sub.add_parser("supertest", help="18-config matrix")
    _add_config_args(sp)
    sp.add_argument("--sizes", nargs="*", default=["2^12", "4109"])
    sp.set_defaults(fn=cmd_supertest)

    sp = sub.add_parser("bench", help="BatchTiming; prints one JSON line")
    _add_config_args(sp)
    sp.add_argument("--n", default="2^24", help="keys per sort (accepts 2^k)")
    sp.add_argument("--batch", type=int, default=10)
    sp.add_argument("--seed", type=int, default=10)
    sp.add_argument("--entropy", type=int, default=1, choices=[1, 2, 3, 4, 5])
    sp.set_defaults(fn=cmd_bench)

    sp = sub.add_parser("segsort", help="SplitSort oracle-identity test")
    sp.add_argument("--total", default="2^16")
    sp.add_argument("--maxlen", type=int, default=256)
    sp.add_argument("--bits", type=int, default=32)
    sp.add_argument("--seed", type=int, default=7)
    sp.set_defaults(fn=cmd_segsort)

    sp = sub.add_parser("dist", help="distributed sort correctness run")
    sp.add_argument("--n", default="2^16")
    sp.add_argument("--seed", type=int, default=11)
    sp.add_argument("--exchange", default="collective",
                    choices=["collective", "remote_dma"])
    sp.add_argument("--cpu-mesh", type=int, default=0, metavar="N",
                    help="force an N-virtual-device CPU mesh (must be the "
                         "first backend use in the process)")
    sp.set_defaults(fn=cmd_dist)

    sp = sub.add_parser("autotune", help="live tile sweep -> measured row")
    sp.add_argument("--mode", default="keys", choices=["keys", "pairs"])
    sp.add_argument("--n", default="2^22")
    sp.add_argument("--tiles", nargs="*", type=int,
                    default=[256, 512, 1024, 2048])
    sp.add_argument("--batch", type=int, default=3)
    sp.add_argument("--install", action="store_true",
                    help="register the measured row as a process override")
    sp.add_argument("--engine", default="radix16",
                    choices=["radix16", "rts", "splitsweep"],
                    help="native engine to time in the tile sweep")
    sp.add_argument("--routing", action="store_true",
                    help="sweep the routing crossovers (map/window) "
                         "instead of the radix tile")
    sp.add_argument("--rangesweep", action="store_true",
                    help="sweep the flagship rangesweep crossovers "
                         "(flat-oracle A/B at --n and below; minutes "
                         "of wall clock at the default 2^28)")
    sp.set_defaults(fn=cmd_autotune)
    return p


def main(argv=None) -> int:
    args = build_parser().parse_args(argv)
    return args.fn(args)


if __name__ == "__main__":
    sys.exit(main())
