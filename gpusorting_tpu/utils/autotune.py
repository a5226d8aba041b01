"""Live-device tuner: measure the tile sweep instead of shipping a table.

The reference selects TuningParameters from a ~190-GPU static table
(Tuner.h:14-927, GetTuningParameters :895-927) that its author populated by
benchmarking each card.  On TPU only the v5e row of our table is
hardware-measured (core/config.py _TUNING_TABLE); every other generation is
a scaled guess flagged `measured=False`.  This module closes that gap the
TPU-native way: run the same tile sweep the v5e row came from
(benches/ablate_radix16.py, round-2/3 hardware windows) ON THE LIVE DEVICE
and return a `measured=True` row — any current or future TPU generation
self-tunes in ~a minute instead of waiting for someone to bench it.

    params, sweep = autotune(Mode.PAIRS)        # measure, pick best tile
    autotune(Mode.PAIRS, install=True)          # and make the tuner use it

`install=True` registers the row as a process-wide override consulted by
`get_tuning_parameters` (the GetTuningParameters analog), so every engine
that reads the tuner — radix16/rts/splitsweep tile selection — picks it up
without threading `tile_rows=` overrides through call sites.
"""

from __future__ import annotations

import dataclasses

from ..core import config as _config
from ..core.config import Mode
from . import timing as _timing

_DEFAULT_TILES = (256, 512, 1024, 2048)


def autotune(
    mode: Mode = Mode.KEYS_ONLY,
    n: int = 1 << 22,
    tiles: tuple[int, ...] = _DEFAULT_TILES,
    batch: int = 3,
    seed: int = 10,
    install: bool = False,
):
    """Measure the radix tile sweep on the live device; return the best row.

    Times the native radix16 engine (the tile consumer) at each candidate
    `tiles` entry on `n` keys (pairs ride an identity payload in PAIRS
    mode), using the reference's batch-timing rules (utils/timing.py).
    Returns (TuningParameters, sweep) where sweep maps tile ->
    keys_per_sec; the returned row is the current generation's row with
    `radix_tile_rows` set to the measured winner and `measured=True`.

    With `install=True` the row also becomes a process-wide tuning
    override (clear with `config.clear_tuning_overrides()`).
    """
    from ..ops import radix16

    if not tiles:
        raise ValueError("tiles must be non-empty")
    sweep = {}
    for tile in tiles:
        if mode == Mode.PAIRS:
            def sort_fn(codes, _t=tile):
                return radix16.sort_pairs_radix16(codes, codes, tile_rows=_t)[0]
        else:
            def sort_fn(codes, _t=tile):
                return radix16.sort_codes_radix16(codes, tile_rows=_t)
        res = _timing.batch_timing(sort_fn, n, batch=batch, seed=seed)
        sweep[tile] = res["keys_per_sec"]
    best = max(sweep, key=sweep.get)
    base = _config.get_tuning_parameters(mode=mode)
    params = dataclasses.replace(base, radix_tile_rows=best, measured=True)
    if install:
        _config.set_tuning_override(mode, params)
    return params, sweep
