#!/usr/bin/env python
"""Round-4j: pairs rangesweep AUTO crossover.

2^28 is measured (hw_pairs_rangesweep_r4.log): 1201.6 (seg 2^22) vs the
flat stable oracle's 1305.5 ms — an 8.0% win.  This prices 2^27 at the
two plausible seg choices against the oracle's measured 582.6 ms
(hw_pairs_probe_r4.log) to place rangesweep_min_pairs.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

from benches.hw_pairs_rangesweep import timed


def main():
    import jax

    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    n = 1 << 27
    for lgs in (22, 21):
        timed(n, 5, "rangesweep", L=1 << lgs)
    timed(n, 5, "flat")
    return 0


if __name__ == "__main__":
    sys.exit(main())
