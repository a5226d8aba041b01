#!/usr/bin/env python
"""Round-5 campaign 12: WHERE does the exchange's in-pipeline premium live?

Campaign-11 closed the issue-cost theory: the relocate kernel ISOLATED
runs at the DMA floor (7.8 ms at K=128, 13.2 at K=256; V1 overlap-copies
and multiplane fusion win nothing), and prep is 0.5 ms at K=128.  Yet
the full keys engine's (exchange + phase-3) block costs ~196.3 ms
against a 176.1 ms mapped-sort baseline + 8.3 kernel+prep — a ~12 ms
premium that only appears IN PIPELINE.  Hypothesis: the (K, L) mapped
sort output <-> (rows, 128) kernel view is a genuine TPU RELAYOUT (tiled
last-two-dims), i.e. XLA materializes a 1 GiB copy on one or both sides.

  D0. mapped-sort-only baseline, same process (expect ~176)
  D1. gen -> mapped sort -> V0 kernel        (premium on the src side?)
  D2. gen -> V0 kernel -> mapped sort        (premium on the dst side?)
  D3. gen -> sort -> V0 -> sort              (both; expect ~360 if free)
  D4. D3 with the map bodies consuming/producing (l_rows, 128) chunk
      SHAPES (sort flattens in-VMEM inside the body) — if the relayout
      theory holds, this form dodges the HBM copy and D4 < D3.

Decides: whether to reshape the production engine's phase boundaries.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gpusorting_tpu.ops import xla_sort
from gpusorting_tpu.ops.rangesweep import LANES

from benches.hw_r5_campaign3 import timed
from benches.hw_r5_campaign11 import N, build_ctrl, v0_call


def main():
    print(json.dumps({"devices": str(jax.devices())}), flush=True)
    L = 1 << 21
    l_rows = L // LANES
    K = N // L
    rows_total = K * l_rows
    ctrl_np, fringe_dev, _ = build_ctrl(L, 0xFFFFFFFF)
    ctrl = jax.device_put(jnp.asarray(ctrl_np))
    v0 = v0_call(K, l_rows)

    def msort(x):
        return jax.lax.map(
            lambda r: xla_sort.sort_all_keys_unstable((r,))[0],
            x.reshape(K, L))

    def msort_2d(x2):
        # map body takes/returns (l_rows, 128) — flatten happens in-VMEM
        def body(r2):
            s = xla_sort.sort_all_keys_unstable((r2.reshape(-1),))[0]
            return s.reshape(l_rows, LANES)

        return jax.lax.map(body, x2.reshape(K, l_rows, LANES))

    def kern(x):
        (o,) = v0(ctrl, (x.reshape(rows_total, LANES).view(jnp.int32),),
                  (fringe_dev,))
        return o.view(jnp.uint32)

    timed("D0_msort", N, lambda k: msort(k).reshape(-1))
    timed("D1_sort_kern", N, lambda k: kern(msort(k).reshape(-1)).reshape(-1))
    timed("D2_kern_sort", N, lambda k: msort(kern(k).reshape(-1)).reshape(-1))
    timed("D3_sort_kern_sort", N,
          lambda k: msort(kern(msort(k).reshape(-1)).reshape(-1)).reshape(-1))
    timed("D4_sort_kern_sort_2d", N,
          lambda k: msort_2d(kern(
              msort_2d(k.reshape(K, l_rows, LANES)).reshape(-1)
          ).reshape(K, l_rows, LANES)).reshape(-1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
