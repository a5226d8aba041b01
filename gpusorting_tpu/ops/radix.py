"""Pallas TPU radix sort pipeline (the product compute path).

Architecture (TPU-first; see SURVEY.md §2.7 for the reference mapping):

  The reference's OneSweep chained-scan-with-decoupled-lookback
  (SweepCommon.hlsl:268-425) depends on forward-progress guarantees that TPU
  does not provide.  On TPU the grid of a `pallas_call` executes sequentially
  on a core, so a single VMEM carry register replaces the whole
  flags/index/lookback machinery: every pass is one streaming kernel with a
  running (R,)-digit offset accumulator — a "grid-serialized OneSweep".

  Pipeline per sort:
    1. global_histogram  — one read of the input, histograms for all passes
                           at once (reference: SweepCommon.hlsl:69-117).
    2. exclusive scans   — tiny (passes x R) cumsums.
    3. per pass: binning — tiles stream through VMEM; elements are grouped
                           by digit locally, then each digit run is DMA'd to
                           its global position with dynamic-size row-aligned
                           copies; partial rows ride a per-digit VMEM carry.

Until the binning kernel lands, this module routes to the XLA backend so the
API surface is complete and bit-exact; `is_native()` reports which path ran.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.config import Order
from . import xla_sort

_NATIVE = False


def is_native() -> bool:
    """True when sorts execute in Pallas kernels (vs the XLA fallback)."""
    return _NATIVE


def sort(keys: jnp.ndarray, order: Order = Order.ASCENDING, variant: str = "onesweep"):
    return xla_sort.sort_keys(keys, order=order)


def sort_pairs(
    keys: jnp.ndarray,
    values: jnp.ndarray,
    order: Order = Order.ASCENDING,
    variant: str = "onesweep",
):
    return xla_sort.sort_pairs(keys, values, order=order)
