"""Native Pallas sort dispatch — the engine-family router.

Variant map (reference README.md:5-15 families -> engines):
  "onesweep"/"forward_sweep" -> Batcher network (`bitonic.py`), the
      skew-immune default of the PALLAS backend (will switch to a radix
      engine once one beats XLA at the flagship size)
  "device_radix"             -> 3-phase reduce-then-scan (`rts.py`)
  "ffx"                      -> fused radix16 at fixed tuning (`radix16.py`)
  "emulated_deadlocking"     -> radix16 as chained tile-range segments with
                                explicit carry handoff (fault injection)
  "splitsweep"               -> splitter-partition + sub-sort hybrid
                                (`splitsweep.py`)

All engines sort the same u32 codes and are bit-exact with the XLA oracle,
including stable pairs.  Round-2 measurements and the reasons AUTO still
resolves to XLA live in `is_native()` below and docs/ROADMAP_perf.md.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core import codec
from ..core.config import Order
from . import bitonic, xla_sort


def is_native() -> bool:
    """True when the AUTO backend would run sorts in native Pallas kernels.

    Round-2 hardware status (v5e, 2^24 keys): XLA flat 17.8 ms; native
    engines — fused radix16 97.8 ms (tile 2048, best tuned), 3-phase rts
    similar, splitsweep hybrid 34.1 ms.  At 2^28 XLA decays to 467 ms but
    every native composition still lands at 600 ms+ (the per-bucket
    placement work is the measured wall: rotations ~1 ms/pass + bf16 byte
    planes ~8 ms/pass at 2^24, and every cheaper variant either crashes
    this Mosaic (f32 matmuls), de-pipelines (per-block conditionals), or
    is neutral (fused wide matmuls) — probes/PROBES.md).  AUTO therefore
    still resolves to XLA; flipping this bool is gated on a native engine
    actually beating the XLA path at 2^28.
    """
    return False


def sort(keys: jnp.ndarray, order: Order = Order.ASCENDING, variant: str = "onesweep"):
    """Native-path typed key sort (keys-only; radix order on codes).

    variant "device_radix" selects the native LSD radix-16 engine
    (ops/radix16.py — the reduce-then-scan / OneSweep-equivalent pipeline,
    runs under interpret mode off-TPU); "splitsweep" selects the hybrid;
    other variants use the sorting network.
    """
    kt = codec.key_type_of(keys)
    codes = codec.encode_keys(keys)
    if variant == "device_radix":
        # the 3-phase reduce-then-scan pipeline (DeviceRadixSort analog)
        from . import rts

        sc = rts.sort_codes_rts(codes)
    elif variant == "ffx":
        # the REAL FFX pipeline: Count -> CountReduce -> Scan -> ScanAdd ->
        # Scatter, two-level scan hierarchy at fixed tuning (ops/ffx.py;
        # FFXParallelSort.cpp:242-328) — structurally distinct from both
        # the fused (radix16) and 3-phase (rts) engines
        from . import ffx

        sc = ffx.sort_codes_ffx(codes)
    elif variant == "emulated_deadlocking":
        # adversarial-scheduling analog: the same radix pipeline executed as
        # segmented tile ranges with explicit carry handoff (radix16 docs)
        from . import radix16

        sc = radix16.sort_codes_radix16(
            codes, segments=radix16.adversarial_segments(codes.shape[0]))
    elif variant == "splitsweep":
        from . import splitsweep

        sc = splitsweep.sort_codes_splitsweep(codes)
    else:
        sc = bitonic.sort_codes(codes)
    out = codec.decode_keys(sc, kt)
    if order == Order.DESCENDING:
        out = jnp.flip(out, axis=0)
    return out


def sort_pairs(
    keys: jnp.ndarray,
    values: jnp.ndarray,
    order: Order = Order.ASCENDING,
    variant: str = "onesweep",
):
    """Native-path stable pair sort; bit-exact with xla_sort.sort_pairs.

    variant "device_radix" routes 32-bit payloads through the native LSD
    radix-16 pipeline on TPU (ops/radix16.py).
    """
    kt = codec.key_type_of(keys)
    bits = codec.payload_to_bits(values)
    if bits.dtype == jnp.uint64:
        # 64-bit payloads ride as two u32 planes (no 64-bit VPU lanes on TPU).
        lo = (bits & jnp.uint64(0xFFFFFFFF)).astype(jnp.uint32)
        hi = (bits >> jnp.uint64(32)).astype(jnp.uint32)
        sc, slo, shi = bitonic.sort_codes_stable_with(
            codec.encode_keys(keys), lo, hi)
        sbits = slo.astype(jnp.uint64) | (shi.astype(jnp.uint64) << jnp.uint64(32))
    elif variant == "device_radix":
        from . import rts

        sc, sbits = rts.sort_pairs_rts(codec.encode_keys(keys), bits)
    elif variant == "splitsweep":
        from . import splitsweep

        sc, sbits = splitsweep.sort_pairs_splitsweep(
            codec.encode_keys(keys), bits)
    elif variant == "emulated_deadlocking":
        from . import radix16

        segs = radix16.adversarial_segments(keys.shape[0])
        sc, sbits = radix16.sort_pairs_radix16(
            codec.encode_keys(keys), bits, segments=segs)
    elif variant == "ffx":
        from . import ffx

        sc, sbits = ffx.sort_pairs_ffx(codec.encode_keys(keys), bits)
    else:
        sc, sbits = bitonic.sort_codes_stable_with(codec.encode_keys(keys), bits)
    out_k = codec.decode_keys(sc, kt)
    out_v = codec.bits_to_payload(sbits, values.dtype)
    if order == Order.DESCENDING:
        out_k = jnp.flip(out_k, axis=0)
        out_v = jnp.flip(out_v, axis=0)
    return out_k, out_v
