#!/usr/bin/env python
"""Rangesweep round-4e: the row-gather exchange, end-to-end.

hw_rowgather_probe: whole-array row gather = 20.5 ms at 2^28 (the DMA
relocate was ~55 ms — DMA-count-bound at ~40 us/descriptor).  Rows:

  - correctness (gather method) at 2^26+odd: uniform/E020/all-equal
  - full gather rangesweep at 2^28, segs 2^23 / 2^22 / 2^24
  - fused variant: the row gather riding INSIDE the phase-3 map body
    (per-bucket gather feeding the sort, no materialized exchange)
  - crossover: n = 2^27 and 2^26 vs XLA at the same n
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from gpusorting_tpu.core import prng
from gpusorting_tpu.ops import rangesweep, xla_sort
from gpusorting_tpu.utils import timing


def emit(name, res=None, extra=None):
    row = {"bench": name}
    if res is not None:
        row.update({k: res[k] for k in (
            "keys_per_sec", "seconds_per_sort", "n", "batch",
            "timing_floored", "spread_min_s", "spread_max_s")})
    row.update(extra or {})
    print(json.dumps(row), flush=True)


def fused_rangesweep(codes, L):
    """Phase-3-fused variant: per-bucket row gather inside the map."""
    n = codes.shape[0]
    K = n // L
    l_rows = L // 128
    x2 = jax.lax.map(lambda r: xla_sort.sort_all_keys_unstable((r,))[0],
                     codes.reshape(K, L))
    bounds = rangesweep._exact_cuts(x2, K, L)
    # reuse the library's map construction by calling the exchange with a
    # stub gather: rebuild src2/g here via the private helpers' math
    x = x2.reshape(-1)
    rows_total = n // 128
    slab_rows = 2 * K
    i_base = (jnp.arange(K, dtype=jnp.int32) * L)[:, None]
    g_start = bounds[:, :-1] + i_base
    g_end = bounds[:, 1:] + i_base
    a0 = -(-g_start // 128)
    a1 = g_end // 128
    nrows = jnp.maximum(a1 - a0, 0)
    nr_bi = nrows.T
    bulk_rows_b = jnp.sum(nr_bi, axis=1)
    lo_end = jnp.minimum(a0 * 128, g_end)
    front = lo_end - g_start
    hi_start = jnp.maximum(a1 * 128, lo_end)
    back = g_end - hi_start
    fr_bi = (front + back).T
    foff_bi = jnp.cumsum(fr_bi, axis=1) - fr_bi
    fringe_b = jnp.sum(fr_bi, axis=1)
    t = jax.lax.broadcasted_iota(jnp.int32, (K, slab_rows * 128), 1)
    c = jax.vmap(lambda fo, tt: jnp.searchsorted(
        fo, tt, side="right").astype(jnp.int32))(foff_bi, t) - 1
    c = jnp.clip(c, 0, K - 1)
    take = lambda m: jnp.take_along_axis(m.T, c, axis=1)
    j = t - take(foff_bi.T)
    src = jnp.where(j < take(front), take(g_start) + j,
                    take(hi_start) + (j - take(front)))
    valid = t < fringe_b[:, None]
    vals = jnp.where(valid.reshape(-1),
                     x[jnp.clip(src, 0, n - 1).reshape(-1)],
                     jnp.uint32(0xFFFFFFFF))
    fringe = vals.reshape(K * slab_rows, 128)

    cum = jnp.cumsum(nr_bi, axis=1) - nr_bi
    q = jax.lax.broadcasted_iota(jnp.int32, (K, l_rows), 1)
    i_sel = jax.vmap(lambda cb, qb: jnp.searchsorted(
        cb, qb, side="right").astype(jnp.int32))(cum, q) - 1
    i_sel = jnp.clip(i_sel, 0, K - 1)
    pick = lambda m: jnp.take_along_axis(m, i_sel, axis=1)
    src_bulk = pick(a0.T) + (q - pick(cum))
    is_slab = q >= bulk_rows_b[:, None]
    slab_base = (rows_total
                 + slab_rows * jnp.arange(K, dtype=jnp.int32)[:, None]
                 - bulk_rows_b[:, None])
    g = jnp.where(is_slab, slab_base + q, src_bulk)      # (K, l_rows)
    src2 = jnp.concatenate([x.reshape(rows_total, 128), fringe], axis=0)

    def body(gb):
        rows = jnp.take(src2, gb, axis=0).reshape(-1)
        return xla_sort.sort_all_keys_unstable((rows,))[0]

    return jax.lax.map(body, g).reshape(-1)


def main():
    n_c = (1 << 26) + 12345
    for tag, arr in [
        ("uniform", prng.hybrid_taus_bits(n_c, seed=5)),
        ("e020", prng.hybrid_taus_bits(n_c, seed=6, and_count=4)),
        ("all_equal", jnp.full((n_c,), 0xFFFFFFFF, jnp.uint32)),
    ]:
        out = np.asarray(rangesweep.sort_codes_rangesweep(
            arr, seg_elems=1 << 23, method="gather"))
        ok = bool((out == np.sort(np.asarray(arr))).all())
        emit(f"rangesweep_gather_exact_{tag}", extra={"exact": ok})
        if not ok:
            print(f"FAIL {tag}", file=sys.stderr)
            return 1
    # fused variant correctness (exact-multiple n)
    arr = prng.hybrid_taus_bits(1 << 26, seed=7)
    out = np.asarray(fused_rangesweep(arr, 1 << 23))
    ok = bool((out == np.sort(np.asarray(arr))).all())
    emit("rangesweep_fused_exact", extra={"exact": ok})
    if not ok:
        return 1

    n = 1 << 28
    for lg in (23, 22, 24):
        L = 1 << lg
        fn = lambda codes, L=L: rangesweep.sort_codes_rangesweep(
            codes, seg_elems=L, method="gather")
        res = timing.batch_timing(fn, n, batch=6, seed=10, repeats=2)
        emit(f"rangesweep_gather_2^28_seg2^{lg}", res,
             {"seg": L, "K": n // L})

    res = timing.batch_timing(
        lambda codes: fused_rangesweep(codes, 1 << 23), n,
        batch=6, seed=10, repeats=2)
    emit("rangesweep_fused_2^28_seg2^23", res)

    # crossover: smaller totals vs XLA in the same process
    for lgn in (27, 26):
        nn = 1 << lgn
        fn = lambda codes: rangesweep.sort_codes_rangesweep(
            codes, seg_elems=1 << 23, method="gather")
        res = timing.batch_timing(fn, nn, batch=8, seed=10, repeats=2)
        emit(f"rangesweep_gather_2^{lgn}_seg2^23", res)
        res = timing.batch_timing(
            lambda codes: xla_sort.sort_all_keys_unstable((codes,))[0],
            nn, batch=8, seed=10, repeats=2)
        emit(f"xla_oracle_2^{lgn}", res)
    return 0


if __name__ == "__main__":
    sys.exit(main())
