#!/usr/bin/env python
"""Round-5 campaign 11: relocate-core cost isolation + cheaper issue schemes.

Sheet 5's closing note names the one unwalled flagship lever: the
relocate's per-range issue cost (binary decomposition = ~14 conditional
static copies per (chunk,bucket) range, swept twice for start+wait).
r4f measured kernel 9.3 ms at K=32 (~the 2x250 GB/s floor); campaign-3 H
rows put the whole exchange at 26.6/27.8/36.7 ms at K=32/64/128 — the
overhead scales with K^2 ranges.  Pairs/argsort/wide pay the WHOLE sweep
once PER PLANE (3 calls for pairs).  Rows, ordered:

  A. prep-only isolation at 2^28 keys (p1 + hier cuts + _exchange_prep,
     no kernel): seg 2^21 / 2^20.  With campaign-5 P rows this splits
     exchange = prep + kernel exactly.
  B. kernel-only microbench on REAL ctrl tables (fetched once from the
     live cuts at seed 10), uniform and dup-heavy (0xFFFF-masked), 1 GiB:
       V0  current binary decomposition (baseline)
       V1  overlap-2-copy: every range = <=2 static copies of size
           2^floor(log2 nr) (tail anchored at range end; the overlap
           rows receive IDENTICAL bytes from both copies — benign), with
           a binary TREE dispatch on the class (4 evals vs 14)
     Each variant bit-checked against V0's output before timing.
  C. fused MULTIPLANE kernel (one call moves 3 planes, shared branch
     evaluation) vs 3x the single-plane call, K=128: V0m3 / V1m3.

Decides: whether the product relocate adopts V1 issue scheme and/or the
fused multiplane form, and updates the Sheet-5 exchange accounting.
"""

import json
import sys

sys.path.insert(0, "/root/repo")

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from gpusorting_tpu.core import prng
from gpusorting_tpu.ops import rangesweep, xla_sort
from gpusorting_tpu.ops.rangesweep import LANES

from benches.hw_r5_campaign3 import timed

N = 1 << 28


# ---- shared ctrl/fringe builder (the real pipeline's, fetched once) -------

def build_ctrl(L, mask, seed=10):
    """Run p1+cuts+prep once on device for keys(seed)&mask; return
    (ctrl ndarray, fringe device array, K)."""
    K = N // L

    @jax.jit
    def go():
        k = prng.hybrid_taus_bits(N, seed) & jnp.uint32(mask)

        def _p1(r):
            s = xla_sort.sort_all_keys_unstable((r,))[0]
            return s, s.reshape(-1, LANES)[:, 0]

        x2, heads = jax.lax.map(_p1, k.reshape(K, L))
        bounds = rangesweep._cuts(x2, K, L, method="hier", heads=heads)
        ctrl, fringes, _ = rangesweep._exchange_prep(
            (x2.reshape(-1),), bounds, K, L)
        return ctrl, fringes[0]

    ctrl, fringe = go()
    return np.asarray(jax.device_get(ctrl)), fringe, K


def pack_cls(ctrl, K):
    """Pack cls=floor(log2 nr) into bits 16+ of the nr ctrl entries."""
    KK = K * K
    c = ctrl.copy()
    nr = c[2 * KK:3 * KK]
    cls = np.zeros_like(nr)
    for b in range(1, 16):
        cls[nr >= (1 << b)] = b
    c[2 * KK:3 * KK] = nr | (cls << 16)
    return c


# ---- V0: the production kernel ---------------------------------------------

def v0_call(K, l_rows, planes=1):
    rows_total = K * l_rows
    reloc = rangesweep._build_relocate(rows_total, K, l_rows, 2 * K, False)

    def call(ctrl, srcs, fringes):
        return tuple(reloc(ctrl, s, f) for s, f in zip(srcs, fringes))

    return call


# ---- V1: overlap-2-copy with tree dispatch ---------------------------------

def _v1_kernel(ctrl_ref, *refs, K, l_rows, slab_rows, planes):
    srcs = refs[:planes]
    fringes = refs[planes:2 * planes]
    outs = refs[2 * planes:3 * planes]
    sem = refs[3 * planes]
    b = pl.program_id(0)
    KK = K * K
    n_bits = max(l_rows.bit_length(), 1)
    fr_bits = max(min(l_rows, slab_rows).bit_length(), 1)

    def leaf(act, s0, d0, nr, c):
        sz = 1 << c
        for src, out in zip(srcs, outs):
            getattr(pltpu.make_async_copy(
                src.at[pl.ds(s0, sz), :],
                out.at[pl.ds(d0, sz), :], sem), act)()

        @pl.when(nr > sz)
        def _():
            for src, out in zip(srcs, outs):
                getattr(pltpu.make_async_copy(
                    src.at[pl.ds(s0 + nr - sz, sz), :],
                    out.at[pl.ds(d0 + nr - sz, sz), :], sem), act)()

    def dispatch(act, s0, d0, nr, cls):
        def rec(lo, hi):
            if hi - lo == 1:
                leaf(act, s0, d0, nr, lo)
                return
            mid = (lo + hi) // 2

            @pl.when(cls < mid)
            def _():
                rec(lo, mid)

            @pl.when(cls >= mid)
            def _():
                rec(mid, hi)

        rec(0, n_bits)

    def blocks(act, ref, out, s0, d0, nr, nb):
        off = jnp.int32(0)
        for k in range(nb - 1, -1, -1):
            bit = (nr >> k) & 1

            @pl.when(bit == 1)
            def _(off=off, k=k):
                getattr(pltpu.make_async_copy(
                    ref.at[pl.ds(s0 + off, 1 << k), :],
                    out.at[pl.ds(d0 + off, 1 << k), :], sem), act)()

            off = off + (bit << k)

    def sweep(act):
        def body(i, _):
            base = b * K + i
            packed = ctrl_ref[2 * KK + base]
            nr = packed & jnp.int32(0xFFFF)
            cls = packed >> 16

            @pl.when(nr > 0)
            def _():
                dispatch(act, ctrl_ref[base], ctrl_ref[KK + base], nr, cls)

            return 0

        jax.lax.fori_loop(0, K, body, 0)
        bulk_b = ctrl_ref[3 * KK + b]
        for fr, out in zip(fringes, outs):
            blocks(act, fr, out, b * slab_rows, b * l_rows + bulk_b,
                   l_rows - bulk_b, fr_bits)

    sweep("start")
    sweep("wait")


@functools.lru_cache(maxsize=8)
def _build_v1(rows_total, K, l_rows, slab_rows, planes):
    kern = functools.partial(_v1_kernel, K=K, l_rows=l_rows,
                             slab_rows=slab_rows, planes=planes)

    def call(ctrl, *arrs):
        outs = pl.pallas_call(
            kern,
            grid=(K,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pl.ANY)] * (2 * planes),
            out_specs=tuple(pl.BlockSpec(memory_space=pl.ANY)
                            for _ in range(planes)),
            out_shape=tuple(
                jax.ShapeDtypeStruct((rows_total, LANES), jnp.int32)
                for _ in range(planes)),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 << 20, has_side_effects=True),
        )(ctrl, *arrs)
        return outs

    return call


def v1_call(K, l_rows, planes=1):
    rows_total = K * l_rows
    built = _build_v1(rows_total, K, l_rows, 2 * K, planes)

    def call(ctrl, srcs, fringes):
        return built(ctrl, *srcs, *fringes)

    return call


# ---- V0m: production binary decomposition, fused multiplane ----------------

def _v0m_kernel(ctrl_ref, *refs, K, l_rows, slab_rows, planes):
    srcs = refs[:planes]
    fringes = refs[planes:2 * planes]
    outs = refs[2 * planes:3 * planes]
    sem = refs[3 * planes]
    b = pl.program_id(0)
    KK = K * K
    n_bits = max(l_rows.bit_length(), 1)
    fr_bits = max(min(l_rows, slab_rows).bit_length(), 1)

    def blocks(act, pairs, s0, d0, nr, nb):
        off = jnp.int32(0)
        for k in range(nb - 1, -1, -1):
            bit = (nr >> k) & 1

            @pl.when(bit == 1)
            def _(off=off, k=k):
                for src, out in pairs:
                    getattr(pltpu.make_async_copy(
                        src.at[pl.ds(s0 + off, 1 << k), :],
                        out.at[pl.ds(d0 + off, 1 << k), :], sem), act)()

            off = off + (bit << k)

    so = tuple(zip(srcs, outs))
    fo = tuple(zip(fringes, outs))

    def sweep(act):
        def body(i, _):
            base = b * K + i
            blocks(act, so, ctrl_ref[base], ctrl_ref[KK + base],
                   ctrl_ref[2 * KK + base] & jnp.int32(0xFFFF), n_bits)
            return 0

        jax.lax.fori_loop(0, K, body, 0)
        bulk_b = ctrl_ref[3 * KK + b]
        blocks(act, fo, b * slab_rows, b * l_rows + bulk_b,
               l_rows - bulk_b, fr_bits)

    sweep("start")
    sweep("wait")


@functools.lru_cache(maxsize=8)
def _build_v0m(rows_total, K, l_rows, slab_rows, planes):
    kern = functools.partial(_v0m_kernel, K=K, l_rows=l_rows,
                             slab_rows=slab_rows, planes=planes)

    def call(ctrl, *arrs):
        return pl.pallas_call(
            kern,
            grid=(K,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM)]
            + [pl.BlockSpec(memory_space=pl.ANY)] * (2 * planes),
            out_specs=tuple(pl.BlockSpec(memory_space=pl.ANY)
                            for _ in range(planes)),
            out_shape=tuple(
                jax.ShapeDtypeStruct((rows_total, LANES), jnp.int32)
                for _ in range(planes)),
            scratch_shapes=[pltpu.SemaphoreType.DMA],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=64 << 20, has_side_effects=True),
        )(ctrl, *arrs)

    return call


def v0m_call(K, l_rows, planes):
    rows_total = K * l_rows
    built = _build_v0m(rows_total, K, l_rows, 2 * K, planes)

    def call(ctrl, srcs, fringes):
        return built(ctrl, *srcs, *fringes)

    return call


# ---- harness ---------------------------------------------------------------

def micro_body(call, ctrl_dev, fringe_dev, K, l_rows, planes):
    rows_total = K * l_rows

    def body(k):
        srcs = []
        for p in range(planes):
            m = jnp.uint32((0x9E3779B9 * (p + 1)) & 0xFFFFFFFF)
            kk = k if p == 0 else k ^ m
            srcs.append(kk.reshape(rows_total, LANES).view(jnp.int32))
        outs = call(ctrl_dev, tuple(srcs), (fringe_dev,) * planes)
        acc = outs[0]
        for o in outs[1:]:
            acc = acc ^ o
        return acc.view(jnp.uint32).reshape(-1)

    return body


def bit_check(name, ref_call, new_call, ctrl_ref_dev, ctrl_new_dev,
              fringe_dev, K, l_rows, planes, seed=33):
    rows_total = K * l_rows

    @jax.jit
    def go():
        k = prng.hybrid_taus_bits(N, seed)
        srcs = tuple(
            (k if p == 0 else
             k ^ jnp.uint32((0x9E3779B9 * (p + 1)) & 0xFFFFFFFF))
            .reshape(rows_total, LANES).view(jnp.int32)
            for p in range(planes))
        a = ref_call(ctrl_ref_dev, srcs, (fringe_dev,) * planes)
        b = new_call(ctrl_new_dev, srcs, (fringe_dev,) * planes)
        bad = jnp.uint32(0)
        for x, y in zip(a, b):
            bad = bad + jnp.sum(x != y, dtype=jnp.uint32)
        return bad

    bad = int(np.asarray(jax.device_get(go())))
    print(json.dumps({"bench": name, "mismatches": bad}), flush=True)
    return bad == 0


def prep_only(L):
    K = N // L

    def body(k):
        def _p1(r):
            s = xla_sort.sort_all_keys_unstable((r,))[0]
            return s, s.reshape(-1, LANES)[:, 0]

        x2, heads = jax.lax.map(_p1, k.reshape(K, L))
        bounds = rangesweep._cuts(x2, K, L, method="hier", heads=heads)
        ctrl, fringes, _ = rangesweep._exchange_prep(
            (x2.reshape(-1),), bounds, K, L)
        return jnp.stack([jnp.sum(ctrl.astype(jnp.uint32)),
                          jnp.sum(fringes[0]),
                          jnp.sum(heads)])

    return body


def main():
    print(json.dumps({"devices": str(jax.devices())}), flush=True)

    # A. prep-only isolation
    for lg in (21, 20):
        timed(f"A_p1cutsprep_hier_seg2^{lg}", N, prep_only(1 << lg))

    # B. kernel micro at seg 2^21 (K=128) and 2^20 (K=256), uniform + dup
    for lg, masks in ((21, (0xFFFFFFFF, 0xFFFF)), (20, (0xFFFFFFFF,))):
        L = 1 << lg
        l_rows = L // LANES
        K = N // L
        for mask in masks:
            tag = "uni" if mask == 0xFFFFFFFF else "dup"
            ctrl_np, fringe_dev, _ = build_ctrl(L, mask)
            ctrl_v0 = jax.device_put(jnp.asarray(ctrl_np))
            ctrl_v1 = jax.device_put(jnp.asarray(pack_cls(ctrl_np, K)))
            v0 = v0_call(K, l_rows)
            v1 = v1_call(K, l_rows)
            ok = bit_check(f"B_v1_exact_K{K}_{tag}", v0, v1,
                           ctrl_v0, ctrl_v1, fringe_dev, K, l_rows, 1)
            timed(f"B_v0_K{K}_{tag}", N,
                  micro_body(v0, ctrl_v0, fringe_dev, K, l_rows, 1))
            if ok:
                timed(f"B_v1_K{K}_{tag}", N,
                      micro_body(v1, ctrl_v1, fringe_dev, K, l_rows, 1))

    # C. multiplane fusion at K=128 uniform, planes=3
    L = 1 << 21
    l_rows = L // LANES
    K = N // L
    ctrl_np, fringe_dev, _ = build_ctrl(L, 0xFFFFFFFF)
    ctrl_v0 = jax.device_put(jnp.asarray(ctrl_np))
    ctrl_v1 = jax.device_put(jnp.asarray(pack_cls(ctrl_np, K)))
    v0s = v0_call(K, l_rows, planes=3)
    v0m = v0m_call(K, l_rows, planes=3)
    v1m = v1_call(K, l_rows, planes=3)
    ok_m = bit_check("C_v0m3_exact", v0s, v0m, ctrl_v0, ctrl_v0,
                     fringe_dev, K, l_rows, 3)
    ok_1 = bit_check("C_v1m3_exact", v0s, v1m, ctrl_v0, ctrl_v1,
                     fringe_dev, K, l_rows, 3)
    timed("C_v0_3calls_K128", N,
          micro_body(v0s, ctrl_v0, fringe_dev, K, l_rows, 3))
    if ok_m:
        timed("C_v0m3_fused_K128", N,
              micro_body(v0m, ctrl_v0, fringe_dev, K, l_rows, 3))
    if ok_1:
        timed("C_v1m3_fused_K128", N,
              micro_body(v1m, ctrl_v1, fringe_dev, K, l_rows, 3))
    return 0


if __name__ == "__main__":
    sys.exit(main())
