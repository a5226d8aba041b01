"""Native C++ host runtime (ctypes binding with lazy on-demand build).

The reference's host framework is C++ (GPUSortBase.h, UtilityKernels.h,
Utils.h); this package is the TPU build's host-side native layer:

  fill_hybrid_taus(n, seed, entropy)  — Thearling-Smith PRNG fill, bit-exact
                                        with core.prng.hybrid_taus_bits
  count_order_violations / count_pair_violations / count_segmented_violations
                                      — O(n) validation oracles
  radix_sort / radix_sort_pairs       — stable host LSD radix reference
                                        (the CUB-oracle analog)

The shared library is compiled with g++ on first use (pybind11 is not in the
image, so the binding is a plain C ABI over ctypes).  Everything degrades
gracefully: `available()` is False when no compiler is present and callers
fall back to the jnp/numpy implementations.
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_HERE = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_HERE, "src", "gpusorting_native.cpp")
_LIBDIR = os.path.join(_HERE, "_build")
_LIB = os.path.join(_LIBDIR, "libgpusorting_native.so")

_lock = threading.Lock()
_lib = None
_tried = False

_u32p = np.ctypeslib.ndpointer(dtype=np.uint32, flags="C_CONTIGUOUS")


def _build() -> bool:
    os.makedirs(_LIBDIR, exist_ok=True)
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17", "-fopenmp",
        _SRC, "-o", _LIB,
    ]
    try:
        r = subprocess.run(cmd, capture_output=True, timeout=120)
        if r.returncode != 0:
            # retry without OpenMP
            cmd.remove("-fopenmp")
            r = subprocess.run(cmd, capture_output=True, timeout=120)
        return r.returncode == 0
    except (OSError, subprocess.SubprocessError):
        return False


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not os.path.exists(_LIB) or (
            os.path.getmtime(_LIB) < os.path.getmtime(_SRC)
        ):
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(_LIB)
        except OSError:
            return None
        lib.hybrid_taus_fill.argtypes = [
            _u32p, ctypes.c_int64, ctypes.c_uint32, ctypes.c_int, ctypes.c_int]
        lib.hybrid_taus_fill.restype = None
        lib.count_order_violations_u32.argtypes = [
            _u32p, ctypes.c_int64, ctypes.c_int]
        lib.count_order_violations_u32.restype = ctypes.c_int64
        lib.count_pair_violations_u32.argtypes = [
            _u32p, _u32p, ctypes.c_int64, ctypes.c_int]
        lib.count_pair_violations_u32.restype = ctypes.c_int64
        lib.count_segmented_violations_u32.argtypes = [
            _u32p, _u32p, ctypes.c_int64, ctypes.c_int64]
        lib.count_segmented_violations_u32.restype = ctypes.c_int64
        lib.lsd_radix_sort_u32.argtypes = [_u32p, ctypes.c_int64]
        lib.lsd_radix_sort_u32.restype = None
        lib.lsd_radix_sort_pairs_u32.argtypes = [_u32p, _u32p, ctypes.c_int64]
        lib.lsd_radix_sort_pairs_u32.restype = None
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def fill_hybrid_taus(n: int, seed: int, and_count: int = 0,
                     warmup: int = 2) -> np.ndarray:
    """Native PRNG fill; bit-exact with core.prng.hybrid_taus_bits."""
    lib = _load()
    out = np.empty(n, dtype=np.uint32)
    if lib is None:
        raise RuntimeError("native library unavailable")
    lib.hybrid_taus_fill(out, n, np.uint32(seed), and_count, warmup)
    return out


def count_order_violations(keys: np.ndarray, descending: bool = False) -> int:
    lib = _load()
    keys = np.ascontiguousarray(keys.view(np.uint32))
    if lib is None:
        d = np.diff(keys.astype(np.int64))
        return int((d > 0).sum() if descending else (d < 0).sum())
    return int(lib.count_order_violations_u32(keys, keys.shape[0],
                                              int(descending)))


def count_pair_violations(keys: np.ndarray, payload: np.ndarray,
                          descending: bool = False) -> int:
    """Adjacent-pair order check over keys AND payload bit patterns.

    Valid only for the reference's payload==key test fixture (the payload is
    initialized equal to the key, so a payload inversion == a stability or
    permutation error — Shaders/Utility.hlsl:147-231).  On real (key, payload)
    data with unrelated payloads this reports false 'violations'; use the
    oracle-identity check instead.
    """
    lib = _load()
    keys = np.ascontiguousarray(keys.view(np.uint32))
    payload = np.ascontiguousarray(payload.view(np.uint32))
    if lib is None:
        dk = np.diff(keys.astype(np.int64))
        dp = np.diff(payload.astype(np.int64))
        if descending:
            return int(((dk > 0) | (dp > 0)).sum())
        return int(((dk < 0) | (dp < 0)).sum())
    return int(lib.count_pair_violations_u32(keys, payload, keys.shape[0],
                                             int(descending)))


def count_segmented_violations(keys: np.ndarray, offsets: np.ndarray) -> int:
    lib = _load()
    keys = np.ascontiguousarray(keys.view(np.uint32))
    offsets = np.ascontiguousarray(np.asarray(offsets, dtype=np.uint32))
    if lib is None:
        errs = 0
        n = keys.shape[0]
        ends = np.append(offsets[1:].astype(np.int64), n)
        for s in range(offsets.shape[0]):
            seg = keys[int(offsets[s]):int(ends[s])]
            errs += int((np.diff(seg.astype(np.int64)) < 0).sum())
        return errs
    return int(lib.count_segmented_violations_u32(
        keys, offsets, offsets.shape[0], keys.shape[0]))


def radix_sort(keys: np.ndarray) -> np.ndarray:
    """Stable host LSD radix sort of u32 codes (reference oracle)."""
    lib = _load()
    out = np.ascontiguousarray(keys.view(np.uint32)).copy()
    if lib is None:
        return np.sort(out)
    lib.lsd_radix_sort_u32(out, out.shape[0])
    return out


def radix_sort_pairs(keys: np.ndarray, payload: np.ndarray):
    """Stable host LSD radix pair sort (CUB SortPairs analog)."""
    lib = _load()
    k = np.ascontiguousarray(keys.view(np.uint32)).copy()
    v = np.ascontiguousarray(payload.view(np.uint32)).copy()
    if lib is None:
        order = np.argsort(k, kind="stable")
        return k[order], v[order]
    lib.lsd_radix_sort_pairs_u32(k, v, k.shape[0])
    return k, v
