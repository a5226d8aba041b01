#!/usr/bin/env python
"""Render the measured benchmark charts (the reference's README-chart surface).

The reference publishes its benchmarks exclusively as chart images
(reference README.md:9-37 — CUB comparison, entropy sweep, SplitSort
segment-length ladder); this script is that surface for gpusorting_tpu,
rendered from the measured rows in `results_TPU_v5_lite.jsonl` (latest row
per bench wins).  Output: static SVGs in docs/img/, referenced by README.

Every plotted point is a hardware measurement from the jsonl except where a
`# provenance:` comment says otherwise (two engine bars transcribed from
benches/RESULTS.md session tables that never got a jsonl row).

Usage:  python benches/plot_results.py [--out docs/img]
"""

from __future__ import annotations

import argparse
import json
import math
import os

import matplotlib

matplotlib.use("Agg")
import matplotlib.pyplot as plt

# Chart chrome (dataviz reference palette, light mode; series slots 1-3 in
# the validated order: blue, orange, aqua — aqua carries direct labels as
# its sub-3:1 contrast relief).
SURFACE = "#fcfcfb"
INK = "#0b0b0b"
INK2 = "#52514e"
MUTED = "#898781"
GRID = "#e1e0d9"
BASELINE = "#c3c2b7"
S1, S2, S3 = "#2a78d6", "#eb6834", "#1baf7a"

HERE = os.path.dirname(os.path.abspath(__file__))
JSONL = os.path.join(HERE, "results_TPU_v5_lite.jsonl")


def load_latest() -> dict[str, dict]:
    latest: dict[str, dict] = {}
    with open(JSONL) as f:
        for line in f:
            d = json.loads(line)
            for r in d.get("rows", []):
                latest[r["bench"]] = r
    return latest


def style_axes(ax, title: str, xlabel: str, ylabel: str):
    ax.set_facecolor(SURFACE)
    ax.figure.set_facecolor(SURFACE)
    for side in ("top", "right"):
        ax.spines[side].set_visible(False)
    for side in ("left", "bottom"):
        ax.spines[side].set_color(BASELINE)
        ax.spines[side].set_linewidth(0.8)
    ax.grid(True, axis="y", color=GRID, linewidth=0.6)
    ax.set_axisbelow(True)
    ax.tick_params(colors=MUTED, labelsize=8.5, length=3)
    ax.set_title(title, color=INK, fontsize=11, loc="left", pad=12)
    ax.set_xlabel(xlabel, color=INK2, fontsize=9)
    ax.set_ylabel(ylabel, color=INK2, fontsize=9)


def save(fig, out_dir: str, name: str):
    path = os.path.join(out_dir, name)
    fig.savefig(path, format="svg", bbox_inches="tight")
    plt.close(fig)
    print(f"wrote {path}")


def chart_size_sweep(rows: dict, out_dir: str):
    """Keys and pairs rate vs input size (reference README.md:25-27 family)."""
    keys = []
    for e in range(10, 29):
        r = rows.get(f"size_sweep_keys_2^{e}")
        if r:
            keys.append((e, r["keys_per_sec"] / 1e9))
    # flagship 2^28 point comes from bench.py's own record when present
    bench_file = os.path.join(HERE, "..", "BENCH_r02.json")
    if os.path.exists(bench_file):
        with open(bench_file) as f:
            b = json.load(f).get("parsed")
        if b and b["metric"] == "keys_per_sec_u32_2^28":
            keys.append((28, b["value"] / 1e9))
    pairs = []
    for e in (22, 24, 26):
        r = rows.get(f"pairs_2^{e}")
        if r:
            pairs.append((e, r["keys_per_sec"] / 1e9))

    fig, ax = plt.subplots(figsize=(6.4, 3.6))
    style_axes(ax, "u32 sort rate vs input size — TPU v5e, 1 chip (AUTO engine)",
               "input size (log2 n)", "Gkeys/s")
    ax.plot(*zip(*keys), color=S1, linewidth=2, marker="o", markersize=5,
            label="keys only")
    ax.plot(*zip(*pairs), color=S2, linewidth=2, marker="o", markersize=5,
            label="key + u32 payload (stable)")
    ax.set_xticks(range(10, 29, 2))
    ax.set_xticklabels([f"2^{e}" for e in range(10, 29, 2)])
    leg = ax.legend(frameon=False, fontsize=8.5, loc="upper right")
    for t in leg.get_texts():
        t.set_color(INK2)
    save(fig, out_dir, "size_sweep.svg")


def chart_segsort_ladder(rows: dict, out_dir: str):
    """Pairs/s vs segment length — the SplitSort chart analog
    (reference README.md:13-21)."""
    fixed = []
    for L in (32, 256, 4096, 262144):
        r = rows.get(f"segsort_fixed_L{L}_pairs")
        if r:
            fixed.append((L, r["keys_per_sec"] / 1e9))
    rand, comp = [], []
    for m in (16, 64, 256, 1024, 4096, 8192, 16384, 65536, 262144):
        r = rows.get(f"segsort_random_maxlen{m}_pairs")
        if r:
            pt = (m, r["keys_per_sec"] / 1e9)
            (comp if r["detail"]["engine"] == "composite" else rand).append(pt)
    # forced-composite reference points (maxlen-insensitive, measured)
    forced = []
    r = rows.get("segsort_random_le1024_pairs")
    if r:
        forced.append((1024, r["keys_per_sec"] / 1e9))
    forced += comp

    fig, ax = plt.subplots(figsize=(6.4, 3.6))
    style_axes(ax,
               "Segmented pair sort vs segment length — 2^22 total pairs, TPU v5e",
               "segment length / random max length", "Gpairs/s")
    ax.set_xscale("log", base=2)
    ax.set_yscale("log", base=2)
    ax.plot(*zip(*fixed), color=S1, linewidth=2, marker="o", markersize=5,
            label="fixed length (batched / mapped-flat)")
    auto_line = rand + comp  # AUTO routes composite past the window cap
    ax.plot(*zip(*auto_line), color=S2, linewidth=2, marker="o", markersize=5,
            label="random lengths, AUTO route")
    ax.plot(*zip(*forced), color=S3, linewidth=2, marker="s", markersize=5,
            linestyle="--", label="composite (segId‖key) baseline")
    # direct labels: aqua's contrast relief + the headline points
    ax.annotate(f"{fixed[0][1]:.1f} G", fixed[0], textcoords="offset points",
                xytext=(6, 4), fontsize=8, color=INK2)
    ax.annotate(f"{forced[-1][1]:.2f} G", forced[-1],
                textcoords="offset points", xytext=(-8, -14), fontsize=8,
                color=INK2)
    ax.set_xticks([2 ** e for e in range(4, 19, 2)])
    ax.set_xticklabels([f"2^{e}" for e in range(4, 19, 2)])
    ax.set_yticks([0.5, 1, 2, 4, 8, 16])
    ax.set_yticklabels(["0.5", "1", "2", "4", "8", "16"])
    leg = ax.legend(frameon=False, fontsize=8.5, loc="upper right")
    for t in leg.get_texts():
        t.set_color(INK2)
    save(fig, out_dir, "segsort_ladder.svg")


def chart_engines(rows: dict, out_dir: str):
    """Engine comparison at 2^24 keys (uniform u32)."""
    bars = [
        ("XLA flat (AUTO)", rows["size_sweep_keys_2^24"]["keys_per_sec"] / 1e9),
        # provenance: RESULTS.md native-engine table (r2 session measurement;
        # splitsweep has no jsonl row)
        ("splitsweep hybrid", 0.49),
        ("radix16 fused LSD", rows["native_radix16_keys_2^24"]["keys_per_sec"] / 1e9),
        ("bitonic network", rows["native_network_keys_2^24"]["keys_per_sec"] / 1e9),
        ("rts 3-phase", rows["native_rts_keys_2^24"]["keys_per_sec"] / 1e9),
        ("ffx 5-stage baseline", rows["ffx_baseline_keys_2^24"]["keys_per_sec"] / 1e9),
    ]
    fig, ax = plt.subplots(figsize=(6.4, 3.2))
    style_axes(ax, "Engine comparison — u32 keys, 2^24, uniform, TPU v5e",
               "Gkeys/s", "")
    names = [b[0] for b in bars][::-1]
    vals = [b[1] for b in bars][::-1]
    ax.barh(names, vals, color=S1, height=0.55)
    ax.grid(True, axis="x", color=GRID, linewidth=0.6)
    ax.grid(False, axis="y")
    for i, v in enumerate(vals):
        ax.annotate(f"{v:.2f}", (v, i), textcoords="offset points",
                    xytext=(5, -3), fontsize=8.5, color=INK2)
    ax.tick_params(axis="y", labelsize=9, labelcolor=INK)
    save(fig, out_dir, "engines_2^24.svg")


def chart_entropy(rows: dict, out_dir: str):
    """Entropy sweep (reference README.md:25-27) — honest: flat on a
    comparison sort; the radix-gate win appears at tile 512 only
    (RESULTS.md entropy section)."""
    pts = []
    for ent in ("1.000", "0.811", "0.544", "0.337", "0.201"):
        r = rows.get(f"entropy_{ent}")
        if r:
            pts.append((float(ent), r["keys_per_sec"] / 1e9))
    fig, ax = plt.subplots(figsize=(6.4, 3.2))
    style_axes(ax, "Thearling–Smith entropy sweep — u32 keys, 2^26, AUTO engine",
               "entropy (bits per bit)", "Gkeys/s")
    ax.plot(*zip(*pts), color=S1, linewidth=2, marker="o", markersize=5)
    ax.set_ylim(0, max(v for _, v in pts) * 1.35)
    ax.invert_xaxis()
    ax.annotate("comparison sort: entropy-flat by design\n"
                "(radix tile-gate shows the classic rising curve at tile 512 —"
                " see RESULTS.md)",
                (0.5, 0.14), xycoords="axes fraction", fontsize=8, color=INK2,
                ha="center")
    save(fig, out_dir, "entropy_sweep.svg")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default=os.path.join(HERE, "..", "docs", "img"))
    args = ap.parse_args()
    os.makedirs(args.out, exist_ok=True)
    rows = load_latest()
    chart_size_sweep(rows, args.out)
    chart_segsort_ladder(rows, args.out)
    chart_engines(rows, args.out)
    chart_entropy(rows, args.out)


if __name__ == "__main__":
    main()
