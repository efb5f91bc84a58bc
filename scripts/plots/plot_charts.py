#!/usr/bin/env python
"""Paper-style charts from compiled results (capability parity: reference
``scripts/plots/plot_charts.py`` + ``plot_prune_fig.py`` — CIDEr-vs-sparsity
pruning curves per method, CIDEr-vs-NNZ trade-off, and metric bars. The
reference hardcodes its published numbers; this version is data-driven from
``compiled_scores.csv`` produced by scripts/collect_scores.py).

    python scripts/plots/plot_charts.py --scores compiled_scores.csv \
        [--split test_beam_2] [--out_dir plots]
"""

from __future__ import annotations

import argparse
import csv
import os
import sys
from collections import defaultdict
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

PALETTE = ["#2a78d6", "#e07b39", "#3a9a5c", "#b2124d", "#7a5cc0", "#52514e"]
METRICS = ["Bleu_1", "Bleu_4", "ROUGE_L", "CIDEr"]


def read_rows(path: str):
    with open(path) as f:
        return list(csv.DictReader(f))


def fget(row, key):
    try:
        return float(row.get(key, ""))
    except (TypeError, ValueError):
        return None


def pick_split(rows, requested):
    """Eval-dir prefix to plot: the requested one, else the first test_* with
    a CIDEr column, else the first val_*."""
    if requested:
        return requested
    keys = set(k.rsplit("/", 1)[0] for r in rows for k in r if "/" in k and k.endswith("CIDEr"))
    for k in sorted(keys):
        if k.startswith("test"):
            return k
    return sorted(keys)[0] if keys else None


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--scores", required=True, help="compiled_scores.csv from collect_scores.py")
    p.add_argument("--split", default=None, help="eval dir name, e.g. test_beam_2")
    p.add_argument("--out_dir", default="plots")
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    rows = read_rows(args.scores)
    split = pick_split(rows, args.split)
    if split is None:
        sys.exit("no eval score columns found")
    os.makedirs(args.out_dir, exist_ok=True)
    cider_key = f"{split}/CIDEr"

    # ---- pruning curve: CIDEr vs sparsity target, one line per prune type
    by_type = defaultdict(list)
    for r in rows:
        c = fget(r, cider_key)
        s = fget(r, "sparsity_target")
        if c is None:
            continue
        if r.get("prune_type") and s is not None:
            by_type[r["prune_type"]].append((s, c))
        else:
            by_type["dense"].append((0.0, c))
    if by_type:
        fig, ax = plt.subplots(figsize=(6.5, 4.2))
        for i, (pt, pts) in enumerate(sorted(by_type.items())):
            pts = sorted(pts)
            ax.plot([x for x, _ in pts], [y for _, y in pts], marker="o", ms=4,
                    lw=1.6, label=pt, color=PALETTE[i % len(PALETTE)])
        ax.set_xlabel("sparsity")
        ax.set_ylabel(f"CIDEr ({split})")
        ax.legend(frameon=False, fontsize=8)
        ax.spines[["top", "right"]].set_visible(False)
        fig.tight_layout()
        fig.savefig(os.path.join(args.out_dir, "cider_vs_sparsity.png"), dpi=200)
        plt.close(fig)

    # ---- trade-off scatter: CIDEr vs NNZ params (when params collected)
    pts = []
    for r in rows:
        c, total, s = fget(r, cider_key), fget(r, "params"), fget(r, "sparsity_target")
        if c is None or total is None:
            continue
        nnz = total * (1.0 - (s or 0.0))
        pts.append((nnz, c, r.get("run", "")))
    if pts:
        fig, ax = plt.subplots(figsize=(6.5, 4.2))
        ax.scatter([x for x, _, _ in pts], [y for _, y, _ in pts], s=28, color=PALETTE[0])
        for x, y, name in pts:
            ax.annotate(name, (x, y), fontsize=6, xytext=(3, 3), textcoords="offset points")
        ax.set_xlabel("NNZ parameters")
        ax.set_ylabel(f"CIDEr ({split})")
        ax.set_xscale("log")
        ax.spines[["top", "right"]].set_visible(False)
        fig.tight_layout()
        fig.savefig(os.path.join(args.out_dir, "cider_vs_nnz.png"), dpi=200)
        plt.close(fig)

    # ---- metric bars per run
    runs = [r for r in rows if fget(r, cider_key) is not None]
    if runs:
        fig, ax = plt.subplots(figsize=(max(6.5, 1.1 * len(runs)), 4.2))
        width = 0.8 / len(METRICS)
        for i, m in enumerate(METRICS):
            vals = [fget(r, f"{split}/{m}") or 0.0 for r in runs]
            ax.bar([j + i * width for j in range(len(runs))], vals, width,
                   label=m, color=PALETTE[i % len(PALETTE)])
        ax.set_xticks([j + 0.4 - width / 2 for j in range(len(runs))])
        ax.set_xticklabels([r.get("run", "") for r in runs], fontsize=7, rotation=20, ha="right")
        ax.set_ylabel(f"score ({split})")
        ax.legend(frameon=False, fontsize=8, ncol=len(METRICS))
        ax.spines[["top", "right"]].set_visible(False)
        fig.tight_layout()
        fig.savefig(os.path.join(args.out_dir, "metric_bars.png"), dpi=200)
        plt.close(fig)

    print(f"charts written to {args.out_dir} (split: {split}, {len(rows)} runs)")


if __name__ == "__main__":
    main()
