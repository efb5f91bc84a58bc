#!/usr/bin/env python
"""Paper-figure tooling over trained checkpoints (capability parity:
reference ``scripts/plots/*`` — nonzero-weight distributions, per-tensor
sparsity, pruning/score curves).

    python scripts/plots/plot_pruning.py --log_dir <run> --out_dir <dir>

Produces:
  weight_hist.png     distribution of nonzero weight magnitudes (masked vs all)
  sparsity_bars.png   per-tensor mask sparsity
  training_curves.png loss + mask-sparsity curves from scalars.jsonl
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

import numpy as np

# single-hue + complement, neutral ink/grid (dataviz defaults)
BLUE = "#2a78d6"
ORANGE = "#e07b39"
INK = "#0b0b0b"
MUTED = "#52514e"
GRID = "#e5e4e0"


def _style(ax):
    ax.spines[["top", "right"]].set_visible(False)
    ax.spines[["left", "bottom"]].set_color(MUTED)
    ax.tick_params(colors=MUTED, labelsize=8)
    ax.grid(axis="y", color=GRID, linewidth=0.6)
    ax.set_axisbelow(True)


def plot_weight_hist(params, masks, mask_type, out):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from sparse_caption_tpu.pruning.engine import mask_weight_pairs, sampled_mask_values

    pairs = mask_weight_pairs(params, masks)
    sampled = sampled_mask_values(masks, mask_type)
    w_all, w_kept = [], []
    for path, w, _ in pairs:
        w = np.asarray(w).ravel()
        m = np.asarray(sampled[path]).ravel()
        w_all.append(np.abs(w))
        w_kept.append(np.abs(w[m > 0.5]))
    w_all = np.concatenate(w_all)
    w_kept = np.concatenate(w_kept) if w_kept else np.array([])

    fig, ax = plt.subplots(figsize=(5, 3), dpi=150)
    bins = np.linspace(0, np.percentile(w_all, 99.5), 80)
    ax.hist(w_all, bins=bins, color=MUTED, alpha=0.45, label="all weights", density=True)
    if w_kept.size:
        ax.hist(w_kept, bins=bins, color=BLUE, alpha=0.75, label="kept (mask=1)", density=True)
    _style(ax)
    ax.set_xlabel("|weight|", color=MUTED)
    ax.set_ylabel("density", color=MUTED)
    ax.legend(frameon=False, fontsize=8)
    ax.set_title("Nonzero weight magnitude distribution", color=INK, fontsize=10)
    fig.tight_layout()
    fig.savefig(out)
    plt.close(fig)


def plot_sparsity_bars(masks, mask_type, out):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from sparse_caption_tpu.pruning.engine import mask_sparsity

    _, _, per = mask_sparsity(masks, mask_type)
    names = list(per)
    vals = [float(per[n]) for n in names]
    order = np.argsort(vals)
    names = [names[i] for i in order]
    vals = [vals[i] for i in order]

    fig, ax = plt.subplots(figsize=(6, max(2.5, 0.18 * len(names))), dpi=150)
    ax.barh(range(len(names)), vals, color=BLUE, height=0.6)
    ax.set_yticks(range(len(names)))
    ax.set_yticklabels([n.replace("/mask", "") for n in names], fontsize=6)
    _style(ax)
    ax.grid(axis="x", color=GRID, linewidth=0.6)
    ax.grid(axis="y", visible=False)
    ax.set_xlim(0, 1)
    ax.set_xlabel("sparsity", color=MUTED)
    ax.set_title("Per-tensor mask sparsity", color=INK, fontsize=10)
    fig.tight_layout()
    fig.savefig(out)
    plt.close(fig)


def plot_training_curves(scalars_path, out):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    series = {}
    with open(scalars_path) as f:
        for line in f:
            rec = json.loads(line)
            series.setdefault(rec["tag"], []).append((rec["step"], rec["value"]))

    panels = [("train/loss", "loss", BLUE), ("train/mask_sparsity", "mask sparsity", ORANGE)]
    panels = [(t, lbl, c) for t, lbl, c in panels if t in series]
    if not panels:
        return False
    fig, axes = plt.subplots(1, len(panels), figsize=(4 * len(panels), 3), dpi=150, squeeze=False)
    for ax, (tag, label, color) in zip(axes[0], panels):
        xy = sorted(series[tag])
        ax.plot([s for s, _ in xy], [v for _, v in xy], color=color, linewidth=2)
        _style(ax)
        ax.set_xlabel("step", color=MUTED)
        ax.set_title(label, color=INK, fontsize=10)
    fig.tight_layout()
    fig.savefig(out)
    plt.close(fig)
    return True


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--log_dir", required=True)
    p.add_argument("--ckpt", default="last")
    p.add_argument("--out_dir", default=None)
    args = p.parse_args()
    out_dir = args.out_dir or os.path.join(args.log_dir, "plots")
    os.makedirs(out_dir, exist_ok=True)

    from sparse_caption_tpu.config import Config
    from sparse_caption_tpu.engine.checkpoints import load_pytree

    cfg = Config.load_config_json(args.log_dir)
    mask_type = cfg.get("prune_type", "supermask") or "supermask"
    ckpt = load_pytree(os.path.join(args.log_dir, f"model_{args.ckpt}.msgpack"))
    params, masks = ckpt["params"], ckpt.get("masks", {})

    made = []
    if masks:
        plot_weight_hist(params, masks, mask_type, os.path.join(out_dir, "weight_hist.png"))
        plot_sparsity_bars(masks, mask_type, os.path.join(out_dir, "sparsity_bars.png"))
        made += ["weight_hist.png", "sparsity_bars.png"]
    scalars = os.path.join(args.log_dir, "scalars.jsonl")
    if os.path.isfile(scalars) and plot_training_curves(scalars, os.path.join(out_dir, "training_curves.png")):
        made.append("training_curves.png")
    print(f"wrote {made} to {out_dir}")


if __name__ == "__main__":
    main()
