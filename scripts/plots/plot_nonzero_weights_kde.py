#!/usr/bin/env python
"""KDE of nonzero weight values across runs (capability parity: reference
``scripts/plots/plot_nonzero_weights_kde.py`` — per-run kernel density of the
NONZERO weights of a checkpoint, dense baseline vs pruned variants, tails
winsorized for display).

    python scripts/plots/plot_nonzero_weights_kde.py --run_dirs runA runB \
        [--model_file model_best_pruned.msgpack,model_best.msgpack] \
        [--out_dir plots]

Reads this framework's msgpack checkpoints (or sparse ``.npz`` exports); one
overlay figure (all runs) plus a per-run panel figure.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

# Host-side plotting tool: pin the CPU backend before any jax-touching
# import (the axon TPU plugin ignores JAX_PLATFORMS and hangs for minutes
# when the relay is unreachable).
from sparse_caption_tpu.utils.jax_setup import select_platform  # noqa: E402

select_platform("cpu")

import numpy as np

# prune-type display names (reference plot_nonzero_weights_kde.py:76-89)
PRUNE_TYPE_TITLE = {
    "supermask": "Proposed",
    "mag_grad_blind": "Gradual (blind)",
    "mag_grad_uniform": "Gradual (uniform)",
    "lottery_mask_freeze": "Lottery (gradual)",
    "lottery_mag_blind": "Lottery (hard-blind)",
    "lottery_mag_uniform": "Lottery (hard-uniform)",
    "lottery_mag_dist": "Lottery (hard-distribution)",
    "mag_blind": "Hard-blind",
    "mag_uniform": "Hard-uniform",
    "mag_dist": "Hard-distribution",
    "snip": "SNIP",
    "": "Dense",
}

PALETTE = ["#2a78d6", "#e07b39", "#3a9a5c", "#b2124d", "#7a5cc0", "#52514e"]


def load_flat_weights(run_dir: str, model_files: list) -> np.ndarray:
    """Flattened concatenation of all 2-D weight tensors of the first
    checkpoint flavor found in the run dir."""
    from sparse_caption_tpu.engine.checkpoints import find_ckpt

    for name in model_files:
        path = os.path.join(run_dir, name)
        if not os.path.isfile(path):
            # flavor missing at the literal name: accept whatever backend
            # find_ckpt resolves (orbax dir OR a msgpack fallback)
            path = find_ckpt(run_dir, os.path.splitext(name)[0])
            if not os.path.exists(path):
                continue
        if path.endswith(".npz"):
            from sparse_caption_tpu.pruning.engine import sparse_import

            params = sparse_import(dict(np.load(path)))
        else:
            from sparse_caption_tpu.engine.checkpoints import load_pytree

            params = load_pytree(path).get("params", {})
        import jax

        leaves = [np.asarray(x).ravel() for x in jax.tree.leaves(params)
                  if getattr(x, "ndim", 0) == 2]
        if leaves:
            return np.concatenate(leaves)
    raise FileNotFoundError(f"none of {model_files} found in {run_dir}")


def kde(values: np.ndarray, grid: np.ndarray) -> np.ndarray:
    from scipy.stats import gaussian_kde

    if values.size > 200_000:  # KDE cost is O(n*grid); subsample for speed
        values = np.random.default_rng(0).choice(values, 200_000, replace=False)
    return gaussian_kde(values)(grid)


def run_label(run_dir: str) -> str:
    cfg_path = os.path.join(run_dir, "config.json")
    if os.path.isfile(cfg_path):
        with open(cfg_path) as f:
            cfg = json.load(f)
        pt = PRUNE_TYPE_TITLE.get(str(cfg.get("prune_type", "")), cfg.get("prune_type", ""))
        tgt = cfg.get("prune_sparsity_target")
        return f"{pt} @ {tgt}" if cfg.get("prune_type") else pt
    return os.path.basename(run_dir.rstrip("/"))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run_dirs", nargs="+", required=True)
    p.add_argument("--model_file",
                   default="model_best_pruned.msgpack,model_best_pruned_sparse.npz,"
                           "model_best.msgpack,model_last.msgpack",
                   help="comma-separated checkpoint flavors, first match wins")
    p.add_argument("--out_dir", default="plots")
    p.add_argument("--winsor_pct", type=float, default=1.0,
                   help="clip this percentile from each tail for display")
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    model_files = args.model_file.split(",")
    os.makedirs(args.out_dir, exist_ok=True)

    data = []
    for run_dir in args.run_dirs:
        w = load_flat_weights(run_dir, model_files)
        nz = w[w != 0]
        lo, hi = np.percentile(nz, [args.winsor_pct, 100 - args.winsor_pct])
        data.append((run_label(run_dir), np.clip(nz, lo, hi)))

    # overlay figure
    fig, ax = plt.subplots(figsize=(7, 4.5))
    for i, (label, nz) in enumerate(data):
        grid = np.linspace(nz.min(), nz.max(), 400)
        ax.plot(grid, kde(nz, grid), label=f"{label} (nnz={nz.size:,d})",
                color=PALETTE[i % len(PALETTE)], lw=1.8)
    ax.set_xlabel("nonzero weight value")
    ax.set_ylabel("density")
    ax.legend(frameon=False, fontsize=8)
    ax.spines[["top", "right"]].set_visible(False)
    fig.tight_layout()
    fig.savefig(os.path.join(args.out_dir, "nonzero_weights_kde.png"), dpi=200)
    plt.close(fig)

    # per-run panels
    n = len(data)
    fig, axes = plt.subplots(1, n, figsize=(4 * n, 3.5), squeeze=False)
    for i, (label, nz) in enumerate(data):
        grid = np.linspace(nz.min(), nz.max(), 400)
        axes[0][i].fill_between(grid, kde(nz, grid), color=PALETTE[i % len(PALETTE)], alpha=0.6)
        axes[0][i].set_title(label, fontsize=9)
        axes[0][i].spines[["top", "right"]].set_visible(False)
    fig.tight_layout()
    fig.savefig(os.path.join(args.out_dir, "nonzero_weights_kde_panels.png"), dpi=200)
    plt.close(fig)
    print(f"wrote nonzero_weights_kde[.png/_panels.png] to {args.out_dir} ({n} runs)")


if __name__ == "__main__":
    main()
