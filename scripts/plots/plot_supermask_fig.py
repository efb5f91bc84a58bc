#!/usr/bin/env python
"""Supermask-mechanism illustration figures (capability parity: reference
``scripts/plots/plot_prune_fig.py`` — heatmap panels of a random mask-logit
matrix, its sigmoid, Bernoulli/rounded 0/1 samples, and a toy weight matrix
before/after masking, as used in the paper's method figure).

Unlike the reference's standalone numpy re-implementation, the samples here
come from the framework's REAL straight-through ops (``ops/ste.py``), so the
figure shows exactly what the training path computes.

    python scripts/plots/plot_supermask_fig.py --out_dir matrices [--annot] [--seed N]
"""

from __future__ import annotations

import argparse
import math
import os
import sys

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", ".."))

# Host-side plotting tool: pin the CPU backend before any jax-touching
# import (the axon TPU plugin ignores JAX_PLATFORMS and hangs for minutes
# when the relay is unreachable).
from sparse_caption_tpu.utils.jax_setup import select_platform  # noqa: E402

select_platform("cpu")


def get_gauss(height: int = 6, width: int = 6) -> np.ndarray:
    """Toy 'weight' matrix: radial gaussian rescaled to [-1, 1]
    (reference plot_prune_fig.py:35-42)."""
    x, y = np.meshgrid(np.linspace(0, 1.75, width), np.linspace(0, 1.75, height))
    dst = np.sqrt(x * x + y * y)
    return np.exp(-(dst ** 2) / 2.0) * 2 - 1


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--out_dir", default="matrices")
    ap.add_argument("--annot", action="store_true", help="annotate cells with values")
    ap.add_argument("--seed", type=int, default=1617446054)
    ap.add_argument("--size", type=int, default=6)
    ap.add_argument("--dpi", type=int, default=600)
    ap.add_argument("--fig_scale", type=float, default=1.5)
    args = ap.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import seaborn as sns
    from matplotlib import pyplot as plt

    import jax
    import jax.numpy as jnp

    from sparse_caption_tpu.ops.ste import bernoulli_sample_sigmoid, rounding_sigmoid

    jax.config.update("jax_platforms", "cpu")
    rng = np.random.default_rng(args.seed)
    n = args.size
    mask = jnp.asarray(rng.uniform(-5.0, 5.0, (n, n)), jnp.float32)
    mask_sigmoid = jax.nn.sigmoid(mask)
    mask_bern = bernoulli_sample_sigmoid(mask, jax.random.PRNGKey(args.seed))
    mask_round = rounding_sigmoid(mask)
    weight = get_gauss(n, n)
    matrices = {
        "mask": np.asarray(mask),
        "mask_sigmoid": np.asarray(mask_sigmoid),
        "mask_bern": np.asarray(mask_bern),
        "mask_round": np.asarray(mask_round),
        "weight": weight,
        "weight_bern": weight * np.asarray(mask_bern),
        "weight_round": weight * np.asarray(mask_round),
    }

    sns.set_context("paper")
    os.makedirs(args.out_dir, exist_ok=True)
    palette = sns.diverging_palette(20, 220, as_cmap=True)
    for name, mat in matrices.items():
        vmin, vmax = (-5, 5) if name == "mask" else (-1, 1)
        s = 3.0 * args.fig_scale
        fig, ax = plt.subplots(nrows=1, ncols=1, figsize=(s, s))
        sns.heatmap(mat, vmin=vmin, vmax=vmax, ax=ax, cmap=palette, annot=args.annot,
                    annot_kws={"fontsize": 18}, fmt=".1f", cbar=False,
                    xticklabels=False, yticklabels=False)
        plt.tight_layout(pad=0)
        fname = name + ("_annot" if args.annot else "")
        fig.savefig(os.path.join(args.out_dir, f"{fname}.png"), dpi=args.dpi)
        plt.close("all")
    print(f"wrote {len(matrices)} figures to {args.out_dir}")


if __name__ == "__main__":
    main()
