#!/usr/bin/env python
"""ORT layer-similarity heatmaps (capability parity: reference
``scripts/plots/compute_ort_layer_sim.py:16-97`` — the ACORT motivation
figure). For each encoder/decoder layer, every weight tensor is
L2-normalized along its last dim and flattened; the layer-pair matrix is the
RMS distance between the concatenated vectors (reference ``compute_sim``).

    python scripts/plots/compute_ort_layer_sim.py --run_dir <run> \
        [--ckpt model_best.msgpack] [--out_dir plots]
"""

from __future__ import annotations

import argparse
import os
import re
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

# Host-side plotting tool: pin the CPU backend before any jax-touching
# import (the axon TPU plugin ignores JAX_PLATFORMS and hangs for minutes
# when the relay is unreachable).
from sparse_caption_tpu.utils.jax_setup import select_platform  # noqa: E402

select_platform("cpu")

import numpy as np


def l2_normalize_last(x: np.ndarray, eps: float = 1e-12) -> np.ndarray:
    n = np.sqrt(np.sum(np.square(x), axis=-1, keepdims=True))
    return x / np.maximum(n, eps)


def rms_distance_matrix(layer_vecs: np.ndarray) -> np.ndarray:
    """(L, N) -> (L, L) RMS distance (reference compute_sim)."""
    x = layer_vecs[:, None, :]
    y = layer_vecs[None, :, :]
    return np.sqrt(np.mean(np.square(x - y), axis=-1))


def collect_layer_vectors(params) -> dict:
    """{'encoder': (L, N), 'decoder': (L, N)} from an ORT params pytree."""
    import jax

    groups = {"encoder": {}, "decoder": {}}
    for path, leaf in jax.tree_util.tree_flatten_with_path(params)[0]:
        names = [getattr(k, "key", str(k)) for k in path]
        m = re.match(r"(box_encoder_layers|encoder_layers|decoder_layers)_(\d+)$", names[0])
        if not m:
            continue
        side = "decoder" if m.group(1) == "decoder_layers" else "encoder"
        idx = int(m.group(2))
        v = l2_normalize_last(np.asarray(leaf, np.float64)).ravel()
        groups[side].setdefault(idx, []).append(v)
    out = {}
    for side, by_layer in groups.items():
        if not by_layer:
            continue
        layers = [np.concatenate(by_layer[i]) for i in sorted(by_layer)]
        out[side] = np.stack(layers)
    return out


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--run_dir", required=True)
    p.add_argument("--ckpt", default="model_best.msgpack")
    p.add_argument("--out_dir", default="plots")
    args = p.parse_args()

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    from sparse_caption_tpu.engine.checkpoints import load_pytree

    from sparse_caption_tpu.engine.checkpoints import find_ckpt

    path = os.path.join(args.run_dir, args.ckpt)
    if not os.path.exists(path):
        path = find_ckpt(args.run_dir, os.path.splitext(args.ckpt)[0])
    if not os.path.exists(path):
        path = find_ckpt(args.run_dir, "model_last")
    params = load_pytree(path)["params"]
    os.makedirs(args.out_dir, exist_ok=True)

    for side, vecs in collect_layer_vectors(params).items():
        mat = rms_distance_matrix(vecs)
        fig, ax = plt.subplots(figsize=(5, 4))
        im = ax.imshow(mat, cmap="viridis")
        ax.set_xticks(range(len(mat)))
        ax.set_yticks(range(len(mat)))
        ax.xaxis.tick_top()
        ax.set_title(f"{side} layer RMS distance", pad=24, fontsize=10)
        for i in range(len(mat)):
            for j in range(len(mat)):
                ax.text(j, i, f"{mat[i, j]:.3f}", ha="center", va="center", fontsize=7,
                        color="w" if mat[i, j] < mat.max() * 0.6 else "k")
        fig.colorbar(im, ax=ax, shrink=0.85)
        fig.tight_layout()
        out = os.path.join(args.out_dir, f"layer_sim_{side}.png")
        fig.savefig(out, dpi=200)
        plt.close(fig)
        print(f"wrote {out} ({len(mat)} layers)")


if __name__ == "__main__":
    main()
