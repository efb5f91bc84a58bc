#!/usr/bin/env python
"""Binarize supermask logits in a checkpoint (parity: reference
``scripts/binarize_supermask.py:35-49``): every mask leaf ->
round(sigmoid(mask)), saved as ``model_best_bin_mask.msgpack``."""

import argparse
import os
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--ckpt", type=str, required=True, help="checkpoint msgpack with params+masks")
    p.add_argument("--out", type=str, default=None, help="output path (default: *_bin_mask.msgpack)")
    args = p.parse_args()

    from sparse_caption_tpu.engine.checkpoints import load_pytree, save_pytree
    from sparse_caption_tpu.pruning.engine import binarize_masks

    ckpt = load_pytree(args.ckpt)
    assert "masks" in ckpt and ckpt["masks"], "checkpoint has no pruning masks"
    ckpt["masks"] = binarize_masks(ckpt["masks"])
    out = args.out or args.ckpt.replace(".msgpack", "_bin_mask.msgpack")
    save_pytree(out, ckpt)
    print(f"binarized masks saved to {out}")


if __name__ == "__main__":
    main()
