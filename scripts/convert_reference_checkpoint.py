#!/usr/bin/env python
"""Convert a reference (jiahuei/sparse-image-captioning) checkpoint into this
framework's format.

Handles the three published artifact flavors (reference ``README.md:67-69``,
``pruning/prune.py:176-226``):
* dense ``model_best.pth`` / ``model_best_pruned.pth``
* sparse-COO ``model_best_pruned_sparse.pth`` (densified on load)
* ``model_best_bin_mask.pth`` (masks kept, converted to the masks collection)

Optionally imports the run's SentencePiece vocabulary (``--spm_model``) so
token ids keep the reference ordering — required for the embedding/generator
rows to line up.

Usage:
    python scripts/convert_reference_checkpoint.py \
        --ckpt model_best_pruned_sparse.pth --model_type relation_transformer \
        --out run_dir/model_best.msgpack [--spm_model tokenizer/word.model \
        --tokenizer_out run_dir/tokenizer] [--share_att_encoder kv ...]
"""

from __future__ import annotations

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# Host-side tool: everything here is numpy/msgpack conversion, so never
# initialize an accelerator backend (the axon TPU plugin ignores
# JAX_PLATFORMS and hangs for minutes when the relay is unreachable).
from sparse_caption_tpu.utils.jax_setup import select_platform  # noqa: E402

select_platform("cpu")


def parse_args():
    p = argparse.ArgumentParser(formatter_class=argparse.ArgumentDefaultsHelpFormatter)
    p.add_argument("--ckpt", required=True, help="reference .pth checkpoint (dense or sparse-COO)")
    p.add_argument("--model_type", required=True,
                   help="transformer | relation_transformer | up_down_lstm (a `_prune` suffix is stripped)")
    p.add_argument("--out", required=True, help="output .msgpack path")
    p.add_argument("--share_att_encoder", default=None, choices=[None, "kv", "qk"])
    p.add_argument("--share_att_decoder", default=None, choices=[None, "kv", "qk"])
    p.add_argument("--spm_model", default=None,
                   help="reference SentencePiece .model file; imports the vocab ordering")
    p.add_argument("--tokenizer_out", default=None,
                   help="directory for the imported word-tokenizer artifact (default: <out dir>/tokenizer)")
    return p.parse_args()


def main():
    args = parse_args()
    import torch

    from sparse_caption_tpu.engine.checkpoints import save_pytree
    from sparse_caption_tpu.utils.convert_torch import convert_state_dict, densify_torch_state_dict

    model_type = args.model_type
    if model_type.endswith("_prune"):
        model_type = model_type[: -len("_prune")]

    state_dict = torch.load(args.ckpt, map_location="cpu", weights_only=False)
    state_dict = densify_torch_state_dict(state_dict)
    params, masks = convert_state_dict(
        state_dict, model_type,
        share_att_encoder=args.share_att_encoder, share_att_decoder=args.share_att_decoder,
    )
    out = Path(args.out)
    out.parent.mkdir(parents=True, exist_ok=True)
    save_pytree(str(out), {"params": params, "masks": masks})
    n = sum(x.size for x in _leaves(params))
    print(f"converted {len(state_dict)} tensors -> {out} ({n:,d} params, masks={'yes' if masks else 'no'})")

    if args.spm_model:
        from sparse_caption_tpu.tokenizers.spm_import import (
            parse_sentencepiece_model,
            pieces_to_word_vocab,
            write_word_vocab_artifact,
        )

        vocab = pieces_to_word_vocab(parse_sentencepiece_model(args.spm_model))
        tok_dir = args.tokenizer_out or str(out.parent / "tokenizer")
        path = write_word_vocab_artifact(vocab, tok_dir)
        print(f"imported SentencePiece vocab ({len(vocab)} pieces, reference id order) -> {path}")


def _leaves(tree):
    import jax

    return jax.tree.leaves(tree)


if __name__ == "__main__":
    main()
