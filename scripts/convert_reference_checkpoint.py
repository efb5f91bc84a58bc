#!/usr/bin/env python
"""Convert a reference PyTorch `.pth` checkpoint (jiahuei/sparse-image-captioning,
incl. the published sparse-captioning-checkpoints) into this framework's
msgpack format.

    python scripts/convert_reference_checkpoint.py \
        --pth model_best.pth --model_type relation_transformer \
        --out model_best_converted.msgpack [--share_att_decoder kv ...]

Sparse (torch COO) checkpoints are densified on load (reference
utils/model_utils.py:110-118).  Cross-framework forward parity of the
conversion is covered by tests/test_torch_parity.py (<1e-4 on logprobs).
"""

import argparse
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--pth", required=True)
    p.add_argument("--out", required=True)
    p.add_argument("--model_type", required=True,
                   choices=["transformer", "relation_transformer", "up_down_lstm"])
    p.add_argument("--num_heads", type=int, default=8)
    p.add_argument("--share_att_encoder", type=str, default=None)
    p.add_argument("--share_att_decoder", type=str, default=None)
    args = p.parse_args()

    import torch

    from sparse_caption_tpu.engine.checkpoints import save_pytree
    from sparse_caption_tpu.utils.convert_torch import convert_state_dict

    state_dict = torch.load(args.pth, map_location="cpu")
    state_dict = {k: (v.to_dense() if getattr(v, "is_sparse", False) else v) for k, v in state_dict.items()}
    params, masks = convert_state_dict(
        state_dict, args.model_type, num_heads=args.num_heads,
        share_att_encoder=args.share_att_encoder, share_att_decoder=args.share_att_decoder,
    )
    save_pytree(args.out, {"params": params, "masks": masks})
    n = sum(x.size for x in __import__("jax").tree.leaves(params))
    print(f"converted {len(state_dict)} tensors ({n:,d} params) -> {args.out}")


if __name__ == "__main__":
    main()
