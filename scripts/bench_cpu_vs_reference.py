#!/usr/bin/env python
"""Same-hardware decode throughput: this framework vs the LIVE reference.

The reference repo publishes no throughput numbers (SURVEY §6), so
bench.py's ``vs_baseline`` uses an estimated A100 constant. This script
produces a MEASURED ratio instead, by running both implementations on the
same CPU: the reference PyTorch ORT (imported from the read-only mount,
used purely as a black box) and this framework's ORT, identical paper-scale
config (d512/ff2048/6L/8h, vocab 10k, 36x2048 features, beam 5), identical
batch, fp32 both.

    python scripts/bench_cpu_vs_reference.py [--batch 4] [--iters 2]

Prints one JSON line:
    {"ours_captions_per_sec": A, "reference_captions_per_sec": B,
     "ours_over_reference_same_cpu": A/B, ...}
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time
import types

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

REFERENCE = os.environ.get("SPARSE_CAPTION_REFERENCE", "/root/reference")

VOCAB, D_MODEL, FF, LAYERS, HEADS = 10000, 512, 2048, 6, 8
REGIONS, FEAT, MAX_LEN, BEAM = 36, 2048, 17, 5


def _stub_reference_deps() -> None:
    for name, mod in {
        "sentencepiece": dict(SentencePieceTrainer=object, SentencePieceProcessor=object),
        "tqdm": dict(tqdm=lambda x, **k: x),
    }.items():
        m = types.ModuleType(name)
        for k, v in mod.items():
            setattr(m, k, v)
        sys.modules.setdefault(name, m)
    if "pkg_resources" not in sys.modules:
        import packaging
        import packaging.version  # noqa: F401

        pr = types.ModuleType("pkg_resources")
        pr.packaging = packaging
        sys.modules["pkg_resources"] = pr
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")
        tvt.Compose = type("_Compose", (), {"__init__": lambda self, *a, **k: None})
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
    sys.path.insert(0, REFERENCE)


def bench_reference(att, amask, boxes, batch: int, iters: int) -> float:
    import torch

    _stub_reference_deps()
    from sparse_caption.models.relation_transformer import RelationTransformerModel
    from sparse_caption.utils.config import Config as RefConfig

    cfg = RefConfig(
        d_model=D_MODEL, dim_feedforward=FF, num_layers=LAYERS, num_heads=HEADS,
        drop_prob_src=0.1, att_feat_size=FEAT, max_seq_length=MAX_LEN, vocab_size=VOCAB,
        bos_token_id=2, eos_token_id=3, unk_token_id=1, pad_token_id=0,
        share_att_encoder=None, share_att_decoder=None,
        share_layer_encoder=None, share_layer_decoder=None,
        no_box_trigonometric_embedding=False,
    )
    torch.manual_seed(0)
    torch.set_num_threads(os.cpu_count() or 1)
    ref = RelationTransformerModel(cfg)
    ref.eval()
    opt = dict(beam_size=BEAM, group_size=1, length_penalty="", decoding_constraint=0,
               suppress_UNK=0, remove_bad_endings=0)
    t_att = torch.tensor(att)
    t_amask = torch.tensor(amask)
    t_boxes = torch.tensor(boxes)

    def run():
        with torch.no_grad():
            return ref(att_feats=t_att, boxes=t_boxes, att_masks=t_amask, mode="sample", opt=opt)

    run()  # warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        run()
    return batch * iters / (time.perf_counter() - t0)


def bench_ours(att, amask, boxes, batch: int, iters: int) -> float:
    import jax

    jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np

    from sparse_caption_tpu.decoding import generate
    from sparse_caption_tpu.models.relation_transformer import RelationTransformer

    model = RelationTransformer(vocab_size=VOCAB, d_model=D_MODEL, dim_feedforward=FF,
                                num_layers=LAYERS, num_heads=HEADS, att_feat_size=FEAT,
                                max_seq_length=MAX_LEN + 1)
    att, amask, boxes = jnp.asarray(att), jnp.asarray(amask), jnp.asarray(boxes)
    seqs0 = jnp.zeros((batch, MAX_LEN + 1), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, att, amask, seqs0, boxes=boxes)

    @jax.jit
    def decode(variables, att, amask, boxes):
        memory = model.apply(variables, att, amask, boxes, method="encode")
        return generate(model, variables, memory, {"beam_size": BEAM, "max_seq_length": MAX_LEN})[0]

    np.asarray(decode(variables, att, amask, boxes))  # compile+warmup
    t0 = time.perf_counter()
    for _ in range(iters):
        np.asarray(decode(variables, att, amask, boxes))
    return batch * iters / (time.perf_counter() - t0)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--iters", type=int, default=2)
    args = ap.parse_args()
    if not os.path.isdir(REFERENCE):
        print(json.dumps({"error": f"reference mount not found at {REFERENCE}"}))
        return

    import numpy as np

    rng = np.random.default_rng(0)
    att = rng.standard_normal((args.batch, REGIONS, FEAT)).astype(np.float32)
    amask = np.ones((args.batch, REGIONS), np.float32)
    boxes = rng.uniform(0.05, 0.95, (args.batch, REGIONS, 4)).astype(np.float32)

    ours = bench_ours(att, amask, boxes, args.batch, args.iters)
    theirs = bench_reference(att, amask, boxes, args.batch, args.iters)
    print(json.dumps({
        "ours_captions_per_sec": round(ours, 3),
        "reference_captions_per_sec": round(theirs, 3),
        "ours_over_reference_same_cpu": round(ours / theirs, 3),
        "batch": args.batch, "beam": BEAM, "config": "ORT-512 paper scale, fp32, CPU",
    }))


if __name__ == "__main__":
    main()
