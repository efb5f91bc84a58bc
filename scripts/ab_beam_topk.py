#!/usr/bin/env python
"""In-loop A/B of the beam step's V-wide top-k strategies (VERDICT r2 #2).

Round-2 profile: f32 ``lax.top_k`` over (B*K, V) = (5120, 10000) costs
0.92 ms/step at batch 1024 — ~7x off the HBM read roofline — and is the
last big target of the decode. Three fixes were A/B'd standalone in round
2; this script measures them IN-LOOP (full beam-5 decode, paper-scale
ORT-512, bf16 eval precision, batch 1024):

    exact   f32 lax.top_k              (round-2 shipping config)
    bf16    bf16-select + f32 gather   (decoding/beam.py _row_topk)
    approx  lax.approx_max_k(recall_target=1.0)

Also verifies output parity: every mode must emit the same token sequences
as ``exact`` on the same inputs (ties below 1 bf16 ulp excepted).

    python scripts/ab_beam_topk.py [--batch 1024] [--iters 5]
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

VOCAB, D_MODEL, FF, LAYERS, HEADS = 10000, 512, 2048, 6, 8
REGIONS, FEAT, MAX_LEN, BEAM = 36, 2048, 17, 5


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--modes", type=str, default="exact,bf16,approx")
    args = ap.parse_args()

    from sparse_caption_tpu.utils.jax_setup import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from sparse_caption_tpu.decoding import beam as beam_mod
    from sparse_caption_tpu.decoding import generate
    from sparse_caption_tpu.models.relation_transformer import RelationTransformer

    model = RelationTransformer(
        vocab_size=VOCAB, d_model=D_MODEL, dim_feedforward=FF, num_layers=LAYERS,
        num_heads=HEADS, att_feat_size=FEAT, max_seq_length=MAX_LEN,
    )
    rng = np.random.default_rng(0)
    b = args.batch
    att = jnp.asarray(rng.standard_normal((b, REGIONS, FEAT)), jnp.bfloat16)
    amask = jnp.ones((b, REGIONS), jnp.bfloat16)
    boxes = jnp.asarray(rng.uniform(0, 1, (b, REGIONS, 4)), jnp.float32)
    seqs0 = jnp.asarray(rng.integers(4, VOCAB, (2, MAX_LEN + 1)), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, att[:2].astype(jnp.float32),
                           jnp.ones((2, REGIONS), jnp.float32), seqs0, boxes=boxes[:2])
    variables = jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x, variables)

    def make_decode(mode):
        beam_mod._TOPK_MODE = mode  # read at trace time inside _row_topk

        @jax.jit
        def decode(variables, att, amask, boxes):
            memory = model.apply(variables, att, amask, boxes, method="encode")
            seq, _ = generate(model, variables, memory, {"beam_size": BEAM, "max_seq_length": MAX_LEN})
            return seq

        return decode

    results = {}
    modes = args.modes.split(",")
    baseline_mode = modes[0]  # sequences are compared against the FIRST mode
    ref_seq = None
    for mode in modes:
        decode = make_decode(mode)
        t0 = time.perf_counter()
        seq = np.asarray(decode(variables, att, amask, boxes))
        print(f"{mode}: compile+first {time.perf_counter() - t0:.1f}s", file=sys.stderr, flush=True)
        if ref_seq is None:
            ref_seq = seq
            match = 1.0
        else:
            match = float(np.mean(np.all(seq[:, 0] == ref_seq[:, 0], axis=-1)))
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            for _ in range(args.iters):
                out = decode(variables, att, amask, boxes)
                np.asarray(out[:, 0, 0])
            best = min(best, time.perf_counter() - t0)
        results[mode] = {"captions_per_sec": round(b * args.iters / best, 1),
                         f"top1_seq_match_vs_{baseline_mode}": round(match, 4)}
        print(f"{mode}: {results[mode]}", file=sys.stderr, flush=True)

    print(json.dumps({"batch": b, "beam": BEAM, "baseline_mode": baseline_mode,
                      "results": results}))


if __name__ == "__main__":
    main()
