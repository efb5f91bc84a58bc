#!/usr/bin/env python
"""Profile the beam-5 decode on the TPU and aggregate device op time.

Round-2/3 profile recipe (CLAUDE.md): jax.profiler.start_trace around N
decode iterations, then parse the trace proto/JSON and aggregate device
time by op name prefix. Prints a sorted table + one JSON line.

    python scripts/profile_decode.py [--batch 1024] [--iters 3]
"""

from __future__ import annotations

import argparse
import json
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np

VOCAB, D_MODEL, FF, LAYERS, HEADS = 10000, 512, 2048, 6, 8
REGIONS, FEAT, MAX_LEN, BEAM = 36, 2048, 17, 5


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    args = ap.parse_args()

    from sparse_caption_tpu.utils.jax_setup import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

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

    @jax.jit
    def decode(variables, att, amask, boxes):
        memory = model.apply(variables, att, amask, boxes, method="encode")
        seq, _ = generate(model, variables, memory, {"beam_size": BEAM, "max_seq_length": MAX_LEN})
        return seq

    np.asarray(decode(variables, att, amask, boxes))  # compile+warmup
    trace_dir = tempfile.mkdtemp(prefix="prof_decode_")
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        np.asarray(decode(variables, att, amask, boxes)[:, 0, 0])
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()

    from sparse_caption_tpu.utils.traceagg import aggregate_device_ops

    agg, total = aggregate_device_ops(trace_dir)
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]
    print(f"wall {wall:.3f}s for {args.iters} iters (batch {b}); "
          f"device total {total:.3f}s", file=sys.stderr)
    for name, dur in rows:
        print(f"{dur * 1e3 / args.iters:9.2f} ms/iter  {100 * dur / max(total, 1e-9):5.1f}%  {name}",
              file=sys.stderr)
    print(json.dumps({"batch": b, "iters": args.iters, "wall_s": round(wall, 3),
                      "device_s": round(total, 3),
                      "top": [{"op": n, "ms_per_iter": round(d * 1e3 / args.iters, 2)}
                              for n, d in rows]}))


if __name__ == "__main__":
    main()
