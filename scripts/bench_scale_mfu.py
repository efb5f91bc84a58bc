#!/usr/bin/env python
"""XE train-step MFU across model scales on the TPU.

The paper models are tiny by accelerator standards (d512, 36 regions, 18
tokens): the reference-batch XE step measures ~7% MFU and the batch-256
knee ~13-15%, and the round-3/4 profiles close both as SMALL-SHAPE bound
(layout copies + sub-tile matmuls), not framework bound. This script is
the direct demonstration: the identical train-step construction (same
engine losses/optim/model code) at progressively larger ORT dims, each
measured for steps/s and analytic-matmul MFU on the chip.

    python scripts/bench_scale_mfu.py [--iters 5] [--only NAME]

Each config runs in a FRESH subprocess (one live jit per process keeps
HBM headroom honest). Prints one JSON line:
    {"paper_d512_b256": {"steps_per_sec": ..., "mfu": ...}, ...}
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

# name: (d_model, ff, layers, heads, images_per_batch, bf16_compute, max_len)
# d1536/12L OOMs 16 GB HBM under f32 Adam state (840M params x 4 copies) —
# the model-size ceiling on one chip is optimizer memory, which is what
# --fsdp / --zero_opt exist for on a real pod.
CONFIGS = {
    # the bench's own paper-scale point, for continuity with bench.py
    "paper_d512_b256": (512, 2048, 6, 8, 256, True, 17),
    "d768_8L_b128": (768, 3072, 8, 12, 128, True, 17),
    "d1024_12L_b64": (1024, 4096, 12, 16, 64, True, 17),
    # same code, longer sequences: isolates whether the MFU plateau is the
    # task's tiny T=18 decode length (it is NOT — 20.3% vs 19.4%)
    "d1024_12L_b32_T64": (1024, 4096, 12, 16, 32, True, 63),
    # f32 compute: drops the per-step bf16 cast of the 375M params (MXU
    # runs f32 dots as bf16 passes regardless)
    "d1024_12L_b64_f32": (1024, 4096, 12, 16, 64, False, 17),
}
REGIONS, FEAT, VOCAB, SPI = 36, 2048, 10000, 5


def run_config(name: str, iters: int) -> None:
    from sparse_caption_tpu.utils.jax_setup import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np
    import optax

    from bench import ort_xe_flops
    from sparse_caption_tpu.config import Config
    from sparse_caption_tpu.engine import losses as losses_mod
    from sparse_caption_tpu.engine.optim import build_weight_optimizer, make_schedule
    from sparse_caption_tpu.models.relation_transformer import RelationTransformer

    d, ff, layers, heads, b, bf16, max_len = CONFIGS[name]
    t = max_len + 1
    model = RelationTransformer(
        vocab_size=VOCAB, d_model=d, dim_feedforward=ff, num_layers=layers,
        num_heads=heads, att_feat_size=FEAT, max_seq_length=t)
    cfg = Config(lr_scheduler="noam", optim="adam", d_model=d, noamopt_warmup=10000,
                 grad_clip=0.1, learning_rate=5e-4, max_train_step=100000)
    opt_w = build_weight_optimizer(cfg, make_schedule(cfg, steps_per_epoch=1000))

    rng = np.random.default_rng(1)
    att = jnp.asarray(rng.standard_normal((b, REGIONS, FEAT)), jnp.float32)
    amask = jnp.ones((b, REGIONS), jnp.float32)
    boxes = jnp.asarray(rng.uniform(0, 1, (b, REGIONS, 4)), jnp.float32)
    seqs = jnp.asarray(rng.integers(4, VOCAB, (b * SPI, t)), jnp.int32)
    seq_masks = jnp.ones((b * SPI, t), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, att, amask, seqs, boxes=boxes)
    params = variables["params"]
    n_params = sum(int(np.prod(x.shape)) for x in jax.tree.leaves(params))
    state = {"params": params, "ow": opt_w.init(params), "step": jnp.zeros((), jnp.int32)}
    base_rng = jax.random.PRNGKey(2)

    @jax.jit
    def xe_step(state):
        k_drop = jax.random.fold_in(base_rng, state["step"])

        def loss_fn(params):
            p, a, am = params, att, amask
            if bf16:
                p = jax.tree.map(
                    lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x, p)
                a, am = att.astype(jnp.bfloat16), amask.astype(jnp.bfloat16)
            lp = model.apply({"params": p}, a, am, seqs, boxes=boxes,
                             train=True, rngs={"dropout": k_drop})
            return losses_mod.language_model_loss(lp, seqs[:, 1:], seq_masks[:, 1:])

        loss, gw = jax.value_and_grad(loss_fn)(state["params"])
        uw, ow = opt_w.update(gw, state["ow"], state["params"])
        return {"params": optax.apply_updates(state["params"], uw), "ow": ow,
                "step": state["step"] + 1}, loss

    state, loss = xe_step(state)
    np.asarray(loss)  # compile + warmup
    trace_dir = None
    if os.environ.get("SCALE_MFU_PROFILE"):
        import tempfile

        trace_dir = tempfile.mkdtemp(prefix="scale_mfu_")
        jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for _ in range(iters):
        state, loss = xe_step(state)
    np.asarray(loss)
    wall = time.perf_counter() - t0
    top_ops = None
    if trace_dir:
        jax.profiler.stop_trace()
        from sparse_caption_tpu.utils.traceagg import aggregate_device_ops

        agg, total = aggregate_device_ops(trace_dir)
        top = sorted(agg.items(), key=lambda kv: -kv[1])[:12]
        top_ops = {k: round(v * 1e3 / iters, 2) for k, v in top}
        top_ops["_device_total_ms_per_step"] = round(total * 1e3 / iters, 2)

    flops = ort_xe_flops(b, spi=SPI, n=REGIONS, t=t, d=d, ff=ff, L=layers, v=VOCAB, feat=FEAT)
    sps = iters / wall
    from bench import PEAK_TFLOPS

    peak = PEAK_TFLOPS.get(jax.devices()[0].device_kind)
    print(json.dumps({
        "d_model": d, "ff": ff, "layers": layers, "batch_images": b, "seq_len": t,
        "bf16_compute": bf16, "params_m": round(n_params / 1e6, 1),
        "steps_per_sec": round(sps, 3),
        "images_per_sec": round(sps * b, 1),
        "model_tflops_per_step": round(flops / 1e12, 3),
        "mfu": round(flops * sps / (peak * 1e12), 4) if peak else None,
        "loss": float(loss),
        **({"top_ops_ms": top_ops} if top_ops else {}),
    }))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--only", type=str, default=None, choices=[None] + list(CONFIGS))
    args = ap.parse_args()
    if args.only:
        run_config(args.only, args.iters)
        return

    out = {}
    for name in CONFIGS:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--only", name,
             "--iters", str(args.iters)],
            capture_output=True, text=True, timeout=3600)
        if r.returncode != 0:
            out[name] = {"error": r.stderr.strip().splitlines()[-1][:300] if r.stderr else "failed"}
            continue
        out[name] = json.loads(r.stdout.strip().splitlines()[-1])
    print(json.dumps(out))


if __name__ == "__main__":
    main()
