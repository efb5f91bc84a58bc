#!/usr/bin/env python
"""Profile the large-batch XE train step on the TPU and aggregate device op
time, closing the training path the way ``profile_decode.py`` closed the
decode: with per-fusion evidence of where the non-MFU time goes.

The bench's MFU model (bench.py ``ort_xe_flops``) counts matmul FLOPs only;
this profile shows what fraction of device time the MXU-eligible fusions
actually get vs LayerNorm/softmax/dropout/layout work, so the ~13-15% MFU
at batch 256 is attributable rather than asserted.

    python scripts/profile_xe.py [--batch 256] [--iters 3] [--bf16]
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


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=256, help="images per step (x5 captions)")
    ap.add_argument("--iters", type=int, default=3)
    ap.add_argument("--top", type=int, default=25)
    ap.add_argument("--bf16", action="store_true", help="--train_precision bf16 equivalent")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    from sparse_caption_tpu.utils.jax_setup import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    import bench as bench_mod
    from sparse_caption_tpu.utils.traceagg import aggregate_device_ops

    # reuse the bench's exact step construction so the profile explains the
    # bench's own xe_steps_per_sec_batch256 numbers
    b = args.batch

    from sparse_caption_tpu.engine import losses as losses_mod

    model, opt_w, opt_m, optax = bench_mod._make_train_pieces(jax, jnp, prune=True)
    rng = np.random.default_rng(1)
    spi, t = 5, bench_mod.MAX_LEN + 1
    att = jnp.asarray(rng.standard_normal((b, bench_mod.REGIONS, bench_mod.FEAT)), jnp.float32)
    amask = jnp.ones((b, bench_mod.REGIONS), jnp.float32)
    boxes = jnp.asarray(rng.uniform(0, 1, (b, bench_mod.REGIONS, 4)), jnp.float32)
    seqs = jnp.asarray(rng.integers(4, bench_mod.VOCAB, (b * spi, t)), jnp.int32)
    seq_masks = jnp.ones((b * spi, t), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
                           att, amask, seqs, boxes=boxes)
    params, masks = variables["params"], variables["masks"]
    state = {"params": params, "masks": masks, "ow": opt_w.init(params), "om": opt_m.init(masks),
             "step": jnp.zeros((), jnp.int32)}
    base_rng = jax.random.PRNGKey(2)
    bf16 = args.bf16

    @jax.jit
    def xe_step(state):
        k_drop, k_mask = jax.random.split(jax.random.fold_in(base_rng, state["step"]))

        def loss_fn(params, masks):
            a, am = att, amask
            if bf16:
                params = jax.tree.map(
                    lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x,
                    params)
                a, am = att.astype(jnp.bfloat16), amask.astype(jnp.bfloat16)
            lp = model.apply({"params": params, "masks": masks}, a, am, seqs, boxes=boxes,
                             train=True, rngs={"dropout": k_drop, "mask": k_mask})
            return losses_mod.language_model_loss(lp, seqs[:, 1:], seq_masks[:, 1:])

        loss, (gw, gm) = jax.value_and_grad(loss_fn, argnums=(0, 1))(state["params"], state["masks"])
        uw, ow = opt_w.update(gw, state["ow"], state["params"])
        um, om = opt_m.update(gm, state["om"], state["masks"])
        return {"params": optax.apply_updates(state["params"], uw),
                "masks": optax.apply_updates(state["masks"], um),
                "ow": ow, "om": om, "step": state["step"] + 1}, loss

    state, loss = xe_step(state)
    np.asarray(loss)  # compile+warmup

    trace_dir = tempfile.mkdtemp(prefix="prof_xe_")
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, loss = xe_step(state)
    np.asarray(loss)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    sps = args.iters / wall

    agg, total = aggregate_device_ops(trace_dir)
    rows = sorted(agg.items(), key=lambda kv: -kv[1])[: args.top]
    flops = bench_mod.ort_xe_flops(b)
    dev_kind = jax.devices()[0].device_kind
    peak = bench_mod.PEAK_TFLOPS.get(dev_kind)
    mfu = flops * sps / (peak * 1e12) if peak else None

    mfu_txt = f"; MFU {mfu:.3f}" if mfu else ""
    print(f"wall {wall:.3f}s for {args.iters} iters (batch {b}x{spi}"
          f"{', bf16' if bf16 else ''}); device total {total:.3f}s; "
          f"{sps:.2f} steps/s{mfu_txt}", file=sys.stderr)
    for name, dur in rows:
        print(f"{dur * 1e3 / args.iters:9.2f} ms/iter  {100 * dur / max(total, 1e-9):5.1f}%  {name}",
              file=sys.stderr)
    out = {"batch": b, "iters": args.iters, "bf16": bf16, "wall_s": round(wall, 3),
           "steps_per_sec": round(sps, 3), "device_s": round(total, 3),
           "model_tflops_per_step": round(flops / 1e12, 4),
           "mfu": round(mfu, 4) if mfu else None,
           "top": [{"op": n, "ms_per_iter": round(d * 1e3 / args.iters, 2)} for n, d in rows]}
    line = json.dumps(out)
    print(line)
    if args.out:
        Path(args.out).write_text(line + "\n")


if __name__ == "__main__":
    main()
