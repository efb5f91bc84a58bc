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

    # the bench's exact step construction (one source of truth), so the
    # profile explains the bench's own xe_steps_per_sec_batch256 numbers
    b, spi, bf16 = args.batch, 5, args.bf16
    xe_step, state = bench_mod.build_xe_step(jax, jnp, b, bf16)

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
