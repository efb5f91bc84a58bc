#!/usr/bin/env python
"""A/B the XE train step's attention layout on the TPU.

The round-3 batch-256 profile (``resources/profile_xe_r3.json``) charges
30 ms/step (16%) to XLA layout copies. This is the direct attempt the
round-3 verdict asked for: a time-major attention formulation
(``SPARSE_CAPTION_ATTN_LAYOUT=time_major``) that keeps q/k/v in their
projected (B, T, h, dk) layout — no (B,h,T,dk) head transposes — with the
einsums carrying the head dim, vs the baseline head-major path.

Each variant runs in a FRESH process: the layout flag is read at trace
time, so a shared process would reuse the first variant's cached jit.

    python scripts/ab_xe_layout.py [--batch 256] [--iters 5] [--bf16]

Prints one JSON line with steps/s and the profiled copy-op ms for both.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def run_variant(args) -> None:
    from sparse_caption_tpu.utils.jax_setup import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench as bench_mod
    from sparse_caption_tpu.utils.traceagg import aggregate_device_ops

    xe_step, state = bench_mod.build_xe_step(jax, jnp, args.batch, args.bf16)
    state, loss = xe_step(state)
    np.asarray(loss)  # compile+warmup

    trace_dir = tempfile.mkdtemp(prefix="ab_xe_")
    jax.profiler.start_trace(trace_dir)
    t0 = time.perf_counter()
    for _ in range(args.iters):
        state, loss = xe_step(state)
    np.asarray(loss)
    wall = time.perf_counter() - t0
    jax.profiler.stop_trace()
    agg, total = aggregate_device_ops(trace_dir)
    copy_s = sum(v for k, v in agg.items() if k.startswith("copy"))
    print(json.dumps({
        "steps_per_sec": round(args.iters / wall, 3),
        "device_ms_per_step": round(total * 1e3 / args.iters, 2),
        "copy_ms_per_step": round(copy_s * 1e3 / args.iters, 2),
        "loss": float(loss),
    }))


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--bf16", action="store_true")
    ap.add_argument("--only", type=str, default=None,
                    choices=[None, "baseline", "time_major"])
    args = ap.parse_args()
    if args.only:
        run_variant(args)
        return

    out = {"batch": args.batch, "iters": args.iters, "bf16": args.bf16}
    for variant in ("baseline", "time_major"):
        env = os.environ.copy()
        env["SPARSE_CAPTION_ATTN_LAYOUT"] = "" if variant == "baseline" else "time_major"
        cmd = [sys.executable, os.path.abspath(__file__), "--only", variant,
               "--batch", str(args.batch), "--iters", str(args.iters)]
        if args.bf16:
            cmd.append("--bf16")
        r = subprocess.run(cmd, env=env, capture_output=True, text=True, timeout=3600)
        assert r.returncode == 0, f"{variant}: {r.stderr[-3000:]}"
        out[variant] = json.loads(r.stdout.strip().splitlines()[-1])
    b, t = out["baseline"], out["time_major"]
    out["time_major_over_baseline"] = round(t["steps_per_sec"] / b["steps_per_sec"], 4)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
