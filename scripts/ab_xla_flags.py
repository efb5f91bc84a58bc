#!/usr/bin/env python
"""A/B the XE train step under XLA TPU compiler-option overrides.

VERDICT r4 (weak #3) notes the ~16% scale-invariant layout-copy tax in
the XE step has been attacked four times at the model-formulation level
(transpose-free r2, pallas box-attn r2, LN stats r3, time-major layout
r4 — all neutral or worse) but never at the XLA-flags level.  This
script closes that axis: it lowers the EXACT bench XE step
(``bench.build_xe_step``) once and compiles it under a set of candidate
TPU compiler options via the AOT API (``lowered.compile(
compiler_options=...)`` — the only override path that reaches the
relay's server-side compiler; client env XLA_FLAGS do not propagate).

Options the server rejects are recorded as ``rejected`` rather than
failing the A/B, so the artifact documents exactly which knobs exist on
this toolchain version.  Timings use the np.asarray sync (CLAUDE.md:
block_until_ready lies through the relay).

    python scripts/ab_xla_flags.py --batch 256 --iters 5 \
        --out resources/ab_xla_flags_r5.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)

# candidate option sets: layout/fusion/scheduling knobs plausibly touching
# the profiled cost classes (layout copies 16%, small-dot fusions, reduces)
OPTION_SETS = {
    "baseline": {},
    "latency_hiding_scheduler": {"xla_tpu_enable_latency_hiding_scheduler": "true"},
    "no_dot_strength_reduction": {"xla_tpu_enable_dot_strength_reduction": "false"},
    "scoped_vmem_128m": {"xla_tpu_scoped_vmem_limit_kib": "131072"},
    "no_multi_level_fusion": {"xla_tpu_enable_multi_level_nested_loop_fusion": "false"},
    "aggressive_fusion": {"xla_tpu_enable_aggressive_loop_fusion_layout_opt": "true"},
    "no_experimental_fusion_cost": {"xla_tpu_use_experimental_fusion_cost_model": "false"},
    "flash_attention_off": {"xla_tpu_enable_flash_attention": "false"},
}


def time_compiled(compiled, state, iters: int) -> float:
    import numpy as np

    s = state
    for _ in range(2):  # warmup
        s, loss = compiled(s)
    np.asarray(loss)
    t0 = time.perf_counter()
    for _ in range(iters):
        s, loss = compiled(s)
    np.asarray(loss)
    return iters / (time.perf_counter() - t0)


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--sets", type=str, default=None,
                    help="comma list of OPTION_SETS keys (default: all)")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    from sparse_caption_tpu.utils.jax_setup import enable_persistent_cache

    enable_persistent_cache()
    import jax

    import bench

    xe_step, state = bench.build_xe_step(jax, jax.numpy, args.batch)
    lowered = xe_step.lower(state)

    keys = args.sets.split(",") if args.sets else list(OPTION_SETS)
    results = {}
    for name in keys:
        opts = OPTION_SETS[name]
        try:
            compiled = lowered.compile(compiler_options=opts or None)
        except Exception as e:  # noqa: BLE001 — unknown flags must not kill the sweep
            results[name] = {"options": opts, "rejected": f"{type(e).__name__}: {e}"[:300]}
            print(json.dumps({name: results[name]}), flush=True)
            continue
        sps = time_compiled(compiled, state, args.iters)
        results[name] = {"options": opts, "steps_per_sec": round(sps, 4)}
        print(json.dumps({name: results[name]}), flush=True)

    base = results.get("baseline", {}).get("steps_per_sec")
    for name, r in results.items():
        if base and "steps_per_sec" in r:
            r["vs_baseline"] = round(r["steps_per_sec"] / base, 4)
    out = {"batch": args.batch, "iters": args.iters,
           "device": str(jax.devices()[0].device_kind), "results": results}
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
