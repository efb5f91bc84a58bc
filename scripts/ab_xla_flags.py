#!/usr/bin/env python
"""A/B bench workloads under XLA TPU compiler-option overrides.

VERDICT r4 (weak #3) notes the ~16% scale-invariant layout-copy tax in
the XE step has been attacked four times at the model-formulation level
(transpose-free r2, pallas box-attn r2, LN stats r3, time-major layout
r4 — all neutral or worse) but never at the XLA-flags level.  This
script closes that axis: it lowers the EXACT bench workload
(``bench.build_xe_step`` or the bench decode graph) once and compiles it
under a set of candidate TPU compiler options via the AOT API
(``lowered.compile(compiler_options=...)`` — the only override path that
reaches the relay's server-side compiler; client env XLA_FLAGS do not
propagate).

Round-5 sweep result (resources/ab_xla_flags_r5.json): every knob is
neutral except ``xla_tpu_scoped_vmem_limit_kib`` — raising the scoped
VMEM budget lets the fusion cost model keep bigger fusions resident.
The ``--sets vmem_sweep`` preset plus ``--repeats`` interleaved timing
(all compiled executables timed round-robin, best-of per program)
separates that signal from relay noise.

Options the server rejects are recorded as ``rejected`` rather than
failing the A/B, so the artifact documents exactly which knobs exist on
this toolchain version.  Timings use the np.asarray sync (CLAUDE.md:
block_until_ready lies through the relay).

    python scripts/ab_xla_flags.py --batch 256 --iters 5 \
        --out resources/ab_xla_flags_r5.json
    python scripts/ab_xla_flags.py --target decode --sets vmem_sweep \
        --repeats 3 --out resources/ab_xla_flags_decode_r5.json
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
    # vmem-limit sweep around the r5 finding (+3.2% at 128M on the XE step)
    "scoped_vmem_32m": {"xla_tpu_scoped_vmem_limit_kib": "32768"},
    "scoped_vmem_48m": {"xla_tpu_scoped_vmem_limit_kib": "49152"},
    "scoped_vmem_64m": {"xla_tpu_scoped_vmem_limit_kib": "65536"},
    "scoped_vmem_80m": {"xla_tpu_scoped_vmem_limit_kib": "81920"},
    "scoped_vmem_96m": {"xla_tpu_scoped_vmem_limit_kib": "98304"},
    "scoped_vmem_192m": {"xla_tpu_scoped_vmem_limit_kib": "196608"},
}
PRESETS = {
    "vmem_sweep": ["baseline", "scoped_vmem_64m", "scoped_vmem_96m",
                   "scoped_vmem_128m", "scoped_vmem_192m"],
    "vmem_fine": ["baseline", "scoped_vmem_32m", "scoped_vmem_48m",
                  "scoped_vmem_64m", "scoped_vmem_80m"],
}


def build_target(target: str, batch: int):
    """Return (lowered, run(compiled) -> rate, unit) for the bench workload."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import bench

    if target == "xe":
        xe_step, state = bench.build_xe_step(jax, jnp, batch)
        lowered = xe_step.lower(state)

        def run(compiled, iters):
            s = state
            for _ in range(2):
                s, loss = compiled(s)
            np.asarray(loss)
            t0 = time.perf_counter()
            for _ in range(iters):
                s, loss = compiled(s)
            np.asarray(loss)
            return iters / (time.perf_counter() - t0)

        return lowered, run, "steps/s"

    # decode: the bench primary graph (encode + cached decode scan + beam)
    from sparse_caption_tpu.decoding import generate
    from sparse_caption_tpu.models.relation_transformer import RelationTransformer

    np_rng = np.random.default_rng(0)
    model = RelationTransformer(
        vocab_size=bench.VOCAB, d_model=bench.D_MODEL, dim_feedforward=bench.FF,
        num_layers=bench.LAYERS, num_heads=bench.HEADS, att_feat_size=bench.FEAT,
        max_seq_length=bench.MAX_LEN,
    )
    att = jnp.asarray(np_rng.standard_normal((batch, bench.REGIONS, bench.FEAT)), jnp.float32)
    amask = jnp.ones((batch, bench.REGIONS), jnp.float32)
    boxes = jnp.asarray(np_rng.uniform(0, 1, (batch, bench.REGIONS, 4)), jnp.float32)
    seqs = jnp.asarray(np_rng.integers(4, bench.VOCAB, (batch, bench.MAX_LEN + 1)), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, att, amask, seqs, boxes=boxes)
    variables = bench._bf16_tree(jnp, variables)
    att = att.astype(jnp.bfloat16)
    amask = amask.astype(jnp.bfloat16)

    def decode(variables, att, amask, boxes):
        memory = model.apply(variables, att, amask, boxes, method="encode")
        seq, _ = generate(model, variables, memory,
                          {"beam_size": bench.BEAM, "max_seq_length": bench.MAX_LEN})
        return seq

    lowered = jax.jit(decode).lower(variables, att, amask, boxes)

    def run(compiled, iters):
        np.asarray(compiled(variables, att, amask, boxes)[:, 0, 0])
        t0 = time.perf_counter()
        for _ in range(iters):
            np.asarray(compiled(variables, att, amask, boxes)[:, 0, 0])
        return batch * iters / (time.perf_counter() - t0)

    return lowered, run, "captions/s"


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--target", choices=("xe", "decode"), default="xe")
    ap.add_argument("--batch", type=int, default=None,
                    help="default: 256 for xe, bench BATCH (2048) for decode")
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument("--repeats", type=int, default=1,
                    help="interleaved timing rounds over all compiled variants; "
                         "best-of per variant (separates relay noise from signal)")
    ap.add_argument("--sets", type=str, default=None,
                    help="comma list of OPTION_SETS keys or a preset name "
                         f"({', '.join(PRESETS)}); default: all")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    from sparse_caption_tpu.utils.jax_setup import enable_persistent_cache

    enable_persistent_cache()
    import jax

    import bench

    batch = args.batch or (256 if args.target == "xe" else bench.BATCH)
    lowered, run, unit = build_target(args.target, batch)

    if args.sets in PRESETS:
        keys = PRESETS[args.sets]
    elif args.sets:
        keys = args.sets.split(",")
    else:
        keys = [k for k in OPTION_SETS if not k.endswith(("_64m", "_96m", "_192m"))]
    results = {}
    compiled_ok = []
    for name in keys:
        opts = OPTION_SETS[name]
        try:
            t0 = time.perf_counter()
            compiled = lowered.compile(compiler_options=opts or None)
            compile_s = round(time.perf_counter() - t0, 1)
        except Exception as e:  # noqa: BLE001 — unknown flags must not kill the sweep
            results[name] = {"options": opts, "rejected": f"{type(e).__name__}: {e}"[:300]}
            print(json.dumps({name: results[name]}), flush=True)
            continue
        results[name] = {"options": opts, "compile_s": compile_s, "samples": []}
        compiled_ok.append((name, compiled))

    for rep in range(max(1, args.repeats)):
        for name, compiled in compiled_ok:
            rate = run(compiled, args.iters)
            results[name]["samples"].append(round(rate, 4))
            print(json.dumps({name: {"round": rep, "rate": round(rate, 4)}}), flush=True)

    for name, _ in compiled_ok:
        results[name]["rate"] = max(results[name]["samples"])
    base = results.get("baseline", {}).get("rate")
    for name, r in results.items():
        if base and "rate" in r:
            r["vs_baseline"] = round(r["rate"] / base, 4)
    out = {"target": args.target, "batch": batch, "iters": args.iters,
           "repeats": args.repeats, "unit": unit,
           "device": str(jax.devices()[0].device_kind), "results": results}
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


if __name__ == "__main__":
    main()
