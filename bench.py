#!/usr/bin/env python
"""Benchmark: flagship ORT throughput on one TPU chip.

Prints ONE JSON line with the primary decode metric plus training-step
metrics (the driver's north star names SCST steps/sec, BASELINE.md:33-35):

    {"metric": "captions_per_sec_per_chip_beam5", "value": N,
     "unit": "captions/sec", "vs_baseline": R,
     "xe_steps_per_sec": X, "scst_steps_per_sec": S, ...}

Config matches the paper-scale ORT: d_model 512, ff 2048, 6 layers, 8
heads, vocab 10k, 36 regions x 2048 features, max caption length 17
(reference defaults: models/transformer.py:567-590, data collate 18 incl.
BOS). Params/activations run in bf16 — the framework's supported eval
precision (scripts/eval_model.py --cast bf16) and standard TPU practice.

* decode: batch 1024 at beam 5, one jitted graph (encode + cached decode
  scan + ancestry beam reorder); batch sweep round 2: 64 -> 1579, 128 ->
  2468, 256 -> 3197, 512 -> 3469, 1024 -> 4518, 2048 -> 4799 captions/s
  (eval batching is a free knob, reference default batch_size_eval=50;
  1024 is the knee of the curve — 2048 adds only +6% for 2x the batch
  latency).  Profile at 1024: the per-step self/cross-attention cache
  reads run at the HBM roofline (~0.25 ms/layer/step for the 94 MB
  K-cache read); remaining headroom is the V-wide top_k (0.9 ms/step,
  ~7x off bandwidth) and sub-roofline small fusions.
* xe_steps_per_sec: supermask-prune XE step (batch 15 images x 5 captions,
  the reference's training batch, utils/training.py:396-415) — jitted
  fwd+bwd+both optimizers, fresh Bernoulli mask draw per forward.
* scst_steps_per_sec: two-phase SCST step at the paper config (batch 5,
  15 random samples, leave-one-out sample-mean baseline — the reference
  recipes' SCST_BASELINE="sample", commands_pruning.sh:47-70): jitted
  sampling decode -> host CIDEr-D reward (native C++ scorer) -> jitted
  REINFORCE update with the teacher-forced-replay gradient pass.

``vs_baseline``: the reference repo publishes no throughput numbers
(SURVEY §6); the baseline constant below is the estimated single-A100
throughput of the reference PyTorch implementation at beam 5 (batched
incremental decoding of this architecture), so >1.0 means faster than the
reference on its own class of hardware. A MEASURED same-hardware anchor
exists too: scripts/bench_cpu_vs_reference.py runs both implementations on
the identical CPU — this framework decodes 2.3x faster than the live
reference (batch 4: 6.16 vs 2.69 captions/s; batch 16: 8.61 vs 3.77;
fp32, paper-scale ORT, beam 5).
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

BASELINE_CAPTIONS_PER_SEC = 100.0  # est. reference impl. on one A100, beam 5

BATCH = int(os.environ.get("BENCH_BATCH", 1024))
BEAM = 5
VOCAB = 10000
D_MODEL = 512
FF = 2048
LAYERS = 6
HEADS = 8
REGIONS = 36
FEAT = 2048
MAX_LEN = 17
ITERS = 5
DEBUG = bool(os.environ.get("BENCH_DEBUG"))


def _log(msg):
    if DEBUG:
        print(msg, file=sys.stderr, flush=True)


def _bf16_tree(jnp, tree):
    import jax

    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x, tree
    )


def bench_decode(jax, jnp, model, variables, att, amask, boxes):
    from sparse_caption_tpu.decoding import generate

    @jax.jit
    def decode(variables, att, amask, boxes):
        memory = model.apply(variables, att, amask, boxes, method="encode")
        seq, _ = generate(model, variables, memory, {"beam_size": BEAM, "max_seq_length": MAX_LEN})
        return seq

    t0 = time.perf_counter()
    np.asarray(decode(variables, att, amask, boxes))
    _log(f"decode warmup+compile: {time.perf_counter() - t0:.1f}s")

    # best of 3 trials: transient tunnel stalls can poison a single timing
    best_dt = float("inf")
    for _trial in range(3):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = decode(variables, att, amask, boxes)
            np.asarray(out[:, 0, 0])  # forces device->host sync
        best_dt = min(best_dt, time.perf_counter() - t0)
    return BATCH * ITERS / best_dt


def _make_train_pieces(jax, jnp, prune: bool):
    """Paper-scale ORT(+supermask) model, optimizers, synthetic batch."""
    import optax

    from sparse_caption_tpu.config import Config
    from sparse_caption_tpu.engine.optim import build_mask_optimizer, build_weight_optimizer, make_schedule
    from sparse_caption_tpu.models.relation_transformer import RelationTransformer
    from sparse_caption_tpu.ops.masked import MaskConfig

    mask_cfg = MaskConfig(mask_type="supermask", mask_init_value=5.0) if prune else None
    model = RelationTransformer(
        vocab_size=VOCAB, d_model=D_MODEL, dim_feedforward=FF, num_layers=LAYERS,
        num_heads=HEADS, att_feat_size=FEAT, max_seq_length=MAX_LEN + 1, mask_cfg=mask_cfg,
    )
    cfg = Config(lr_scheduler="noam", optim="adam", d_model=D_MODEL, noamopt_warmup=10000,
                 grad_clip=0.1, learning_rate=5e-4, max_train_step=100000)
    schedule = make_schedule(cfg, steps_per_epoch=1000)
    opt_w = build_weight_optimizer(cfg, schedule)
    opt_m = build_mask_optimizer(cfg, prune)
    return model, opt_w, opt_m, optax


def bench_xe_step(jax, jnp):
    """Supermask XE train step at reference batch 15 x 5 captions."""
    from sparse_caption_tpu.engine import losses as losses_mod

    model, opt_w, opt_m, optax = _make_train_pieces(jax, jnp, prune=True)
    rng = np.random.default_rng(1)
    b, spi, t = 15, 5, MAX_LEN + 1
    att = jnp.asarray(rng.standard_normal((b, REGIONS, FEAT)), jnp.float32)
    amask = jnp.ones((b, REGIONS), jnp.float32)
    boxes = jnp.asarray(rng.uniform(0, 1, (b, REGIONS, 4)), jnp.float32)
    seqs = jnp.asarray(rng.integers(4, VOCAB, (b * spi, t)), jnp.int32)
    seq_masks = jnp.ones((b * spi, t), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0), "mask": jax.random.PRNGKey(1)},
                           att, amask, seqs, boxes=boxes)
    params, masks = variables["params"], variables["masks"]
    state = {"params": params, "masks": masks, "ow": opt_w.init(params), "om": opt_m.init(masks),
             "step": jnp.zeros((), jnp.int32)}
    base_rng = jax.random.PRNGKey(2)

    @jax.jit
    def xe_step(state):
        # per-step keys derived in-jit from the carried step counter —
        # eager host fold_in ops are ~3 ms relay dispatches each
        # (engine/training.py make_xe_step does the same from state.step)
        k_drop, k_mask = jax.random.split(jax.random.fold_in(base_rng, state["step"]))

        def loss_fn(params, masks):
            # f32 params: JAX's default TPU matmul precision already runs f32
            # dots on the MXU in bf16, so --train_precision bf16 is neutral on
            # step time at this batch (A/B'd: 48.1 f32 vs 47.0 bf16 steps/s) —
            # its value is activation/weight HBM headroom, not speed
            lp = model.apply({"params": params, "masks": masks}, att, amask, seqs, boxes=boxes,
                             train=True, rngs={"dropout": k_drop, "mask": k_mask})
            return losses_mod.language_model_loss(lp, seqs[:, 1:], seq_masks[:, 1:])

        loss, (gw, gm) = jax.value_and_grad(loss_fn, argnums=(0, 1))(state["params"], state["masks"])
        uw, ow = opt_w.update(gw, state["ow"], state["params"])
        um, om = opt_m.update(gm, state["om"], state["masks"])
        import optax as _o

        return {"params": _o.apply_updates(state["params"], uw), "masks": _o.apply_updates(state["masks"], um),
                "ow": ow, "om": om, "step": state["step"] + 1}, loss

    t0 = time.perf_counter()
    state, loss = xe_step(state)
    np.asarray(loss)
    _log(f"xe warmup+compile: {time.perf_counter() - t0:.1f}s")
    n = 10
    best = float("inf")
    for _trial in range(2):
        t0 = time.perf_counter()
        for i in range(n):
            state, loss = xe_step(state)
        np.asarray(loss)
        best = min(best, time.perf_counter() - t0)
    return n / best


def bench_scst_step(jax, jnp, tmp_dir="/tmp/sc_bench"):
    """Two-phase SCST step: device sample -> host CIDEr-D -> device update."""
    from sparse_caption_tpu.decoding import generate
    from sparse_caption_tpu.engine import losses as losses_mod
    from sparse_caption_tpu.metrics.cider import build_df_pickle
    from sparse_caption_tpu.scst import CaptionScorer
    from sparse_caption_tpu.scst import native as native_scst

    model, opt_w, opt_m, optax = _make_train_pieces(jax, jnp, prune=False)
    b, n_samples, t = 5, 15, MAX_LEN
    rng = np.random.default_rng(2)
    att = jnp.asarray(rng.standard_normal((b, REGIONS, FEAT)), jnp.float32)
    amask = jnp.ones((b, REGIONS), jnp.float32)
    boxes = jnp.asarray(rng.uniform(0, 1, (b, REGIONS, 4)), jnp.float32)
    seqs0 = jnp.asarray(rng.integers(4, VOCAB, (b, t + 1)), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(3)}, att, amask, seqs0, boxes=boxes)
    params = variables["params"]
    state = {"params": params, "ow": opt_w.init(params), "step": jnp.zeros((), jnp.int32)}
    base_rng = jax.random.PRNGKey(4)

    # synthetic refs + df pickle (token ids as words — same n-gram math)
    words = lambda ids: " ".join(f"w{i}" for i in ids)  # noqa: E731
    gts = [[words(rng.integers(4, 200, rng.integers(8, 15))) for _ in range(5)] for _ in range(b)]
    os.makedirs(tmp_dir, exist_ok=True)
    df_path = os.path.join(tmp_dir, "df.p")
    if not os.path.isfile(df_path):
        build_df_pickle(gts, df_path)
    scorer_cls = native_scst.NativeCaptionScorer if native_scst.is_available() else CaptionScorer
    scorer = scorer_cls(df_path[:-2], cider_weight=1.0, bleu_weight=[0, 0, 0, 0])

    # same semantics as the engine's two-phase step (engine/training.py
    # make_scst_step): train-mode sampling policy; the grad pass recomputes
    # the identical decode differentiably so gradients attach to the true
    # sampling-pass logprobs
    sample_opt = {"num_random_sample": n_samples, "beam_size": 0, "max_seq_length": t,
                  "temperature": 1.0, "decode_train": True}

    def train_sample(params, rng, differentiable):
        v = {"params": params}
        kd, km, kdec = jax.random.split(rng, 3)
        memory = model.apply(v, att, amask, boxes, train=True, rngs={"dropout": kd, "mask": km},
                             method="encode")
        opt_d = dict(sample_opt, differentiable=True) if differentiable else sample_opt
        return generate(model, v, memory, opt_d, rng=kdec)

    @jax.jit
    def sample_fn(params, step):
        # per-step key derived in-jit (mirrors engine/training.py): eager
        # host rng ops are ~3 ms relay dispatches each
        rng = jax.random.fold_in(base_rng, step)
        return {"sample": train_sample(params, rng, False)[0]}

    @jax.jit
    def grad_fn(state, sample_seq, rewards):
        from sparse_caption_tpu.decoding.api import decode_train_keys

        rng = jax.random.fold_in(base_rng, state["step"])  # same key as sample_fn
        flat = sample_seq.reshape(b * n_samples, t)

        def loss_fn(params):
            # teacher-forced replay (engine/training.py make_scst_step): one
            # parallel fwd reproduces the whole sampling decode's logprobs
            v = {"params": params}
            kd, km, kdec = jax.random.split(rng, 3)
            memory = model.apply(v, att, amask, boxes, train=True,
                                 rngs={"dropout": kd, "mask": km}, method="encode")
            _, dropout_key, _, _ = decode_train_keys(kdec)
            seqs_in = jnp.concatenate(
                [jnp.full((b * n_samples, 1), model.bos_id, jnp.int32), flat], axis=1)
            lp = model.apply(v, memory, seqs_in, True,
                             method="decode_teacher_forced", rngs={"dropout": dropout_key})
            seq_lp = jnp.take_along_axis(lp, flat[..., None], axis=2)[..., 0]
            mask = (flat != model.pad_id).astype(seq_lp.dtype)
            return losses_mod.reward_loss(seq_lp, mask, rewards)

        loss, gw = jax.value_and_grad(loss_fn)(state["params"])
        uw, ow = opt_w.update(gw, state["ow"], state["params"])
        import optax as _o

        return {"params": _o.apply_updates(state["params"], uw), "ow": ow,
                "step": state["step"] + 1}, loss

    def scst_step(state):
        res = jax.device_get(sample_fn(state["params"], state["step"]))
        sample_np = res["sample"]
        sample_dec = [[words(sample_np[i, j][sample_np[i, j] > 3]) for j in range(n_samples)]
                      for i in range(b)]
        # leave-one-out sample-mean baseline (reference SCST_BASELINE="sample")
        sc_s, sc_b = scorer(refs=gts, sample=sample_dec, baseline=None)
        rewards = np.asarray(sc_s - sc_b, np.float32)
        return grad_fn(state, sample_np, rewards)

    t0 = time.perf_counter()
    state, loss = scst_step(state)
    np.asarray(loss)
    _log(f"scst warmup+compile: {time.perf_counter() - t0:.1f}s")
    n = 6
    best = float("inf")
    for _trial in range(2):
        t0 = time.perf_counter()
        for i in range(n):
            state, loss = scst_step(state)
        np.asarray(loss)
        best = min(best, time.perf_counter() - t0)
    return n / best


def main() -> None:
    from sparse_caption_tpu.utils.jax_setup import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from sparse_caption_tpu.models.relation_transformer import RelationTransformer

    model = RelationTransformer(
        vocab_size=VOCAB, d_model=D_MODEL, dim_feedforward=FF, num_layers=LAYERS,
        num_heads=HEADS, att_feat_size=FEAT, max_seq_length=MAX_LEN,
    )
    key = jax.random.PRNGKey(0)
    rng = np.random.default_rng(0)
    att = jnp.asarray(rng.standard_normal((BATCH, REGIONS, FEAT)), jnp.float32)
    amask = jnp.ones((BATCH, REGIONS), jnp.float32)
    boxes = jnp.asarray(rng.uniform(0, 1, (BATCH, REGIONS, 4)), jnp.float32)
    seqs = jnp.asarray(rng.integers(4, VOCAB, (BATCH, MAX_LEN + 1)), jnp.int32)
    variables = model.init({"params": key}, att, amask, seqs, boxes=boxes)
    # bf16 eval precision (supported path: eval_model --cast bf16)
    variables = _bf16_tree(jnp, variables)
    att_b = att.astype(jnp.bfloat16)
    amask_b = amask.astype(jnp.bfloat16)

    captions_per_sec = bench_decode(jax, jnp, model, variables, att_b, amask_b, boxes)
    xe_sps = bench_xe_step(jax, jnp)
    scst_sps = bench_scst_step(jax, jnp)

    value = captions_per_sec / 1  # single-chip benchmark
    print(json.dumps({
        "metric": "captions_per_sec_per_chip_beam5",
        "value": round(value, 2),
        "unit": "captions/sec",
        "vs_baseline": round(value / BASELINE_CAPTIONS_PER_SEC, 3),
        "decode_batch": BATCH,
        "xe_steps_per_sec": round(xe_sps, 3),
        "xe_images_per_sec": round(xe_sps * 15, 1),
        "scst_steps_per_sec": round(scst_sps, 3),
    }))


if __name__ == "__main__":
    main()
