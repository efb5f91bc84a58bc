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

* decode: batch 2048 at beam 5, one jitted graph (encode + cached decode
  scan + ancestry beam reorder); round-3 sweep with the bf16 top-k:
  1024 -> 4631, 2048 -> 4852 (the throughput peak), 4096 -> 4696
  captions/s (eval batching is a free knob, reference default
  batch_size_eval=50; past 2048 the cache reads exceed HBM residency
  sweet spots and throughput regresses). Fusion-level profile
  (resources/profile_decode_r3.json): per-step self/cross cache reads
  within 2x of the HBM roofline, generator matmul at the MXU bound,
  top-k kCustom lowering-bound (not bandwidth-bound) — every remaining
  op is at its structural bound.
* xe_steps_per_sec: supermask-prune XE step (batch 15 images x 5 captions,
  the reference's training batch, utils/training.py:396-415) — jitted
  fwd+bwd+both optimizers, fresh Bernoulli mask draw per forward.
* scst_steps_per_sec: two-phase SCST step at the paper config (batch 5,
  15 random samples, leave-one-out sample-mean baseline — the reference
  recipes' SCST_BASELINE="sample", commands_pruning.sh:47-70): jitted
  sampling decode -> host CIDEr-D reward (native C++ scorer) -> jitted
  REINFORCE update with the teacher-forced-replay gradient pass.
* scst_pipelined_steps_per_sec: same workload under --scst_pipeline (host
  scoring of batch N overlaps the device grad of batch N-1; one-update
  policy lag, documented in engine/training.py make_scst_pipelined_step).
* scst_beam_steps_per_sec: beam-5 SCST (differentiable beam-scan
  recompute gradient pass; reference utils/training.py:225-230).
* scst_device_reward_steps_per_sec (+ sparse variant): --scst_reward
  device — the CIDEr-D reward computed INSIDE the jitted grad step
  (scst/device_reward.py), so the loop has zero device->host syncs and
  runs as pure async dispatch.
* xe_steps_per_sec_batch256 + *_mfu fields: large-batch XE and analytic
  matmul-FLOPs MFU vs the chip's peak bf16 rate (the reference batch-15
  step is latency-bound; MFU quantifies how idle the chip is there).
* updown_* / acort_*: the other two paper model families (Up-Down LSTM
  defaults rnn 1000; ACORT-base radix-768 + kv/layer sharing).
  acort_scst_device_steps_per_sec runs ACORT SCST with the in-jit reward
  (radix digits regrouped to word ids in-jit, round-5) — zero host syncs
  for the radix family too.

``vs_baseline``: the reference repo publishes no throughput numbers
(SURVEY §6); the baseline constant below is the estimated single-A100
throughput of the reference PyTorch implementation at beam 5 (batched
incremental decoding of this architecture), so >1.0 means faster than the
reference on its own class of hardware — the estimate basis is labeled in
the JSON (``vs_baseline_basis``). A MEASURED same-hardware anchor is
reported alongside (``vs_reference_same_cpu_*``): scripts/
bench_cpu_vs_reference.py runs both implementations on the identical CPU
(fresh process per sub-bench) — round-3 quiet-host numbers: decode 2.09x,
XE train step 1.19x, SCST train step 1.94x faster than the live reference
(fp32, paper-scale ORT).

Output protocol (round-4 restructure — the round-3 all-or-nothing single
print at the very end timed out in the driver's capture window, rc=124):
the PRIMARY decode section runs FIRST and a complete JSON line is printed
immediately; after every subsequent section the CUMULATIVE JSON is
re-printed (one line each — the last complete line wins). A global
wall-clock budget (env SPARSE_CAPTION_BENCH_BUDGET_S, default 1200 s)
governs a skip-don't-break scheduler (round-5): each section carries a
nominal cost estimate and is skipped individually when it no longer fits
the remaining budget — cheaper sections behind a stalled one still run —
and best-of-k timing drops to k=1 past 45% budget. A watchdog thread +
SIGTERM/SIGALRM handlers flush the partial JSON with "truncated": true
even if the main thread is blocked inside a relay compile.
"""

from __future__ import annotations

import json
import os
import signal
import sys
import threading
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent))

import numpy as np

BASELINE_CAPTIONS_PER_SEC = 100.0  # est. reference impl. on one A100, beam 5
# Measured same-CPU ratios vs the LIVE reference (scripts/
# bench_cpu_vs_reference.py, round-3 quiet-host run, fp32 paper-scale ORT).
MEASURED_SAME_CPU = {"decode": 1.72, "xe": 1.05, "scst": 1.51}
BUDGET_S = float(os.environ.get("SPARSE_CAPTION_BENCH_BUDGET_S", 1200))

BATCH = int(os.environ.get("BENCH_BATCH", 2048))
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


_T0 = time.perf_counter()  # reset by main(); module import time is close enough


def _trials(k: int) -> int:
    """Best-of-k trial count, dropped to 1 once 45% of the budget is spent —
    a slightly noisier number beats a skipped section (VERDICT r4 item 2)."""
    return 1 if (time.perf_counter() - _T0) > 0.45 * BUDGET_S else k


def _hot_jit(fn):
    """jax.jit with the measured-win TPU compiler options (scoped-VMEM
    48 MiB: +11% on the XE step at batch 256, +3.0% on the beam-5 decode
    at batch 2048 — round-5 on-chip A/Bs, resources/ab_xla_flags_*_r5.json;
    utils/jax_setup.tpu_compiler_options). No-op off TPU."""
    import jax

    from sparse_caption_tpu.utils.jax_setup import tpu_compiler_options

    return jax.jit(fn, compiler_options=tpu_compiler_options())


def _bf16_tree(jnp, tree):
    import jax

    return jax.tree.map(
        lambda x: x.astype(jnp.bfloat16) if jnp.issubdtype(x.dtype, jnp.floating) else x, tree
    )


def bench_decode(jax, jnp, model, variables, att, amask, boxes):
    from sparse_caption_tpu.decoding import generate

    @_hot_jit
    def decode(variables, att, amask, boxes):
        memory = model.apply(variables, att, amask, boxes, method="encode")
        seq, _ = generate(model, variables, memory, {"beam_size": BEAM, "max_seq_length": MAX_LEN})
        return seq

    t0 = time.perf_counter()
    np.asarray(decode(variables, att, amask, boxes))
    _log(f"decode warmup+compile: {time.perf_counter() - t0:.1f}s")

    # best of 3 trials: transient tunnel stalls can poison a single timing
    best_dt = float("inf")
    for _trial in range(_trials(3)):
        t0 = time.perf_counter()
        for _ in range(ITERS):
            out = decode(variables, att, amask, boxes)
            np.asarray(out[:, 0, 0])  # forces device->host sync
        best_dt = min(best_dt, time.perf_counter() - t0)
    return BATCH * ITERS / best_dt


# --------------------------------------------------------------- MFU model
# Peak dense bf16 matmul throughput per chip, by jax device_kind.
PEAK_TFLOPS = {
    "TPU v4": 275.0,
    "TPU v5 lite": 197.0,  # v5e
    "TPU v5": 459.0,       # v5p
    "TPU v6 lite": 918.0,  # v6e (Trillium)
}


def ort_xe_flops(b: int, spi: int = 5, n: int = REGIONS, t: int = MAX_LEN + 1,
                 d: int = D_MODEL, ff: int = FF, L: int = LAYERS, v: int = VOCAB,
                 feat: int = FEAT) -> float:
    """Analytic matmul FLOPs for one ORT XE train step (fwd + bwd = 3x fwd).

    Per-matmul convention 2*m*n*k; causal self-attention counted at half
    density. Elementwise/LayerNorm/softmax FLOPs excluded (<2% at these
    shapes, and they are VPU not MXU work)."""
    enc_attn = L * (4 * 2 * n * d * d + 2 * 2 * n * n * d)
    enc_ffn = L * (2 * 2 * n * d * ff)
    enc = b * (2 * n * feat * d + enc_attn + enc_ffn)
    seqs = b * spi
    dec_self = L * (4 * 2 * t * d * d + 0.5 * 2 * 2 * t * t * d)
    dec_cross = L * (2 * 2 * t * d * d + 2 * 2 * t * n * d)
    dec_ffn = L * (2 * 2 * t * d * ff)
    gen = 2 * t * d * v
    cross_kv = b * L * (2 * 2 * n * d * d)  # per image, reused by its seqs
    dec = seqs * (dec_self + dec_cross + dec_ffn + gen) + cross_kv
    fwd = enc + dec
    return 3.0 * fwd


def _make_train_pieces(jax, jnp, prune: bool):
    """Paper-scale ORT(+supermask) model, optimizers, synthetic batch."""
    import optax

    from sparse_caption_tpu.config import Config
    from sparse_caption_tpu.engine.optim import build_mask_optimizer, build_weight_optimizer, make_schedule
    from sparse_caption_tpu.models.relation_transformer import RelationTransformer
    from sparse_caption_tpu.ops.masked import MaskConfig

    if prune:
        mask_type = prune if isinstance(prune, str) else "supermask"
        mask_cfg = MaskConfig(mask_type=mask_type,
                              mask_init_value=5.0 if mask_type == "supermask" else 1.0)
    else:
        mask_cfg = None
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


def build_xe_step(jax, jnp, b: int = 15, bf16_compute: bool = False):
    """Construct the jitted supermask XE step + initial state.

    Shared by ``bench_xe_step`` and ``scripts/profile_xe.py`` so the
    profile explains the bench's own numbers (one construction, not two
    drifting copies). bf16_compute mirrors --train_precision bf16
    (differentiable cast of params+activations; master params stay f32)."""
    from sparse_caption_tpu.engine import losses as losses_mod

    model, opt_w, opt_m, optax = _make_train_pieces(jax, jnp, prune=True)
    rng = np.random.default_rng(1)
    spi, t = 5, MAX_LEN + 1
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

    @_hot_jit
    def xe_step(state):
        # per-step keys derived in-jit from the carried step counter —
        # eager host fold_in ops are ~3 ms relay dispatches each
        # (engine/training.py make_xe_step does the same from state.step)
        k_drop, k_mask = jax.random.split(jax.random.fold_in(base_rng, state["step"]))

        def loss_fn(params, masks):
            # f32 params default: JAX's TPU matmul precision already runs f32
            # dots on the MXU in bf16, so --train_precision bf16 is neutral on
            # step time at the reference batch (A/B'd: 48.1 f32 vs 47.0 bf16
            # steps/s) — its value is activation/weight HBM headroom, which
            # bf16_compute quantifies at the large-batch point
            a, am = att, amask
            if bf16_compute:
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
        import optax as _o

        return {"params": _o.apply_updates(state["params"], uw), "masks": _o.apply_updates(state["masks"], um),
                "ow": ow, "om": om, "step": state["step"] + 1}, loss

    return xe_step, state


def bench_xe_step(jax, jnp, b: int = 15, bf16_compute: bool = False):
    """Supermask XE train step at b images x 5 captions (reference batch 15,
    utils/training.py:396-415; larger b quantifies the latency-vs-MFU
    tradeoff — the chip is mostly idle at the reference batch; batch
    sweep r3: 256 is the throughput knee, 512 regresses)."""
    xe_step, state = build_xe_step(jax, jnp, b, bf16_compute)
    t0 = time.perf_counter()
    state, loss = xe_step(state)
    np.asarray(loss)
    _log(f"xe warmup+compile: {time.perf_counter() - t0:.1f}s")
    n = 10
    best = float("inf")
    for _trial in range(_trials(2)):
        t0 = time.perf_counter()
        for i in range(n):
            state, loss = xe_step(state)
        np.asarray(loss)
        best = min(best, time.perf_counter() - t0)
    return n / best


def bench_scst_step(jax, jnp, tmp_dir="/tmp/sc_bench", mask_type=None, sparsity=0.95,
                    b=5, n_samples=15, device_only=False):
    """Two-phase SCST step: device sample -> host CIDEr-D -> device update.

    mask_type="mask_freeze" benches the paper's SPARSE fine-tuning stage
    (commands_pruning.sh:175-196): frozen binary masks at `sparsity` (a
    random pattern — dense-math step time is pattern-independent), legal
    for the teacher-forced-replay and pipelined paths because frozen masks
    replay deterministically (engine/training.py use_tf_replay).

    device_only=True benches only the --scst_reward device path (rewards
    computed in-jit, zero host syncs) — used for the SCST scale-headroom
    section at TPU-worthy batches (e.g. b=64 x 15 samples), where the
    reference's host scorer is architecturally the serial bottleneck and
    this design keeps the loop pure async dispatch."""
    from sparse_caption_tpu.decoding import generate
    from sparse_caption_tpu.engine import losses as losses_mod
    from sparse_caption_tpu.metrics.cider import build_df_pickle
    from sparse_caption_tpu.scst import CaptionScorer
    from sparse_caption_tpu.scst import native as native_scst

    model, opt_w, opt_m, optax = _make_train_pieces(jax, jnp, prune=mask_type or False)
    t = MAX_LEN
    rng = np.random.default_rng(2)
    att = jnp.asarray(rng.standard_normal((b, REGIONS, FEAT)), jnp.float32)
    amask = jnp.ones((b, REGIONS), jnp.float32)
    boxes = jnp.asarray(rng.uniform(0, 1, (b, REGIONS, 4)), jnp.float32)
    seqs0 = jnp.asarray(rng.integers(4, VOCAB, (b, t + 1)), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(3), "mask": jax.random.PRNGKey(5)},
                           att, amask, seqs0, boxes=boxes)
    params = variables["params"]
    if mask_type:
        mrng = np.random.default_rng(7)
        masks = jax.tree.map(
            lambda m: jnp.asarray(mrng.random(m.shape) >= sparsity, jnp.float32),
            variables["masks"])

        def mk_v(params):
            return {"params": params, "masks": masks}
    else:
        def mk_v(params):
            return {"params": params}
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
        v = mk_v(params)
        kd, km, kdec = jax.random.split(rng, 3)
        memory = model.apply(v, att, amask, boxes, train=True, rngs={"dropout": kd, "mask": km},
                             method="encode")
        opt_d = dict(sample_opt, differentiable=True) if differentiable else sample_opt
        return generate(model, v, memory, opt_d, rng=kdec)

    @_hot_jit
    def sample_fn(params, step):
        # per-step key derived in-jit (mirrors engine/training.py): eager
        # host rng ops are ~3 ms relay dispatches each
        rng = jax.random.fold_in(base_rng, step)
        return {"sample": train_sample(params, rng, False)[0]}

    def _update_body(state, sample_seq, rewards, step):
        from sparse_caption_tpu.decoding.api import decode_train_keys

        rng = jax.random.fold_in(base_rng, step)  # same key as sample_fn
        flat = sample_seq.reshape(b * n_samples, t)

        def loss_fn(params):
            # teacher-forced replay (engine/training.py make_scst_step): one
            # parallel fwd reproduces the whole sampling decode's logprobs
            v = mk_v(params)
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

    grad_fn = _hot_jit(_update_body)

    # ---- device-reward pieces (--scst_reward device): CIDEr-D in-jit
    from sparse_caption_tpu.metrics.cider import CiderScorer
    from sparse_caption_tpu.scst import device_reward as devr

    tok2id = {"<pad>": 0, "<unk>": 1, "<bos>": 2, "<eos>": 3}
    tok2id.update({f"w{i}": i for i in range(4, VOCAB)})
    _cs = CiderScorer.from_pickle(df_path)
    dev_table = devr.DfTable.build(_cs.df, _cs.ref_len, tok2id)
    dev_fn = devr.make_cider_device_fn(dev_table)
    tbl_dev = dev_table.device_arrays()
    pack_dev = devr.ref_pack_device(
        devr.build_ref_pack(gts, _cs.df, _cs.ref_len, tok2id, vocab_size=VOCAB))
    dev_img_idx = jnp.repeat(jnp.arange(b), n_samples)

    @_hot_jit
    def grad_fn_dev(state, sample_seq, step):
        """REINFORCE grad with the reward computed on-device: the SCST loop
        never touches the host (engine make_scst_step --scst_reward device)."""
        flat = sample_seq.reshape(b * n_samples, t)
        sc = dev_fn(flat, dev_img_idx, tbl_dev, pack_dev)
        rewards = sc - devr.leave_one_out_baseline(sc, n_samples)
        return _update_body(state, sample_seq, rewards, step)

    def score(sample_np):
        sample_dec = [[words(sample_np[i, j][sample_np[i, j] > 3]) for j in range(n_samples)]
                      for i in range(b)]
        # leave-one-out sample-mean baseline (reference SCST_BASELINE="sample")
        sc_s, sc_b = scorer(refs=gts, sample=sample_dec, baseline=None)
        return np.asarray(sc_s - sc_b, np.float32)

    def scst_step(state):
        res = jax.device_get(sample_fn(state["params"], state["step"]))
        rewards = score(res["sample"])
        return grad_fn(state, res["sample"], rewards, state["step"])

    n = 6

    # ---- device-reward variant (--scst_reward device): rewards in-jit, the
    # loop is pure async dispatch — zero host syncs until the final block
    def run_device(state, n_steps):
        loss = None
        for _ in range(n_steps):
            res = sample_fn(state["params"], state["step"])
            state, loss = grad_fn_dev(state, res["sample"], state["step"])
        np.asarray(loss)  # single sync at the end
        return state

    if device_only:
        t0 = time.perf_counter()
        state = run_device(state, 1)  # compile sample_fn + grad_fn_dev
        _log(f"scst device-only warmup+compile: {time.perf_counter() - t0:.1f}s")
        best = float("inf")
        for _trial in range(_trials(2)):
            t0 = time.perf_counter()
            state = run_device(state, n)
            best = min(best, time.perf_counter() - t0)
        return n / best

    t0 = time.perf_counter()
    state, loss = scst_step(state)
    np.asarray(loss)
    _log(f"scst warmup+compile: {time.perf_counter() - t0:.1f}s")
    best = float("inf")
    for _trial in range(_trials(2)):
        t0 = time.perf_counter()
        for i in range(n):
            state, loss = scst_step(state)
        np.asarray(loss)
        best = min(best, time.perf_counter() - t0)
    serial_sps = n / best

    # ---- pipelined variant (engine make_scst_pipelined_step semantics):
    # dispatch batch N's sampling async, hand its token fetch to a
    # background thread (the ~33 ms relay RTT is GIL-released network
    # wait), then score batch N-1's joined fetch and queue its grad.
    from concurrent.futures import ThreadPoolExecutor

    fetch_pool = ThreadPoolExecutor(max_workers=2, thread_name_prefix="scst_fetch")

    def run_pipelined(state, n_steps, counter0):
        pending = None
        ctr = counter0
        for _ in range(n_steps):
            step_arr = np.asarray(ctr, np.int32)
            ctr += 1
            res = sample_fn(state["params"], step_arr)  # async dispatch
            future = fetch_pool.submit(jax.device_get, res)  # background fetch
            if pending is not None:
                rewards = score(pending[3].result()["sample"])  # joins batch N-1
                state, _ = grad_fn(state, pending[0], rewards, pending[2])  # queued
            pending = (res["sample"], None, step_arr, future)
        if pending is not None:
            rewards = score(pending[3].result()["sample"])
            state, loss = grad_fn(state, pending[0], rewards, pending[2])
            np.asarray(loss)
        return state, ctr

    t0 = time.perf_counter()
    state, ctr = run_pipelined(state, 2, 100)  # warmup (compiles nothing new)
    _log(f"scst pipelined warmup: {time.perf_counter() - t0:.1f}s")
    best = float("inf")
    for _trial in range(_trials(2)):
        t0 = time.perf_counter()
        state, ctr = run_pipelined(state, n, ctr)
        best = min(best, time.perf_counter() - t0)
    pipe_sps = n / best

    t0 = time.perf_counter()
    state = run_device(state, 1)  # compile grad_fn_dev
    _log(f"scst device-reward warmup+compile: {time.perf_counter() - t0:.1f}s")
    best = float("inf")
    for _trial in range(_trials(2)):
        t0 = time.perf_counter()
        state = run_device(state, n)
        best = min(best, time.perf_counter() - t0)
    return serial_sps, pipe_sps, n / best


def bench_scst_beam_step(jax, jnp, tmp_dir="/tmp/sc_bench"):
    """Beam-mode SCST (reference utils/training.py:225-230): beam-5 sampling
    under the train policy -> host CIDEr-D -> grad via the differentiable
    beam-scan recompute (tokens/logprobs proven identical to the sampling
    pass in tests/test_scst_semantics.py)."""
    from sparse_caption_tpu.decoding import generate
    from sparse_caption_tpu.engine import losses as losses_mod
    from sparse_caption_tpu.metrics.cider import build_df_pickle
    from sparse_caption_tpu.scst import CaptionScorer
    from sparse_caption_tpu.scst import native as native_scst

    model, opt_w, opt_m, optax = _make_train_pieces(jax, jnp, prune=False)
    b, n_beams, t = 5, 5, MAX_LEN
    rng = np.random.default_rng(5)
    att = jnp.asarray(rng.standard_normal((b, REGIONS, FEAT)), jnp.float32)
    amask = jnp.ones((b, REGIONS), jnp.float32)
    boxes = jnp.asarray(rng.uniform(0, 1, (b, REGIONS, 4)), jnp.float32)
    seqs0 = jnp.asarray(rng.integers(4, VOCAB, (b, t + 1)), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(6)}, att, amask, seqs0, boxes=boxes)
    params = variables["params"]
    state = {"params": params, "ow": opt_w.init(params), "step": jnp.zeros((), jnp.int32)}
    base_rng = jax.random.PRNGKey(7)
    words = lambda ids: " ".join(f"w{i}" for i in ids)  # noqa: E731
    gts = [[words(rng.integers(4, 200, rng.integers(8, 15))) for _ in range(5)] for _ in range(b)]
    os.makedirs(tmp_dir, exist_ok=True)
    df_path = os.path.join(tmp_dir, "df.p")
    if not os.path.isfile(df_path):
        build_df_pickle(gts, df_path)
    scorer_cls = native_scst.NativeCaptionScorer if native_scst.is_available() else CaptionScorer
    scorer = scorer_cls(df_path[:-2], cider_weight=1.0, bleu_weight=[0, 0, 0, 0])
    beam_opt = {"beam_size": n_beams, "max_seq_length": t, "decode_train": True}

    def train_sample(params, rng):
        v = {"params": params}
        kd, km, kdec = jax.random.split(rng, 3)
        memory = model.apply(v, att, amask, boxes, train=True,
                             rngs={"dropout": kd, "mask": km}, method="encode")
        return generate(model, v, memory, beam_opt, rng=kdec)

    @_hot_jit
    def sample_fn(params, step):
        rng = jax.random.fold_in(base_rng, step)
        return train_sample(params, rng)[0]

    @_hot_jit
    def grad_fn(state, sample_seq, rewards):
        rng = jax.random.fold_in(base_rng, state["step"])
        flat = jax.lax.stop_gradient(sample_seq).reshape(b * n_beams, t)

        def loss_fn(params):
            _, lp = train_sample(params, rng)  # identical beam realization
            seq_lp = lp.reshape(b * n_beams, t)
            mask = (flat != model.pad_id).astype(seq_lp.dtype)
            return losses_mod.reward_loss(seq_lp, mask, rewards)

        loss, gw = jax.value_and_grad(loss_fn)(state["params"])
        uw, ow = opt_w.update(gw, state["ow"], state["params"])
        import optax as _o

        return {"params": _o.apply_updates(state["params"], uw), "ow": ow,
                "step": state["step"] + 1}, loss

    def step(state):
        sample_np = np.asarray(sample_fn(state["params"], state["step"]))
        sample_dec = [[words(sample_np[i, j][sample_np[i, j] > 3]) for j in range(n_beams)]
                      for i in range(b)]
        sc_s, sc_b = scorer(refs=gts, sample=sample_dec, baseline=None)
        rewards = np.asarray(sc_s - sc_b, np.float32)
        return grad_fn(state, sample_np, rewards)

    t0 = time.perf_counter()
    state, loss = step(state)
    np.asarray(loss)
    _log(f"beam-scst warmup+compile: {time.perf_counter() - t0:.1f}s")
    n = 4
    best = float("inf")
    for _trial in range(_trials(2)):
        t0 = time.perf_counter()
        for _ in range(n):
            state, loss = step(state)
        np.asarray(loss)
        best = min(best, time.perf_counter() - t0)
    return n / best


def bench_updown(jax, jnp):
    """Up-Down LSTM at paper scale (reference att_model.py:317-345 defaults:
    rnn 1000, input encoding 1000, att_hid 512): beam-5 decode captions/s +
    XE steps/s. The decode scan is latency-sensitive small-matmul work
    (1000-wide LSTM cells) — MXU utilization is inherently low; batch is
    the only lever."""
    from sparse_caption_tpu.decoding import generate
    from sparse_caption_tpu.engine import losses as losses_mod
    from sparse_caption_tpu.engine.optim import build_weight_optimizer, make_schedule
    from sparse_caption_tpu.models.up_down import UpDownModel

    from sparse_caption_tpu.config import Config

    model = UpDownModel(vocab_size=VOCAB, rnn_size=1000, input_encoding_size=1000,
                        att_hid_size=512, fc_feat_size=FEAT, att_feat_size=FEAT,
                        max_seq_length=MAX_LEN, drop_prob_lm=0.5)
    rng = np.random.default_rng(8)
    dec_batch = int(os.environ.get("BENCH_UPDOWN_BATCH", 1024))
    att = jnp.asarray(rng.standard_normal((dec_batch, REGIONS, FEAT)), jnp.bfloat16)
    amask = jnp.ones((dec_batch, REGIONS), jnp.bfloat16)
    fc = jnp.asarray(rng.standard_normal((dec_batch, FEAT)), jnp.bfloat16)
    seqs0 = jnp.asarray(rng.integers(4, VOCAB, (2, MAX_LEN + 1)), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(9), "dropout": jax.random.PRNGKey(10),
                            "ss": jax.random.PRNGKey(11)},
                           att[:2].astype(jnp.float32), amask[:2].astype(jnp.float32),
                           seqs0, fc_feats=fc[:2].astype(jnp.float32), train=True)
    variables = _bf16_tree(jnp, variables)

    @_hot_jit
    def decode(variables, att, amask, fc):
        memory = model.apply(variables, att, amask, fc, method="encode")
        seq, _ = generate(model, variables, memory, {"beam_size": BEAM, "max_seq_length": MAX_LEN})
        return seq

    t0 = time.perf_counter()
    np.asarray(decode(variables, att, amask, fc)[:, 0, 0])
    _log(f"updown decode warmup+compile: {time.perf_counter() - t0:.1f}s")
    best = float("inf")
    for _trial in range(_trials(2)):
        t0 = time.perf_counter()
        for _ in range(3):
            np.asarray(decode(variables, att, amask, fc)[:, 0, 0])
        best = min(best, time.perf_counter() - t0)
    decode_cps = dec_batch * 3 / best

    # XE step at the reference batch (15 x 5)
    b, spi, t = 15, 5, MAX_LEN + 1
    att_t = jnp.asarray(rng.standard_normal((b, REGIONS, FEAT)), jnp.float32)
    amask_t = jnp.ones((b, REGIONS), jnp.float32)
    fc_t = jnp.asarray(rng.standard_normal((b, FEAT)), jnp.float32)
    seqs = jnp.asarray(rng.integers(4, VOCAB, (b * spi, t)), jnp.int32)
    seq_masks = jnp.ones((b * spi, t), jnp.float32)
    vs = model.init({"params": jax.random.PRNGKey(12), "dropout": jax.random.PRNGKey(13),
                     "ss": jax.random.PRNGKey(14)},
                    att_t, amask_t, seqs[:b], fc_feats=fc_t, train=True)
    params = vs["params"]
    cfg = Config(lr_scheduler="noam", optim="adam", d_model=1000, noamopt_warmup=10000,
                 grad_clip=0.1, learning_rate=5e-4, max_train_step=100000)
    opt_w = build_weight_optimizer(cfg, make_schedule(cfg, steps_per_epoch=1000))
    state = {"params": params, "ow": opt_w.init(params), "step": jnp.zeros((), jnp.int32)}
    base_rng = jax.random.PRNGKey(15)

    @_hot_jit
    def xe_step(state):
        k_drop, k_ss = jax.random.split(jax.random.fold_in(base_rng, state["step"]))

        def loss_fn(params):
            lp = model.apply({"params": params}, att_t, amask_t, seqs, fc_feats=fc_t,
                             train=True, rngs={"dropout": k_drop, "ss": k_ss})
            return losses_mod.language_model_loss(lp, seqs[:, 1:], seq_masks[:, 1:])

        loss, gw = jax.value_and_grad(loss_fn)(state["params"])
        uw, ow = opt_w.update(gw, state["ow"], state["params"])
        import optax as _o

        return {"params": _o.apply_updates(state["params"], uw), "ow": ow,
                "step": state["step"] + 1}, loss

    t0 = time.perf_counter()
    state, loss = xe_step(state)
    np.asarray(loss)
    _log(f"updown xe warmup+compile: {time.perf_counter() - t0:.1f}s")
    n = 10
    best = float("inf")
    for _trial in range(_trials(2)):
        t0 = time.perf_counter()
        for _ in range(n):
            state, loss = xe_step(state)
        np.asarray(loss)
        best = min(best, time.perf_counter() - t0)
    return decode_cps, n / best


def bench_acort(jax, jnp):
    """ACORT-base (reference commands_acort.sh:37-53: ORT + radix-768
    tokenizer + share_att kv + share_layer (0,0,0,1,1,1), d512/ff2048,
    max_seq 26): beam-5 decode captions/s + XE steps/s."""
    from sparse_caption_tpu.decoding import generate
    from sparse_caption_tpu.engine import losses as losses_mod
    from sparse_caption_tpu.engine.optim import build_weight_optimizer, make_schedule
    from sparse_caption_tpu.models.relation_transformer import RelationTransformer

    from sparse_caption_tpu.config import Config

    vocab = 768 + 4  # radix base + specials
    t_max = 25  # radix tokens per caption (max_seq_length 26 incl. BOS)
    model = RelationTransformer(
        vocab_size=vocab, d_model=D_MODEL, dim_feedforward=FF, num_layers=LAYERS,
        num_heads=HEADS, att_feat_size=FEAT, max_seq_length=t_max,
        share_att_encoder="kv", share_att_decoder="kv",
        share_layer_encoder=(0, 0, 0, 1, 1, 1), share_layer_decoder=(0, 0, 0, 1, 1, 1),
    )
    rng = np.random.default_rng(16)
    att = jnp.asarray(rng.standard_normal((BATCH, REGIONS, FEAT)), jnp.float32)
    amask = jnp.ones((BATCH, REGIONS), jnp.float32)
    boxes = jnp.asarray(rng.uniform(0, 1, (BATCH, REGIONS, 4)), jnp.float32)
    seqs0 = jnp.asarray(rng.integers(4, vocab, (2, t_max + 1)), jnp.int32)
    variables = model.init({"params": jax.random.PRNGKey(17)},
                           att[:2], amask[:2], seqs0, boxes=boxes[:2])
    variables = _bf16_tree(jnp, variables)
    att_b, amask_b = att.astype(jnp.bfloat16), amask.astype(jnp.bfloat16)

    @_hot_jit
    def decode(variables, att, amask, boxes):
        memory = model.apply(variables, att, amask, boxes, method="encode")
        seq, _ = generate(model, variables, memory, {"beam_size": BEAM, "max_seq_length": t_max})
        return seq

    t0 = time.perf_counter()
    np.asarray(decode(variables, att_b, amask_b, boxes)[:, 0, 0])
    _log(f"acort decode warmup+compile: {time.perf_counter() - t0:.1f}s")
    best = float("inf")
    for _trial in range(_trials(2)):
        t0 = time.perf_counter()
        for _ in range(3):
            np.asarray(decode(variables, att_b, amask_b, boxes)[:, 0, 0])
        best = min(best, time.perf_counter() - t0)
    decode_cps = BATCH * 3 / best

    # XE at the reference batch
    b, spi, t = 15, 5, t_max + 1
    att_t, amask_t, boxes_t = att[:b], amask[:b], boxes[:b]
    seqs = jnp.asarray(rng.integers(4, vocab, (b * spi, t)), jnp.int32)
    seq_masks = jnp.ones((b * spi, t), jnp.float32)
    vs = model.init({"params": jax.random.PRNGKey(18)}, att_t, amask_t, seqs[:b], boxes=boxes_t)
    params = vs["params"]
    cfg = Config(lr_scheduler="noam", optim="adam", d_model=D_MODEL, noamopt_warmup=10000,
                 grad_clip=0.1, learning_rate=5e-4, max_train_step=100000)
    opt_w = build_weight_optimizer(cfg, make_schedule(cfg, steps_per_epoch=1000))
    state = {"params": params, "ow": opt_w.init(params), "step": jnp.zeros((), jnp.int32)}
    base_rng = jax.random.PRNGKey(19)

    @_hot_jit
    def xe_step(state):
        k_drop = jax.random.fold_in(base_rng, state["step"])

        def loss_fn(params):
            lp = model.apply({"params": params}, att_t, amask_t, seqs, boxes=boxes_t,
                             train=True, rngs={"dropout": k_drop})
            return losses_mod.language_model_loss(lp, seqs[:, 1:], seq_masks[:, 1:])

        loss, gw = jax.value_and_grad(loss_fn)(state["params"])
        uw, ow = opt_w.update(gw, state["ow"], state["params"])
        import optax as _o

        return {"params": _o.apply_updates(state["params"], uw), "ow": ow,
                "step": state["step"] + 1}, loss

    t0 = time.perf_counter()
    state, loss = xe_step(state)
    np.asarray(loss)
    _log(f"acort xe warmup+compile: {time.perf_counter() - t0:.1f}s")
    n = 10
    best = float("inf")
    for _trial in range(_trials(2)):
        t0 = time.perf_counter()
        for _ in range(n):
            state, loss = xe_step(state)
        np.asarray(loss)
        best = min(best, time.perf_counter() - t0)
    xe_sps = n / best

    # ---- ACORT SCST with --scst_reward device (round-5 capability): the
    # sampled RADIX digit ids are regrouped into word ids IN-JIT
    # (scst/device_reward.py make_radix_to_word_fn) ahead of the word-level
    # CIDEr-D scorer, so even ACORT's SCST loop runs with zero host syncs
    # (previously host-reward-bound: the digits needed a host decode) ----
    import os as _os
    import tempfile as _tf

    from sparse_caption_tpu.decoding.api import decode_train_keys
    from sparse_caption_tpu.metrics.cider import CiderScorer, build_df_pickle
    from sparse_caption_tpu.scst import device_reward as devr
    from sparse_caption_tpu.tokenizers.radix import decimal_to_base

    sb, n_samples = 5, 15  # the paper SCST config (batch 5 x 15 samples)
    word_vocab = 10000
    tpw = len(decimal_to_base(word_vocab - 4, 768))
    grng = np.random.default_rng(21)
    words = lambda ids: " ".join(f"w{i}" for i in ids)  # noqa: E731
    gts = [[words(grng.integers(4, 200, grng.integers(8, 15))) for _ in range(5)]
           for _ in range(sb)]
    with _tf.TemporaryDirectory() as td:
        dfp = _os.path.join(td, "df.p")
        build_df_pickle(gts, dfp)
        cs = CiderScorer.from_pickle(dfp)
    tok2id = {"<pad>": 0, "<unk>": 1, "<bos>": 2, "<eos>": 3}
    tok2id.update({f"w{i}": i for i in range(4, word_vocab)})
    table = devr.DfTable.build(cs.df, cs.ref_len, tok2id)
    regroup = devr.make_radix_to_word_fn(768, tpw, word_vocab)
    score_dev = devr.make_reward_device_fn(table, eos_id=3, pad_id=0, bos_id=2,
                                           regroup=regroup)
    tbl_dev = table.device_arrays()
    pack_dev = devr.ref_pack_device(
        devr.build_ref_pack(gts, cs.df, cs.ref_len, tok2id, vocab_size=word_vocab))
    img_idx = jnp.repeat(jnp.arange(sb), n_samples)
    s_att, s_amask, s_boxes = att[:sb], amask[:sb], boxes[:sb]
    sample_opt = {"num_random_sample": n_samples, "beam_size": 0,
                  "max_seq_length": t_max, "temperature": 1.0, "decode_train": True}

    @_hot_jit
    def scst_sample(params, step):
        srng = jax.random.fold_in(base_rng, step + 7)
        kd, kdec = jax.random.split(srng)
        memory = model.apply({"params": params}, s_att, s_amask, s_boxes, train=True,
                             rngs={"dropout": kd}, method="encode")
        return generate(model, {"params": params}, memory, sample_opt, rng=kdec)[0]

    @_hot_jit
    def scst_grad_dev(state, sample_seq):
        srng = jax.random.fold_in(base_rng, state["step"] + 7)
        flat = sample_seq.reshape(sb * n_samples, t_max)
        sc = score_dev(flat, img_idx, tbl_dev, pack_dev)
        rewards = sc - devr.leave_one_out_baseline(sc, n_samples)

        def loss_fn(params):
            kd, kdec = jax.random.split(srng)
            memory = model.apply({"params": params}, s_att, s_amask, s_boxes, train=True,
                                 rngs={"dropout": kd}, method="encode")
            _, dropout_key, _, _ = decode_train_keys(kdec)
            seqs_in = jnp.concatenate(
                [jnp.full((sb * n_samples, 1), model.bos_id, jnp.int32), flat], axis=1)
            lp = model.apply({"params": params}, memory, seqs_in, True,
                             method="decode_teacher_forced", rngs={"dropout": dropout_key})
            seq_lp = jnp.take_along_axis(lp, flat[..., None], axis=2)[..., 0]
            mask = (flat != model.pad_id).astype(seq_lp.dtype)
            return losses_mod.reward_loss(seq_lp, mask, rewards)

        loss, gw = jax.value_and_grad(loss_fn)(state["params"])
        uw, ow = opt_w.update(gw, state["ow"], state["params"])
        import optax as _o

        return {"params": _o.apply_updates(state["params"], uw), "ow": ow,
                "step": state["step"] + 1}, loss

    def run_scst(state, n_steps):
        loss = None
        for _ in range(n_steps):
            seq = scst_sample(state["params"], state["step"])
            state, loss = scst_grad_dev(state, seq)
        np.asarray(loss)  # single sync (pure async dispatch otherwise)
        return state

    t0 = time.perf_counter()
    state = run_scst(state, 1)
    _log(f"acort scst-device warmup+compile: {time.perf_counter() - t0:.1f}s")
    ns = 6
    best = float("inf")
    for _trial in range(_trials(2)):
        t0 = time.perf_counter()
        state = run_scst(state, ns)
        best = min(best, time.perf_counter() - t0)
    return decode_cps, xe_sps, ns / best


class _Emitter:
    """Cumulative-JSON emitter: one complete line per section, last line
    wins. Thread-safe because the watchdog thread and signal handlers may
    flush while the main thread is blocked inside a relay call."""

    def __init__(self):
        self.out = {}
        # RLock: a SIGTERM/SIGALRM handler runs on the MAIN thread and calls
        # flush_truncated — if the signal lands while update() holds the
        # lock, a plain Lock would self-deadlock and the flush guarantee
        # (and the os._exit behind it) would never run
        self.lock = threading.RLock()
        self.t0 = time.monotonic()

    def elapsed(self):
        return time.monotonic() - self.t0

    def update(self, **fields):
        with self.lock:
            # a completed section supersedes an earlier watchdog flush: the
            # line now reflects newer state (the budget check re-adds
            # truncation flags if sections are actually skipped)
            if self.out.get("truncated_reason") == "watchdog":
                self.out.pop("truncated", None)
                self.out.pop("truncated_reason", None)
            self.out.update(fields)
            self._print()

    def _print(self):
        self.out["bench_wall_s"] = round(self.elapsed(), 1)
        print(json.dumps(self.out), flush=True)

    def flush_truncated(self, why):
        with self.lock:
            self.out["truncated"] = True
            self.out["truncated_reason"] = why
            if self.out.get("value") is None:
                # killed before the primary decode completed: still emit an
                # explicit truncation record (a silent rc-0 exit would read
                # as a clean run with no JSON)
                self.out.setdefault("metric", "captions_per_sec_per_chip_beam5")
                self.out.setdefault("value", None)
                self.out.setdefault("unit", "captions/sec")
            self._print()


def main() -> None:
    global _T0

    _T0 = time.perf_counter()
    from sparse_caption_tpu.utils.jax_setup import enable_persistent_cache

    enable_persistent_cache()
    import jax
    import jax.numpy as jnp

    from sparse_caption_tpu.models.relation_transformer import RelationTransformer

    em = _Emitter()

    # Flush guarantees: a daemon watchdog fires even when the main thread is
    # blocked in a C relay call (signal handlers can't run there); SIGTERM/
    # SIGALRM handlers cover cooperative kills between Python bytecodes.
    def _on_signal(signum, frame):  # noqa: ARG001
        em.flush_truncated(f"signal {signum}")
        os._exit(0)

    for sig in (signal.SIGTERM, signal.SIGALRM):
        try:
            signal.signal(sig, _on_signal)
        except (ValueError, OSError):
            pass
    watchdog = threading.Timer(BUDGET_S * 1.5, em.flush_truncated, args=("watchdog",))
    watchdog.daemon = True
    watchdog.start()

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

    kind = jax.devices()[0].device_kind
    peak = PEAK_TFLOPS.get(kind)
    f15 = ort_xe_flops(15)
    f256 = ort_xe_flops(256)

    def mfu(flops, sps):
        # None-checks, not falsy: a measured 0.0 must emit as 0.0, not read
        # as "section skipped"
        return round(flops * sps / (peak * 1e12), 4) if (peak is not None and sps is not None) else None

    def rnd(x, nd=3):
        return round(x, nd) if x is not None else None

    # ---- primary section FIRST: a complete JSON line exists the moment the
    # headline decode number is measured
    captions_per_sec = bench_decode(jax, jnp, model, variables, att_b, amask_b, boxes)
    em.update(
        metric="captions_per_sec_per_chip_beam5",
        value=round(captions_per_sec, 2),
        unit="captions/sec",
        vs_baseline=round(captions_per_sec / BASELINE_CAPTIONS_PER_SEC, 3),
        vs_baseline_basis=(
            "estimated reference PyTorch on one A100 at beam 5 = "
            f"{BASELINE_CAPTIONS_PER_SEC:.0f} captions/s (no published numbers, SURVEY §6)"),
        vs_reference_same_cpu_decode=MEASURED_SAME_CPU["decode"],
        vs_reference_same_cpu_xe=MEASURED_SAME_CPU["xe"],
        vs_reference_same_cpu_scst=MEASURED_SAME_CPU["scst"],
        vs_reference_same_cpu_basis=(
            "measured: scripts/bench_cpu_vs_reference.py, both frameworks on the identical "
            "CPU, fp32 paper-scale ORT (round-5 quiet-host run, "
            "resources/cpu_vs_reference_r5.json; the XE ratio is floored by the "
            "XLA:CPU-vs-oneDNN GEMM gap — see the gemm_* probe keys — and does "
            "not transfer to TPU)"),
        decode_batch=BATCH,
        device_kind=kind,
        peak_tflops_bf16=peak,
        budget_s=BUDGET_S,
    )

    # ---- remaining sections, importance-ordered; each failure or budget
    # exhaustion leaves every already-emitted line intact
    def sec_xe():
        xe_sps = bench_xe_step(jax, jnp)
        em.update(xe_steps_per_sec=rnd(xe_sps), xe_images_per_sec=rnd(xe_sps * 15, 1),
                  xe_model_tflops_per_step=round(f15 / 1e12, 4), xe_mfu=mfu(f15, xe_sps))

    def sec_scst():
        s, p, d = bench_scst_step(jax, jnp)
        em.update(scst_steps_per_sec=rnd(s), scst_pipelined_steps_per_sec=rnd(p),
                  scst_device_reward_steps_per_sec=rnd(d))

    def sec_scst_scale():
        # SCST scale headroom (VERDICT r3 #6): device-reward step at a
        # TPU-worthy batch — the reference's host scorer cannot scale here
        b, ns = 64, 15
        d = bench_scst_step(jax, jnp, b=b, n_samples=ns, device_only=True)
        em.update(scst_device_b64_steps_per_sec=rnd(d),
                  scst_device_b64_images_per_sec=rnd(d * b, 1),
                  scst_device_b64_samples_per_sec=rnd(d * b * ns, 1))

    def sec_xe_b256():
        xe_b256 = bench_xe_step(jax, jnp, 256)
        em.update(xe_steps_per_sec_batch256=rnd(xe_b256),
                  xe_b256_model_tflops_per_step=round(f256 / 1e12, 4),
                  xe_b256_mfu=mfu(f256, xe_b256))

    def sec_xe_b256_bf16():
        # --train_precision bf16 is neutral at the reference batch (latency
        # bound) but +13% at batch 256 (HBM-bound regime): A/B'd r3
        xe_b = bench_xe_step(jax, jnp, 256, True)
        em.update(xe_steps_per_sec_batch256_bf16=rnd(xe_b), xe_b256_bf16_mfu=mfu(f256, xe_b))

    def sec_scst_sparse():
        # the paper's sparse fine-tuning stage: frozen 95%-sparse masks
        s, p, d = bench_scst_step(jax, jnp, "/tmp/sc_bench", "mask_freeze")
        em.update(scst_sparse_steps_per_sec=rnd(s), scst_sparse_pipelined_steps_per_sec=rnd(p),
                  scst_sparse_device_reward_steps_per_sec=rnd(d))

    def sec_scst_beam():
        em.update(scst_beam_steps_per_sec=rnd(bench_scst_beam_step(jax, jnp)))

    def sec_updown():
        cps, sps = bench_updown(jax, jnp)
        em.update(updown_captions_per_sec=rnd(cps, 1), updown_xe_steps_per_sec=rnd(sps))

    def sec_acort():
        cps, sps, scst_sps = bench_acort(jax, jnp)
        em.update(acort_captions_per_sec=rnd(cps, 1), acort_xe_steps_per_sec=rnd(sps),
                  acort_scst_device_steps_per_sec=rnd(scst_sps))

    # (name, fn, estimated nominal cost in s — warm-cache relay, r3/r4 runs).
    # The scheduler SKIPS a section whose estimate does not fit the
    # remaining budget and still tries the cheaper ones behind it — the r4
    # failure mode (one adverse 20-min compile starving every later
    # section) now costs exactly the sections that genuinely don't fit,
    # not everything behind the stall (VERDICT r4 item 2).
    sections = [
        ("xe", sec_xe, 60),
        ("scst", sec_scst, 170),
        ("scst_scale_b64", sec_scst_scale, 70),
        ("xe_b256", sec_xe_b256, 80),
        ("xe_b256_bf16", sec_xe_b256_bf16, 80),
        ("scst_sparse", sec_scst_sparse, 170),
        ("scst_beam", sec_scst_beam, 110),
        ("updown", sec_updown, 110),
        ("acort", sec_acort, 150),
    ]
    skipped = []
    for name, fn, est in sections:
        if em.elapsed() + est > BUDGET_S:
            skipped.append(name)
            print(f"bench {name} skipped: est {est}s > {BUDGET_S - em.elapsed():.0f}s left",
                  file=sys.stderr)
            continue
        try:
            fn()
        except Exception as e:  # noqa: BLE001 — one failing sub-bench must not kill the line
            print(f"bench {name} failed: {type(e).__name__}: {e}", file=sys.stderr)
    if skipped:
        em.update(truncated=True,
                  truncated_reason=f"wall-clock budget {BUDGET_S:.0f}s exceeded",
                  skipped_sections=skipped)
    watchdog.cancel()


if __name__ == "__main__":
    main()
