#!/usr/bin/env python
"""End-to-end sparse-quality probe: the paper's full pipeline on the
evaluated metric.

The reference's north-star claim (README.md:89-92) is that its pruning
pipeline — dense XE pre-train -> supermask prune to 95% sparsity ->
mask-freeze SCST fine-tune — preserves CIDEr (113.0 at 0.95 vs 111.3
dense XE, i.e. the sparse+SCST model BEATS the dense XE baseline). COCO
features are unavailable in this environment, so the absolute 113 cannot
be reproduced; what IS testable is the same pipeline's effect on the
same metric over a memorizable synthetic task:

1. dense XE warmup (``--xe_steps``) -> fork into two arms trained the
   SAME further horizon (``--prune_steps``), so the comparison is not
   confounded by training time:
   - **control**: plain dense XE -> greedy CIDEr-D ``cider_dense_control``
   - **prune**: supermask joint train (reference recipe: mask Adam lr
     100 / eps 1e-2, sparsity weight, reversed-cosine anneal —
     ``train_n_prune_transformer.py:69-82,306-312``, ``prune.py:228-269``)
     -> binarize -> greedy CIDEr-D ``cider_sparse`` at 95% sparsity
2. mask-freeze SCST fine-tune of the sparse model (``--scst_reward
   device``, 60 samples — the reference's published SPARSE SCST config,
   ``commands_pruning.sh:175-196``) -> greedy CIDEr-D ``cider_sparse_scst``

Verdict booleans mirror the paper's table shape: sparsity lands on
target, pruning preserves the dense-control CIDEr, and SCST does not
degrade the sparse model (on a memorizable task both arms end near the
task ceiling, so there is no headroom for a LIFT — the SCST-raises-CIDEr
claim itself is pinned from an under-trained start by
``check_scst_improves.py`` / ``tests/test_learning.py``).

Defaults are paper scale (ORT-512, vocab 10k) for the real-TPU run;
tests/test_learning.py shrinks dims via flags and pins the pipeline on
CPU. Prints ONE JSON line; optionally dumps to --out.
"""

from __future__ import annotations

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", type=str, default=None,
                    help="pin jax platform (e.g. cpu); default auto (TPU when present)")
    ap.add_argument("--d_model", type=int, default=512)
    ap.add_argument("--dim_feedforward", type=int, default=2048)
    ap.add_argument("--num_layers", type=int, default=6)
    ap.add_argument("--num_heads", type=int, default=8)
    ap.add_argument("--vocab_size", type=int, default=10000)
    ap.add_argument("--att_feat_size", type=int, default=2048)
    ap.add_argument("--regions", type=int, default=36)
    ap.add_argument("--max_len", type=int, default=17)
    ap.add_argument("--images", type=int, default=20)
    ap.add_argument("--batch_images", type=int, default=15)
    ap.add_argument("--xe_steps", type=int, default=1500,
                    help="dense phase: short of the ceiling, leaving SCST headroom")
    ap.add_argument("--prune_steps", type=int, default=60000,
                    help="supermask anneal horizon (the avalanche at paper scale "
                         "needs tens of thousands of steps — the horizon law, "
                         "CLAUDE.md; shrink together with dims for CPU tests)")
    ap.add_argument("--chunk", type=int, default=25, help="steps per jitted scan chunk")
    ap.add_argument("--sparsity_target", type=float, default=0.95)
    ap.add_argument("--sparsity_weight", type=float, default=120.0,
                    help="reference's swept ORT value (commands_pruning.sh:259-268); "
                         "the formula default 30 needs ~4x the horizon")
    ap.add_argument("--scst_steps", type=int, default=600)
    ap.add_argument("--scst_batch_images", type=int, default=5)
    ap.add_argument("--scst_num_samples", type=int, default=60,
                    help="the reference's sparse-SCST sample count "
                         "(commands_pruning.sh:175-196; dense runs use 15)")
    ap.add_argument("--xe_lr", type=float, default=3e-4)
    ap.add_argument("--scst_lr", type=float, default=5e-5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    if args.prune_steps % args.chunk or args.xe_steps % args.chunk:
        ap.error("--xe_steps/--prune_steps must be multiples of --chunk "
                 "(truncating would cut the anneal short of its horizon)")

    from sparse_caption_tpu.utils.jax_setup import enable_persistent_cache, select_platform

    select_platform(args.platform)
    import jax

    enable_persistent_cache()
    import jax.numpy as jnp
    import optax

    from sparse_caption_tpu.decoding import generate
    from sparse_caption_tpu.decoding.api import decode_train_keys
    from sparse_caption_tpu.engine import losses as losses_mod
    from sparse_caption_tpu.engine.optim import build_mask_optimizer
    from sparse_caption_tpu.config import Config
    from sparse_caption_tpu.metrics.cider import CiderScorer, build_df_pickle
    from sparse_caption_tpu.models.relation_transformer import RelationTransformer
    from sparse_caption_tpu.ops.masked import MaskConfig
    from sparse_caption_tpu.pruning.engine import binarize_masks, compute_sparsity_loss, mask_sparsity
    from sparse_caption_tpu.scst import device_reward as devr

    vocab, t = args.vocab_size, args.max_len
    n_img, spi = args.images, 5
    rng_np = np.random.default_rng(args.seed)

    # memorizable synthetic task (same scheme as check_supermask_dynamics /
    # check_scst_improves): image i's five references are deterministic
    # token sequences of i
    att_np = rng_np.standard_normal((n_img, args.regions, args.att_feat_size)).astype(np.float32)
    boxes_np = rng_np.uniform(0.05, 0.95, (n_img, args.regions, 4)).astype(np.float32)
    seqs_np = np.zeros((n_img, spi, t + 1), np.int64)
    lengths = rng_np.integers(max(6, t - 6), t - 1, (n_img, spi))
    for i in range(n_img):
        for j in range(spi):
            ln = int(lengths[i, j])
            body = 4 + (np.arange(ln) * (7 + j % 2) + i * 131) % (vocab - 4)
            seqs_np[i, j, 0] = 2
            seqs_np[i, j, 1:1 + ln] = body
            seqs_np[i, j, 1 + ln] = 3

    words = lambda ids: " ".join(f"w{k}" for k in ids)  # noqa: E731
    gts = [[words(seqs_np[i, j][(seqs_np[i, j] > 3)]) for j in range(spi)] for i in range(n_img)]

    def build_model(mc):
        return RelationTransformer(
            vocab_size=vocab, d_model=args.d_model, dim_feedforward=args.dim_feedforward,
            num_layers=args.num_layers, num_heads=args.num_heads,
            att_feat_size=args.att_feat_size, max_seq_length=t + 1, mask_cfg=mc,
        )

    att = jnp.asarray(att_np)
    boxes = jnp.asarray(boxes_np)
    amask_all = jnp.ones((n_img, args.regions), jnp.float32)
    seqs_all = jnp.asarray(seqs_np, jnp.int32)
    segm_all = jnp.asarray((seqs_np != 0).astype(np.float32))
    base_rng = jax.random.PRNGKey(args.seed + 2)
    b_img = args.batch_images

    # the dense and masked configs share every param name (MaskedDense etc.
    # only ADD a "masks" collection), so weights transfer between phases
    dense_model = build_model(None)
    variables = dense_model.init({"params": jax.random.PRNGKey(1)},
                                 att[:2], amask_all[:2], seqs_all[:2, 0], boxes=boxes[:2])
    params = variables["params"]

    # ------------------------------------------------------------- scoring
    import tempfile

    td = tempfile.mkdtemp(prefix="sparse_quality_")
    df_path = f"{td}/df.p"
    build_df_pickle(gts, df_path)
    cs = CiderScorer.from_pickle(df_path)
    tok2id = {"<pad>": 0, "<unk>": 1, "<bos>": 2, "<eos>": 3}
    tok2id.update({f"w{k}": k for k in range(4, vocab)})
    table = devr.DfTable.build(cs.df, cs.ref_len, tok2id)
    dev_fn = devr.make_cider_device_fn(table)
    tbl_dev = table.device_arrays()
    pack_dev_all = devr.ref_pack_device(
        devr.build_ref_pack(gts, cs.df, cs.ref_len, tok2id, vocab_size=vocab))

    _greedy_cache = {}

    def eval_cider(model, variables, tag) -> float:
        """Greedy-decode all images, score with the HOST CIDEr-D (the same
        scorer the offline eval stack uses — the device scorer only drives
        training rewards)."""
        if tag not in _greedy_cache:
            @jax.jit
            def greedy_fn(variables):
                memory = model.apply(variables, att, amask_all, boxes, method="encode")
                return generate(model, variables, memory,
                                {"beam_size": 1, "max_seq_length": t})[0]

            _greedy_cache[tag] = greedy_fn
        seq = np.asarray(_greedy_cache[tag](variables))[:, 0]
        sc = CiderScorer(df=cs.df, ref_len=cs.ref_len)
        for i in range(n_img):
            sc.append(words(seq[i][seq[i] > 3]), gts[i])
        mean, _ = sc.compute()
        return float(mean)

    # ------------------------------------------------- phase 1: dense XE
    opt_xe = optax.chain(optax.clip(0.1), optax.adam(args.xe_lr))

    def make_xe_chunk(model, masked: bool, weight: float, max_step: int, opt_m=None):
        def one_step(state, _):
            step = state["step"]
            keys = jax.random.split(jax.random.fold_in(base_rng, step), 3)
            k_drop, k_mask, k_batch = keys
            idx = jax.random.randint(k_batch, (b_img,), 0, n_img)
            a = jnp.take(att, idx, axis=0)
            bx = jnp.take(boxes, idx, axis=0)
            am = jnp.ones((b_img, args.regions), jnp.float32)
            s = jnp.take(seqs_all, idx, axis=0).reshape(b_img * spi, t + 1)
            sm = jnp.take(segm_all, idx, axis=0).reshape(b_img * spi, t + 1)

            if masked:
                def loss_fn(p, m):
                    lp = model.apply({"params": p, "masks": m}, a, am, s, boxes=bx,
                                     train=True, rngs={"dropout": k_drop, "mask": k_mask})
                    cap = losses_mod.language_model_loss(lp, s[:, 1:], sm[:, 1:])
                    sp, aux = compute_sparsity_loss(m, args.sparsity_target, weight,
                                                    step, max_step)
                    return cap + sp, (cap, aux)

                (loss, (cap, aux)), (gw, gm) = jax.value_and_grad(
                    loss_fn, argnums=(0, 1), has_aux=True)(state["params"], state["masks"])
                uw, ow = opt_xe.update(gw, state["ow"], state["params"])
                um, om = opt_m.update(gm, state["om"], state["masks"])
                new = {"params": optax.apply_updates(state["params"], uw),
                       "masks": optax.apply_updates(state["masks"], um),
                       "ow": ow, "om": om, "step": step + 1}
                return new, (cap, aux["mask_sparsity"])

            def loss_fn(p):
                lp = model.apply({"params": p}, a, am, s, boxes=bx,
                                 train=True, rngs={"dropout": k_drop})
                return losses_mod.language_model_loss(lp, s[:, 1:], sm[:, 1:])

            loss, gw = jax.value_and_grad(loss_fn)(state["params"])
            uw, ow = opt_xe.update(gw, state["ow"], state["params"])
            new = {"params": optax.apply_updates(state["params"], uw),
                   "ow": ow, "step": state["step"] + 1}
            return new, (loss, jnp.zeros(()))

        @jax.jit
        def run_chunk(state):
            return jax.lax.scan(one_step, state, None, length=args.chunk)

        return run_chunk

    t0 = time.time()
    dense_chunk = make_xe_chunk(dense_model, False, 0.0, args.xe_steps)
    dstate = {"params": params, "ow": opt_xe.init(params), "step": jnp.zeros((), jnp.int32)}
    for c in range(args.xe_steps // args.chunk):
        dstate, (caps, _) = dense_chunk(dstate)
    xe_loss = float(np.asarray(caps)[-1])
    cider_dense_xe = eval_cider(dense_model, {"params": dstate["params"]}, "dense")
    print(f"# dense XE {args.xe_steps} steps in {time.time() - t0:.0f}s, "
          f"loss {xe_loss:.3f}, greedy CIDEr-D {cider_dense_xe:.4f}",
          file=sys.stderr, flush=True)

    # control arm: the SAME further horizon of plain dense XE, so the
    # sparse-vs-dense comparison is matched on total training steps
    t0 = time.time()
    cstate = {"params": dstate["params"], "ow": dstate["ow"], "step": dstate["step"]}
    for c in range(args.prune_steps // args.chunk):
        cstate, (caps, _) = dense_chunk(cstate)
    ctrl_loss = float(np.asarray(caps)[-1])
    ctrl_s = time.time() - t0
    cider_dense_control = eval_cider(dense_model, {"params": cstate["params"]}, "dense")
    print(f"# dense CONTROL +{args.prune_steps} steps in {ctrl_s:.0f}s, "
          f"loss {ctrl_loss:.3f}, greedy CIDEr-D {cider_dense_control:.4f}",
          file=sys.stderr, flush=True)

    # --------------------------------------------- phase 2: supermask prune
    masked_model = build_model(MaskConfig(mask_type="supermask", mask_init_value=5.0))
    mvars = masked_model.init({"params": jax.random.PRNGKey(9), "mask": jax.random.PRNGKey(10)},
                              att[:2], amask_all[:2], seqs_all[:2, 0], boxes=boxes[:2])
    masks0 = mvars["masks"]
    cfg = Config(prune_supermask_lr=100.0, prune_mask_adam_eps=1e-2)
    opt_m = build_mask_optimizer(cfg, True)
    pstate = {"params": dstate["params"], "masks": masks0,
              "ow": opt_xe.init(dstate["params"]), "om": opt_m.init(masks0),
              "step": jnp.zeros((), jnp.int32)}
    prune_chunk = make_xe_chunk(masked_model, True, args.sparsity_weight,
                                args.prune_steps, opt_m)
    t0 = time.time()
    n_chunks = args.prune_steps // args.chunk
    for c in range(n_chunks):
        pstate, (caps, sps) = prune_chunk(pstate)
        if (c + 1) % max(n_chunks // 12, 1) == 0 or c == n_chunks - 1:
            print(f"# prune step {(c + 1) * args.chunk}: loss "
                  f"{float(np.asarray(caps)[-1]):.3f} sparsity "
                  f"{float(np.asarray(sps)[-1]):.4f}", file=sys.stderr, flush=True)
    prune_s = time.time() - t0

    bin_masks = binarize_masks(jax.device_get(pstate["masks"]))
    final_sp, _, _ = mask_sparsity(bin_masks, "mask_freeze")
    final_sp = float(final_sp)
    freeze_model = build_model(MaskConfig(mask_type="mask_freeze"))
    fvars = {"params": pstate["params"], "masks": jax.tree.map(jnp.asarray, bin_masks)}
    cider_sparse = eval_cider(freeze_model, fvars, "sparse")
    print(f"# prune {args.prune_steps} steps in {prune_s:.0f}s: sparsity {final_sp:.5f}, "
          f"greedy CIDEr-D {cider_sparse:.4f}", file=sys.stderr, flush=True)

    # ------------------------------------- phase 3: mask-freeze SCST (device)
    n_s = args.scst_num_samples
    sb = args.scst_batch_images
    opt_sc = optax.chain(optax.clip(0.1), optax.adam(args.scst_lr))
    osc = opt_sc.init(fvars["params"])
    sample_opt = {"num_random_sample": n_s, "beam_size": 0, "max_seq_length": t,
                  "temperature": 1.0, "decode_train": True}
    masks_dev = fvars["masks"]

    @jax.jit
    def scst_step(params, osc, step):
        """mask_freeze --scst_reward device semantics (engine make_scst_step
        rng=None -> grad_fn_dev; frozen masks replay deterministically so the
        teacher-forced replay gradient pass is exact)."""
        k = jax.random.fold_in(jax.random.fold_in(base_rng, 777), step)
        kb, krest = jax.random.split(k)
        idx = jax.random.randint(kb, (sb,), 0, n_img)
        a, bx = att[idx], boxes[idx]
        am = jnp.ones((sb, args.regions), jnp.float32)

        def fwd_encode(p, kd):
            return freeze_model.apply({"params": p, "masks": masks_dev}, a, am, bx,
                                      train=True, rngs={"dropout": kd}, method="encode")

        kd, kdec = jax.random.split(krest)
        memory = fwd_encode(params, kd)
        seq = jax.lax.stop_gradient(
            generate(freeze_model, {"params": params, "masks": masks_dev}, memory,
                     sample_opt, rng=kdec)[0])
        flat = seq.reshape(sb * n_s, t)
        sc = dev_fn(flat, jnp.repeat(idx, n_s), tbl_dev, pack_dev_all)
        rewards = sc - devr.leave_one_out_baseline(sc, n_s)

        def loss_fn(p):
            kd2, kdec2 = jax.random.split(krest)
            mem = fwd_encode(p, kd2)
            _, dropout_key, _, _ = decode_train_keys(kdec2)
            seqs_in = jnp.concatenate(
                [jnp.full((sb * n_s, 1), freeze_model.bos_id, jnp.int32), flat], axis=1)
            lp = freeze_model.apply({"params": p, "masks": masks_dev}, mem, seqs_in, True,
                                    method="decode_teacher_forced",
                                    rngs={"dropout": dropout_key})
            seq_lp = jnp.take_along_axis(lp, flat[..., None], axis=2)[..., 0]
            m = (flat != freeze_model.pad_id).astype(seq_lp.dtype)
            return losses_mod.reward_loss(seq_lp, m, rewards)

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, osc2 = opt_sc.update(g, osc, params)
        return optax.apply_updates(params, up), osc2, loss, jnp.mean(sc)

    sparams = fvars["params"]
    curve = [{"step": 0, "cider": cider_sparse}]
    t0 = time.time()
    eval_every = max(args.scst_steps // 6, 1)
    for s in range(args.scst_steps):
        sparams, osc, loss, mean_r = scst_step(sparams, osc, jnp.asarray(s, jnp.int32))
        if (s + 1) % eval_every == 0:
            c = eval_cider(freeze_model, {"params": sparams, "masks": masks_dev}, "sparse")
            curve.append({"step": s + 1, "cider": c,
                          "mean_sample_reward": float(np.asarray(mean_r))})
            print(f"# SCST step {s + 1}: sparse greedy CIDEr-D {c:.4f}",
                  file=sys.stderr, flush=True)
    scst_s = time.time() - t0
    cider_sparse_scst = curve[-1]["cider"]

    tol = max(0.05, 0.05 * cider_dense_control)
    out = {
        "config": (f"ORT d{args.d_model}/ff{args.dim_feedforward}/{args.num_layers}L "
                   f"vocab {vocab}; XE {args.xe_steps} -> [control XE | supermask] "
                   f"{args.prune_steps} (target {args.sparsity_target}, weight "
                   f"{args.sparsity_weight:.0f}) -> mask_freeze SCST {args.scst_steps} "
                   f"x{n_s} samples"),
        "cider_dense_xe": round(cider_dense_xe, 4),
        "cider_dense_control": round(cider_dense_control, 4),
        "cider_sparse": round(cider_sparse, 4),
        "cider_sparse_scst": round(cider_sparse_scst, 4),
        "final_sparsity": round(final_sp, 5),
        "sparsity_on_target": bool(
            abs((1 - final_sp) - (1 - args.sparsity_target)) / (1 - args.sparsity_target) <= 0.05),
        "prune_preserves_cider": bool(cider_sparse >= 0.9 * cider_dense_control - 0.02),
        "scst_no_degradation": bool(cider_sparse_scst >= cider_sparse - tol),
        "scst_curve": curve,
        "xe_loss": round(xe_loss, 4),
        "control_loss": round(ctrl_loss, 4),
        "control_seconds": round(ctrl_s, 1),
        "prune_seconds": round(prune_s, 1),
        "scst_seconds": round(scst_s, 1),
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
