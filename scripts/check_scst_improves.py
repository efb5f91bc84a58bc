#!/usr/bin/env python
"""SCST optimization probe: does REINFORCE actually raise CIDEr-D?

The reference's training recipe (README.md:84-96; ``commands_*.sh``) is
XE pre-training followed by SCST fine-tuning, whose entire point is that
policy-gradient training on the CIDEr-D reward lifts the evaluated CIDEr
(the paper's dense baselines gain ~10 CIDEr from SCST). The equivalence
tests (tests/test_scst_semantics.py) prove our gradients match the
fused-oracle update; this probe demonstrates the *optimization claim*
itself end-to-end: starting from a deliberately UNDER-trained XE model on
a memorizable synthetic task, SCST steps (train-mode sampling, sample-mean
leave-one-out baseline, device-resident CIDEr-D reward — the
``--scst_reward device`` path) must raise the greedy-decode CIDEr-D.

Defaults are paper scale (ORT-512, vocab 10k) for the real-TPU run;
tests/test_learning.py shrinks dims via flags and pins the climb on CPU.

Prints ONE JSON line: {"cider_before": ..., "cider_after": ...,
"curve": [{"step": s, "cider": c}, ...], "improved": bool}.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import numpy as np


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--platform", type=str, default=None,
                    help="pin jax platform (e.g. cpu); default auto-selects "
                         "the TPU backend when present (the axon plugin "
                         "registers as 'axon', not 'tpu')")
    ap.add_argument("--d_model", type=int, default=512)
    ap.add_argument("--dim_feedforward", type=int, default=2048)
    ap.add_argument("--num_layers", type=int, default=6)
    ap.add_argument("--num_heads", type=int, default=8)
    ap.add_argument("--vocab_size", type=int, default=10000)
    ap.add_argument("--att_feat_size", type=int, default=2048)
    ap.add_argument("--regions", type=int, default=36)
    ap.add_argument("--max_len", type=int, default=17)
    ap.add_argument("--images", type=int, default=20)
    ap.add_argument("--batch_images", type=int, default=5, help="SCST batch (reference config)")
    ap.add_argument("--xe_steps", type=int, default=120,
                    help="deliberately short: leaves CIDEr headroom for SCST")
    ap.add_argument("--scst_steps", type=int, default=600)
    ap.add_argument("--scst_num_samples", type=int, default=15)
    ap.add_argument("--eval_every", type=int, default=100)
    ap.add_argument("--xe_lr", type=float, default=3e-4)
    ap.add_argument("--scst_lr", type=float, default=5e-5)
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()

    from sparse_caption_tpu.utils.jax_setup import enable_persistent_cache, select_platform

    select_platform(args.platform)
    import jax

    enable_persistent_cache()
    import jax.numpy as jnp
    import optax

    from sparse_caption_tpu.decoding import generate
    from sparse_caption_tpu.decoding.api import decode_train_keys
    from sparse_caption_tpu.engine import losses as losses_mod
    from sparse_caption_tpu.metrics.cider import CiderScorer, build_df_pickle
    from sparse_caption_tpu.models.relation_transformer import RelationTransformer
    from sparse_caption_tpu.scst import device_reward as devr

    vocab, t = args.vocab_size, args.max_len
    n_img, spi = args.images, 5
    rng = np.random.default_rng(args.seed)

    # memorizable synthetic task (same scheme as check_supermask_dynamics):
    # image i's five references are deterministic token sequences of i, so
    # a perfectly-fit greedy decode reaches the refs' own CIDEr ceiling —
    # the under-trained XE start leaves measurable headroom below it
    att_np = rng.standard_normal((n_img, args.regions, args.att_feat_size)).astype(np.float32)
    boxes_np = rng.uniform(0.05, 0.95, (n_img, args.regions, 4)).astype(np.float32)
    seqs_np = np.zeros((n_img, spi, t + 1), np.int64)
    lengths = rng.integers(max(6, t - 6), t - 1, (n_img, spi))
    for i in range(n_img):
        for j in range(spi):
            ln = int(lengths[i, j])
            body = 4 + (np.arange(ln) * (7 + j % 2) + i * 131) % (vocab - 4)
            seqs_np[i, j, 0] = 2
            seqs_np[i, j, 1:1 + ln] = body
            seqs_np[i, j, 1 + ln] = 3

    words = lambda ids: " ".join(f"w{k}" for k in ids)  # noqa: E731
    gts = [[words(seqs_np[i, j][(seqs_np[i, j] > 3)]) for j in range(spi)] for i in range(n_img)]

    model = RelationTransformer(
        vocab_size=vocab, d_model=args.d_model, dim_feedforward=args.dim_feedforward,
        num_layers=args.num_layers, num_heads=args.num_heads,
        att_feat_size=args.att_feat_size, max_seq_length=t + 1,
    )
    att = jnp.asarray(att_np)
    amask = jnp.ones((n_img, args.regions), jnp.float32)
    boxes = jnp.asarray(boxes_np)
    variables = model.init({"params": jax.random.PRNGKey(1)},
                           att[:2], amask[:2], jnp.asarray(seqs_np[:2, 0], jnp.int32),
                           boxes=boxes[:2])
    params = variables["params"]

    # ---------------------------------------------------------------- XE
    opt_xe = optax.chain(optax.clip(0.1), optax.adam(args.xe_lr))
    ow = opt_xe.init(params)
    base_rng = jax.random.PRNGKey(args.seed + 2)
    b_img = args.batch_images
    flat_seqs = jnp.asarray(seqs_np.reshape(n_img * spi, t + 1), jnp.int32)

    @jax.jit
    def xe_step(params, ow, step):
        k = jax.random.fold_in(base_rng, step)
        kd, kb = jax.random.split(k)
        idx = jax.random.randint(kb, (b_img,), 0, n_img)
        s = flat_seqs.reshape(n_img, spi, t + 1)[idx].reshape(b_img * spi, t + 1)

        def loss_fn(p):
            lp = model.apply({"params": p}, att[idx], amask[idx], s, boxes=boxes[idx],
                             train=True, rngs={"dropout": kd})
            m = (s[:, 1:] != 0).astype(lp.dtype)
            return losses_mod.language_model_loss(lp, s[:, 1:], m)

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, ow2 = opt_xe.update(g, ow, params)
        return optax.apply_updates(params, up), ow2, loss

    t0 = time.time()
    for s in range(args.xe_steps):
        params, ow, loss = xe_step(params, ow, jnp.asarray(s, jnp.int32))
    print(f"# XE {args.xe_steps} steps in {time.time() - t0:.0f}s, "
          f"final loss {float(np.asarray(loss)):.3f}", file=sys.stderr)

    # ------------------------------------------------------------- scorer
    td = tempfile.mkdtemp(prefix="scst_improve_")
    df_path = os.path.join(td, "df.p")
    build_df_pickle(gts, df_path)
    cs = CiderScorer.from_pickle(df_path)

    tok2id = {"<pad>": 0, "<unk>": 1, "<bos>": 2, "<eos>": 3}
    tok2id.update({f"w{k}": k for k in range(4, vocab)})
    table = devr.DfTable.build(cs.df, cs.ref_len, tok2id)
    dev_fn = devr.make_cider_device_fn(table)
    tbl_dev = table.device_arrays()

    greedy = None  # built lazily (jit cache)

    def eval_cider(params) -> float:
        nonlocal greedy
        if greedy is None:
            @jax.jit
            def greedy_fn(params):
                v = {"params": params}
                memory = model.apply(v, att, amask, boxes, method="encode")
                return generate(model, v, memory, {"beam_size": 1, "max_seq_length": t})[0]

            greedy = greedy_fn
        seq = np.asarray(greedy(params))[:, 0]
        sc = CiderScorer(df=cs.df, ref_len=cs.ref_len)
        for i in range(n_img):
            sc.append(words(seq[i][seq[i] > 3]), gts[i])
        mean, _ = sc.compute()
        return float(mean)

    # ---------------------------------------------------------------- SCST
    n_s = args.scst_num_samples
    opt_sc = optax.chain(optax.clip(0.1), optax.adam(args.scst_lr))
    osc = opt_sc.init(params)
    sample_opt = {"num_random_sample": n_s, "beam_size": 0, "max_seq_length": t,
                  "temperature": 1.0, "decode_train": True}

    pack_dev = devr.ref_pack_device(
        devr.build_ref_pack(gts, cs.df, cs.ref_len, tok2id, vocab_size=vocab))

    @jax.jit
    def scst_step(params, osc, step):
        """--scst_reward device semantics: sample, score in-jit, replay
        teacher-forced for the grad (engine make_scst_step rng=None branch)."""
        k = jax.random.fold_in(jax.random.fold_in(base_rng, 777), step)
        kb, krest = jax.random.split(k)
        idx = jax.random.randint(kb, (b_img,), 0, n_img)
        a, am, bx = att[idx], amask[idx], boxes[idx]

        def sample(p, differentiable):
            v = {"params": p}
            kd, kdec = jax.random.split(krest)
            memory = model.apply(v, a, am, bx, train=True, rngs={"dropout": kd},
                                 method="encode")
            o = dict(sample_opt, differentiable=True) if differentiable else sample_opt
            return generate(model, v, memory, o, rng=kdec)

        seq = jax.lax.stop_gradient(sample(params, False)[0])  # (b, n_s, t)
        flat = seq.reshape(b_img * n_s, t)
        img_idx = jnp.repeat(idx, n_s)
        sc = dev_fn(flat, img_idx, tbl_dev, pack_dev)
        rewards = sc - devr.leave_one_out_baseline(sc, n_s)

        def loss_fn(p):
            v = {"params": p}
            kd, kdec = jax.random.split(krest)
            memory = model.apply(v, a, am, bx, train=True, rngs={"dropout": kd},
                                 method="encode")
            _, dropout_key, _, _ = decode_train_keys(kdec)
            seqs_in = jnp.concatenate(
                [jnp.full((b_img * n_s, 1), model.bos_id, jnp.int32), flat], axis=1)
            lp = model.apply(v, memory, seqs_in, True, method="decode_teacher_forced",
                             rngs={"dropout": dropout_key})
            seq_lp = jnp.take_along_axis(lp, flat[..., None], axis=2)[..., 0]
            m = (flat != model.pad_id).astype(seq_lp.dtype)
            return losses_mod.reward_loss(seq_lp, m, rewards)

        loss, g = jax.value_and_grad(loss_fn)(params)
        up, osc2 = opt_sc.update(g, osc, params)
        return optax.apply_updates(params, up), osc2, loss, jnp.mean(sc)

    cider_before = eval_cider(params)
    curve = [{"step": 0, "cider": cider_before}]
    print(f"# greedy CIDEr-D before SCST: {cider_before:.4f}", file=sys.stderr)
    t0 = time.time()
    for s in range(args.scst_steps):
        params, osc, loss, mean_r = scst_step(params, osc, jnp.asarray(s, jnp.int32))
        if (s + 1) % args.eval_every == 0:
            c = eval_cider(params)
            curve.append({"step": s + 1, "cider": c,
                          "mean_sample_reward": float(np.asarray(mean_r))})
            print(f"# step {s + 1}: greedy CIDEr-D {c:.4f} "
                  f"(mean sampled {float(np.asarray(mean_r)):.4f})", file=sys.stderr)
    cider_after = max(c["cider"] for c in curve[1:]) if len(curve) > 1 else cider_before
    final = curve[-1]["cider"]
    out = {
        "cider_before": cider_before, "cider_after": final,
        "cider_best": cider_after, "curve": curve,
        "scst_seconds": time.time() - t0,
        "improved": final > cider_before + max(0.02, 0.05 * cider_before),
    }
    print(json.dumps(out))
    if args.out:
        with open(args.out, "w") as f:
            json.dump(out, f, indent=1)


if __name__ == "__main__":
    main()
