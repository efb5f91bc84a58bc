"""End-to-end training smoke tests (parity model: reference
tests/test_train.py:80-102 — every model trains for 1 epoch on the tiny
fixture dataset with micro configs, then prune variants per mask type)."""

import os
import sys

import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from sparse_caption_tpu.config import Config
from sparse_caption_tpu.opts import parse_opt


def tiny_args(fixture_dataset, log_dir, model, extra=()):
    return [
        "--caption_model", model,
        "--dataset", "mscoco_testing",
        "--dataset_dir", fixture_dataset,
        "--log_dir", str(log_dir),
        "--tokenizer", "word",
        "--vocab_size", "64",
        "--batch_size", "2",
        "--batch_size_eval", "2",
        "--max_epochs", "1",
        "--max_seq_length", "10",
        "--save_checkpoint_every", "1",
        "--losses_log_every", "1",
        "--max_att_regions", "8",
        "--att_feat_size", "16",
        "--seq_per_img", "3",
        "--cache_min_free_ram", "1.0",
    ] + list(extra)


TINY_TRANSFORMER = ["--d_model", "8", "--dim_feedforward", "16", "--num_layers", "1", "--num_heads", "2"]
TINY_UPDOWN = ["--rnn_size", "8", "--input_encoding_size", "8", "--att_hid_size", "8", "--fc_feat_size", "16"]


def run_train(argv, prune: bool = False):
    args = parse_opt(argv, include_pruning=prune)
    config = Config(**vars(args))
    if prune:
        from sparse_caption_tpu.engine.prune_training import PruneTrainingModule

        module = PruneTrainingModule(config)
    else:
        from sparse_caption_tpu.engine.training import TrainingModule

        module = TrainingModule(config)
    module.train()
    return module


def test_train_loader_iterates_per_image_records(fixture_dataset, tmp_path):
    """A train epoch covers one record per IMAGE with seq_per_img captions
    sampled per step — matching the reference's train dataloader, which
    passes generation_mode=True (utils/training.py:85-87) and samples
    min(seq_per_img, len) captions per image in its train collate
    (collate.py:133-138). Eval loaders are per-image too."""
    args = parse_opt(tiny_args(fixture_dataset, tmp_path, "transformer", TINY_TRANSFORMER))
    config = Config(**vars(args))
    from sparse_caption_tpu.engine.training import TrainingModule

    module = TrainingModule(config)
    assert len(module.data.get_split("train")) == 4 * 5  # raw per-caption records
    train_loader = module.get_loader("train", train=True)
    assert len(train_loader.records) == 4  # one record per train image
    assert len(train_loader) == 4 // config.batch_size
    batch = next(iter(train_loader))
    # each step still carries batch_size x seq_per_img sampled captions
    assert batch["seqs"].shape[0] == config.batch_size * config.seq_per_img
    val_loader = module.get_loader("val", train=False)
    assert len(val_loader.records) == 2  # deduped per image


@pytest.mark.parametrize(
    "model,extra",
    [
        ("transformer", TINY_TRANSFORMER),
        ("relation_transformer", TINY_TRANSFORMER),
        ("up_down_lstm", TINY_UPDOWN),
    ],
)
def test_train_dense(model, extra, fixture_dataset, tmp_path):
    module = run_train(tiny_args(fixture_dataset, tmp_path / model, model, extra))
    # run dir artifacts (reference checkpoint layout)
    for f in ["config.json", "model_init.msgpack", "model_last.msgpack", "model_params.json"]:
        assert os.path.isfile(os.path.join(module.config.log_dir, f)), f
    # a val eval happened and produced scores
    val_dir = os.path.join(module.config.log_dir, "val_beam_1")
    assert os.path.isfile(os.path.join(val_dir, "scores.csv"))


def test_train_bf16_precision_and_eval_cast(fixture_dataset, tmp_path):
    """--train_precision bf16 + --eval_cast bf16 on the ORT (boxes) model:
    master params/opt state stay f32, boxes stay f32 through the cast
    (geometry trig hygiene — engine/training.py cast notes), loss finite."""
    import jax.numpy as jnp
    import numpy as np

    module = run_train(tiny_args(
        fixture_dataset, tmp_path, "relation_transformer",
        TINY_TRANSFORMER + ["--train_precision", "bf16", "--eval_cast", "bf16"]))
    # master params and optimizer state are still f32
    import jax

    leaves = jax.tree.leaves(module.state.params)
    assert all(x.dtype == jnp.float32 for x in leaves if jnp.issubdtype(x.dtype, jnp.floating))
    opt_leaves = [x for x in jax.tree.leaves((module.state.opt_w, module.state.opt_m))
                  if hasattr(x, "dtype")]
    assert all(x.dtype == jnp.float32 for x in opt_leaves if jnp.issubdtype(x.dtype, jnp.floating))
    # and training made finite progress (scalars were logged)
    scal = os.path.join(module.config.log_dir, "scalars.jsonl")
    assert os.path.isfile(scal)
    import json

    recs = [json.loads(ln) for ln in open(scal)]
    losses = [r["value"] for r in recs if r.get("tag") == "train/caption_loss"]
    assert losses and all(np.isfinite(v) for v in losses)
    # eval ran under the bf16 cast and produced scores
    assert os.path.isfile(os.path.join(module.config.log_dir, "val_beam_1", "scores.csv"))


def test_bf16_input_cast_excludes_boxes(fixture_dataset, tmp_path):
    """The bf16 compute cast must leave 'boxes' f32 (advisor round-2
    finding: bf16 box coords degenerate the x100-scaled geometry trig)."""
    import jax
    import jax.numpy as jnp

    args = parse_opt(tiny_args(fixture_dataset, tmp_path, "relation_transformer",
                               TINY_TRANSFORMER + ["--train_precision", "bf16"]))
    config = Config(**vars(args))
    from sparse_caption_tpu.engine.training import TrainingModule

    module = TrainingModule(config)
    module.init_state()
    seen = {}

    orig = module.model.apply

    def spy(variables, **kw):
        for k in ("boxes", "att_feats"):
            if k in kw:
                seen[k] = kw[k].dtype
        return orig(variables, **kw)

    module.model.apply = spy
    batch = next(iter(module.get_loader("train", train=True)))
    inputs = module._model_inputs(batch)
    xe_step = module.make_xe_step()
    with jax.disable_jit():
        xe_step(module.state, inputs, jnp.asarray(batch["masks"]))
    module.model.apply = orig
    assert seen["att_feats"] == jnp.bfloat16
    assert seen["boxes"] == jnp.float32


def test_train_acort_radix_sharing(fixture_dataset, tmp_path):
    """ACORT = ORT + radix tokenizer + kv sharing + layer sharing."""
    argv = tiny_args(fixture_dataset, tmp_path, "relation_transformer",
                     TINY_TRANSFORMER + ["--tokenizer", "radix", "--radix_base", "8",
                                         "--num_layers", "2",
                                         "--share_att_encoder", "kv", "--share_att_decoder", "kv",
                                         "--share_layer_encoder", "0,0", "--share_layer_decoder", "0,0"])
    # radix max_seq default handling
    argv += ["--max_seq_length", "12"]
    module = run_train(argv)
    assert os.path.isfile(os.path.join(module.config.log_dir, "model_last.msgpack"))


@pytest.mark.parametrize("prune_type", ["supermask", "snip", "mag_blind", "mag_uniform", "mag_dist"])
def test_train_prune(prune_type, fixture_dataset, tmp_path):
    extra = ["--prune_type", prune_type, "--prune_sparsity_target", "0.5"]
    if prune_type == "supermask":
        # enough optimizer steps + the reference toy-test sparsity-loss
        # weight (tests/test_prune.py:46 uses weight=120 over 40 iters) so
        # the anneal actually drives the masks to the target within the run
        # per-image epochs: 4 train imgs / batch 2 = 2 steps/epoch; 20 epochs
        # = 40 optimizer steps (the reference toy horizon, tests/test_prune.py:46)
        extra += ["--max_epochs", "20", "--prune_supermask_sparsity_weight", "120",
                  "--save_checkpoint_every", "10", "--losses_log_every", "10"]
    argv = tiny_args(fixture_dataset, tmp_path, "relation_transformer_prune",
                     TINY_TRANSFORMER + extra)
    module = run_train(argv, prune=True)
    log_dir = module.config.log_dir
    assert os.path.isfile(os.path.join(log_dir, "mask_params.json"))
    from sparse_caption_tpu.pruning.engine import mask_sparsity

    s, _, _ = mask_sparsity(module.state.masks, prune_type)
    if prune_type == "supermask":
        # end-state parity with the reference integration assertion
        # (tests/test_prune.py:119-126: final sparsity within +-0.3 of target
        # for the REGULAR/supermask type after training)
        assert abs(float(s) - 0.5) < 0.3
    elif prune_type == "snip":
        # SNIP masks are gradient-trained at lr=100 after the one-shot prune
        # (reference masked_layer.py:67 mask_trainable + train_n_prune param
        # groups), so post-training sparsity is unconstrained here — the
        # reference toy test never feeds SNIP masks to its optimizer, making
        # its post-training assertion equivalent to the one-shot check in
        # test_pruning.py::TestSnip
        pass
    else:
        # one-shot magnitude masks are frozen -> stay at target
        assert abs(float(s) - 0.5) < 0.05


def test_train_prune_lottery(fixture_dataset, tmp_path):
    argv = tiny_args(fixture_dataset, tmp_path, "up_down_lstm_prune",
                     TINY_UPDOWN + ["--prune_type", "lottery_mag_blind", "--prune_sparsity_target", "0.5"])
    module = run_train(argv, prune=True)
    from sparse_caption_tpu.pruning.engine import mask_sparsity

    s, _, _ = mask_sparsity(module.state.masks, "lottery_mag_blind")
    assert abs(float(s) - 0.5) < 0.05


def test_lottery_rewinds_to_start_from_init(fixture_dataset, tmp_path):
    """Lottery-ticket semantics (reference train_n_prune_transformer.py:108-116):
    masks come from the start_from run's TRAINED weights, but params rewind
    to that run's ``model_init`` snapshot — NOT to the prune run's own
    fresh random init."""
    import jax
    import numpy as np

    from sparse_caption_tpu.config import Config
    from sparse_caption_tpu.engine.checkpoints import load_pytree
    from sparse_caption_tpu.engine.prune_training import PruneTrainingModule

    dense_dir = tmp_path / "dense"
    run_train(tiny_args(fixture_dataset, dense_dir, "up_down_lstm", TINY_UPDOWN))

    argv = tiny_args(fixture_dataset, tmp_path / "lottery", "up_down_lstm_prune",
                     TINY_UPDOWN + ["--prune_type", "lottery_mag_blind",
                                    "--prune_sparsity_target", "0.5",
                                    "--start_from", str(dense_dir),
                                    "--seed", "1234"])  # different init than the dense run
    module = PruneTrainingModule(Config(**vars(parse_opt(argv, include_pruning=True))))
    module.prepare()
    module.init_state()
    module.save_checkpoint("init")
    own_init = jax.tree.map(np.asarray, module.state.params)
    module.maybe_load_checkpoint()
    module.post_restore_hook()

    dense_init = load_pytree(str(dense_dir / "model_init.msgpack"))["params"]
    got, want, own = (jax.tree.leaves(jax.tree.map(np.asarray, t))
                      for t in (module.state.params, dense_init, own_init))
    assert all(np.array_equal(g, w) for g, w in zip(got, want)), \
        "lottery params must equal the dense run's init snapshot"
    assert any(not np.array_equal(g, o) for g, o in zip(got, own)), \
        "lottery params must NOT be this run's own random init"
    from sparse_caption_tpu.pruning.engine import mask_sparsity

    s, _, _ = mask_sparsity(module.state.masks, "lottery_mag_blind")
    assert abs(float(s) - 0.5) < 0.05  # masks kept from the trained weights


def test_train_scst_random_sample_mean(fixture_dataset, tmp_path):
    """1-epoch SCST run from scratch (random sampling, sample-mean baseline)."""
    argv = tiny_args(fixture_dataset, tmp_path, "transformer",
                     TINY_TRANSFORMER + ["--scst_start_epoch", "0", "--scst_num_samples", "3",
                                         "--scst_sample", "random", "--scst_baseline", "sample"])
    module = run_train(argv)
    assert os.path.isfile(os.path.join(module.config.log_dir, "model_last.msgpack"))


def test_train_scst_beam_greedy_baseline(fixture_dataset, tmp_path):
    """SCST with beam-search sampling + greedy baseline (the other 2 axes)."""
    argv = tiny_args(fixture_dataset, tmp_path, "transformer",
                     TINY_TRANSFORMER + ["--scst_start_epoch", "0", "--scst_num_samples", "3",
                                         "--scst_sample", "beam_search", "--scst_baseline", "greedy"])
    module = run_train(argv)
    assert os.path.isfile(os.path.join(module.config.log_dir, "model_last.msgpack"))


def test_eval_model_script(fixture_dataset, tmp_path):
    module = run_train(tiny_args(fixture_dataset, tmp_path, "transformer", TINY_TRANSFORMER))
    import subprocess

    # --platform cpu: the axon sitecustomize ignores JAX_PLATFORMS, so
    # without the flag this subprocess would run on the tunneled TPU
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "scripts", "eval_model.py"),
         "--log_dir", module.config.log_dir, "--ckpt", "last", "--split", "val", "--beam_size", "2",
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "CIDEr" in r.stdout

    # --split train: memorization eval on the train images (beyond the
    # reference, whose eval_model restricts to val/test) — scores resolve
    # against the annotation file's train GT (4-image corpus)
    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "scripts", "eval_model.py"),
         "--log_dir", module.config.log_dir, "--ckpt", "last", "--split", "train", "--beam_size", "1",
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "CIDEr" in r.stdout
    import glob as _glob

    assert _glob.glob(os.path.join(module.config.log_dir, "train_beam_1", "score_*.json"))


def test_eval_model_preserves_run_config_and_folds_masks(fixture_dataset, tmp_path):
    """eval_model on a PRUNE run must (a) not rewrite the training run's
    config.json with its eval-time mutations (stripped `_prune` name,
    decode overrides), and (b) fold the masks collection into the dense
    params instead of scoring raw unmasked weights."""
    import json
    import subprocess

    argv = tiny_args(fixture_dataset, tmp_path, "up_down_lstm_prune",
                     TINY_UPDOWN + ["--prune_type", "mag_blind", "--prune_sparsity_target", "0.5"])
    module = run_train(argv, prune=True)
    cfg_path = os.path.join(module.config.log_dir, "config.json")
    with open(cfg_path) as f:
        before = json.load(f)
    assert before["caption_model"] == "up_down_lstm_prune"

    r = subprocess.run(
        [sys.executable, os.path.join(os.path.dirname(__file__), "..", "scripts", "eval_model.py"),
         "--log_dir", module.config.log_dir, "--ckpt", "last", "--split", "val",
         "--beam_size", "1", "--platform", "cpu"],
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    with open(cfg_path) as f:
        after = json.load(f)
    assert after == before, "eval_model must not rewrite the run's config.json"

    # (b): folding applied — the dense model the eval built must carry
    # zeroed weights where the mask is 0 (reproduce the fold here)
    import numpy as np

    from sparse_caption_tpu.engine.checkpoints import load_pytree
    from sparse_caption_tpu.pruning.engine import mask_weight_pairs, prune_weights

    ckpt = load_pytree(os.path.join(module.config.log_dir, "model_last.msgpack"))
    folded = prune_weights(ckpt["params"], ckpt["masks"], "mag_blind")
    pairs = list(mask_weight_pairs(folded, ckpt["masks"]))
    assert pairs and any(float(np.mean(np.asarray(m) == 0)) > 0.2 for _, _, m in pairs)


def test_mask_freeze_scst_from_pruned_checkpoint(fixture_dataset, tmp_path):
    """The paper's sparse-SCST recipe (reference commands_pruning.sh:175-196):
    supermask-prune, then fine-tune with mask_freeze + SCST from that run."""
    prune_argv = tiny_args(fixture_dataset, tmp_path / "prune", "relation_transformer_prune",
                           TINY_TRANSFORMER + ["--prune_type", "supermask",
                                               "--prune_sparsity_target", "0.5"])
    prune_mod = run_train(prune_argv, prune=True)

    scst_argv = tiny_args(fixture_dataset, tmp_path / "scst", "relation_transformer_prune",
                          TINY_TRANSFORMER + [
                              "--prune_type", "mask_freeze",
                              "--start_from", prune_mod.config.log_dir,
                              "--scst_start_epoch", "0", "--scst_num_samples", "3",
                              "--scst_sample", "random", "--scst_baseline", "sample"])
    scst_mod = run_train(scst_argv, prune=True)
    # masks restored from the pruned run and frozen (no mask optimizer updates)
    import jax
    import numpy as np

    from sparse_caption_tpu.engine.checkpoints import load_pytree

    src = load_pytree(os.path.join(prune_mod.config.log_dir, "model_last.msgpack"))
    for a, b in zip(jax.tree.leaves(src["masks"]), jax.tree.leaves(scst_mod.state.masks)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.parametrize("mode,baseline", [("random", "sample"), ("beam_search", "greedy")])
def test_train_scst_fused(mode, baseline, fixture_dataset, tmp_path):
    """Single-jit SCST (--scst_fused): sampling under grad + io_callback rewards."""
    argv = tiny_args(fixture_dataset, tmp_path / f"{mode}_{baseline}", "transformer",
                     TINY_TRANSFORMER + ["--scst_start_epoch", "0", "--scst_num_samples", "3",
                                         "--scst_sample", mode, "--scst_baseline", baseline,
                                         "--scst_fused"])
    module = run_train(argv)
    assert os.path.isfile(os.path.join(module.config.log_dir, "model_last.msgpack"))


def test_resume_training_continues_from_last_checkpoint(fixture_dataset, tmp_path):
    """Failure recovery (reference utils/training.py:160-178 + opts
    --resume_training): a second invocation with --start_from <run dir> +
    --resume_training restores model_last + optimizer state and continues
    at the saved global step instead of restarting from scratch."""
    import numpy as np

    run_a = tiny_args(fixture_dataset, tmp_path / "runA", "transformer", TINY_TRANSFORMER)
    mod_a = run_train(run_a)
    steps_a = mod_a.global_step
    assert steps_a > 0
    assert os.path.isfile(os.path.join(mod_a.config.log_dir, "optimizer_last.msgpack"))
    params_a = mod_a.state.params

    # "crash and restart": fresh process state, same run resumed for 1 more epoch
    run_b = tiny_args(fixture_dataset, tmp_path / "runB", "transformer",
                      TINY_TRANSFORMER + ["--start_from", mod_a.config.log_dir,
                                          "--resume_training"])
    args = parse_opt(run_b)
    config = Config(**vars(args))
    from sparse_caption_tpu.engine.training import TrainingModule

    mod_b = TrainingModule(config)
    mod_b.prepare()
    mod_b.init_state()
    restored = mod_b.maybe_load_checkpoint()
    assert restored
    # optimizer step counter resumed -> training continues, not restarts
    assert mod_b.global_step == steps_a
    # restored params equal the saved ones (not a fresh init)
    import jax

    d = jax.tree.map(lambda a, b: float(abs(np.asarray(a) - np.asarray(b)).max()),
                     params_a, mod_b.state.params)
    assert max(jax.tree_util.tree_leaves(d)) < 1e-6
    # resume_training alone must tolerate the existing config.json (prepare
    # used to die on FileExistsError without --config_overwrite), and a
    # large save_every exercises the end-of-run save: a resumed run's final
    # step is N + max_train_step, so the `== max_train_step` trigger never
    # fires at its end — the tail window must still be checkpointed
    mod_b.config.save_checkpoint_every = 1000
    mod_b.train()
    assert mod_b.global_step == 2 * steps_a  # one more epoch on top
    from sparse_caption_tpu.engine.checkpoints import load_pytree

    opt = load_pytree(os.path.join(mod_b.config.log_dir, "optimizer_last.msgpack"))
    assert int(np.asarray(opt["step"])) == 2 * steps_a


def test_profile_dir_writes_trace(fixture_dataset, tmp_path):
    """Observability: --profile_dir captures a jax.profiler trace of steps
    2..2+profile_steps (engine/training.py train loop; SURVEY §5 tracing)."""
    import glob

    argv = tiny_args(fixture_dataset, tmp_path, "transformer",
                     TINY_TRANSFORMER + ["--profile_dir", str(tmp_path / "prof"),
                                         "--profile_steps", "2", "--max_epochs", "3"])
    run_train(argv)
    traces = glob.glob(str(tmp_path / "prof" / "**" / "*.trace.json.gz"), recursive=True)
    assert traces, "no profiler trace written"


@pytest.mark.parametrize("on_device", [False, True])
def test_train_prune_gradual(on_device, fixture_dataset, tmp_path):
    """Gradual Zhu&Gupta magnitude pruning through the train loop
    (pre_log_hook schedule), with thresholds computed on host or
    on-device (--prune_gradual_on_device, jnp.quantile path)."""
    extra = ["--prune_type", "mag_grad_uniform", "--prune_sparsity_target", "0.5",
             "--prune_gradual_frequency", "2", "--max_epochs", "20",
             "--save_checkpoint_every", "50"]
    if on_device:
        extra.append("--prune_gradual_on_device")
    argv = tiny_args(fixture_dataset, tmp_path / f"dev{int(on_device)}",
                     "relation_transformer_prune", TINY_TRANSFORMER + extra)
    module = run_train(argv, prune=True)
    from sparse_caption_tpu.pruning.engine import mask_sparsity

    s, _, _ = mask_sparsity(module.state.masks, "mag_grad_uniform")
    assert abs(float(s) - 0.5) < 0.05


def test_train_pipeline_stages_flag(fixture_dataset, tmp_path):
    """--pipeline_stages N (GPipe over the decoder stack) as a real
    training flag: N=1 and N=2 runs with identical seeds produce
    IDENTICAL final params (stage-sharding changes nothing numerically);
    loss/grad equality vs the sequential deterministic backward is pinned
    at the library level by test_parallel.py::
    test_pipeline_train_grads_match_sequential."""
    import json

    import jax
    import numpy as np

    from sparse_caption_tpu.engine.checkpoints import load_pytree

    runs = {}
    for n in (1, 2):
        argv = tiny_args(fixture_dataset, tmp_path / f"pipe{n}", "transformer",
                         TINY_TRANSFORMER + ["--num_layers", "2",
                                             "--pipeline_stages", str(n)])
        runs[n] = run_train(argv)
    losses = {}
    for n, mod in runs.items():
        scal = os.path.join(mod.config.log_dir, "scalars.jsonl")
        recs = [json.loads(ln) for ln in open(scal)]
        losses[n] = [r["value"] for r in recs if r.get("tag") == "train/caption_loss"]
    assert losses[1] and len(losses[1]) == len(losses[2])
    np.testing.assert_allclose(losses[1], losses[2], atol=1e-5)
    a = load_pytree(os.path.join(runs[1].config.log_dir, "model_last.msgpack"))
    b = load_pytree(os.path.join(runs[2].config.log_dir, "model_last.msgpack"))
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def test_train_pipeline_stages_masked(fixture_dataset, tmp_path):
    """--pipeline_stages on a PRUNED model (supermask): masks sample once
    per step outside the pipeline via the STE, the sparsity loss applies,
    and N=1 == N=2 (losses and final params+masks)."""
    import json

    import jax
    import numpy as np

    from sparse_caption_tpu.engine.checkpoints import load_pytree

    runs = {}
    for n in (1, 2):
        argv = tiny_args(fixture_dataset, tmp_path / f"mpipe{n}", "transformer_prune",
                         TINY_TRANSFORMER + ["--num_layers", "2",
                                             "--pipeline_stages", str(n),
                                             "--prune_type", "supermask",
                                             "--prune_sparsity_target", "0.5"])
        runs[n] = run_train(argv, prune=True)
    losses = {}
    for n, mod in runs.items():
        scal = os.path.join(mod.config.log_dir, "scalars.jsonl")
        recs = [json.loads(ln) for ln in open(scal)]
        losses[n] = [r["value"] for r in recs if r.get("tag") == "train/caption_loss"]
        # the supermask sparsity loss is live on the pipelined path
        assert any(r.get("tag") == "train/sparsity_loss" for r in recs)
    assert losses[1] and len(losses[1]) == len(losses[2])
    np.testing.assert_allclose(losses[1], losses[2], atol=1e-5)
    for name in ("model_last.msgpack",):
        a = load_pytree(os.path.join(runs[1].config.log_dir, name))
        b = load_pytree(os.path.join(runs[2].config.log_dir, name))
        for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
            np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)
    # masks actually moved (the STE gradient reaches the logits)
    init = load_pytree(os.path.join(runs[1].config.log_dir, "model_init.msgpack"))
    last = load_pytree(os.path.join(runs[1].config.log_dir, "model_last.msgpack"))
    dm = max(float(np.max(np.abs(np.asarray(a) - np.asarray(b))))
             for a, b in zip(jax.tree.leaves(init["masks"]), jax.tree.leaves(last["masks"])))
    assert dm > 1e-4, f"mask logits never moved (max delta {dm})"


def test_train_pipeline_dp_composition(fixture_dataset, tmp_path):
    """--pipeline_stages 2 x --mesh_shape 2 (dp x pp over 4 devices) equals
    the plain 2-stage pipeline run: data sharding changes nothing
    numerically."""
    import jax
    import numpy as np

    from sparse_caption_tpu.engine.checkpoints import load_pytree

    runs = {}
    for tag, extra in (("pp", []), ("dpp", ["--mesh_shape", "2"])):
        # decoder batch = 2 imgs x 3 captions = 6; n_micro 3 -> microbatch 2,
        # divisible by the dp=2 data axis
        argv = tiny_args(fixture_dataset, tmp_path / f"c_{tag}", "transformer",
                         TINY_TRANSFORMER + ["--num_layers", "2",
                                             "--pipeline_stages", "2",
                                             "--pipeline_microbatches", "3"] + extra)
        runs[tag] = run_train(argv)
    a = load_pytree(os.path.join(runs["pp"].config.log_dir, "model_last.msgpack"))
    b = load_pytree(os.path.join(runs["dpp"].config.log_dir, "model_last.msgpack"))
    for x, y in zip(jax.tree.leaves(a), jax.tree.leaves(b)):
        np.testing.assert_allclose(np.asarray(x), np.asarray(y), atol=1e-5)


def test_pipeline_stages_flag_guards(fixture_dataset, tmp_path):
    """--pipeline_stages rejects a tensor-parallel --mesh_shape and SCST
    (data-only mesh_shape composes as dp x pp instead)."""
    import pytest as _pytest

    argv = tiny_args(fixture_dataset, tmp_path / "g1", "transformer",
                     TINY_TRANSFORMER + ["--num_layers", "2", "--pipeline_stages", "2",
                                         "--mesh_shape", "2,2"])
    with _pytest.raises(ValueError, match="tensor axis"):
        run_train(argv)
    argv = tiny_args(fixture_dataset, tmp_path / "g2", "transformer",
                     TINY_TRANSFORMER + ["--num_layers", "2", "--pipeline_stages", "2",
                                         "--scst_start_epoch", "0"])
    with _pytest.raises(ValueError, match="XE training only"):
        run_train(argv)
