"""SCST gradient semantics: the default two-phase step (sample -> host
rewards -> differentiable recompute) must be EXACTLY the reference's
captured-logprob estimator. Proven two ways:

1. recompute determinism: re-running the train-mode sampling decode with
   the same rng reproduces the identical tokens and logprobs (the grad
   pass scores the true sampled policy, supermask Bernoulli and dropout
   included — the round-1 advisor finding)
2. step equivalence: on one batch from one state, the two-phase step and
   the single-jit fused step (gradients attached to the sampling-pass
   logprobs via io_callback, reference utils/training.py:225-254) produce
   the same updated parameters.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from sparse_caption_tpu.config import Config
from sparse_caption_tpu.opts import parse_opt

TINY = ["--d_model", "8", "--dim_feedforward", "16", "--num_layers", "1", "--num_heads", "2"]


def _module(fixture_dataset, tmp_path, extra=()):
    argv = [
        "--caption_model", "transformer_prune",
        "--dataset", "mscoco_testing",
        "--dataset_dir", fixture_dataset,
        "--log_dir", str(tmp_path),
        "--tokenizer", "word",
        "--vocab_size", "64",
        "--batch_size", "2",
        "--max_epochs", "1",
        "--max_seq_length", "10",
        "--max_att_regions", "8",
        "--att_feat_size", "16",
        "--seq_per_img", "3",
        "--cache_min_free_ram", "1.0",
        "--prune_type", "supermask",
        "--prune_sparsity_target", "0.5",
        "--scst_start_epoch", "0",
        "--scst_num_samples", "3",
        "--scst_sample", "random",
        "--scst_baseline", "greedy",
    ] + TINY + list(extra)
    args = parse_opt(argv, include_pruning=True)
    config = Config(**vars(args))
    from sparse_caption_tpu.engine.prune_training import PruneTrainingModule

    module = PruneTrainingModule(config)
    module.prepare()
    module.init_state()
    return module


def test_train_sample_recompute_is_deterministic(fixture_dataset, tmp_path):
    """Same rng -> bitwise-identical tokens and logprobs across the
    while-loop sampling pass and the differentiable scan recompute, with
    dropout active and per-step supermask Bernoulli draws."""
    import jax

    from sparse_caption_tpu.decoding import generate

    module = _module(fixture_dataset, tmp_path / "det")
    model = module.model
    batch = next(iter(module.train_loader))
    inputs = module._model_inputs(batch, with_seqs=False)
    variables = module._variables(module.state)
    sample_opt = {"num_random_sample": 3, "beam_size": 0, "max_seq_length": 9,
                  "decode_train": True}
    rng = jax.random.PRNGKey(7)
    k_d, k_m, k_dec = jax.random.split(rng, 3)
    memory = model.apply(variables, **inputs, train=True,
                         rngs={"dropout": k_d, "mask": k_m}, method="encode")
    seq1, lp1 = generate(model, variables, memory, sample_opt, rng=k_dec)
    seq2, lp2 = generate(model, variables, memory, dict(sample_opt, differentiable=True), rng=k_dec)
    np.testing.assert_array_equal(np.asarray(seq1), np.asarray(seq2))
    valid = np.asarray(seq1) != model.pad_id
    np.testing.assert_array_equal(np.asarray(lp1)[valid], np.asarray(lp2)[valid])
    # train-mode policy actually differs from the eval policy (dropout/masks
    # active) — otherwise this test would not be exercising the claim
    memory_ev = model.apply(variables, **inputs, method="encode")
    seq_ev, _ = generate(model, variables, memory_ev,
                         {k: v for k, v in sample_opt.items() if k != "decode_train"}, rng=k_dec)
    assert not np.array_equal(np.asarray(seq1), np.asarray(seq_ev))


@pytest.mark.parametrize("baseline", ["greedy", "sample"])
def test_two_phase_step_equals_fused_step(fixture_dataset, tmp_path, baseline):
    """Two-phase (recompute) and fused (io_callback) SCST steps produce the
    same parameter update from the same state, batch, and rng."""
    import jax

    module = _module(fixture_dataset, tmp_path / f"eq_{baseline}",
                     extra=["--scst_baseline", baseline])
    two_phase = module.make_scst_step()
    fused = module.make_scst_fused_step()

    batch = next(iter(module.train_loader))
    rng = jax.random.PRNGKey(11)
    k_sample, _ = jax.random.split(rng)

    state_a, loss_a, aux_a = two_phase(module.state, batch, rng)
    # the two-phase step derives its realization key as split(rng)[0]; hand
    # the fused step that same key so both sample the identical policy
    state_b, loss_b, aux_b = fused(module.state, batch, k_sample)

    np.testing.assert_allclose(float(loss_a), float(loss_b), atol=1e-6)
    np.testing.assert_allclose(aux_a["avg_reward"], aux_b["avg_reward"], atol=1e-6)
    for a, b in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(jax.tree.leaves(state_a.masks), jax.tree.leaves(state_b.masks)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def _dense_module(fixture_dataset, tmp_path, extra=()):
    argv = [
        "--caption_model", "transformer",
        "--dataset", "mscoco_testing",
        "--dataset_dir", fixture_dataset,
        "--log_dir", str(tmp_path),
        "--tokenizer", "word",
        "--vocab_size", "64",
        "--batch_size", "2",
        "--max_epochs", "1",
        "--max_seq_length", "10",
        "--max_att_regions", "8",
        "--att_feat_size", "16",
        "--seq_per_img", "3",
        "--cache_min_free_ram", "1.0",
        "--scst_start_epoch", "0",
        "--scst_num_samples", "3",
        "--scst_sample", "random",
        "--scst_baseline", "greedy",
    ] + TINY + list(extra)
    args = parse_opt(argv)
    config = Config(**vars(args))
    from sparse_caption_tpu.engine.training import TrainingModule

    module = TrainingModule(config)
    module.prepare()
    module.init_state()
    return module


def test_teacher_forced_replay_matches_sampling_logprobs(fixture_dataset, tmp_path):
    """Dense models: ONE parallel teacher-forced forward in replay mode
    (TimeDropout per-step key folding, causal-only key mask, no decoder
    attn-prob dropout) reproduces the train-mode sampling decode's
    per-step logprobs at every loss-relevant (non-pad) position."""
    import jax
    import jax.numpy as jnp

    from sparse_caption_tpu.decoding import generate
    from sparse_caption_tpu.decoding.api import decode_train_keys

    module = _dense_module(fixture_dataset, tmp_path / "tf")
    model = module.model
    assert model.DECODE_DROPOUT_FOLDS_T
    batch = next(iter(module.train_loader))
    inputs = module._model_inputs(batch, with_seqs=False)
    variables = module._variables(module.state)
    n_samples, t = 3, 9
    sample_opt = {"num_random_sample": n_samples, "beam_size": 0, "max_seq_length": t,
                  "decode_train": True}
    rng = jax.random.PRNGKey(13)
    k_d, k_m, k_dec = jax.random.split(rng, 3)
    memory = model.apply(variables, **inputs, train=True,
                         rngs={"dropout": k_d, "mask": k_m}, method="encode")
    seq, seq_lp = generate(model, variables, memory, sample_opt, rng=k_dec)

    _, dropout_key, _, _ = decode_train_keys(k_dec)
    n = seq.shape[0] * seq.shape[1]
    flat = jnp.reshape(seq, (n, t))
    seqs_in = jnp.concatenate([jnp.full((n, 1), model.bos_id, jnp.int32), flat], axis=1)
    lp = model.apply(variables, memory, seqs_in, True,
                     method="decode_teacher_forced", rngs={"dropout": dropout_key})
    lp_at = jnp.take_along_axis(lp, flat[..., None], axis=2)[..., 0]
    valid = np.asarray(flat) != model.pad_id
    assert valid.any()
    np.testing.assert_allclose(np.asarray(lp_at)[valid],
                               np.asarray(seq_lp).reshape(n, t)[valid], atol=1e-5)


def test_beam_scst_recompute_is_deterministic_and_differentiable(fixture_dataset, tmp_path):
    """Beam-mode SCST (reference utils/training.py:225-230): the grad pass
    re-runs the beam decode (a fixed-shape lax.scan, differentiable as-is)
    with the same rng — it must reproduce the sampling pass's selected
    tokens and per-step logprobs bit for bit, and gradients must flow
    through the whole beam scan (nonzero for decoder params)."""
    import jax
    import jax.numpy as jnp

    from sparse_caption_tpu.decoding import generate

    module = _module(fixture_dataset, tmp_path / "beamdet",
                     extra=["--scst_sample", "beam_search"])
    model = module.model
    batch = next(iter(module.train_loader))
    inputs = module._model_inputs(batch, with_seqs=False)
    variables = module._variables(module.state)
    beam_opt = {"beam_size": 3, "max_seq_length": 9, "decode_train": True}
    rng = jax.random.PRNGKey(23)
    k_d, k_m, k_dec = jax.random.split(rng, 3)
    memory = model.apply(variables, **inputs, train=True,
                         rngs={"dropout": k_d, "mask": k_m}, method="encode")
    seq1, lp1 = generate(model, variables, memory, beam_opt, rng=k_dec)
    # identical rng -> identical realization (this is exactly what grad_fn's
    # _train_sample(differentiable=True) recompute runs)
    seq2, lp2 = generate(model, variables, memory, dict(beam_opt, differentiable=True), rng=k_dec)
    np.testing.assert_array_equal(np.asarray(seq1), np.asarray(seq2))
    valid = np.asarray(seq1) != model.pad_id
    assert valid.any()
    np.testing.assert_array_equal(np.asarray(lp1)[valid], np.asarray(lp2)[valid])

    # gradients flow through the beam scan into the decoder params
    def loss_fn(params):
        vs = dict(variables, params=params)
        mem = model.apply(vs, **inputs, train=True,
                          rngs={"dropout": k_d, "mask": k_m}, method="encode")
        _, lp = generate(model, vs, mem, beam_opt, rng=k_dec)
        mask = (seq1 != model.pad_id).astype(lp.dtype)
        return jnp.sum(lp * mask)

    grads = jax.grad(loss_fn)(variables["params"])
    gnorm = sum(float(jnp.sum(jnp.abs(g))) for g in jax.tree.leaves(grads))
    assert np.isfinite(gnorm) and gnorm > 0


@pytest.mark.parametrize("baseline", ["greedy", "sample"])
def test_two_phase_step_equals_fused_step_beam(fixture_dataset, tmp_path, baseline):
    """Beam-mode SCST: two-phase (beam recompute) and fused steps produce
    the same update — the published beam-SCST variants' gradient proof
    (reference resources/commands_pruning.sh:47-70)."""
    import jax

    module = _module(fixture_dataset, tmp_path / f"beameq_{baseline}",
                     extra=["--scst_sample", "beam_search", "--scst_baseline", baseline])
    two_phase = module.make_scst_step()
    fused = module.make_scst_fused_step()
    batch = next(iter(module.train_loader))
    rng = jax.random.PRNGKey(29)
    k_sample, _ = jax.random.split(rng)
    state_a, loss_a, aux_a = two_phase(module.state, batch, rng)
    state_b, loss_b, aux_b = fused(module.state, batch, k_sample)
    np.testing.assert_allclose(float(loss_a), float(loss_b), atol=1e-6)
    np.testing.assert_allclose(aux_a["avg_reward"], aux_b["avg_reward"], atol=1e-6)
    for a, b in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    for a, b in zip(jax.tree.leaves(state_a.masks), jax.tree.leaves(state_b.masks)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_pipelined_scst_matches_serial_modulo_lag(fixture_dataset, tmp_path):
    """--scst_pipeline overlaps host scoring with the previous batch's grad;
    its only semantics delta is a one-update policy lag. With learning rate
    0 the lag vanishes, so the pipelined step's per-batch rewards and
    losses must EXACTLY equal the serial two-phase step's, shifted by one
    call; and with a real lr, flush() leaves exactly one optimizer step per
    batch."""
    import jax

    lr0 = ["--lr_scheduler", "step", "--learning_rate", "0.0",
           "--learning_rate_decay_start", "-1"]
    mod_a = _dense_module(fixture_dataset, tmp_path / "ser", extra=lr0)
    mod_b = _dense_module(fixture_dataset, tmp_path / "pipe", extra=lr0 + ["--scst_pipeline"])
    serial = mod_a.make_scst_step()
    pipelined = mod_b.make_scst_pipelined_step()

    batches = list(mod_a.train_loader)[:3]
    ser_out, pipe_out = [], []
    sa, sb = mod_a.state, mod_b.state
    for batch in batches:
        sa, loss_a, aux_a = serial(sa, batch)
        ser_out.append((float(loss_a), aux_a["avg_reward"]))
    for batch in batches:
        sb, loss_b, aux_b = pipelined(sb, batch)
        pipe_out.append((float(loss_b), aux_b["avg_reward"] if aux_b else None))
    sb, loss_last, aux_last = pipelined.flush(sb)
    pipe_out.append((float(loss_last), aux_last["avg_reward"]))

    # first pipelined call reports no completed grad; thereafter call k
    # reports batch k-1's loss/reward — identical to serial at lr 0
    assert pipe_out[0][1] is None
    for k in range(len(batches)):
        np.testing.assert_allclose(pipe_out[k + 1][0], ser_out[k][0], atol=1e-6)
        np.testing.assert_allclose(pipe_out[k + 1][1], ser_out[k][1], atol=1e-9)
    assert int(sb.step) == len(batches)  # one optimizer step per batch after flush

    # with a REAL lr the pipelined runner still applies every update
    mod_c = _dense_module(fixture_dataset, tmp_path / "pipe_lr")
    pipe_c = mod_c.make_scst_pipelined_step()
    sc = mod_c.state
    p0 = jax.tree.leaves(sc.params)[0].copy()
    for batch in batches:
        sc, _, _ = pipe_c(sc, batch)
    sc, _, _ = pipe_c.flush(sc)
    assert int(sc.step) == len(batches)
    assert not np.allclose(np.asarray(jax.tree.leaves(sc.params)[0]), np.asarray(p0))


def test_pipelined_scst_rejects_non_replay_configs(fixture_dataset, tmp_path):
    """Pipelining is gated to the teacher-forced-replay path: the scan
    recompute would regenerate tokens under lagged params."""
    import pytest as _pytest

    mod = _module(fixture_dataset, tmp_path / "gate")  # supermask model
    with _pytest.raises(ValueError, match="teacher-forced-replay"):
        mod.make_scst_pipelined_step()


def test_dense_two_phase_uses_tf_replay_and_equals_fused(fixture_dataset, tmp_path):
    """The dense two-phase step (teacher-forced replay grad pass) produces
    the same parameter update as the fused captured-logprob step."""
    import jax

    module = _dense_module(fixture_dataset, tmp_path / "tf_eq")
    two_phase = module.make_scst_step()
    fused = module.make_scst_fused_step()
    batch = next(iter(module.train_loader))
    rng = jax.random.PRNGKey(17)
    k_sample, _ = jax.random.split(rng)
    state_a, loss_a, aux_a = two_phase(module.state, batch, rng)
    state_b, loss_b, aux_b = fused(module.state, batch, k_sample)
    np.testing.assert_allclose(float(loss_a), float(loss_b), atol=1e-5)
    np.testing.assert_allclose(aux_a["avg_reward"], aux_b["avg_reward"], atol=1e-6)
    for a, b in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_mask_freeze_two_phase_uses_tf_replay_and_equals_fused(fixture_dataset, tmp_path):
    """Frozen-mask pruned models (the paper's sparse-SCST stage,
    commands_pruning.sh:175-196) have DETERMINISTIC masks, so the
    teacher-forced-replay grad path applies and reproduces the fused
    captured-logprob estimator — which also makes --scst_pipeline legal
    for sparse fine-tuning."""
    import jax

    module = _module(fixture_dataset, tmp_path / "mf_eq",
                     extra=["--prune_type", "mask_freeze"])
    two_phase = module.make_scst_step()
    assert two_phase.use_tf_replay  # deterministic masks replay exactly
    fused = module.make_scst_fused_step()
    batch = next(iter(module.train_loader))
    rng = jax.random.PRNGKey(23)
    k_sample, _ = jax.random.split(rng)
    state_a, loss_a, _ = two_phase(module.state, batch, rng)
    state_b, loss_b, _ = fused(module.state, batch, k_sample)
    np.testing.assert_allclose(float(loss_a), float(loss_b), atol=1e-5)
    for a, b in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    # pipelining is now constructible for the frozen-mask model
    module2 = _module(fixture_dataset, tmp_path / "mf_pipe",
                      extra=["--prune_type", "mask_freeze"])
    module2.make_scst_pipelined_step()
