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
