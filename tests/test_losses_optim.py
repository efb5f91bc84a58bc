"""Loss + schedule unit tests (parity targets: reference utils/losses.py,
utils/optim.py)."""

import jax.numpy as jnp
import numpy as np
import torch

from sparse_caption_tpu.config import Config
from sparse_caption_tpu.engine.losses import label_smoothing_loss, language_model_loss, reward_loss
from sparse_caption_tpu.engine.optim import make_schedule


def _ref_lm_loss(logprobs, targets, masks):
    inp = torch.tensor(np.asarray(logprobs))
    tgt = torch.tensor(np.asarray(targets))[:, : inp.size(1)]
    m = torch.tensor(np.asarray(masks)).float()[:, : inp.size(1)]
    out = -inp.gather(2, tgt.unsqueeze(2).long()).squeeze(2) * m
    return float(out.sum() / m.sum())


def test_language_model_loss_matches_torch_reference():
    rng = np.random.default_rng(0)
    lp = np.log(rng.dirichlet(np.ones(7), size=(3, 4)))
    tgt = rng.integers(0, 7, size=(3, 4))
    mask = (rng.random((3, 4)) > 0.3).astype(np.float32)
    mask[:, 0] = 1
    ours = float(language_model_loss(jnp.asarray(lp), jnp.asarray(tgt), jnp.asarray(mask)))
    np.testing.assert_allclose(ours, _ref_lm_loss(lp, tgt, mask), rtol=1e-5)


def test_label_smoothing_matches_torch_kldiv():
    rng = np.random.default_rng(1)
    lp = np.log(rng.dirichlet(np.ones(6), size=(2, 3))).astype(np.float32)
    tgt = rng.integers(0, 6, size=(2, 3))
    mask = np.ones((2, 3), np.float32)
    smoothing = 0.1
    ours = float(label_smoothing_loss(jnp.asarray(lp), jnp.asarray(tgt), jnp.asarray(mask), smoothing))
    # torch reference (losses.py:45-77)
    inp = torch.tensor(lp).reshape(-1, 6)
    t = torch.tensor(tgt).reshape(-1)
    m = torch.tensor(mask).reshape(-1)
    true_dist = torch.full_like(inp, smoothing / (6 - 1))
    true_dist.scatter_(1, t.unsqueeze(1), 1.0 - smoothing)
    kl = torch.nn.KLDivLoss(reduction="none")(inp, true_dist)
    ref = float((kl.sum(1) * m).sum() / m.sum())
    np.testing.assert_allclose(ours, ref, rtol=1e-5)


def test_reward_loss_sign_and_masking():
    lp = jnp.asarray([[-1.0, -2.0, -3.0]])
    mask = jnp.asarray([[1.0, 1.0, 0.0]])
    reward = jnp.asarray([2.0])
    # -sum(lp * r * m)/sum(m) = -(-1*2 + -2*2)/2 = 3
    np.testing.assert_allclose(float(reward_loss(lp, mask, reward)), 3.0, rtol=1e-6)


def test_noam_schedule():
    cfg = Config(lr_scheduler="noam", d_model=512, noamopt_factor=1.0, noamopt_warmup=4000)
    sched = make_schedule(cfg)
    # warmup region linear, peak at warmup step
    s1 = float(sched(jnp.asarray(0)))
    s_peak = float(sched(jnp.asarray(3999)))
    s_late = float(sched(jnp.asarray(39999)))
    assert s1 < s_peak and s_late < s_peak
    np.testing.assert_allclose(s_peak, (512 ** -0.5) * (4000 ** -0.5), rtol=1e-4)


def test_cosine_schedule_endpoints():
    cfg = Config(lr_scheduler="cosine", learning_rate=0.01, learning_rate_min=1e-5, max_train_step=1000)
    sched = make_schedule(cfg)
    np.testing.assert_allclose(float(sched(jnp.asarray(0))), 0.01, rtol=1e-5)
    np.testing.assert_allclose(float(sched(jnp.asarray(1000))), 1e-5, rtol=1e-3)


def test_step_schedule_epoch_decay():
    cfg = Config(lr_scheduler="step", learning_rate=0.1, learning_rate_decay_start=0,
                 learning_rate_decay_every=2, learning_rate_decay_rate=0.5)
    sched = make_schedule(cfg, steps_per_epoch=10)
    np.testing.assert_allclose(float(sched(jnp.asarray(5))), 0.1)  # epoch 0
    np.testing.assert_allclose(float(sched(jnp.asarray(25))), 0.05)  # epoch 2
    np.testing.assert_allclose(float(sched(jnp.asarray(45))), 0.025)  # epoch 4
