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


def test_weight_decay_matches_torch_coupled_l2():
    """Reference passes weight_decay to every torch.optim class — coupled
    L2 (g + wd*w fed to the optimizer), NOT AdamW's decoupled decay.
    Compare one sgd and one adam step against torch."""
    from sparse_caption_tpu.engine.optim import build_weight_optimizer

    w0 = np.asarray([[0.5, -1.0], [2.0, 0.25]], np.float32)
    g0 = np.asarray([[0.1, 0.2], [-0.3, 0.4]], np.float32)
    for optim_name in ("sgd", "adam"):
        cfg = Config(optim=optim_name, lr_scheduler="step", learning_rate=0.1,
                     learning_rate_decay_start=-1, learning_rate_decay_every=3,
                     learning_rate_decay_rate=0.8, weight_decay=0.01, grad_clip=0.0,
                     optim_alpha=0.9, optim_beta=0.999, optim_epsilon=1e-8)
        opt = build_weight_optimizer(cfg, lambda step: 0.1)
        params = {"w": jnp.asarray(w0)}
        state = opt.init(params)
        updates, _ = opt.update({"w": jnp.asarray(g0)}, state, params)
        ours = np.asarray(params["w"] + updates["w"])

        tw = torch.nn.Parameter(torch.tensor(w0))
        topt = (torch.optim.SGD([tw], lr=0.1, weight_decay=0.01) if optim_name == "sgd"
                else torch.optim.Adam([tw], lr=0.1, betas=(0.9, 0.999), eps=1e-8,
                                      weight_decay=0.01))
        tw.grad = torch.tensor(g0)
        topt.step()
        np.testing.assert_allclose(ours, tw.detach().numpy(), rtol=1e-5, atol=1e-6)


def test_step_schedule_rejects_zero_decay_every():
    import pytest

    cfg = Config(lr_scheduler="step", learning_rate=0.1, learning_rate_decay_start=0,
                 learning_rate_decay_every=0, learning_rate_decay_rate=0.5)
    with pytest.raises(AssertionError):
        make_schedule(cfg, steps_per_epoch=10)
