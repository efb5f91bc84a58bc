"""Optimizers + LR schedules (optax rebuild of reference
``sparse_caption/utils/optim.py:15-191``).

Schedules (step-indexed from 1, matching the reference RateOpt counters):
* noam: ``factor * d_model^-0.5 * min(step^-0.5, step * warmup^-1.5)``
* step: epoch-based decay (epoch derived from steps_per_epoch)
* cosine: step-based anneal from lr_init to lr_min over max_train_step

Weight path: grad value-clip (default 0.1, reference optim.py:187-191) ->
optimizer with scheduled LR.  Mask path (supermask/SNIP): constant-LR Adam
with huge LR (default 100) and eps 1e-2, never touched by the schedule —
the optax twin of the reference's tagged param group
(``train_n_prune_transformer.py:69-82``, ``optim.py:24-27``).  For
non-trainable mask types the mask transform is ``set_to_zero``.
"""

from __future__ import annotations

import math
from typing import Callable

import optax

ALL_SCHEDULERS = ("noam", "step", "cosine")
ALL_OPTIMIZERS = ("rmsprop", "adagrad", "sgd", "sgdm", "sgdmom", "adam")


def make_schedule(config, steps_per_epoch: int = 1) -> Callable:
    import jax.numpy as jnp

    name = str(config.get("lr_scheduler", "noam")).lower()
    if name == "noam":
        d_model = int(config.get("d_model", 512))
        factor = float(config.get("noamopt_factor", 1.0))
        warmup = int(config.get("noamopt_warmup", 10000))

        def sched(step):
            s = jnp.maximum(step + 1, 1).astype(jnp.float32)
            return factor * (d_model ** -0.5) * jnp.minimum(s ** -0.5, s * (warmup ** -1.5))

        return sched
    if name == "step":
        lr0 = float(config.get("learning_rate", 5e-4))
        decay_start = int(config.get("learning_rate_decay_start", -1))
        decay_every = int(config.get("learning_rate_decay_every", 3))
        decay_rate = float(config.get("learning_rate_decay_rate", 0.8))
        # reference StepLROpt asserts at construction (optim.py:60-66);
        # inside jit a zero decay_every would be a silent traced div-by-zero
        assert decay_every > 0, f"learning_rate_decay_every must be > 0, got {decay_every}"
        assert 0.0 < decay_rate <= 1.0, f"learning_rate_decay_rate must be in (0, 1], got {decay_rate}"

        def sched(step):
            epoch = step // max(steps_per_epoch, 1)
            frac = jnp.where(epoch > decay_start, (epoch - decay_start) // decay_every, 0)
            use_decay = jnp.logical_and(decay_start >= 0, epoch > decay_start)
            return jnp.where(use_decay, lr0 * (decay_rate ** frac.astype(jnp.float32)), lr0)

        return sched
    if name == "cosine":
        lr0 = float(config.get("learning_rate", 0.01))
        lr_min = float(config.get("learning_rate_min", 1e-5))
        max_step = int(config.get("max_train_step", 100000))

        def sched(step):
            frac = jnp.minimum(step.astype(jnp.float32) / max_step, 1.0) if hasattr(step, "astype") else min(
                step / max_step, 1.0
            )
            cos = 1.0 + jnp.cos(frac * math.pi)
            return (lr0 - lr_min) * (cos / 2.0) + lr_min

        return sched
    raise ValueError(f"bad lr_scheduler `{name}`; options: {ALL_SCHEDULERS}")


def build_weight_optimizer(config, schedule: Callable) -> optax.GradientTransformation:
    name = str(config.get("optim", "adam")).lower()
    grad_clip = float(config.get("grad_clip", 0.1))
    wd = float(config.get("weight_decay", 0.0))
    alpha = float(config.get("optim_alpha", 0.9))
    beta = float(config.get("optim_beta", 0.999))
    eps = float(config.get("optim_epsilon", 1e-8))
    if str(config.get("lr_scheduler", "noam")).lower() == "noam":
        # reference hard-codes Adam(0.9, 0.98, 1e-9) with NO weight decay
        # under noam (optim.py:116-125)
        alpha, beta, eps = 0.9, 0.98, 1e-9
        name = "adam"
        wd = 0.0

    if name == "adam":
        core = optax.adam(schedule, b1=alpha, b2=beta, eps=eps)
    elif name == "rmsprop":
        core = optax.rmsprop(schedule, decay=alpha, eps=eps)
    elif name == "adagrad":
        core = optax.adagrad(schedule)
    elif name == "sgd":
        core = optax.sgd(schedule)
    elif name == "sgdm":
        core = optax.sgd(schedule, momentum=alpha)
    elif name == "sgdmom":
        core = optax.sgd(schedule, momentum=alpha, nesterov=True)
    else:
        raise ValueError(f"bad optim `{name}`; options: {ALL_OPTIMIZERS}")
    chain = [optax.clip(grad_clip)] if grad_clip and grad_clip > 0 else []
    if wd:
        # torch-style COUPLED L2 (g + wd*w fed into the optimizer) for
        # EVERY optimizer, exactly as the reference passes weight_decay to
        # each torch.optim class (optim.py:94-118) — not AdamW's decoupled
        # decay, and not adam-only
        chain.append(optax.add_decayed_weights(wd))
    return optax.chain(*chain, core)


def build_mask_optimizer(config, trainable: bool) -> optax.GradientTransformation:
    """Constant-LR Adam for supermask/SNIP logits; no-op otherwise."""
    if not trainable:
        return optax.set_to_zero()
    lr = float(config.get("prune_supermask_lr", 100.0))
    eps = float(config.get("prune_mask_adam_eps", 1e-2))
    return optax.adam(lr, b1=0.9, b2=0.999, eps=eps)
