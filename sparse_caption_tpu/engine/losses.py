"""Training criteria (parity: reference ``sparse_caption/utils/losses.py:10-77``).

All take log-probabilities and normalize by the mask sum, matching the
reference exactly (including the KL constant term in label smoothing, which
torch's KLDivLoss carries)."""

from __future__ import annotations

import jax.numpy as jnp


def language_model_loss(logprobs, targets, masks):
    """Masked NLL. logprobs (N, T, V); targets/masks (N, T') with T' >= T
    (truncated to T, reference losses.py:36-42)."""
    t = logprobs.shape[1]
    targets = targets[:, :t]
    masks = masks[:, :t].astype(logprobs.dtype)
    nll = -jnp.take_along_axis(logprobs, targets[..., None].astype(jnp.int32), axis=2)[..., 0]
    return jnp.sum(nll * masks) / jnp.maximum(jnp.sum(masks), 1.0)


def label_smoothing_loss(logprobs, targets, masks, smoothing: float = 0.1):
    """Masked KL(true_dist || p) with fill smoothing/(V-1)
    (reference losses.py:45-77)."""
    t = logprobs.shape[1]
    v = logprobs.shape[-1]
    targets = targets[:, :t].astype(jnp.int32)
    masks = masks[:, :t].astype(logprobs.dtype)
    confidence = 1.0 - smoothing
    fill = smoothing / (v - 1)
    one_hot = jnp.zeros_like(logprobs) + fill
    one_hot = jnp.put_along_axis(one_hot, targets[..., None], confidence, axis=2, inplace=False)
    # torch KLDivLoss: sum_v t * (log t - logp); 0*log0 := 0
    log_t = jnp.where(one_hot > 0, jnp.log(jnp.maximum(one_hot, 1e-30)), 0.0)
    kl = jnp.sum(one_hot * (log_t - logprobs), axis=-1)
    return jnp.sum(kl * masks) / jnp.maximum(jnp.sum(masks), 1.0)


def reward_loss(sample_logprobs, masks, rewards):
    """REINFORCE: mean over mask of -logp * reward (reference losses.py:10-29).

    sample_logprobs (N, T) chosen-token logprobs; rewards (N,) broadcast
    over time."""
    masks = masks.astype(sample_logprobs.dtype)
    out = -sample_logprobs * (masks * rewards[:, None])
    return jnp.sum(out) / jnp.maximum(jnp.sum(masks), 1.0)
