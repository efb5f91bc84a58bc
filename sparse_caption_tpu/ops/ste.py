"""Straight-through estimators for supermask sampling.

Semantics parity with the reference autograd Functions
(``sparse_caption/pruning/sampler.py:10-66``):

* ``bernoulli_sample_sigmoid(logits, key)``: forward draws
  ``Bernoulli(sigmoid(logits))``; backward is identity **through the
  sigmoid** by default (grad flows into sigmoid'), or bypasses the sigmoid
  entirely when ``bypass_sigmoid_grad`` (reference ``BernoulliSampleSigmoid``)
* ``rounding_sigmoid(logits)``: forward is ``round(sigmoid(logits))``; same
  two backward flavors

TPU note: these are elementwise ops over mask tensors; XLA fuses the
sigmoid+compare+select chain into the consuming dot's epilogue/prologue.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


@jax.custom_vjp
def _ste_identity(x, y):
    """Forward returns y (the sampled/rounded value); backward passes grad to x."""
    return y


def _ste_identity_fwd(x, y):
    return y, None


def _ste_identity_bwd(_, g):
    return g, None


_ste_identity.defvjp(_ste_identity_fwd, _ste_identity_bwd)


def bernoulli_sample(probs, key):
    """Bernoulli draw with identity straight-through gradient w.r.t. probs."""
    sample = jax.random.bernoulli(key, jax.lax.stop_gradient(probs)).astype(probs.dtype)
    return _ste_identity(probs, sample)


def round_ste(probs):
    """round() with identity straight-through gradient w.r.t. probs."""
    return _ste_identity(probs, jnp.round(jax.lax.stop_gradient(probs)))


def bernoulli_sample_sigmoid(logits, key, bypass_sigmoid_grad: bool = False):
    """Stochastic mask sample from raw logits (reference sampler.py:42-53)."""
    if bypass_sigmoid_grad:
        sample = jax.random.bernoulli(key, jax.nn.sigmoid(jax.lax.stop_gradient(logits))).astype(logits.dtype)
        return _ste_identity(logits, sample)
    return bernoulli_sample(jax.nn.sigmoid(logits), key)


def rounding_sigmoid(logits, bypass_sigmoid_grad: bool = False):
    """Deterministic mask binarization from raw logits (reference sampler.py:56-66)."""
    if bypass_sigmoid_grad:
        rounded = jnp.round(jax.nn.sigmoid(jax.lax.stop_gradient(logits)))
        return _ste_identity(logits, rounded)
    return round_ste(jax.nn.sigmoid(logits))
