"""Pallas TPU kernels for the incremental-decode hot path.

Motivation (measured, see STATUS.md): the beam decode is op-overhead-bound
— ~1.07 ms per layer per step at paper scale for ~3.5 MB of weight traffic
and trivial FLOPs (~10x off the bandwidth roofline), because each decode
step lowers to dozens of small HLOs per layer.  Fusing a whole block into
one Pallas kernel removes that per-op overhead.

``ffn_block_step``: pre-norm FFN with residual, one kernel:
    y = x + W2 @ relu(W1 @ refnorm(x))
(RefLayerNorm semantics: std (Bessel) + eps — reference
transformer.py:329-341.)  All operands VMEM-resident at decode sizes
(x (B, D), W1 (D, FF), W2 (FF, D): ~4.5 MB bf16 at D=512, FF=2048).

Eval-path only (no dropout), used when the model runs unmasked on TPU;
exactness vs the XLA path is tested in interpret... TPU PRNG isn't used
here so the kernel also runs under ``interpret=True`` on CPU for tests.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _refnorm(x, scale, bias, d, eps=1e-6):
    mean = jnp.mean(x, axis=-1, keepdims=True)
    var = jnp.sum(jnp.square(x - mean), axis=-1, keepdims=True) / max(d - 1, 1)
    return scale * (x - mean) / (jnp.sqrt(var) + eps) + bias


def _ffn_kernel(x_ref, ls_ref, lb_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *, d):
    x = x_ref[:].astype(jnp.float32)
    h = _refnorm(x, ls_ref[:].astype(jnp.float32), lb_ref[:].astype(jnp.float32), d)
    h = jnp.dot(h.astype(x_ref.dtype), w1_ref[:], preferred_element_type=jnp.float32)
    h = jnp.maximum(h + b1_ref[:].astype(jnp.float32), 0.0)
    y = jnp.dot(h.astype(x_ref.dtype), w2_ref[:], preferred_element_type=jnp.float32)
    o_ref[:] = (x + y + b2_ref[:].astype(jnp.float32)).astype(o_ref.dtype)


def ffn_block_step(x, ln_scale, ln_bias, w1, b1, w2, b2):
    """x: (B, D). Returns x + FFN(refnorm(x)) in one kernel."""
    b, d = x.shape
    kernel = functools.partial(_ffn_kernel, d=d)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, d), x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 7,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interpret(),
    )(x, ln_scale.reshape(1, -1), ln_bias.reshape(1, -1), w1, b1.reshape(1, -1), w2, b2.reshape(1, -1))
