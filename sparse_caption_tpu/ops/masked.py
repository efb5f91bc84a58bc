"""Masked (prunable) flax layers.

The reference subclasses every layer type (MaskedLinear / MaskedEmbedding /
MaskedLSTMCell, ``sparse_caption/pruning/masked_layer.py:118-255``) and
discovers masks by a ``_pruning_mask`` name-suffix scan.  Here masking is a
single reusable transformation: prunable layers own a ``mask`` parameter in
the dedicated ``"masks"`` flax collection, so the mask pytree is structurally
separate from ``"params"`` — no name scans, and the optimizer / pruning code
partitions by collection.

Forward semantics (parity with ``masked_layer.py:84-110``):
  * supermask: train -> ``w * Bernoulli(sigmoid(m))`` (fresh sample per
    forward per layer, via the ``"mask"`` rng stream); eval ->
    ``w * round(sigmoid(m))`` — both straight-through
  * every other mask type: ``w * m`` with ``m`` a 0/1 tensor

The mask multiply is elementwise ahead of the dot; XLA fuses it into the
matmul's operand read, so no separate Pallas kernel is needed: hand-written
Pallas variants (fused supermask matmul, fused generator top-k) were A/B'd
against XLA's fusions in rounds 2-3 and LOST — see CLAUDE.md perf notes —
so the deliberate design is to keep masking as a plain elementwise op and
let XLA schedule it.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sparse_caption_tpu.ops.ste import bernoulli_sample_sigmoid, rounding_sigmoid
from sparse_caption_tpu.pruning import SUPER_MASKS, VALID_MASKS

MASKS_COLLECTION = "masks"
MASK_RNG = "mask"


@dataclasses.dataclass(frozen=True)
class MaskConfig:
    """Per-model pruning configuration threaded into prunable layers."""

    mask_type: str
    mask_init_value: float = 1.0
    bypass_sigmoid_grad: bool = False

    def __post_init__(self):
        if self.mask_type not in VALID_MASKS:
            raise ValueError(f"mask_type must be one of {VALID_MASKS}, got `{self.mask_type}`")

    @property
    def is_supermask(self) -> bool:
        return self.mask_type in SUPER_MASKS


def sample_mask(mask, cfg: MaskConfig, train: bool, rng_key):
    """Mask tensor -> multiplicative 0/1 sample (straight-through)."""
    if cfg.is_supermask:
        if train:
            return bernoulli_sample_sigmoid(mask, rng_key, cfg.bypass_sigmoid_grad)
        return rounding_sigmoid(mask, cfg.bypass_sigmoid_grad)
    return mask


class _Prunable(nn.Module):
    """Shared mask-param plumbing for prunable layers."""

    def _masked(self, kernel, cfg: Optional[MaskConfig], train: bool):
        if cfg is None:
            return kernel
        init_value = cfg.mask_init_value if cfg.is_supermask else 1.0
        mask = self.variable(
            MASKS_COLLECTION, "mask", lambda: jnp.full(kernel.shape, init_value, dtype=jnp.float32)
        ).value
        rng = self.make_rng(MASK_RNG) if (cfg.is_supermask and train) else None
        # cast back to the weight dtype: masks live in f32 (their lr=100
        # updates would quantize away in bf16), and the f32 0/1 sample would
        # otherwise promote a bf16 kernel — and every downstream matmul —
        # to f32. The multiply-by-0/1 is exact, so the cast is too.
        return (kernel * sample_mask(mask, cfg, train, rng)).astype(kernel.dtype)


class MaskedDense(_Prunable):
    """Dense layer with optional pruning mask on the kernel.

    Equivalent capability to reference ``MaskedLinear``
    (masked_layer.py:118-135); with ``mask_cfg=None`` it is a plain Dense.
    """

    features: int
    use_bias: bool = True
    mask_cfg: Optional[MaskConfig] = None
    kernel_init: Callable = nn.initializers.xavier_uniform()
    bias_init: Callable = nn.initializers.zeros_init()
    dtype: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        kernel = self.param("kernel", self.kernel_init, (x.shape[-1], self.features))
        # NOTE: a Pallas fused supermask matmul (Bernoulli drawn in-kernel)
        # was built and A/B'd in round 2 and LOST to XLA's fusion at paper
        # scale (80.9 vs 74.1 ms/step); deleted in round 3 — see CLAUDE.md
        # perf notes for the full writeup.
        kernel = self._masked(kernel, self.mask_cfg, train)
        y = jnp.dot(x, kernel.astype(x.dtype) if self.dtype is None else kernel.astype(self.dtype))
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class MaskedEmbed(_Prunable):
    """Embedding with optional pruning mask (reference MaskedEmbedding,
    masked_layer.py:139-175)."""

    num_embeddings: int
    features: int
    mask_cfg: Optional[MaskConfig] = None
    embedding_init: Callable = nn.initializers.xavier_uniform()

    @nn.compact
    def __call__(self, ids, train: bool = False):
        table = self.param("embedding", self.embedding_init, (self.num_embeddings, self.features))
        table = self._masked(table, self.mask_cfg, train)
        return jnp.take(table, ids, axis=0)
