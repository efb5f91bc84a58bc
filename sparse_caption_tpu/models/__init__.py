"""Model registry (parity: reference ``sparse_caption/models/__init__.py:16-55``).

Registered names mirror the reference:
``transformer``, ``relation_transformer``, ``up_down_lstm`` and their
``*_prune`` variants (same architectures constructed with a MaskConfig).

Model API (TPU-first, replaces the reference's ``model(**data, mode=...)``
module-state protocol, ``models/caption_model.py:24-28``):

* ``model.apply(vars, batch..., train=..., rngs=...)``                 -> XE logprobs
* ``model.apply(vars, ..., method="encode")``                          -> memory pytree
* ``model.apply(vars, memory, method="init_cache")``                   -> decode cache pytree
* ``model.apply(vars, it, cache, t, memory, method="decode_step")``    -> (logprobs, cache)

``memory`` and ``cache`` are plain pytrees whose leading axis is batch, so
generation loops (greedy / sample / beam) reorder them with gathers —
model-agnostic, jit-friendly.
"""

from sparse_caption_tpu.registry import Registry

MODEL_REGISTRY: Registry = Registry("model")
register_model = MODEL_REGISTRY.register


def get_model(name: str):
    MODEL_REGISTRY.import_all("sparse_caption_tpu.models")
    return MODEL_REGISTRY.get(name.lower())
