"""sparse_caption_tpu — a TPU-native (JAX/XLA/Pallas/pjit) image-captioning framework.

A ground-up rebuild of the capabilities of jiahuei/sparse-image-captioning
(End-to-End Supermask Pruning, Pattern Recognition 2021): Up-Down LSTM,
Transformer, Object Relation Transformer / ACORT captioning models over
bottom-up region features, six families of unstructured pruning (supermask,
one-shot / gradual magnitude, SNIP, lottery, mask-freeze), SCST fine-tuning
with CIDEr-D/BLEU rewards, and the full COCO caption metric suite.

Design stance (not a port):
  * functional flax.linen models; weights and pruning masks are ordinary
    pytree leaves partitioned by path (no name-suffix scans over modules)
  * decoding is pure: explicit KV-cache pytrees carried through
    ``lax.scan`` / ``lax.while_loop``; beam reorder is a gather
  * mask sampling is a ``jax.custom_vjp`` straight-through estimator fused
    into the dot by XLA (Pallas kernels in ``sparse_caption_tpu.ops``)
  * scale-out is ``jax.sharding.Mesh`` + ``pjit`` data/tensor parallelism
    (the reference is single-GPU; parallelism here is new, TPU-first)
"""

__version__ = "0.1.0"
