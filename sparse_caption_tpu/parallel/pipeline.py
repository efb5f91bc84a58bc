"""Pipeline parallelism (GPipe-style) over the decoder layer stack.

New TPU-native capability (the reference is single-GPU — SURVEY §2.11);
completes the mesh story alongside data parallelism, Megatron tensor
parallelism, and ZeRO-1 optimizer sharding (``parallel/mesh.py``):

* the decoder's homogeneous layers are **stacked** along a leading layer
  axis and sharded over a 1-D ``("pipe",)`` mesh axis — each stage holds
  ``L / n_stages`` contiguous layers;
* the batch splits into microbatches that flow through the stages in the
  classic GPipe schedule (Huang et al. 2019): at tick ``t`` stage ``s``
  processes microbatch ``t - s``, activations hop to the next stage with
  one ``lax.ppermute`` per tick (a point-to-point ICI neighbor transfer,
  NOT an all-to-all), and the last stage accumulates outputs;
* everything is expressed with ``shard_map`` + collectives — no
  hand-written sends/receives, and XLA overlaps the ppermute with the
  next tick's compute.

Scope: eval-mode (deterministic) forward of the *dense* decoder stack —
the demonstration target is the sharding/communication pattern, pinned
numerically equal to the sequential ``Transformer._decode_full``
(tests/test_parallel.py). Bubble fraction is the usual
``(P-1) / (M+P-1)``; choose ``n_micro >> n_stages`` in real use.

Why layers-as-scan works here: all decoder layers of every model family
(transformer / ORT / ACORT without ``share_layer``) are instances of one
``DecoderLayer`` module, so their param pytrees stack leaf-wise and a
single ``lax.scan`` applies a stage's layer slice in order.

Sequence parallelism and expert parallelism are deliberately absent
framework-wide: sequences are ≤30 tokens / 36 regions (nothing to shard)
and no model family is MoE (SURVEY §5.7's N/A-by-design statement).
"""

from __future__ import annotations

from typing import Any, Dict, Sequence

import jax
import jax.numpy as jnp
import numpy as np
from jax import lax
from jax.sharding import Mesh, PartitionSpec as P

try:  # jax >= 0.6 exports it at the top level
    from jax import shard_map as _shard_map
except ImportError:  # pragma: no cover - older jax
    from jax.experimental.shard_map import shard_map as _shard_map

PIPE_AXIS = "pipe"


def make_pipe_mesh(n_stages: int, devices: Sequence[Any] = None) -> Mesh:
    """1-D mesh over the first ``n_stages`` devices, axis ``"pipe"``."""
    devices = list(devices) if devices is not None else jax.devices()
    assert len(devices) >= n_stages, (
        f"pipe mesh needs {n_stages} devices, have {len(devices)}")
    return Mesh(np.array(devices[:n_stages]), (PIPE_AXIS,))


def decoder_layer_keys(params: Dict[str, Any]):
    keys = [k for k in params if k.startswith("decoder_layers_")]
    return sorted(keys, key=lambda s: int(s.rsplit("_", 1)[1]))


def stack_decoder_layers(params: Dict[str, Any]):
    """Stack the per-layer param pytrees along a new leading layer axis."""
    keys = decoder_layer_keys(params)
    assert keys, "no decoder_layers_* params found"
    return jax.tree.map(lambda *xs: jnp.stack(xs), *[params[k] for k in keys])


def _layer_module(model):
    # mirror of Transformer._setup_decoder's DecoderLayer construction
    from sparse_caption_tpu.models.transformer import DecoderLayer

    return DecoderLayer(model.d_model, model.num_heads, model.dim_feedforward,
                        model.dropout_rate, model.share_att_decoder, model.mask_cfg)


def pipelined_decoder_stack(model, params: Dict[str, Any], x, memory, src_mask,
                            tgt_mask, mesh: Mesh, n_micro: int, stacked=None):
    """Run the decoder layer stack pipeline-parallel over ``mesh``.

    x: (B, T, D) embedded+position-encoded decoder input; memory: (B, S, D);
    src_mask: (B, 1, 1, S); tgt_mask: (B, 1, T, T). Returns the stack
    output (B, T, D) — pre-``decoder_norm``, like the sequential loop in
    ``Transformer._decode_full``.
    """
    assert getattr(model, "share_layer_decoder", None) is None, (
        "pipeline parallelism needs one param set per layer (no share_layer)")
    assert getattr(model, "mask_cfg", None) is None, (
        "pipelined stack demo covers dense models (masks collection not plumbed)")
    n_stages = mesh.shape[PIPE_AXIS]
    keys = decoder_layer_keys(params)
    n_layers = len(keys)
    assert n_layers % n_stages == 0, (
        f"{n_layers} decoder layers do not divide into {n_stages} stages")
    b = x.shape[0]
    assert b % n_micro == 0, f"batch {b} not divisible by n_micro={n_micro}"
    mb = b // n_micro

    if stacked is None:
        stacked = stack_decoder_layers(params)

    def split(a):
        a = jnp.broadcast_to(a, (b,) + a.shape[1:])
        return a.reshape((n_micro, mb) + a.shape[1:])

    xs, mems, smasks, tmasks = (split(a) for a in (x, memory, src_mask, tgt_mask))
    f = _cached_stage_jit(model, mesh, jax.tree.structure(stacked))
    y = f(stacked, xs, mems, smasks, tmasks)
    return y.reshape((b,) + y.shape[2:])


# one jitted shard_map per (layer config, mesh, param treedef): building a
# fresh closure + jax.jit per CALL retraced and recompiled the whole
# pipeline on every direct invocation (minutes per compile through the
# relay) — only the engine's outer @jax.jit hid it on the train path
_PIPE_JIT_CACHE: Dict[Any, Any] = {}


def _cached_stage_jit(model, mesh: Mesh, treedef):
    cfg = (model.d_model, model.num_heads, model.dim_feedforward,
           model.dropout_rate, model.share_att_decoder)
    key = (cfg, mesh, treedef)
    if key in _PIPE_JIT_CACHE:
        return _PIPE_JIT_CACHE[key]
    layer_mod = _layer_module(model)
    n_stages = mesh.shape[PIPE_AXIS]

    def stage_fn(lp, xs, mems, smasks, tmasks):
        idx = lax.axis_index(PIPE_AXIS)
        m_total = xs.shape[0]

        def apply_stack(h, mem, sm, tm):
            def body(h, p):
                return layer_mod.apply({"params": p}, h, mem, sm, tm, train=False), None

            h, _ = lax.scan(body, h, lp)
            return h

        out = jnp.zeros_like(xs)
        # warmup/drain ticks run the stack on a discarded input; seed the
        # carry with REAL data (microbatch 0), not zeros — a constant input
        # makes LayerNorm's std exactly 0, whose sqrt-at-0 derivative is
        # inf, and the zero cotangent times inf poisons the whole backward
        # with NaNs (forward-only eval never sees this)
        carry = lax.dynamic_index_in_dim(xs, 0, 0, keepdims=False)
        # GPipe schedule: tick t, stage s works on microbatch m = t - s
        for t in range(m_total + n_stages - 1):
            m = jnp.clip(t - idx, 0, m_total - 1)

            def take(a):
                return lax.dynamic_index_in_dim(a, m, 0, keepdims=False)

            x_in = jnp.where(idx == 0, take(xs), carry)
            y = apply_stack(x_in, take(mems), take(smasks), take(tmasks))
            active = jnp.logical_and(t - idx >= 0, t - idx <= m_total - 1)
            write = jnp.logical_and(active, idx == n_stages - 1)
            out = jnp.where(write, lax.dynamic_update_index_in_dim(out, y, m, 0), out)
            if n_stages > 1:
                # neighbor hop stage s -> s+1 (non-receivers get zeros)
                carry = lax.ppermute(y, PIPE_AXIS,
                                     [(i, i + 1) for i in range(n_stages - 1)])
        # only the last stage holds real outputs; psum replicates them
        return lax.psum(jnp.where(idx == n_stages - 1, out, jnp.zeros_like(out)),
                        PIPE_AXIS)

    specs_p = jax.tree.unflatten(treedef, [P(PIPE_AXIS)] * treedef.num_leaves)
    f = jax.jit(_shard_map(stage_fn, mesh=mesh,
                           in_specs=(specs_p, P(), P(), P(), P()), out_specs=P()))
    _PIPE_JIT_CACHE[key] = f
    return f


def pipelined_decode_full(model, variables: Dict[str, Any], tgt, memory_pytree,
                          mesh: Mesh, n_micro: int):
    """Pipeline-parallel equivalent of the eval-mode
    ``Transformer._decode_full`` (embed + stack + final norm): tgt (B, T)
    tokens → decoder output (B, T, D). Numerically equal to the sequential
    forward (pinned by tests)."""
    from sparse_caption_tpu.models.transformer import subsequent_mask

    memory, mem_mask = memory_pytree["memory"], memory_pytree["mask"]
    t = tgt.shape[1]
    tgt_mask = (tgt != model.pad_id)[:, None, None, :] & subsequent_mask(t)
    src_mask = mem_mask[:, None, None, :]
    x = model.apply(variables, tgt,
                    method=lambda m, tg: m.pos_enc(m.tgt_embed(tg, False), train=False))
    y = pipelined_decoder_stack(model, variables["params"], x, memory,
                                src_mask, tgt_mask, mesh, n_micro)
    return model.apply(variables, y, method=lambda m, h: m.decoder_norm(h))


def pipeline_xe_loss_and_grads(model, variables: Dict[str, Any], seqs,
                               memory_pytree, mesh: Mesh, n_micro: int):
    """XE teacher-forced loss + FULL param-tree gradients with the decoder
    stack executed pipeline-parallel (GPipe backward: XLA differentiates
    the tick loop, so activation grads hop the stages in reverse with the
    transposed ``ppermute`` — still zero hand-written collectives).

    ``seqs``: (N, T) with BOS; memory rows repeat to N like
    ``Transformer.decode_teacher_forced``. Deterministic (no dropout):
    the demonstration target is the sharded compute/communication
    structure, pinned by gradient equality vs the sequential backward
    (tests/test_parallel.py). Returns ``(loss, grads)`` where the
    stage-sharded layer grads are unstacked back into the params tree, so
    any optax optimizer applies unchanged."""
    import jax.numpy as _jnp

    from sparse_caption_tpu.engine import losses as losses_mod
    from sparse_caption_tpu.models.transformer import repeat_to_batch, subsequent_mask

    params = variables["params"]
    tgt = seqs[:, :-1]
    memory, mem_mask = repeat_to_batch(memory_pytree["memory"], memory_pytree["mask"],
                                       tgt.shape[0])
    t = tgt.shape[1]
    tgt_mask = (tgt != model.pad_id)[:, None, None, :] & subsequent_mask(t)
    src_mask = mem_mask[:, None, None, :]
    seq_mask = (seqs[:, 1:] != model.pad_id).astype(_jnp.float32)
    layer_keys = decoder_layer_keys(params)
    stacked = stack_decoder_layers(params)

    def loss_fn(p, stacked_layers):
        x = model.apply({"params": p}, tgt,
                        method=lambda m, tg: m.pos_enc(m.tgt_embed(tg, False), train=False))
        y = pipelined_decoder_stack(model, p, x, memory, src_mask, tgt_mask,
                                    mesh, n_micro, stacked=stacked_layers)
        lp = model.apply({"params": p}, y,
                         method=lambda m, h: m.generator(m.decoder_norm(h), False))
        return losses_mod.language_model_loss(lp, seqs[:, 1:], seq_mask)

    loss, (g_p, g_stacked) = jax.value_and_grad(loss_fn, argnums=(0, 1))(params, stacked)
    # the pipelined path reads the STACKED copy, so g_p's decoder_layers_*
    # entries are zeros — replace them with the unstacked per-stage grads
    grads = {**g_p}
    for i, k in enumerate(layer_keys):
        grads[k] = jax.tree.map(lambda a, _i=i: a[_i], g_stacked)
    return loss, grads


def pipeline_xe_train_loss_and_grads(model, params: Dict[str, Any], inputs: Dict[str, Any],
                                     seq_masks, criterion, mesh: Mesh, n_micro: int):
    """Full XE training loss + grads with the decoder stack pipelined —
    the ``--pipeline_stages`` engine path (vs :func:`pipeline_xe_loss_and_grads`,
    which treats the encoder output as a constant for the unit tests).

    The encoder runs INSIDE ``loss_fn`` (replicated on every stage), so
    encoder/embedding/generator gradients flow; the decoder-layer grads
    come back from the stage-sharded stacked copy and are unstacked into
    the params tree, so the optax update applies unchanged.  Deterministic
    (no dropout) — documented in ``opts.py --pipeline_stages``."""
    from sparse_caption_tpu.models.transformer import subsequent_mask

    seqs = inputs["seqs"]
    enc_inputs = {k: v for k, v in inputs.items() if k != "seqs"}
    layer_keys = decoder_layer_keys(params)
    stacked = stack_decoder_layers(params)

    def loss_fn(p, stacked_layers):
        variables = {"params": p}
        memory_pytree = model.apply(variables, **enc_inputs, train=False, method="encode")
        from sparse_caption_tpu.models.transformer import repeat_to_batch

        tgt = seqs[:, :-1]
        memory, mem_mask = repeat_to_batch(memory_pytree["memory"], memory_pytree["mask"],
                                           tgt.shape[0])
        t = tgt.shape[1]
        tgt_mask = (tgt != model.pad_id)[:, None, None, :] & subsequent_mask(t)
        src_mask = mem_mask[:, None, None, :]
        x = model.apply(variables, tgt,
                        method=lambda m, tg: m.pos_enc(m.tgt_embed(tg, False), train=False))
        y = pipelined_decoder_stack(model, p, x, memory, src_mask, tgt_mask,
                                    mesh, n_micro, stacked=stacked_layers)
        lp = model.apply(variables, y,
                         method=lambda m, h: m.generator(m.decoder_norm(h), False))
        return criterion(lp, seqs[:, 1:], seq_masks[:, 1:])

    loss, (g_p, g_stacked) = jax.value_and_grad(loss_fn, argnums=(0, 1))(params, stacked)
    grads = {**g_p}
    for i, k in enumerate(layer_keys):
        grads[k] = jax.tree.map(lambda a, _i=i: a[_i], g_stacked)
    return loss, grads
