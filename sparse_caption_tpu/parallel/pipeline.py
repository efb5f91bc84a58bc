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
DATA_AXIS = "data"


def make_pipe_mesh(n_stages: int, devices: Sequence[Any] = None, dp: int = 1) -> Mesh:
    """Mesh for pipeline parallelism: 1-D ``("pipe",)`` over the first
    ``n_stages`` devices, or — with ``dp > 1`` — a 2-D ``("data", "pipe")``
    mesh over ``dp * n_stages`` devices (dp x pp composition: each data
    shard runs its own lock-step pipeline over its slice of the
    microbatches; gradients all-reduce over ``data`` automatically through
    ``shard_map``'s replicated-input transpose rule)."""
    devices = list(devices) if devices is not None else jax.devices()
    if dp > 1:
        need = dp * n_stages
        assert len(devices) >= need, (
            f"dp x pp mesh needs {need} devices ({dp} x {n_stages}), have {len(devices)}")
        return Mesh(np.array(devices[:need]).reshape(dp, n_stages), (DATA_AXIS, PIPE_AXIS))
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


def _layer_module(model, masked: bool = False):
    # mirror of Transformer._setup_decoder's DecoderLayer construction.
    # Masked stacks run with mask_freeze semantics (plain ``w * m``): the
    # engine pre-samples supermasks outside the pipeline, so inside the
    # stages every mask type is just a 0/1 multiplier.
    from sparse_caption_tpu.models.transformer import DecoderLayer
    from sparse_caption_tpu.ops.masked import MaskConfig

    cfg = MaskConfig(mask_type="mask_freeze") if masked else None
    return DecoderLayer(model.d_model, model.num_heads, model.dim_feedforward,
                        model.dropout_rate, model.share_att_decoder, cfg)


def pipelined_decoder_stack(model, params: Dict[str, Any], x, memory, src_mask,
                            tgt_mask, mesh: Mesh, n_micro: int, stacked=None,
                            stacked_masks=None):
    """Run the decoder layer stack pipeline-parallel over ``mesh``.

    x: (B, T, D) embedded+position-encoded decoder input; memory: (B, S, D);
    src_mask: (B, 1, 1, S); tgt_mask: (B, 1, T, T). Returns the stack
    output (B, T, D) — pre-``decoder_norm``, like the sequential loop in
    ``Transformer._decode_full``.

    Masked (pruned) models pass ``stacked_masks``: the per-layer masks
    stacked like the params, applied as a plain ``w * m`` multiply inside
    the stages (mask_freeze semantics).  Supermask TRAIN steps sample the
    Bernoulli masks ONCE per step OUTSIDE the pipeline (one step = one
    forward, so this is exactly the reference's fresh-sample-per-forward,
    ``masked_layer.py:84-110``) and the straight-through gradient chains
    through the sampled values back to the logits.
    """
    assert getattr(model, "share_layer_decoder", None) is None, (
        "pipeline parallelism needs one param set per layer (no share_layer)")
    if getattr(model, "mask_cfg", None) is not None:
        assert stacked_masks is not None, (
            "masked model: pass stacked_masks (pre-sampled binary masks)")
    n_stages = mesh.shape[PIPE_AXIS]
    keys = decoder_layer_keys(params)
    n_layers = len(keys)
    assert n_layers % n_stages == 0, (
        f"{n_layers} decoder layers do not divide into {n_stages} stages")
    b = x.shape[0]
    assert b % n_micro == 0, f"batch {b} not divisible by n_micro={n_micro}"
    mb = b // n_micro
    if DATA_AXIS in mesh.axis_names:
        assert mb % mesh.shape[DATA_AXIS] == 0, (
            f"microbatch {mb} not divisible by data axis {mesh.shape[DATA_AXIS]}")

    if stacked is None:
        stacked = stack_decoder_layers(params)

    def split(a):
        a = jnp.broadcast_to(a, (b,) + a.shape[1:])
        return a.reshape((n_micro, mb) + a.shape[1:])

    xs, mems, smasks, tmasks = (split(a) for a in (x, memory, src_mask, tgt_mask))
    mask_treedef = (jax.tree.structure(stacked_masks)
                    if stacked_masks is not None else None)
    f = _cached_stage_jit(model, mesh, jax.tree.structure(stacked), mask_treedef)
    if stacked_masks is not None:
        y = f(stacked, stacked_masks, xs, mems, smasks, tmasks)
    else:
        y = f(stacked, xs, mems, smasks, tmasks)
    return y.reshape((b,) + y.shape[2:])


# one jitted shard_map per (layer config, mesh, param treedef): building a
# fresh closure + jax.jit per CALL retraced and recompiled the whole
# pipeline on every direct invocation (minutes per compile through the
# relay) — only the engine's outer @jax.jit hid it on the train path
_PIPE_JIT_CACHE: Dict[Any, Any] = {}


def _cached_stage_jit(model, mesh: Mesh, treedef, mask_treedef=None):
    cfg = (model.d_model, model.num_heads, model.dim_feedforward,
           model.dropout_rate, model.share_att_decoder)
    key = (cfg, mesh, treedef, mask_treedef)
    if key in _PIPE_JIT_CACHE:
        return _PIPE_JIT_CACHE[key]
    masked = mask_treedef is not None
    layer_mod = _layer_module(model, masked=masked)
    n_stages = mesh.shape[PIPE_AXIS]

    def stage_fn(lp, lm, xs, mems, smasks, tmasks):
        idx = lax.axis_index(PIPE_AXIS)
        m_total = xs.shape[0]

        def apply_stack(h, mem, sm, tm):
            def body(h, pm):
                p, m = pm
                v = {"params": p, "masks": m} if masked else {"params": p}
                return layer_mod.apply(v, h, mem, sm, tm, train=False), None

            h, _ = lax.scan(body, h, (lp, lm))
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
    # dp x pp: activations shard their per-microbatch batch dim (axis 1)
    # over the data axis; params/masks stay replicated across data (their
    # cotangents psum over it via shard_map's transpose rule)
    act = P(None, DATA_AXIS) if DATA_AXIS in mesh.axis_names else P()
    if masked:
        specs_m = jax.tree.unflatten(mask_treedef,
                                     [P(PIPE_AXIS)] * mask_treedef.num_leaves)
        f = jax.jit(_shard_map(stage_fn, mesh=mesh,
                               in_specs=(specs_p, specs_m, act, act, act, act),
                               out_specs=act))
    else:
        def stage_fn_dense(lp, xs, mems, smasks, tmasks):
            return stage_fn(lp, None, xs, mems, smasks, tmasks)

        f = jax.jit(_shard_map(stage_fn_dense, mesh=mesh,
                               in_specs=(specs_p, act, act, act, act),
                               out_specs=act))
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


def _sample_mask_tree(masks, cfg, rng):
    """Sample every mask leaf with its own key (independent Bernoulli per
    layer, like the per-layer ``make_rng`` draws of the in-model path);
    differentiable via the STE custom_vjp.  Non-supermask types pass
    through unchanged (they are already 0/1)."""
    from sparse_caption_tpu.ops.masked import sample_mask

    leaves, tdef = jax.tree.flatten(masks)
    train = rng is not None
    keys = list(jax.random.split(rng, len(leaves))) if train else [None] * len(leaves)
    return tdef.unflatten([sample_mask(leaf, cfg, train, k)
                           for leaf, k in zip(leaves, keys)])


def pipeline_xe_train_loss_and_grads(model, params: Dict[str, Any], inputs: Dict[str, Any],
                                     seq_masks, criterion, mesh: Mesh, n_micro: int,
                                     masks: Dict[str, Any] = None, mask_rng=None):
    """Full XE training loss + grads with the decoder stack pipelined —
    the ``--pipeline_stages`` engine path (vs :func:`pipeline_xe_loss_and_grads`,
    which treats the encoder output as a constant for the unit tests).

    The encoder runs INSIDE ``loss_fn`` (replicated on every stage), so
    encoder/embedding/generator gradients flow; the decoder-layer grads
    come back from the stage-sharded stacked copy and are unstacked into
    the params tree, so the optax update applies unchanged.  Deterministic
    (no dropout) — documented in ``opts.py --pipeline_stages``.

    Masked (pruned) models pass ``masks`` (the flax masks collection) and,
    for supermask training, ``mask_rng``: the Bernoulli masks are sampled
    ONCE per step via the STE (one step = one forward, exactly the
    reference's fresh-sample-per-forward) and the whole model — encoder,
    embeds, generator outside the pipeline, decoder layers inside —
    consumes the sampled 0/1 values with plain ``w * m`` multiplies
    (mask_freeze semantics), so the straight-through gradient reaches the
    logits once, with no double-sigmoid factor.  Returns
    ``(loss, grads, mask_grads)`` in that case."""
    from sparse_caption_tpu.models.transformer import subsequent_mask

    seqs = inputs["seqs"]
    enc_inputs = {k: v for k, v in inputs.items() if k != "seqs"}
    layer_keys = decoder_layer_keys(params)
    stacked = stack_decoder_layers(params)

    masked = masks is not None
    if masked:
        from sparse_caption_tpu.ops.masked import MaskConfig

        mask_cfg = model.mask_cfg
        assert mask_cfg is not None, "masks passed for a dense model"
        # the whole step consumes PRE-SAMPLED 0/1 masks as plain multipliers
        fmodel = model.clone(mask_cfg=MaskConfig(mask_type="mask_freeze"))
        mask_layer_keys = [k for k in layer_keys if k in masks]
        assert mask_layer_keys == layer_keys, (
            f"decoder-layer masks missing: {sorted(set(layer_keys) - set(masks))}")
        stacked_m = stack_decoder_layers({k: masks[k] for k in layer_keys})
        rest_m = {k: v for k, v in masks.items() if k not in set(layer_keys)}
    else:
        fmodel = model
        stacked_m = None
        rest_m = None

    def loss_fn(p, stacked_layers, rm, sm):
        variables = {"params": p}
        sampled_sm = None
        if masked:
            k1, k2 = (jax.random.split(mask_rng) if mask_rng is not None
                      else (None, None))
            variables["masks"] = _sample_mask_tree(rm, mask_cfg, k1)
            sampled_sm = _sample_mask_tree(sm, mask_cfg, k2)
        memory_pytree = fmodel.apply(variables, **enc_inputs, train=False, method="encode")
        from sparse_caption_tpu.models.transformer import repeat_to_batch

        tgt = seqs[:, :-1]
        memory, mem_mask = repeat_to_batch(memory_pytree["memory"], memory_pytree["mask"],
                                           tgt.shape[0])
        t = tgt.shape[1]
        tgt_mask = (tgt != model.pad_id)[:, None, None, :] & subsequent_mask(t)
        src_mask = mem_mask[:, None, None, :]
        x = fmodel.apply(variables, tgt,
                         method=lambda m, tg: m.pos_enc(m.tgt_embed(tg, False), train=False))
        y = pipelined_decoder_stack(model, p, x, memory, src_mask, tgt_mask,
                                    mesh, n_micro, stacked=stacked_layers,
                                    stacked_masks=sampled_sm)
        lp = fmodel.apply(variables, y,
                          method=lambda m, h: m.generator(m.decoder_norm(h), False))
        return criterion(lp, seqs[:, 1:], seq_masks[:, 1:])

    if masked:
        loss, (g_p, g_stacked, g_rm, g_sm) = jax.value_and_grad(
            loss_fn, argnums=(0, 1, 2, 3))(params, stacked, rest_m, stacked_m)
    else:
        loss, (g_p, g_stacked) = jax.value_and_grad(
            loss_fn, argnums=(0, 1))(params, stacked, rest_m, stacked_m)
    grads = {**g_p}
    for i, k in enumerate(layer_keys):
        grads[k] = jax.tree.map(lambda a, _i=i: a[_i], g_stacked)
    if not masked:
        return loss, grads
    mask_grads = {**g_rm}
    for i, k in enumerate(layer_keys):
        mask_grads[k] = jax.tree.map(lambda a, _i=i: a[_i], g_sm)
    return loss, grads, mask_grads
