"""Caption Transformer (Annotated-Transformer style encoder-decoder).

TPU-native rebuild of the reference ``transformer`` model
(``sparse_caption/models/transformer.py:29-719``):

* pre-norm enc-dec, custom std-based LayerNorm, sinusoidal PE,
  log-softmax generator, xavier-uniform init
* src embed: Dense(att_feat_size -> d_model) + ReLU + Dropout(drop_prob_src)
  (``transformer.py:632-634``)
* multi-caption training: when ``seqs`` batch > memory batch, memory is
  repeat-interleaved by seq_per_img (``transformer.py:99-102``)
* ACORT sharing: ``share_att_{encoder,decoder}`` in {None, kv, qk};
  ``share_layer_{encoder,decoder}`` aliases layer parameters
  (``transformer.py:133-142,175-183,223-263``)
* decoding uses explicit static-shape KV caches + time index instead of the
  reference's module-attribute cache mutation (``transformer.py:240-269``)
"""

from __future__ import annotations

from typing import Any, Dict, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from sparse_caption_tpu.models import register_model
from sparse_caption_tpu.models.layers import (
    Generator,
    InputEmbedding,
    MaskedDense,
    MultiHeadAttention,
    PositionalEncoding,
    PositionwiseFeedForward,
    RefLayerNorm,
    SublayerConnection,
)
from sparse_caption_tpu.ops.masked import MaskConfig


def _unique_layer_plan(num_layers: int, share_layer: Optional[Sequence[int]]) -> Tuple[int, Tuple[int, ...]]:
    """(n_unique, assignment) for layer sharing (reference transformer.py:133-142)."""
    if share_layer:
        share_layer = tuple(int(i) for i in share_layer)
        assert len(share_layer) == num_layers, (
            f"share_layer has {len(share_layer)} entries for num_layers={num_layers}; "
            "a short list would silently change the model depth")
        n_unique = len(set(share_layer))
        assert set(share_layer) == set(range(n_unique)), f"share_layer must use indices 0..{n_unique - 1}"
        return n_unique, share_layer
    return num_layers, tuple(range(num_layers))


class EncoderLayer(nn.Module):
    d_model: int
    num_heads: int
    d_ff: int
    dropout_rate: float = 0.1
    share_att: Optional[str] = None
    mask_cfg: Optional[MaskConfig] = None

    def setup(self):
        self.self_attn = MultiHeadAttention(
            self.num_heads, self.d_model, self.dropout_rate, self.share_att, self.mask_cfg
        )
        self.feed_forward = PositionwiseFeedForward(self.d_model, self.d_ff, self.dropout_rate, self.mask_cfg)
        self.sub0 = SublayerConnection(self.dropout_rate)
        self.sub1 = SublayerConnection(self.dropout_rate)

    def __call__(self, x, mask, train: bool = False):
        x = self.sub0(x, lambda y: self.self_attn(y, y, y, mask, train), train)
        return self.sub1(x, lambda y: self.feed_forward(y, train), train)


class DecoderLayer(nn.Module):
    d_model: int
    num_heads: int
    d_ff: int
    dropout_rate: float = 0.1
    share_att: Optional[str] = None
    mask_cfg: Optional[MaskConfig] = None

    def setup(self):
        self.self_attn = MultiHeadAttention(
            self.num_heads, self.d_model, self.dropout_rate, self.share_att, self.mask_cfg
        )
        self.src_attn = MultiHeadAttention(
            self.num_heads, self.d_model, self.dropout_rate, self.share_att, self.mask_cfg
        )
        self.feed_forward = PositionwiseFeedForward(self.d_model, self.d_ff, self.dropout_rate, self.mask_cfg)
        self.sub0 = SublayerConnection(self.dropout_rate)
        self.sub1 = SublayerConnection(self.dropout_rate)
        self.sub2 = SublayerConnection(self.dropout_rate)

    def __call__(self, x, memory, src_mask, tgt_mask, train: bool = False,
                 replay_time: bool = False):
        # replay_time: reproduce the incremental decode's train-mode dropout
        # (per-step folded keys; no attn-prob dropout — the step path applies
        # none) so one teacher-forced pass equals a whole sampling decode
        ad = not replay_time
        x = self.sub0(x, lambda y: self.self_attn(y, y, y, tgt_mask, train, attn_dropout=ad),
                      train, replay_time=replay_time)
        x = self.sub1(x, lambda y: self.src_attn(y, memory, memory, src_mask, train, attn_dropout=ad),
                      train, replay_time=replay_time)
        return self.sub2(x, lambda y: self.feed_forward(y, train, replay_time=replay_time),
                         train, replay_time=replay_time)

    # ------------------------------------------------------------- decode
    def project_memory_kv(self, memory, train: bool = False):
        return self.src_attn.project_memory_kv(memory, train)

    def step(self, x_t, layer_cache: Dict, cross: Dict, t, mem_mask, train: bool = False,
             ancestry_onehot=None):
        """One decode step. layer_cache: {self_k, self_v}; cross: {cross_k, cross_v}."""
        def self_fn(y):
            # "self_v" absent = kv-shared layer caching one array (ACORT)
            out, new_k, new_v = self.self_attn.decode_self(
                y, layer_cache["self_k"], layer_cache.get("self_v"), t, train,
                ancestry_onehot=ancestry_onehot,
            )
            layer_cache["self_k"] = new_k
            if new_v is not None:
                layer_cache["self_v"] = new_v
            return out

        x_t = self.sub0(x_t, self_fn, train, t=t)
        x_t = self.sub1(
            x_t,
            lambda y: self.src_attn.decode_cross(y, cross["cross_k"], cross.get("cross_v"),
                                                 mem_mask, train),
            train, t=t,
        )
        # note: a Pallas fused ln+FFN kernel for this block was A/B'd twice
        # (round 1: 485.9 vs 485.6 c/s; round 2 @ batch 256: 3214 vs 3203)
        # and never beat XLA's own fusion at these sizes, so it was removed
        x_t = self.sub2(x_t, lambda y: self.feed_forward(y, train, t=t), train, t=t)
        return x_t, layer_cache


def subsequent_mask(t: int):
    """(1, 1, T, T) lower-triangular validity mask (reference transformer.py:105-108)."""
    return jnp.tril(jnp.ones((t, t), dtype=jnp.bool_))[None, None]


def repeat_to_batch(memory, mem_mask, n_tgt: int):
    """Repeat-interleave an encoded memory (+mask) to the target batch:
    seq_per_img caption rows per image share one encoder pass (reference
    utils/model_utils.py repeat_tensors). One shared helper — the XE
    forward, teacher-forced replay, and both pipeline loss paths all need
    the identical repeat semantics."""
    if memory.shape[0] != n_tgt:
        assert n_tgt % memory.shape[0] == 0, (n_tgt, memory.shape)
        spi = n_tgt // memory.shape[0]
        memory = jnp.repeat(memory, spi, axis=0)
        mem_mask = jnp.repeat(mem_mask, spi, axis=0)
    return memory, mem_mask


@register_model("transformer")
@register_model("transformer_prune")
class Transformer(nn.Module):
    """Flagship caption transformer. COLLATE fields: att (+ optional fc unused)."""

    vocab_size: int
    d_model: int = 512
    dim_feedforward: int = 2048
    num_layers: int = 6
    num_heads: int = 8
    drop_prob_src: float = 0.5
    dropout_rate: float = 0.1
    att_feat_size: int = 2048
    max_seq_length: int = 18
    pad_id: int = 0
    bos_id: int = 2
    eos_id: int = 3
    unk_id: int = 1
    share_att_encoder: Optional[str] = None
    share_att_decoder: Optional[str] = None
    share_layer_encoder: Optional[Sequence[int]] = None
    share_layer_decoder: Optional[Sequence[int]] = None
    mask_cfg: Optional[MaskConfig] = None

    COLLATE_FIELDS = ("att_feats", "att_masks")

    def _setup_decoder(self):
        n_dec, self.dec_plan = _unique_layer_plan(self.num_layers, self.share_layer_decoder)
        self.tgt_embed = InputEmbedding(self.vocab_size, self.d_model, self.mask_cfg)
        self.pos_enc = PositionalEncoding(self.d_model, self.dropout_rate)
        self.decoder_layers = [
            DecoderLayer(self.d_model, self.num_heads, self.dim_feedforward, self.dropout_rate,
                         self.share_att_decoder, self.mask_cfg)
            for _ in range(n_dec)
        ]
        self.decoder_norm = RefLayerNorm()
        self.generator = Generator(self.vocab_size, self.mask_cfg)

    def setup(self):
        self._setup_decoder()
        n_enc, self.enc_plan = _unique_layer_plan(self.num_layers, self.share_layer_encoder)
        self.src_proj = MaskedDense(self.d_model, mask_cfg=self.mask_cfg, name="src_proj")
        self.src_dropout = nn.Dropout(self.drop_prob_src)
        self.encoder_layers = [
            EncoderLayer(self.d_model, self.num_heads, self.dim_feedforward, self.dropout_rate,
                         self.share_att_encoder, self.mask_cfg)
            for _ in range(n_enc)
        ]
        self.encoder_norm = RefLayerNorm()

    # ----------------------------------------------------------- encoding
    def _embed_src(self, att_feats, train: bool):
        x = nn.relu(self.src_proj(att_feats, train))
        return self.src_dropout(x, deterministic=not train)

    def encode(self, att_feats, att_masks, boxes=None, train: bool = False) -> Dict[str, Any]:
        """att_feats: (B, S, F); att_masks: (B, S). Returns memory pytree."""
        del boxes
        x = self._embed_src(att_feats, train)
        src_mask = att_masks[:, None, None, :]  # (B, 1, 1, S)
        for i in self.enc_plan:
            x = self.encoder_layers[i](x, src_mask, train)
        memory = self.encoder_norm(x)
        return {"memory": memory, "mask": att_masks}

    # ----------------------------------------------------- XE teacher force
    def _decode_full(self, tgt, memory, mem_mask, train: bool, replay_time: bool = False):
        """tgt: (N, T) already cropped. Returns decoder output (N, T, D)."""
        t = tgt.shape[1]
        if replay_time:
            # match the incremental decode exactly: it attends to every
            # written cache slot <= t regardless of token id (a sampled pad
            # or post-EOS pad still wrote K/V), so the replay must NOT mask
            # pad keys the way the XE forward does
            tgt_mask = jnp.broadcast_to(subsequent_mask(t), (tgt.shape[0], 1, t, t))
        else:
            tgt_mask = (tgt != self.pad_id)[:, None, None, :] & subsequent_mask(t)  # (N,1,T,T)
        src_mask = mem_mask[:, None, None, :]
        x = self.pos_enc(self.tgt_embed(tgt, train), train=train, replay_time=replay_time)
        for i in self.dec_plan:
            x = self.decoder_layers[i](x, memory, src_mask, tgt_mask, train, replay_time=replay_time)
        return self.decoder_norm(x)

    def __call__(self, att_feats, att_masks, seqs, boxes=None, train: bool = False):
        """XE forward: logprobs (N, T-1, V) over targets seqs[:, 1:]
        (decoder input is seqs[:, :-1], reference transformer.py:677-680)."""
        enc = self.encode(att_feats, att_masks, boxes, train)
        tgt = seqs[:, :-1]
        memory, mem_mask = repeat_to_batch(enc["memory"], enc["mask"], tgt.shape[0])
        out = self._decode_full(tgt, memory, mem_mask, train)
        return self.generator(out, train)

    # --------------------------------------------- SCST teacher-forced replay
    # The incremental decode folds every dropout site's key by the step index
    # (TimeDropout step mode), so one parallel forward in replay_time mode
    # reproduces a whole train-mode sampling decode bit for bit. SCST's
    # gradient pass uses this instead of differentiating through the T-step
    # scan: gradients still attach to the true sampling-pass logprobs
    # (reference utils/training.py:225-254 captured-logprob semantics) at the
    # cost of ONE teacher-forced fwd+bwd. Only valid for dense models — a
    # supermask model redraws its Bernoulli masks every step, which no single
    # parallel pass can reproduce.
    DECODE_DROPOUT_FOLDS_T = True

    def decode_teacher_forced(self, memory_pytree: Dict[str, Any], seqs, train: bool = False):
        """Logprobs (N, T-1, V) of ``seqs[:, 1:]`` given an encoded memory.

        ``seqs``: (N, T) starting with BOS; N may be a multiple of the
        memory's batch (samples per image — memory rows are repeated).
        With ``train=True`` under the same ``"dropout"`` rng as a sampling
        decode, the returned logprobs equal that decode's per-step logprobs
        at every pre-EOS position (post-EOS positions differ only through
        loss-masked pad handling)."""
        tgt = seqs[:, :-1]
        memory, mem_mask = repeat_to_batch(memory_pytree["memory"], memory_pytree["mask"],
                                           tgt.shape[0])
        out = self._decode_full(tgt, memory, mem_mask, train, replay_time=train)
        return self.generator(out, train)

    # ------------------------------------------------------------- decode
    # generate() may init the cache with rows_per_image > 1 against an
    # UNREPEATED memory (cross K/V deduplicated to one row per image) and,
    # for beam search, beam-ancestry attention instead of physical cache
    # reorder — see layers.MultiHeadAttention.decode_self/decode_cross.
    SUPPORTS_GROUPED_DECODE = True

    def init_cache(self, memory_pytree: Dict[str, Any], max_steps: Optional[int] = None,
                   rows_per_image: int = 1, beam_ancestry: bool = False,
                   train: bool = False) -> Dict[str, Any]:
        """Build the static-shape decode cache.

        Self-attention K/V zeros live at ``B * rows_per_image`` rows; the
        projected cross K/V stays at B rows (one per image — each group of
        rows broadcasts over its image's memory). With ``beam_ancestry``,
        an identity ancestor map (B, rows, T_max) is carried so the beam
        search can reorder beams WITHOUT rewriting the K/V cache."""
        memory = memory_pytree["memory"]
        b = memory.shape[0]
        rows = b * int(rows_per_image)
        t_max = int(max_steps or (self.max_seq_length + 1))
        dk = self.d_model // self.num_heads
        layers, cross = [], []
        proj = {}  # unique layer index -> projected cross K/V
        for i in self.dec_plan:
            layer = self.decoder_layers[i]
            if train:
                # train-mode supermask draws a fresh Bernoulli mask per
                # call: repeated slots of a shared layer must each draw,
                # matching the reference's per-call module semantics
                ck, cv = layer.project_memory_kv(memory, train)
            else:
                # share_layer slots reuse one projection: same params ->
                # bit-identical K/V, so project once per UNIQUE layer
                # (ACORT plan (0,)*6 would otherwise compute and carry six
                # identical cross caches)
                if i not in proj:
                    proj[i] = layer.project_memory_kv(memory, train)
                ck, cv = proj[i]
            entry = {"self_k": jnp.zeros((rows, self.num_heads, t_max, dk), ck.dtype)}
            if layer.self_attn.share_att != "kv":
                entry["self_v"] = jnp.zeros((rows, self.num_heads, t_max, dk), ck.dtype)
            # kv-shared layers store ONE cache array (K == V under the kv
            # projection): halves decode-cache HBM footprint and traffic
            layers.append(entry)
            if layer.src_attn.share_att == "kv":
                cross.append({"cross_k": ck})
            else:
                cross.append({"cross_k": ck, "cross_v": cv})
        # "static": beam-invariant per image -> exempt from beam reorder
        cache = {"layers": layers, "static": {"cross": cross}}
        if beam_ancestry:
            cache["ancestry"] = jnp.tile(jnp.arange(rows_per_image, dtype=jnp.int32)[None, :, None],
                                         (b, 1, t_max))
        return cache

    def decode_step(self, it, cache: Dict[str, Any], t, memory_pytree: Dict[str, Any], train: bool = False):
        """it: (N,) current tokens; t: scalar index. Returns (logprobs (N, V), cache)."""
        mem_mask = memory_pytree["mask"][:, None, None, :]
        x = self.tgt_embed(it[:, None], train)  # (N, 1, D)
        x = self.pos_enc(x, t=t, train=train)
        ancestry = cache.get("ancestry")
        a_onehot = None
        if ancestry is not None:
            # slot t is written by each row itself this step -> identity
            k = ancestry.shape[1]
            ident = jnp.tile(jnp.arange(k, dtype=ancestry.dtype)[None, :], (ancestry.shape[0], 1))
            ancestry = jax.lax.dynamic_update_index_in_dim(
                ancestry.transpose(2, 0, 1), ident, t, axis=0
            ).transpose(1, 2, 0)
            a_onehot = jax.nn.one_hot(ancestry, k, dtype=x.dtype)  # (B, K, T_max, K)
        new_layers = []
        for j, i in enumerate(self.dec_plan):
            x, lc = self.decoder_layers[i].step(
                x, dict(cache["layers"][j]), cache["static"]["cross"][j], t, mem_mask, train,
                ancestry_onehot=a_onehot,
            )
            new_layers.append(lc)
        x = self.decoder_norm(x)
        logprobs = self.generator(x[:, 0], train)
        new_cache = {"layers": new_layers, "static": cache["static"]}
        if ancestry is not None:
            new_cache["ancestry"] = ancestry
        return logprobs, new_cache

    @staticmethod
    def add_argparse_args(parser) -> None:
        parser.add_argument("--d_model", type=int, default=512)
        parser.add_argument("--dim_feedforward", type=int, default=2048)
        parser.add_argument("--num_layers", type=int, default=6)
        parser.add_argument("--num_heads", type=int, default=8)
        parser.add_argument("--drop_prob_src", type=float, default=0.5)
        parser.add_argument("--att_feat_size", type=int, default=2048)
        from sparse_caption_tpu.config import str_to_none

        parser.add_argument("--share_att_encoder", type=str_to_none, default=None,
                            choices=[None, "kv", "qk"])
        parser.add_argument("--share_att_decoder", type=str_to_none, default=None,
                            choices=[None, "kv", "qk"])
        parser.add_argument("--share_layer_encoder", type=str, default=None,
                            help="comma ints, e.g. '0,0,0,1,1,1'")
        parser.add_argument("--share_layer_decoder", type=str, default=None)

    @classmethod
    def from_config(cls, config, mask_cfg: Optional[MaskConfig] = None):
        from sparse_caption_tpu.config import list_of_ints

        def share_layer(v):
            if v is None or v == "":
                return None
            return tuple(list_of_ints(v)) if isinstance(v, str) else tuple(v)

        return cls(
            vocab_size=config.vocab_size,
            d_model=config.get("d_model", 512),
            dim_feedforward=config.get("dim_feedforward", 2048),
            num_layers=config.get("num_layers", 6),
            num_heads=config.get("num_heads", 8),
            drop_prob_src=config.get("drop_prob_src", 0.5),
            att_feat_size=config.get("att_feat_size", 2048),
            max_seq_length=config.get("max_seq_length", 18),
            pad_id=config.get("pad_token_id", 0),
            bos_id=config.get("bos_token_id", 2),
            eos_id=config.get("eos_token_id", 3),
            unk_id=1,
            share_att_encoder=config.get("share_att_encoder"),
            share_att_decoder=config.get("share_att_decoder"),
            share_layer_encoder=share_layer(config.get("share_layer_encoder")),
            share_layer_decoder=share_layer(config.get("share_layer_decoder")),
            mask_cfg=mask_cfg,
        )
