"""Object Relation Transformer (ORT) + ACORT.

TPU-native rebuild of the reference ``relation_transformer``
(``sparse_caption/models/relation_transformer.py:39-426``):

* encoder: geometry-biased box self-attention (``BoxMultiHeadAttention``)
  over bottom-up region features; ``att_embed`` (Dense+ReLU+Dropout) is
  applied *before* encode and the encoder src_embed is identity
  (``relation_transformer.py:327,331-333,349-350``)
* decoder / PE / generator / caching: shared with the caption Transformer
* ACORT = ORT + radix tokenizer + ``share_att*`` + ``share_layer*`` flags
  (reference ``resources/commands_acort.sh:37-53``)

Static-shape deltas (documented): no ``clip_att`` / ``pack_wrapper``
(``relation_transformer.py:398-405``, ``utils/model_utils.py:149-168``) —
those are dynamic-shape host optimizations; here padding is masked in
attention so padded regions never influence valid outputs.
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax.numpy as jnp
from flax import linen as nn

from sparse_caption_tpu.models import register_model
from sparse_caption_tpu.models.layers import (
    BoxMultiHeadAttention,
    MaskedDense,
    PositionwiseFeedForward,
    RefLayerNorm,
    SublayerConnection,
)
from sparse_caption_tpu.models.transformer import Transformer, _unique_layer_plan


class BoxEncoderLayer(nn.Module):
    d_model: int
    num_heads: int
    d_ff: int
    trigonometric_embedding: bool = True
    dropout_rate: float = 0.1
    share_att: Optional[str] = None
    mask_cfg: Optional[Any] = None

    def setup(self):
        self.self_attn = BoxMultiHeadAttention(
            self.num_heads, self.d_model, self.trigonometric_embedding,
            self.dropout_rate, self.share_att, self.mask_cfg,
        )
        self.feed_forward = PositionwiseFeedForward(self.d_model, self.d_ff, self.dropout_rate, self.mask_cfg)
        self.sub0 = SublayerConnection(self.dropout_rate)
        self.sub1 = SublayerConnection(self.dropout_rate)

    def __call__(self, x, boxes, mask, train: bool = False):
        x = self.sub0(x, lambda y: self.self_attn(y, boxes, mask, train), train)
        return self.sub1(x, lambda y: self.feed_forward(y, train), train)


@register_model("relation_transformer")
@register_model("relation_transformer_prune")
class RelationTransformer(Transformer):
    """ORT: box-relation encoder + cached transformer decoder.

    COLLATE fields: att + boxes.
    """

    box_trigonometric_embedding: bool = True

    COLLATE_FIELDS = ("att_feats", "att_masks", "boxes")

    def setup(self):
        self._setup_decoder()
        n_enc, self.box_enc_plan = _unique_layer_plan(self.num_layers, self.share_layer_encoder)
        self.box_encoder_layers = [
            BoxEncoderLayer(self.d_model, self.num_heads, self.dim_feedforward,
                            self.box_trigonometric_embedding, self.dropout_rate,
                            self.share_att_encoder, self.mask_cfg)
            for _ in range(n_enc)
        ]
        self.att_embed = MaskedDense(self.d_model, mask_cfg=self.mask_cfg, name="att_embed")
        self.att_embed_dropout = nn.Dropout(self.drop_prob_src)
        self.box_encoder_norm = RefLayerNorm()

    def encode(self, att_feats, att_masks, boxes=None, train: bool = False) -> Dict[str, Any]:
        assert boxes is not None, "relation_transformer requires boxes"
        x = nn.relu(self.att_embed(att_feats, train))
        x = self.att_embed_dropout(x, deterministic=not train)
        src_mask = att_masks[:, None, None, :]
        for i in self.box_enc_plan:
            x = self.box_encoder_layers[i](x, boxes, src_mask, train)
        memory = self.box_encoder_norm(x)
        return {"memory": memory, "mask": att_masks}

    # __call__ is inherited: Transformer.__call__ dispatches through
    # self.encode, which is the box-attention override above

    @staticmethod
    def add_argparse_args(parser) -> None:
        Transformer.add_argparse_args(parser)
        parser.add_argument("--no_box_trigonometric_embedding", action="store_true")

    @classmethod
    def from_config(cls, config, mask_cfg=None):
        base = Transformer.from_config.__func__(cls, config, mask_cfg)
        return base.clone(
            box_trigonometric_embedding=not config.get("no_box_trigonometric_embedding", False)
        )
