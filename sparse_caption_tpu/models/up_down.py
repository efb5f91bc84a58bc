"""Up-Down (Bottom-Up Top-Down) LSTM captioner.

TPU-native rebuild of the reference ``up_down_lstm``
(``sparse_caption/models/att_model.py:48-397``):

* token embed -> ReLU -> Dropout; fc/att feature projections; precomputed
  ``p_att = ctx2att(att_embed)`` cached in the memory pytree
  (``att_model.py:77-89,127,142``)
* two-cell core: attention LSTM input ``[h_lang, fc_embed, word_embed]``;
  additive (tanh) soft attention with **masked renormalization** — softmax
  over all regions then mask-multiply + renorm (``att_model.py:283-313``);
  language LSTM input ``[att_result, h_att]`` (``att_model.py:317-345``)
* XE unroll as a Python loop over the (static) T-1 time steps with
  scheduled sampling (``ss_prob``, ``att_model.py:150-159``) — unrolled
  HLO rather than ``lax.scan`` (T<=17 tiny LSTM steps; scan would shrink
  the traced program at the cost of a scan carry, unmeasured); the
  reference's all-pad early break is subsumed by loss masking (static
  shapes)
* LSTM cells use torch gate order (i, f, g, o) with masked weight matrices
  (reference ``MaskedLSTMCell``, ``pruning/masked_layer.py:178-211``)

Defaults: rnn_size 1000, input_encoding_size 1000, att_hid 512
(``att_model.py:358-396``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sparse_caption_tpu.models import register_model
from sparse_caption_tpu.ops.masked import MaskConfig, MaskedDense, MaskedEmbed


class MaskedLSTMCell(nn.Module):
    """LSTM cell with torch semantics and prunable weight matrices."""

    hidden_size: int
    mask_cfg: Optional[MaskConfig] = None

    @nn.compact
    def __call__(self, x, hc, train: bool = False):
        h, c = hc
        gates = (
            MaskedDense(4 * self.hidden_size, mask_cfg=self.mask_cfg, name="ih")(x, train)
            + MaskedDense(4 * self.hidden_size, mask_cfg=self.mask_cfg, name="hh")(h, train)
        )
        i, f, g, o = jnp.split(gates, 4, axis=-1)
        c_new = jax.nn.sigmoid(f) * c + jax.nn.sigmoid(i) * jnp.tanh(g)
        h_new = jax.nn.sigmoid(o) * jnp.tanh(c_new)
        return h_new, c_new


class AdditiveAttention(nn.Module):
    """Soft attention with masked renormalization (reference att_model.py:283-313)."""

    att_hid_size: int
    mask_cfg: Optional[MaskConfig] = None

    @nn.compact
    def __call__(self, h, att_embed, p_att, att_masks=None, train: bool = False):
        """h: (B, rnn); att_embed: (B, R, rnn); p_att: (B, R, att_hid)."""
        att_h = MaskedDense(self.att_hid_size, mask_cfg=self.mask_cfg, name="h2att")(h, train)
        dot = jnp.tanh(p_att + att_h[:, None, :])
        scores = MaskedDense(1, mask_cfg=self.mask_cfg, name="alpha_net")(dot, train)[..., 0]  # (B, R)
        weight = jax.nn.softmax(scores, axis=1)
        if att_masks is not None:
            weight = weight * att_masks
            weight = weight / jnp.maximum(jnp.sum(weight, axis=1, keepdims=True), 1e-9)
        return jnp.einsum("br,brd->bd", weight, att_embed)


@register_model("up_down_lstm")
@register_model("up_down_lstm_prune")
class UpDownModel(nn.Module):
    vocab_size: int
    rnn_size: int = 1000
    input_encoding_size: int = 1000
    att_hid_size: int = 512
    fc_feat_size: int = 2048
    att_feat_size: int = 2048
    logit_layers: int = 1
    drop_prob_lm: float = 0.5
    max_seq_length: int = 18
    pad_id: int = 0
    bos_id: int = 2
    eos_id: int = 3
    unk_id: int = 1
    ss_prob: float = 0.0
    mask_cfg: Optional[MaskConfig] = None

    COLLATE_FIELDS = ("att_feats", "att_masks", "fc_feats")

    def setup(self):
        self.embed = MaskedEmbed(self.vocab_size, self.input_encoding_size, mask_cfg=self.mask_cfg)
        self.fc_embed = MaskedDense(self.rnn_size, mask_cfg=self.mask_cfg)
        self.att_embed = MaskedDense(self.rnn_size, mask_cfg=self.mask_cfg)
        self.ctx2att = MaskedDense(self.att_hid_size, mask_cfg=self.mask_cfg)
        self.att_lstm = MaskedLSTMCell(self.rnn_size, self.mask_cfg)
        self.lang_lstm = MaskedLSTMCell(self.rnn_size, self.mask_cfg)
        self.attention = AdditiveAttention(self.att_hid_size, self.mask_cfg)
        if self.logit_layers == 1:
            self.logit = [MaskedDense(self.vocab_size, mask_cfg=self.mask_cfg)]
        else:
            self.logit = [
                MaskedDense(self.rnn_size, mask_cfg=self.mask_cfg) for _ in range(self.logit_layers - 1)
            ] + [MaskedDense(self.vocab_size, mask_cfg=self.mask_cfg)]
        self.dropout = nn.Dropout(self.drop_prob_lm)

    # ------------------------------------------------------------- helpers
    def _drop(self, x, train: bool):
        return self.dropout(x, deterministic=not train)

    def _embed_token(self, it, train: bool):
        return self._drop(nn.relu(self.embed(it, train)), train)

    def _logit(self, h, train: bool):
        x = h
        for layer in self.logit[:-1]:
            x = self._drop(nn.relu(layer(x, train)), train)
        return jax.nn.log_softmax(self.logit[-1](x, train), axis=-1)

    # ------------------------------------------------------------- encode
    def encode(self, att_feats, att_masks, fc_feats=None, boxes=None, train: bool = False) -> Dict[str, Any]:
        del boxes
        assert fc_feats is not None, "up_down_lstm requires fc_feats"
        fc_e = self._drop(nn.relu(self.fc_embed(fc_feats, train)), train)  # (B, rnn)
        att_e = self._drop(nn.relu(self.att_embed(att_feats, train)), train)  # (B, R, rnn)
        p_att = self.ctx2att(att_e, train)  # (B, R, att_hid)
        return {"fc": fc_e, "att": att_e, "p_att": p_att, "mask": att_masks}

    # --------------------------------------------------------------- core
    def _core_step(self, it, state, memory, train: bool):
        xt = self._embed_token(it, train)
        h_att_in = jnp.concatenate([state["h_lang"], memory["fc"], xt], axis=1)
        h_att, c_att = self.att_lstm(h_att_in, (state["h_att"], state["c_att"]), train)
        att_res = self.attention(h_att, memory["att"], memory["p_att"], memory["mask"], train)
        h_lang, c_lang = self.lang_lstm(jnp.concatenate([att_res, h_att], axis=1), (state["h_lang"], state["c_lang"]), train)
        out = self._drop(h_lang, train)
        logprobs = self._logit(out, train)
        return logprobs, {"h_att": h_att, "c_att": c_att, "h_lang": h_lang, "c_lang": c_lang}

    # ------------------------------------------------------------ XE path
    def __call__(self, att_feats, att_masks, seqs, fc_feats=None, boxes=None, train: bool = False):
        """Teacher-forced XE: logprobs (N, T-1, V) over targets seqs[:, 1:]."""
        memory = self.encode(att_feats, att_masks, fc_feats, boxes, train)
        n = seqs.shape[0]
        if memory["fc"].shape[0] != n:
            assert n % memory["fc"].shape[0] == 0
            spi = n // memory["fc"].shape[0]
            memory = jax.tree.map(lambda x: jnp.repeat(x, spi, axis=0), memory)
        state = self.init_cache(memory)
        tokens = seqs[:, :-1]  # (N, T-1)
        t_steps = tokens.shape[1]

        use_ss = train and self.ss_prob > 0.0
        ss_rng = self.make_rng("ss") if use_ss else None

        if not use_ss:
            # plain teacher forcing: unrolled python loop over static T-1 steps
            outs = []
            for t in range(t_steps):
                lp, state = self._core_step(tokens[:, t], state, memory, train)
                outs.append(lp)
            return jnp.stack(outs, axis=1)

        # scheduled sampling: feed model sample with prob ss_prob (t >= 1)
        outs = []
        prev_lp = None
        for t in range(t_steps):
            it = tokens[:, t]
            if t >= 1:
                k1, k2, ss_rng = jax.random.split(ss_rng, 3)
                coin = jax.random.uniform(k1, (n,)) < self.ss_prob
                sampled = jax.random.categorical(k2, jax.lax.stop_gradient(prev_lp), axis=-1)
                it = jnp.where(coin, sampled, it)
            lp, state = self._core_step(it, state, memory, train)
            outs.append(lp)
            prev_lp = lp
        return jnp.stack(outs, axis=1)

    # ------------------------------------------------------------- decode
    def init_cache(self, memory_pytree: Dict[str, Any], max_steps: Optional[int] = None,
                   train: bool = False) -> Dict[str, Any]:
        del max_steps, train  # no cached projections -> nothing to sample
        b = memory_pytree["fc"].shape[0]
        z = jnp.zeros((b, self.rnn_size), memory_pytree["fc"].dtype)
        return {"h_att": z, "c_att": z, "h_lang": z, "c_lang": z}

    def decode_step(self, it, cache: Dict[str, Any], t, memory_pytree: Dict[str, Any], train: bool = False):
        del t
        return self._core_step(it, cache, memory_pytree, train)

    @staticmethod
    def add_argparse_args(parser) -> None:
        parser.add_argument("--rnn_size", type=int, default=1000)
        parser.add_argument("--input_encoding_size", type=int, default=1000)
        parser.add_argument("--att_feat_size", type=int, default=2048)
        parser.add_argument("--drop_prob_lm", type=float, default=0.5)
        parser.add_argument("--att_hid_size", type=int, default=512)
        parser.add_argument("--fc_feat_size", type=int, default=2048)
        parser.add_argument("--logit_layers", type=int, default=1)

    @classmethod
    def from_config(cls, config, mask_cfg: Optional[MaskConfig] = None):
        return cls(
            vocab_size=config.vocab_size,
            rnn_size=config.get("rnn_size", 1000),
            input_encoding_size=config.get("input_encoding_size", 1000),
            att_hid_size=config.get("att_hid_size", 512),
            fc_feat_size=config.get("fc_feat_size", 2048),
            att_feat_size=config.get("att_feat_size", 2048),
            logit_layers=config.get("logit_layers", 1),
            drop_prob_lm=config.get("drop_prob_lm", 0.5),
            max_seq_length=config.get("max_seq_length", 18),
            pad_id=config.get("pad_token_id", 0),
            bos_id=config.get("bos_token_id", 2),
            eos_id=config.get("eos_token_id", 3),
            ss_prob=config.get("ss_prob", 0.0),
            mask_cfg=mask_cfg,
        )
