"""Shared model layers (TPU-first rebuild of the reference transformer stack).

Numerics parity notes (verified against the reference):
* ``RefLayerNorm`` uses **std (Bessel-corrected) + eps**, not var+eps
  (reference ``models/transformer.py:329-341``)
* pre-norm residual: ``x + dropout(f(norm(x)))`` (``transformer.py:345-358``)
* sinusoidal PE table with incremental offset (``transformer.py:362-390``)
* masked softmax fills with -1e9 (``transformer.py:294-296``)
* attention-prob dropout, xavier-uniform init on dim>1 params

Decode path is fully functional: KV caches are explicit arrays
``(B, H, T_max, d_k)`` written with ``dynamic_update_slice`` at step ``t``
(the reference mutates ``module.cache`` lists, ``transformer.py:240-269``).
All shapes static for XLA.
"""

from __future__ import annotations

import math
from typing import Optional

import jax
import jax.numpy as jnp
from flax import linen as nn

from sparse_caption_tpu.ops.masked import MaskConfig, MaskedDense

NEG_INF = -1e9


class TimeDropout(nn.Module):
    """Dropout whose per-decode-step randomness is keyed by ``fold_in(site_key, t)``.

    Three modes over the same site key (``make_rng("dropout")``):

    * standard (``t=None, replay_time=False``): one draw over ``x.shape`` —
      ordinary dropout for full-sequence (XE) forwards.
    * step (``t`` given, x ``(N, 1, D)``): draw keyed by ``fold_in(key, t)``
      — used by the incremental decode so each step gets fresh dropout (the
      reference's train-mode sampling loop calls the model once per step,
      utils/training.py:225-237) while the *site* key stays constant across
      steps.
    * replay (``replay_time=True``, x ``(N, T, D)``): re-draw the step-mode
      masks for ALL t in one pass (vmap over ``fold_in(key, t)``).  This is
      what lets a single teacher-forced forward reproduce, bit for bit, the
      dropout realization of a whole train-mode sampling decode — the key to
      the fast SCST gradient pass (one parallel fwd+bwd instead of
      differentiating through a T-step scan).
    """

    rate: float

    @nn.compact
    def __call__(self, x, train: bool = False, t=None, replay_time: bool = False):
        if not train or self.rate == 0.0:
            return x
        key = self.make_rng("dropout")
        keep = 1.0 - self.rate
        if t is not None:
            mask = jax.random.bernoulli(jax.random.fold_in(key, t), keep, x.shape)
        elif replay_time:
            n, t_len, d = x.shape
            keys = jax.vmap(lambda i: jax.random.fold_in(key, i))(jnp.arange(t_len))
            mask = jax.vmap(lambda k: jax.random.bernoulli(k, keep, (n, 1, d)))(keys)  # (T, N, 1, D)
            mask = mask[:, :, 0, :].transpose(1, 0, 2)  # (N, T, D)
        else:
            mask = jax.random.bernoulli(key, keep, x.shape)
        return jnp.where(mask, x / keep, jnp.zeros_like(x))


class RefLayerNorm(nn.Module):
    """LayerNorm matching the reference: a*(x-mean)/(std+eps)+b with unbiased std."""

    eps: float = 1e-6

    @nn.compact
    def __call__(self, x):
        d = x.shape[-1]
        a = self.param("scale", nn.initializers.ones_init(), (d,))
        b = self.param("bias", nn.initializers.zeros_init(), (d,))
        # stats in f32 for stability, result back in the input dtype so bf16
        # runs stay bf16 end to end (exact no-op for f32 runs). A bf16-stats
        # eval variant was A/B'd in round 3 and LOST (4600 vs 4654 cap/s
        # in-loop at batch 1024): XLA fuses the dtype casts into the reduce,
        # so f32 stats cost nothing — deleted, writeup in CLAUDE.md.
        xf = x.astype(jnp.float32)
        mean = jnp.mean(xf, axis=-1, keepdims=True)
        # torch .std() is Bessel-corrected (ddof=1)
        var = jnp.sum(jnp.square(xf - mean), axis=-1, keepdims=True) / max(d - 1, 1)
        std = jnp.sqrt(var)
        out = a.astype(jnp.float32) * (xf - mean) / (std + self.eps) + b.astype(jnp.float32)
        return out.astype(x.dtype)


def sinusoid_table(max_len: int, d_model: int) -> jnp.ndarray:
    position = jnp.arange(max_len, dtype=jnp.float32)[:, None]
    div_term = jnp.exp(jnp.arange(0, d_model, 2, dtype=jnp.float32) * -(math.log(10000.0) / d_model))
    pe = jnp.zeros((max_len, d_model), dtype=jnp.float32)
    pe = pe.at[:, 0::2].set(jnp.sin(position * div_term))
    pe = pe.at[:, 1::2].set(jnp.cos(position * div_term))
    return pe


class PositionalEncoding(nn.Module):
    d_model: int
    dropout_rate: float = 0.1
    max_len: int = 5000

    @nn.compact
    def __call__(self, x, t: Optional[jnp.ndarray] = None, train: bool = False,
                 replay_time: bool = False):
        # match the activation dtype: an f32 table silently promotes the whole
        # decode to f32 (doubles cache/select traffic on bf16 runs)
        pe = sinusoid_table(self.max_len, self.d_model).astype(x.dtype)
        if t is None:
            x = x + pe[None, : x.shape[1]]
        else:  # incremental decoding: x is (B, 1, D), t the time index
            x = x + jax.lax.dynamic_slice_in_dim(pe, t, 1, axis=0)[None]
        return TimeDropout(self.dropout_rate)(x, train, t=t, replay_time=replay_time)


class PositionwiseFeedForward(nn.Module):
    d_model: int
    d_ff: int
    dropout_rate: float = 0.1
    mask_cfg: Optional[MaskConfig] = None

    @nn.compact
    def __call__(self, x, train: bool = False, t=None, replay_time: bool = False):
        h = MaskedDense(self.d_ff, mask_cfg=self.mask_cfg, name="w_1")(x, train)
        h = TimeDropout(self.dropout_rate)(nn.relu(h), train, t=t, replay_time=replay_time)
        return MaskedDense(self.d_model, mask_cfg=self.mask_cfg, name="w_2")(h, train)


class SublayerConnection(nn.Module):
    """Pre-norm residual wrapper."""

    dropout_rate: float = 0.1

    @nn.compact
    def __call__(self, x, sublayer, train: bool = False, t=None, replay_time: bool = False):
        y = sublayer(RefLayerNorm(name="norm")(x))
        return x + TimeDropout(self.dropout_rate)(y, train, t=t, replay_time=replay_time)


def _split_heads(x, h: int):
    """(B, T, D) -> (B, h, T, D/h)."""
    b, t, d = x.shape
    return x.reshape(b, t, h, d // h).transpose(0, 2, 1, 3)


def _merge_heads(x):
    """(B, h, T, dk) -> (B, T, h*dk)."""
    b, h, t, dk = x.shape
    return x.transpose(0, 2, 1, 3).reshape(b, t, h * dk)


def scaled_dot_attention(q, k, v, mask=None, bias=None, dropout: Optional[nn.Dropout] = None):
    """q/k/v: (B, h, T, dk). mask broadcastable to (B, h, Tq, Tk), 0 = invalid.
    bias (optional) added to scores AFTER masking (ORT geometry path adds the
    log-geometry term after the -1e9 fill, reference relation_transformer.py:277-287)."""
    dk = q.shape[-1]
    scores = jnp.einsum("bhqd,bhkd->bhqk", q, k) / math.sqrt(dk)
    if mask is not None:
        # dtype-preserving fill: a python-float NEG_INF would promote bf16->f32
        scores = jnp.where(mask == 0, jnp.asarray(NEG_INF, scores.dtype), scores)
    if bias is not None:
        scores = scores + bias
    probs = jax.nn.softmax(scores, axis=-1)
    if dropout is not None:
        probs = dropout(probs)
    return jnp.einsum("bhqk,bhkd->bhqd", probs, v)


class MultiHeadAttention(nn.Module):
    """MHA with ACORT projection sharing and functional KV-cache decode.

    Sharing map (reference ``transformer.py:223-263``):
      * None: q/k/v/out projections
      * "kv": q, shared kv (value reuses the projected key tensor), out
      * "qk": shared qk (key reuses the q projection), v, out
    """

    num_heads: int
    d_model: int
    dropout_rate: float = 0.1
    share_att: Optional[str] = None
    mask_cfg: Optional[MaskConfig] = None

    def setup(self):
        assert self.d_model % self.num_heads == 0
        assert self.share_att in (None, "kv", "qk"), f"invalid share_att {self.share_att}"
        dense = lambda name: MaskedDense(self.d_model, mask_cfg=self.mask_cfg, name=name)  # noqa: E731
        self.q_proj = dense("q_proj")
        if self.share_att == "kv":
            self.kv_proj = dense("kv_proj")
        elif self.share_att == "qk":
            self.v_proj = dense("v_proj")
        else:
            self.k_proj = dense("k_proj")
            self.v_proj = dense("v_proj")
        self.out_proj = dense("out_proj")
        self.attn_dropout = nn.Dropout(self.dropout_rate)

    def _project_kv(self, key, value, train: bool):
        if self.share_att == "kv":
            k = _split_heads(self.kv_proj(key, train), self.num_heads)
            v = k
        elif self.share_att == "qk":
            k = _split_heads(self.q_proj(key, train), self.num_heads)
            v = _split_heads(self.v_proj(value, train), self.num_heads)
        else:
            k = _split_heads(self.k_proj(key, train), self.num_heads)
            v = _split_heads(self.v_proj(value, train), self.num_heads)
        return k, v

    def __call__(self, query, key, value, mask=None, train: bool = False,
                 attn_dropout: bool = True):
        """Full-sequence attention. mask: (B, 1, Tq, Tk) or (B, 1, 1, Tk); 0=invalid.

        ``attn_dropout=False`` skips the attention-prob dropout — used by the
        teacher-forced SCST replay, whose step-mode counterpart
        (decode_self/decode_cross) applies none."""
        q = _split_heads(self.q_proj(query, train), self.num_heads)
        k, v = self._project_kv(key, value, train)
        drop = self.attn_dropout if (train and attn_dropout) else None
        out = scaled_dot_attention(q, k, v, mask=mask, dropout=(lambda p: drop(p, deterministic=False)) if drop else None)
        return self.out_proj(_merge_heads(out), train)

    # ---------------------------------------------------------------- decode
    def project_memory_kv(self, memory, train: bool = False):
        """Precompute cross-attention K/V once per decode (reference caches
        projected encoder K/V entirely, transformer.py:255-256)."""
        return self._project_kv(memory, memory, train)

    def decode_cross(self, x_t, mem_k, mem_v, mem_mask=None, train: bool = False):
        """x_t: (N, 1, D); mem_k/v: (B, h, S, dk) with B dividing N; mem_mask:
        (B, 1, 1, S).  When N > B (beams / random samples per image), the
        K/V rows are NOT repeated — each group of N/B query rows reads its
        image's memory via broadcast, cutting cross-attention HBM traffic by
        the group factor (the reference repeats the projected cache
        per-beam, transformer.py:240-252).

        ``mem_v=None`` means V shares K's storage (ACORT share_att="kv":
        the kv projection makes K and V identical, so the cache holds one
        copy — half the cross-cache HBM reads)."""
        if mem_v is None:
            mem_v = mem_k
        q = _split_heads(self.q_proj(x_t, train), self.num_heads)  # (N, h, 1, dk)
        b = mem_k.shape[0]
        rep = q.shape[0] // b
        if rep == 1:
            out = scaled_dot_attention(q, mem_k, mem_v, mask=mem_mask)
            return self.out_proj(_merge_heads(out), train)
        h, dk = q.shape[1], q.shape[3]
        qg = q.reshape(b, rep, h, dk)
        scores = jnp.einsum("bkhd,bhsd->bkhs", qg, mem_k) / math.sqrt(dk)
        if mem_mask is not None:
            m = mem_mask.reshape(b, 1, 1, -1)  # broadcast over the group dim
            scores = jnp.where(m == 0, jnp.asarray(NEG_INF, scores.dtype), scores)
        probs = jax.nn.softmax(scores, axis=-1)
        out = jnp.einsum("bkhs,bhsd->bkhd", probs, mem_v)  # (B, rep, h, dk)
        out = out.reshape(b * rep, 1, h * dk)
        return self.out_proj(out, train)

    def _fused_qkv_step(self, x_t):
        """q/k/v for one decode step as a single matmul over concatenated
        kernels (unshared, unmasked, eval path only).  The concatenation is
        loop-invariant, so XLA hoists it out of the decode scan — param
        layout (and the torch converter) stay untouched while the per-step
        matmul count drops 3x."""
        p = lambda mod, leaf: mod.variables["params"][leaf]  # noqa: E731
        w = jnp.concatenate([p(self.q_proj, "kernel"), p(self.k_proj, "kernel"), p(self.v_proj, "kernel")], axis=1)
        b = jnp.concatenate([p(self.q_proj, "bias"), p(self.k_proj, "bias"), p(self.v_proj, "bias")])
        qkv = jnp.dot(x_t, w.astype(x_t.dtype)) + b.astype(x_t.dtype)
        q, k, v = jnp.split(qkv, 3, axis=-1)
        return (_split_heads(q, self.num_heads), _split_heads(k, self.num_heads),
                _split_heads(v, self.num_heads))

    def decode_self(self, x_t, cache_k, cache_v, t, train: bool = False, ancestry_onehot=None):
        """Single-step causal self-attention against a static-shape cache.

        x_t: (N, 1, D); cache_k/v: (N, h, T_max, dk); t: scalar step index.
        Returns (out, new_cache_k, new_cache_v).

        ``ancestry_onehot`` (B, K, T_max, K with N = B*K) switches on
        beam-ancestry attention: cache rows are NEVER physically reordered
        by the beam search — row j keeps the K/V it wrote at each step — and
        the attention resolves beam k's history at slot t' through the
        one-hot ancestor map instead. This removes the dominant per-step HBM
        traffic of decode (full-cache gather + rewrite each step; round-2
        profile) at the cost of a K-times-larger score contraction (trivial
        FLOPs at beam widths). Exact: the one-hot selection reproduces the
        physically-reordered scores bit-for-bit in bf16/f32.
        """
        shared_cache = cache_v is None  # share_att="kv": one cache array
        # fused path only once the projection params EXIST: init-first usage
        # (model.init via decode_step) reaches here before q/k/v_proj have
        # ever been called, and the raw variables read would KeyError
        if (self.share_att is None and self.mask_cfg is None and not train
                and not self.is_initializing()):
            q, k_t, v_t = self._fused_qkv_step(x_t)
        else:
            q = _split_heads(self.q_proj(x_t, train), self.num_heads)
            k_t, v_t = self._project_kv(x_t, x_t, train)
        cache_k = jax.lax.dynamic_update_slice_in_dim(cache_k, k_t, t, axis=2)
        if shared_cache:
            # K and V are identical under the kv projection — storing one
            # copy halves the self-cache HBM write+read per step
            cache_v_read = cache_k
        else:
            cache_v = jax.lax.dynamic_update_slice_in_dim(cache_v, v_t, t, axis=2)
            cache_v_read = cache_v
        t_max = cache_k.shape[2]
        valid = (jnp.arange(t_max) <= t)[None, None, None, :]  # (1,1,1,T_max)
        if ancestry_onehot is None:
            out = scaled_dot_attention(q, cache_k, cache_v_read, mask=valid)
            return self.out_proj(_merge_heads(out), train), cache_k, cache_v

        b, k, _, _ = ancestry_onehot.shape
        h, dk = q.shape[1], q.shape[3]
        a = ancestry_onehot.astype(q.dtype)
        qg = q.reshape(b, k, h, dk)
        kg = cache_k.reshape(b, k, h, t_max, dk)
        vg = cache_v_read.reshape(b, k, h, t_max, dk)
        # scores of beam k's query against EVERY row j's key at each slot,
        # then one-hot-select the ancestor row per (k, t')
        scores_all = jnp.einsum("bkhd,bjhtd->bkhtj", qg, kg) / math.sqrt(dk)
        scores = jnp.einsum("bkhtj,bktj->bkht", scores_all, a)
        scores = jnp.where(valid, scores, jnp.asarray(NEG_INF, scores.dtype))  # (B,K,h,T)
        probs = jax.nn.softmax(scores, axis=-1)
        pa = jnp.einsum("bkht,bktj->bkhtj", probs, a)
        out = jnp.einsum("bkhtj,bjhtd->bkhd", pa, vg).reshape(b * k, 1, h * dk)
        return self.out_proj(out, train), cache_k, cache_v


# ----------------------------------------------------------------- ORT geometry
def box_relational_embedding(boxes, dim_g: int = 64, wave_len: float = 1000.0, trigonometric: bool = True):
    """Pairwise geometry features from relative box coords.

    Parity: reference ``relation_transformer.py:196-256`` — log-delta
    (cx, cy, w, h) with |dx/w| clamped at 1e-3, optional trig expansion at
    x100 scaling.  boxes: (B, R, 4) as (x_min, y_min, x_max, y_max).
    Returns (B, R, R, dim_g) (dim_g=4 when not trigonometric).
    """
    x_min, y_min, x_max, y_max = jnp.split(boxes, 4, axis=-1)  # (B, R, 1)
    cx = (x_min + x_max) * 0.5
    cy = (y_min + y_max) * 0.5
    w = (x_max - x_min) + 1.0
    h = (y_max - y_min) + 1.0

    delta_x = jnp.log(jnp.maximum(jnp.abs((cx - jnp.swapaxes(cx, 1, 2)) / w), 1e-3))
    delta_y = jnp.log(jnp.maximum(jnp.abs((cy - jnp.swapaxes(cy, 1, 2)) / h), 1e-3))
    delta_w = jnp.log(w / jnp.swapaxes(w, 1, 2))
    delta_h = jnp.log(h / jnp.swapaxes(h, 1, 2))
    position_mat = jnp.stack([delta_x, delta_y, delta_w, delta_h], axis=-1)  # (B, R, R, 4)

    if not trigonometric:
        return position_mat
    n_freq = dim_g // 8
    dim_mat = 1.0 / (wave_len ** (jnp.arange(n_freq, dtype=jnp.float32) / n_freq))
    mul = 100.0 * position_mat[..., None] * dim_mat  # (B, R, R, 4, n_freq)
    b, r = boxes.shape[0], boxes.shape[1]
    mul = mul.reshape(b, r, r, 4 * n_freq)
    return jnp.concatenate([jnp.sin(mul), jnp.cos(mul)], axis=-1)  # (B, R, R, dim_g)


class BoxMultiHeadAttention(nn.Module):
    """Geometry-biased self-attention (Object Relation Transformer encoder).

    Parity: reference ``BoxMultiHeadedAttention``
    (``relation_transformer.py:119-293``): per-head scalar geometric weight
    ``w_g = relu(WG_h(emb))`` combined as
    ``softmax(log(clamp(w_g, 1e-6)) + qk/sqrt(d))`` after the -1e9 pad fill.
    The reference's h separate Linear(dim_g, 1) layers are a single
    Dense(dim_g -> h) here (mathematically identical).
    """

    num_heads: int
    d_model: int
    trigonometric_embedding: bool = True
    dropout_rate: float = 0.1
    share_att: Optional[str] = None
    mask_cfg: Optional[MaskConfig] = None

    def setup(self):
        assert self.d_model % self.num_heads == 0
        assert self.share_att in (None, "kv", "qk"), f"invalid share_att {self.share_att}"
        dense = lambda name: MaskedDense(self.d_model, mask_cfg=self.mask_cfg, name=name)  # noqa: E731
        self.q_proj = dense("q_proj")
        if self.share_att == "kv":
            self.kv_proj = dense("kv_proj")
        elif self.share_att == "qk":
            self.v_proj = dense("v_proj")
        else:
            self.k_proj = dense("k_proj")
            self.v_proj = dense("v_proj")
        self.out_proj = dense("out_proj")
        self.wg = MaskedDense(self.num_heads, mask_cfg=self.mask_cfg, name="wg")
        self.attn_dropout = nn.Dropout(self.dropout_rate)

    @property
    def dim_g(self) -> int:
        return 64 if self.trigonometric_embedding else 4

    def __call__(self, x, boxes, mask=None, train: bool = False):
        """x: (B, R, D); boxes: (B, R, 4); mask: (B, 1, 1, R), 0=invalid."""
        q = _split_heads(self.q_proj(x, train), self.num_heads)
        if self.share_att == "kv":
            k = _split_heads(self.kv_proj(x, train), self.num_heads)
            v = k
        elif self.share_att == "qk":
            k = _split_heads(self.q_proj(x, train), self.num_heads)
            v = _split_heads(self.v_proj(x, train), self.num_heads)
        else:
            k = _split_heads(self.k_proj(x, train), self.num_heads)
            v = _split_heads(self.v_proj(x, train), self.num_heads)

        # geometry features in f32 ALWAYS: the trig expansion evaluates
        # sin/cos of x100-scaled log-deltas, where bf16's 8-bit mantissa
        # rounds the argument by more than 2*pi — the embedding degenerates
        # to noise (observed as ~40x inflated wg grads under bf16 training).
        # The tensors are tiny ((B, R, R, 64)); the result re-enters the
        # compute dtype at the wg projection below.
        geo = box_relational_embedding(boxes.astype(jnp.float32), dim_g=self.dim_g,
                                       trigonometric=self.trigonometric_embedding)
        w_g = nn.relu(self.wg(geo.astype(x.dtype), train))  # (B, R, R, h)
        # the wg projection and log/clamp run in the COMPUTE dtype on
        # purpose: w_g is O(1)-scaled, so bf16 log costs only ~1e-2 bias
        # noise (harmless under softmax), while f32 here would double the
        # HBM traffic of a (B, R, R, h) tensor inside the bandwidth-bound
        # encoder. Only the trig args above are precision-critical. The
        # trailing cast guards the f32-geo case (f32 `boxes` input must not
        # re-promote a bf16 encoder).
        log_wg = jnp.log(jnp.maximum(w_g, 1e-6)).transpose(0, 3, 1, 2).astype(q.dtype)  # (B, h, R, R)

        drop = (lambda p: self.attn_dropout(p, deterministic=False)) if train else None
        out = scaled_dot_attention(q, k, v, mask=mask, bias=log_wg, dropout=drop)
        return self.out_proj(_merge_heads(out), train)


# --------------------------------------------------------------- embeddings
class InputEmbedding(nn.Module):
    """Token embedding scaled by sqrt(d_model) (reference transformer.py:395-402)."""

    vocab_size: int
    d_model: int
    mask_cfg: Optional[MaskConfig] = None

    @nn.compact
    def __call__(self, ids, train: bool = False):
        from sparse_caption_tpu.ops.masked import MaskedEmbed

        emb = MaskedEmbed(self.vocab_size, self.d_model, mask_cfg=self.mask_cfg, name="lut")(ids, train)
        return emb * math.sqrt(self.d_model)


class Generator(nn.Module):
    """Linear + log_softmax output head (reference transformer.py:405-413)."""

    vocab_size: int
    mask_cfg: Optional[MaskConfig] = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        logits = MaskedDense(self.vocab_size, mask_cfg=self.mask_cfg, name="proj")(x, train)
        if train:
            # mixed-precision hygiene: under bf16 training the projection runs
            # on the MXU in bf16, but the log_softmax (and thus every loss)
            # accumulates in f32 — standard TPU practice; exact no-op for f32
            logits = logits.astype(jnp.float32)
        return jax.nn.log_softmax(logits, axis=-1)
