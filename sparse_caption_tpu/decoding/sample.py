"""Greedy / temperature sampling decode loop as ``lax.scan``.

Semantics parity with the reference token loop
(``sparse_caption/models/transformer.py:506-561``, duplicated at
``att_model.py:223-279``):

* feed BOS; ``max_len`` steps; ``unfinished`` latch zeroes tokens after the
  first EOS (the EOS itself is recorded); per-step chosen-token logprobs are
  recorded every step (loss masking handles the tail)
* ``decoding_constraint``: forbid repeating the previous token (t > 0)
* random mode samples from ``softmax(logprobs / temperature)``; the caller
  repeats the memory pytree ``num_random_sample`` times beforehand

The reference's "early exit when all finished" is a dynamic-shape host
optimization; under jit the scan runs the full static length (cheap: the
per-step cost is one cached decode).
"""

from __future__ import annotations

from typing import Callable, Optional, Tuple

import jax
import jax.numpy as jnp

NEG_INF = -1e30


def modified_sample_logits(logprobs: jnp.ndarray, sample_method: str, temperature: float) -> jnp.ndarray:
    """The deterministic logit transformation of the reference's
    ``sample_next_word`` (caption_model.py:228-268) for the categorical
    methods: temperature scaling plus top-k filtering (``top<k>``, k >= 1)
    or nucleus renormalization (``top<p>``, 0 < p < 1). The returned logits
    are both the sampling distribution and the values gathered as
    sample_logprobs (the reference gathers from the modified tensor)."""
    scaled = logprobs / temperature
    if not sample_method.startswith("top"):
        assert sample_method == "random", f"unknown sample_method `{sample_method}`"
        return scaled
    top_num = float(sample_method[3:])
    if 0 < top_num < 1:
        # nucleus sampling (Holtzman et al.): keep the smallest prefix of the
        # sorted distribution with cumulative mass >= p (first token always
        # kept), renormalize, write log-probs back (reference :245-256)
        probs = jax.nn.softmax(scaled, axis=-1)
        # ONE O(V log V) sort per step (this runs inside the per-token
        # sampling loop): the descending order gives both the sorted probs
        # (gather) and each token's rank (scatter of arange) — the naive
        # jnp.sort + double-argsort formulation is three vocab-wide sorts
        # for the identical result (stable argsort ⇒ identical tie ranks)
        b, v = probs.shape
        order = jnp.argsort(-probs, axis=-1)
        sorted_probs = jnp.take_along_axis(probs, order, axis=-1)
        csum = jnp.cumsum(sorted_probs, axis=-1)
        keep_sorted = jnp.concatenate(
            [jnp.ones_like(csum[:, :1], dtype=bool), csum[:, :-1] < top_num], axis=-1
        )
        n_keep = jnp.sum(keep_sorted, axis=-1, keepdims=True)  # (B, 1)
        ranks = jnp.zeros_like(order).at[jnp.arange(b)[:, None], order].set(
            jnp.arange(v, dtype=order.dtype)[None, :])
        keep = ranks < n_keep
        denom = jnp.sum(jnp.where(keep, probs, 0.0), axis=-1, keepdims=True)
        return jnp.where(keep, jnp.log(probs / denom), NEG_INF)
    k = int(top_num)
    kth = jax.lax.top_k(scaled, k)[0][:, -1:]
    return jnp.where(scaled >= kth, scaled, NEG_INF)


def sample_next_word(
    logprobs: jnp.ndarray, sample_method: str, temperature: float, key: jax.Array
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One sampling decision (parity: reference ``CaptionModel.sample_next_word``,
    caption_model.py:228-268). Returns (it (B,) int32, sample_logprobs (B,))."""
    if sample_method == "greedy":
        it = jnp.argmax(logprobs, axis=-1).astype(jnp.int32)
        lp = jnp.take_along_axis(logprobs, it[:, None], axis=-1)[:, 0]
        return it, lp
    if sample_method == "gumbel":
        # argmax of log_softmax((lp + g)/T) == argmax(lp + g); sample_logprobs
        # gathered from the ORIGINAL logprobs (reference :233-243)
        eps = 1e-20
        u = jax.random.uniform(key, logprobs.shape)
        g = -jnp.log(-jnp.log(u + eps) + eps)
        it = jnp.argmax(logprobs + g, axis=-1).astype(jnp.int32)
        lp = jnp.take_along_axis(logprobs, it[:, None], axis=-1)[:, 0]
        return it, lp
    modified = modified_sample_logits(logprobs, sample_method, temperature)
    it = jax.random.categorical(key, modified, axis=-1).astype(jnp.int32)
    lp = jnp.take_along_axis(modified, it[:, None], axis=-1)[:, 0]
    return it, lp


def sample_decode(
    step_fn: Callable,
    init_cache,
    batch_size: int,
    max_len: int,
    *,
    bos_id: int,
    eos_id: int,
    pad_id: int = 0,
    greedy: bool = True,
    temperature: float = 1.0,
    sample_method: str = "random",
    decoding_constraint: int = 0,
    rng: Optional[jax.Array] = None,
    differentiable: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Run the decode loop.

    step_fn(it, cache, t) -> (logprobs (B, V), cache) — closure over
    params/memory (already repeated for random samples).
    Returns (seq (B, max_len) int32, seq_logprobs (B, max_len)).
    """
    if rng is None:
        rng = jax.random.PRNGKey(0)

    init = (
        jnp.zeros((), jnp.int32),  # t
        jnp.full((batch_size,), bos_id, dtype=jnp.int32),  # it
        init_cache,
        jnp.ones((batch_size,), dtype=jnp.bool_),  # unfinished
        rng,
        jnp.full((batch_size, max_len), pad_id, jnp.int32),  # seq
        jnp.zeros((batch_size, max_len)),  # seq_lp
    )

    def cond(carry):
        t, _, _, unfinished, _, _, _ = carry
        # early exit once every row has emitted EOS (reference greedy loop's
        # "quit loop if all sequences have finished", transformer.py:549-551)
        return (t < max_len) & jnp.any(unfinished)

    def body(carry):
        t, it, cache, unfinished, key, seq, seq_lp = carry
        logprobs, cache = step_fn(it, cache, t)
        if decoding_constraint:
            # forbid the previous token (only meaningful for t > 0; at t == 0
            # `it` is BOS which the model never emits anyway)
            prev_penalty = jax.nn.one_hot(it, logprobs.shape[-1]) * -jnp.inf
            logprobs = jnp.where(t > 0, logprobs + jnp.nan_to_num(prev_penalty, neginf=-1e30), logprobs)
        if greedy:
            next_it = jnp.argmax(logprobs, axis=-1).astype(jnp.int32)
            chosen_lp = jnp.take_along_axis(logprobs, next_it[:, None], axis=-1)[:, 0]
        elif sample_method == "random":
            # reference random loop: multinomial(exp(lp/T)) with lp gathered
            # from the raw logprobs (transformer.py:533-541)
            key, sub = jax.random.split(key)
            next_it = jax.random.categorical(sub, logprobs / temperature, axis=-1).astype(jnp.int32)
            chosen_lp = jnp.take_along_axis(logprobs, next_it[:, None], axis=-1)[:, 0]
        else:  # greedy / gumbel / top-k / nucleus sample_next_word variants
            key, sub = jax.random.split(key)
            next_it, chosen_lp = sample_next_word(logprobs, sample_method, temperature, sub)
        chosen_lp = chosen_lp.astype(seq_lp.dtype)
        tok = jnp.where(unfinished, next_it, jnp.int32(pad_id))
        seq = seq.at[:, t].set(tok)
        seq_lp = seq_lp.at[:, t].set(chosen_lp)
        unfinished = unfinished & (next_it != eos_id)
        return (t + 1, tok, cache, unfinished, key, seq, seq_lp)

    if differentiable:
        # reverse-mode AD cannot cross lax.while_loop; SCST-with-grads uses a
        # fixed-length scan instead (no early exit)
        def scan_body(carry, t):
            new = body((t,) + carry)
            return new[1:], None

        carry = init[1:]
        for_scan = jax.lax.scan(scan_body, carry, jnp.arange(max_len))[0]
        _, _, _, _, seq, seq_lp = for_scan
        return seq, seq_lp

    _, _, _, _, _, seq, seq_lp = jax.lax.while_loop(cond, body, init)
    return seq, seq_lp
