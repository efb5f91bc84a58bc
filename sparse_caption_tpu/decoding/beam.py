"""Batched beam search as a fixed-shape ``lax.scan``.

Rebuild of the reference's classic beam search
(``sparse_caption/models/caption_model.py:30-226``) as a pure function:
no python-list state reorders — the cache pytree is gather-reordered on the
batch axis every step.

Semantics parity:
* candidates = beam score + logprob, top-K over ``K*V`` per image
  (``caption_model.py:56-111``); first step restricted to beam 0 via -inf
  init scores (reference feeds BOS once then expands,
  ``transformer.py:481-505`` — same selected beams)
* a beam that emits EOS at step t (or survives to the last step) is copied
  to the done set with length-penalty-adjusted score
  ``penalty(t+1, sum_lp)``; its live score is then dropped by 1000
  (``caption_model.py:194-210``)
* constraints: ``decoding_constraint`` (no immediate repeat),
  ``suppress_UNK`` (-1000 on the unk id), bad-ending suppression (forbid
  EOS after a bad-ending word; the reference writes -inf on token 0 — an
  artifact of the ancestor repo where id 0 *was* EOS — the intent is
  "don't end after a dangling word", implemented here on the real EOS id)
* per-step chosen-token logprobs are recorded per beam (B, K, T) so SCST
  can attach gradients (reference stores full (B,K,T,V) and gathers later)
* done set kept fixed-shape: merge(live finishers, done) -> top-K by score

Diverse beam search (``group_size > 1``) staggers groups in time; supported
via sequential per-group scans with a cross-group diversity penalty.
"""

from __future__ import annotations

import os
from typing import Callable, NamedTuple, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp

from sparse_caption_tpu.decoding.penalties import penalty_fn

NEG_BIG = -1e18

# Strategy for the V-wide per-beam top-K (the one op in the beam step that
# touches the whole vocab; round-2 profile: 0.92 ms/step at batch 1024,
# ~7x off the HBM read roofline for f32 lax.top_k on TPU).
#   exact  - f32 lax.top_k (bit-exact; CPU default so the beam-output
#            oracle tests vs the live reference stay exact)
#   bf16   - select indices on a bf16 cast (halves the sort's compare
#            bandwidth), then gather the f32 values of the K winners (the
#            candidate resolve stays f32-exact). Only token selections
#            whose f32 logprobs differ by < 1 bf16 ulp can flip — below
#            sampling noise for beam search. TPU default.
#   approx - jax.lax.approx_max_k(recall_target=1.0) (TPU PartialReduce)


def _row_topk(scores, k: int):
    """Top-k over the trailing (vocab) axis; see the mode table above.

    The env var is read HERE (trace time, zero runtime cost), not at module
    import — a test/script that imports the package first and sets
    SPARSE_CAPTION_BEAM_TOPK afterwards must still get the requested mode."""
    mode = os.environ.get("SPARSE_CAPTION_BEAM_TOPK", "auto")
    if mode == "auto":
        mode = "bf16" if jax.default_backend() == "tpu" else "exact"
    if mode == "bf16" and scores.dtype == jnp.float32:
        _, idx = jax.lax.top_k(scores.astype(jnp.bfloat16), k)
        return jnp.take_along_axis(scores, idx, axis=-1), idx
    if mode == "approx":
        return jax.lax.approx_max_k(scores, k, recall_target=1.0)
    return jax.lax.top_k(scores, k)


class BeamState(NamedTuple):
    tokens: jnp.ndarray  # (B*K,) last emitted token
    cache: object  # pytree, batch axis = B*K
    sum_lp: jnp.ndarray  # (B, K) live beam scores
    seq: jnp.ndarray  # (B, K, T)
    seq_lp: jnp.ndarray  # (B, K, T) chosen-token logprobs
    done_score: jnp.ndarray  # (B, K) penalized finished scores
    done_seq: jnp.ndarray  # (B, K, T)
    done_seq_lp: jnp.ndarray  # (B, K, T)


def _gather_beams(x, beam_ix, batch_size: int, k: int):
    """Gather along a flat (B*K, ...) batch axis by per-image beam index (B, K).

    A top-level ``"static"`` subtree is exempt: entries there are identical
    across an image's beams (e.g. projected cross-attention K/V), so the
    within-image permutation is a value identity — skipping it avoids
    re-writing hundreds of MB of cache per step at paper scale.
    """
    flat_ix = (beam_ix + jnp.arange(batch_size)[:, None] * k).reshape(-1)
    # within-image K-way selection as a one-hot matmul: XLA lowers jnp.take
    # here to a windowed select_n loop ~20x off the bandwidth roofline (the
    # single hottest op of the whole decode); a (B, K, K) 0/1 matmul is one
    # bandwidth-bound op and EXACT (coefficients are exactly 0/1)
    onehot = jax.nn.one_hot(beam_ix, k)  # (B, K, K)

    def sel(a):
        if a.ndim >= 1 and a.shape[0] == batch_size * k:
            rows = a.reshape(batch_size, k, -1)
            out = jnp.einsum("bij,bjr->bir", onehot.astype(a.dtype), rows)
            return out.reshape(a.shape)
        return jnp.take(a, flat_ix, axis=0)

    if isinstance(x, dict) and "ancestry" in x:
        # ancestry mode: the K/V cache rows are never reordered — only the
        # tiny (B, K, T) ancestor map is gathered by parent beam (the model
        # resolves ancestry inside attention, layers.decode_self)
        out = dict(x)
        out["ancestry"] = jnp.take_along_axis(x["ancestry"], beam_ix[..., None], axis=1)
        return out
    if isinstance(x, dict) and "static" in x:
        rest = {kk: v for kk, v in x.items() if kk != "static"}
        out = jax.tree.map(sel, rest)
        out["static"] = x["static"]
        return out
    return jax.tree.map(sel, x)


def beam_search(
    step_fn: Callable,
    init_cache,
    batch_size: int,
    beam_size: int,
    max_len: int,
    vocab_size: int,
    *,
    bos_id: int,
    eos_id: int,
    pad_id: int = 0,
    unk_id: int = 1,
    length_penalty: str = "",
    decoding_constraint: int = 0,
    suppress_unk: int = 0,
    bad_ending_ids: Optional[Sequence[int]] = None,
    diversity_penalty_tokens: Optional[jnp.ndarray] = None,
    diversity_lambda: float = 0.5,
    return_seq_snapshots: bool = False,
) -> Tuple[jnp.ndarray, ...]:
    """Beam search over ``step_fn(it, cache, t) -> (logprobs (B*K, V), cache)``.

    The caller must pre-repeat memory/cache pytrees to batch ``B*K``
    (interleaved: image i occupies rows i*K..(i+1)*K-1).
    Returns (seq (B, K, max_len) int32, seq_logprobs (B, K, max_len)),
    sorted by penalized score per image, descending.
    """
    k = beam_size
    penalty = penalty_fn(length_penalty)
    bad_ids = jnp.asarray(list(bad_ending_ids), dtype=jnp.int32) if bad_ending_ids else None

    init = BeamState(
        tokens=jnp.full((batch_size * k,), bos_id, dtype=jnp.int32),
        cache=init_cache,
        sum_lp=jnp.where(jnp.arange(k)[None, :] == 0, 0.0, NEG_BIG) * jnp.ones((batch_size, 1)),
        seq=jnp.full((batch_size, k, max_len), pad_id, dtype=jnp.int32),
        seq_lp=jnp.zeros((batch_size, k, max_len)),
        done_score=jnp.full((batch_size, k), NEG_BIG),
        done_seq=jnp.full((batch_size, k, max_len), pad_id, dtype=jnp.int32),
        done_seq_lp=jnp.zeros((batch_size, k, max_len)),
    )

    def body(state: BeamState, t):
        logprobs, cache = step_fn(state.tokens, state.cache, t)  # (B*K, V)

        constrained = logprobs
        if decoding_constraint:
            prev = state.tokens  # (B*K,)
            pen = jax.nn.one_hot(prev, vocab_size) * NEG_BIG
            constrained = jnp.where(t > 0, constrained + pen, constrained)
        if bad_ids is not None:
            is_bad = jnp.isin(state.tokens, bad_ids)  # (B*K,)
            eos_pen = jnp.where(is_bad[:, None] & (jnp.arange(vocab_size)[None, :] == eos_id), NEG_BIG, 0.0)
            constrained = jnp.where(t > 0, constrained + eos_pen, constrained)
        if suppress_unk:
            constrained = constrained.at[:, unk_id].add(-1000.0)
        if diversity_penalty_tokens is not None:
            # diverse groups: subtract lambda x count of tokens earlier groups
            # chose at this local time (reference add_diversity,
            # caption_model.py:33-52)
            prev_t = jax.lax.dynamic_index_in_dim(
                diversity_penalty_tokens, t, axis=2, keepdims=False
            )  # (B, prev_beams)
            change = jnp.sum(jax.nn.one_hot(prev_t, vocab_size), axis=1)  # (B, V)
            constrained = constrained - jnp.repeat(change, k, axis=0) * diversity_lambda

        # two-level top-k (exact): each beam can contribute at most K winners
        # to the per-image top-K (sum_lp is constant within a beam), so take
        # the per-beam top-K tokens first (one V-wide pass) and resolve the
        # final top-K over the tiny (K, K) candidate grid. This removes the
        # (B, K*V) candidate materialization + vocab-wide select that
        # dominated the decode step (CLAUDE.md round-1 profile).
        row_lp, row_tok = _row_topk(constrained, k)  # (B*K, K) augmented
        cand = state.sum_lp[..., None] + row_lp.reshape(batch_size, k, k).astype(state.sum_lp.dtype)
        top_scores, flat_ix = jax.lax.top_k(cand.reshape(batch_size, k * k), k)  # (B, K)
        beam_ix = flat_ix // k  # parent beam
        rank_ix = flat_ix % k  # which of the parent's top-K tokens
        tok_grid = row_tok.reshape(batch_size, k, k)
        tok_ix = jnp.take_along_axis(
            jnp.take_along_axis(tok_grid, beam_ix[..., None], axis=1), rank_ix[..., None], axis=2
        )[..., 0].astype(jnp.int32)

        # reorder histories + cache by parent beam
        seq = jnp.take_along_axis(state.seq, beam_ix[..., None], axis=1)
        seq_lp = jnp.take_along_axis(state.seq_lp, beam_ix[..., None], axis=1)
        cache = _gather_beams(cache, beam_ix, batch_size, k)

        # record token + its unaugmented logprob: gather the raw values of
        # the K*K candidate tokens only (V-wide work is over by this point)
        raw_grid = jnp.take_along_axis(logprobs, row_tok, axis=1).reshape(batch_size, k, k)
        chosen_lp = jnp.take_along_axis(
            jnp.take_along_axis(raw_grid, beam_ix[..., None], axis=1), rank_ix[..., None], axis=2
        )[..., 0]
        chosen_lp = chosen_lp.astype(state.seq_lp.dtype)  # scores accumulate in f32 even for bf16 models
        seq = jax.lax.dynamic_update_index_in_dim(seq.transpose(2, 0, 1), tok_ix, t, axis=0).transpose(1, 2, 0)
        seq_lp = jax.lax.dynamic_update_index_in_dim(seq_lp.transpose(2, 0, 1), chosen_lp, t, axis=0).transpose(1, 2, 0)
        sum_lp = top_scores

        # finished handling
        is_end = (tok_ix == eos_id) | jnp.equal(t, max_len - 1)
        fin_score = jnp.where(is_end, penalty(t + 1.0, sum_lp), NEG_BIG)  # (B, K)
        merged_score = jnp.concatenate([state.done_score, fin_score], axis=1)  # (B, 2K)
        merged_seq = jnp.concatenate([state.done_seq, seq], axis=1)
        merged_seq_lp = jnp.concatenate([state.done_seq_lp, seq_lp], axis=1)
        best_scores, best_ix = jax.lax.top_k(merged_score, k)
        done_seq = jnp.take_along_axis(merged_seq, best_ix[..., None], axis=1)
        done_seq_lp = jnp.take_along_axis(merged_seq_lp, best_ix[..., None], axis=1)

        # knock finished live beams down (reference -1000, caption_model.py:210)
        sum_lp = jnp.where(is_end, sum_lp - 1000.0, sum_lp)

        new_state = BeamState(
            tokens=tok_ix.reshape(-1),
            cache=cache,
            sum_lp=sum_lp,
            seq=seq,
            seq_lp=seq_lp,
            done_score=best_scores,
            done_seq=done_seq,
            done_seq_lp=done_seq_lp,
        )
        # live-beam snapshot after this step: diverse groups read earlier
        # groups' *live* (reordered) beam tokens at a staggered time offset
        # (reference add_diversity, caption_model.py:40-43)
        return new_state, (seq if return_seq_snapshots else None)

    final, snapshots = jax.lax.scan(body, init, jnp.arange(max_len))
    # done set is already top-K sorted by penalized score
    if return_seq_snapshots:
        return final.done_seq, final.done_seq_lp, snapshots
    return final.done_seq, final.done_seq_lp
