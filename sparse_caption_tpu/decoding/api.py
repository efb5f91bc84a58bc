"""Generation orchestrator (parity: reference ``_generate_captions``,
``sparse_caption/models/transformer.py:445-561`` / ``att_model.py:180-279``).

Dispatch on the opt dict exactly like the reference:
* ``num_random_sample > 0`` (requires ``beam_size < 1``): temperature
  sampling with the memory repeated per sample
* ``beam_size > 1``: batched beam search
* else: greedy

Returns ``(seq, seq_logprobs)`` with ``seq: (B, num_return, max_len)``
(reference ``transformer.py:553-561``).
"""

from __future__ import annotations

from typing import Any, Dict, Optional

import jax
import jax.numpy as jnp

from sparse_caption_tpu.decoding.beam import beam_search
from sparse_caption_tpu.decoding.sample import sample_decode


def _repeat_pytree(tree, n: int):
    """Repeat-interleave every leaf along axis 0 (reference repeat_tensors,
    utils/model_utils.py:31-44)."""
    return jax.tree.map(lambda x: jnp.repeat(x, n, axis=0), tree)


def decode_train_keys(rng):
    """Derive (sampling_rng, dropout_key, mask_key, init_key) for a
    train-mode decode. Shared with the SCST teacher-forced gradient pass,
    which must reproduce exactly the per-site dropout keys that
    ``generate(..., decode_train=True, rng=rng)`` used."""
    rng, step_key, init_key = jax.random.split(rng, 3)
    dropout_key, mask_key = jax.random.split(step_key)
    return rng, dropout_key, mask_key, init_key


def generate(
    model,
    variables,
    memory: Dict[str, Any],
    opt: Optional[Dict[str, Any]] = None,
    rng: Optional[jax.Array] = None,
    batch_size: Optional[int] = None,
):
    """Decode captions from an encoded memory pytree.

    ``model`` must expose init_cache / decode_step methods (see models/__init__).
    """
    opt = opt or {}
    num_random_sample = int(opt.get("num_random_sample", 0))
    beam_size = int(opt.get("beam_size", 1))
    temperature = float(opt.get("temperature", 1.0))
    decoding_constraint = int(opt.get("decoding_constraint", 0))
    max_len = int(opt.get("max_seq_length", model.max_seq_length))
    decode_train = bool(opt.get("decode_train", False))

    b = batch_size if batch_size is not None else jax.tree.leaves(memory)[0].shape[0]

    step_key = init_key = None
    dropout_folds_t = bool(getattr(model, "DECODE_DROPOUT_FOLDS_T", False))
    if decode_train:
        # train-mode decode (SCST sampling policy, reference model.train() +
        # _sample, utils/training.py:225-237): per-step dropout + supermask
        # Bernoulli rngs, keyed by t so a re-run with the same `rng`
        # reproduces the identical policy realization. Transformer-family
        # models fold the dropout key by t INSIDE each site (TimeDropout),
        # so the base key is passed unchanged every step and a single
        # teacher-forced replay can reproduce the whole decode (the fast
        # SCST gradient pass); other models get the per-step outer fold.
        assert rng is not None, "decode_train requires an rng"
        rng, dropout_key, mask_key, init_key = decode_train_keys(rng)
        step_key = (dropout_key, mask_key)

    def make_step(mem):
        def step_fn(it, cache, t):
            if step_key is not None:
                dropout_key, mask_key = step_key
                kd = dropout_key if dropout_folds_t else jax.random.fold_in(dropout_key, t)
                km = jax.random.fold_in(mask_key, t)
                return model.apply(variables, it, cache, t, mem, True,
                                   method="decode_step", rngs={"dropout": kd, "mask": km})
            return model.apply(variables, it, cache, t, mem, method="decode_step")

        return step_fn

    grouped = bool(getattr(model, "SUPPORTS_GROUPED_DECODE", False))

    def grouped_cache(rows_per_image: int, beam_ancestry: bool = False):
        """Cache + step memory for models that read one cross-K/V row per
        image (no memory repeat); falls back to physical repeat otherwise."""
        # train-mode decode also Bernoulli-samples the cached cross-K/V
        # projection masks once (the reference projects them on the first
        # train-mode step and caches, transformer.py:255-256)
        kw = dict(train=True, rngs={"mask": init_key}) if decode_train else {}
        # cache sized EXACTLY max_len: the loop writes slots 0..max_len-1,
        # and every per-step attention reads the whole static cache, so one
        # spare slot is ~6% wasted HBM traffic at paper scale
        if grouped:
            cache = model.apply(variables, memory, max_len, rows_per_image, beam_ancestry,
                                method="init_cache", **kw)
            return cache, memory
        mem = _repeat_pytree(memory, rows_per_image)
        return model.apply(variables, mem, max_len, method="init_cache", **kw), mem

    if num_random_sample > 0:
        assert beam_size < 1, f"beam_size must be < 1 for random sampling, got {beam_size}"
        cache, mem = grouped_cache(num_random_sample)
        seq, seq_lp = sample_decode(
            make_step(mem), cache, b * num_random_sample, max_len,
            bos_id=model.bos_id, eos_id=model.eos_id, pad_id=model.pad_id,
            greedy=False, temperature=temperature,
            sample_method=str(opt.get("sample_method", "random")),
            decoding_constraint=decoding_constraint, rng=rng,
            differentiable=bool(opt.get("differentiable", False)),
        )
        return seq.reshape(b, num_random_sample, max_len), seq_lp.reshape(b, num_random_sample, max_len)

    if beam_size > 1:
        group_size = int(opt.get("group_size", 1))
        vocab = model.vocab_size
        common = dict(
            bos_id=model.bos_id, eos_id=model.eos_id, pad_id=model.pad_id,
            unk_id=model.unk_id,
            length_penalty=str(opt.get("length_penalty", "")),
            decoding_constraint=decoding_constraint,
            suppress_unk=int(opt.get("suppress_UNK", 0)),
            bad_ending_ids=opt.get("bad_ending_ids"),
        )
        if group_size <= 1:
            cache, mem = grouped_cache(beam_size, beam_ancestry=True)
            return beam_search(make_step(mem), cache, b, beam_size, max_len, vocab, **common)

        # diverse beam search (reference caption_model.py:30-226): the
        # reference staggers groups in time — group g at local time t reads
        # earlier group p's LIVE beam tokens at position t as of p's step
        # t + (g - p) (add_diversity, caption_model.py:40-43). Groups run as
        # sequential scans here; each records per-step live-beam snapshots
        # so later groups can replay that exact staggered view.
        assert beam_size % group_size == 0, "beam_size must divide by group_size"
        bdash = beam_size // group_size
        div_lambda = float(opt.get("diversity_lambda", 0.5))

        def staggered_tokens(snap, off):
            """(B, bdash, T): prev group's live beams' token at position t, as
            seen after that group's scan step min(t + off, T-1)."""
            t_total = snap.shape[0]
            rows = snap[jnp.minimum(jnp.arange(t_total) + off, t_total - 1)]  # (T, B, K, T)
            idx = jnp.arange(t_total)[:, None, None, None]
            col = jnp.take_along_axis(rows, idx, axis=3)[..., 0]  # (T, B, K)
            return col.transpose(1, 2, 0)

        seqs_out, lps_out, snapshots = [], [], []
        for divm in range(group_size):
            prev_tokens = None
            if divm > 0:
                prev_tokens = jnp.concatenate(
                    [staggered_tokens(snapshots[p], divm - p) for p in range(divm)], axis=1
                )
            cache, mem = grouped_cache(bdash, beam_ancestry=True)
            seq_g, lp_g, snap_g = beam_search(
                make_step(mem), cache, b, bdash, max_len, vocab,
                diversity_penalty_tokens=prev_tokens, diversity_lambda=div_lambda,
                return_seq_snapshots=True,
                **common,
            )
            seqs_out.append(seq_g)
            lps_out.append(lp_g)
            snapshots.append(snap_g)
        return jnp.concatenate(seqs_out, axis=1), jnp.concatenate(lps_out, axis=1)

    cache, mem = grouped_cache(1)
    seq, seq_lp = sample_decode(
        make_step(mem), cache, b, max_len,
        bos_id=model.bos_id, eos_id=model.eos_id, pad_id=model.pad_id,
        greedy=True, decoding_constraint=decoding_constraint, rng=rng,
    )
    return seq[:, None, :], seq_lp[:, None, :]
