"""Device-resident CIDEr-D reward (scst/device_reward.py).

1. scorer parity: the jitted device scorer reproduces the host
   ``CiderScorer`` (itself golden-matched to both reference vendored
   scorers) on adversarial inputs — pad/bos noise inside sampled ids,
   empty captions, repeated grams, OOV and literal-``<unk>`` reference
   words — to f32 tolerance.
2. engine parity: an SCST train step with ``--scst_reward device``
   produces the same parameter update as the host-reward step.
3. fused: with device rewards the single-jit fused step (no io_callback)
   equals the two-phase device step.
"""

import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))

from sparse_caption_tpu.metrics.cider import CiderScorer, build_df_pickle
from sparse_caption_tpu.scst import device_reward as devr


def _host_decode(ids, vocab):
    """Mirror tokenizers/word.py decode: stop at eos, skip pad/bos."""
    words = []
    for i in ids:
        if i == 3:
            break
        if i in (0, 2):
            continue
        words.append(vocab[i] if 0 <= i < len(vocab) else "<unk>")
    return " ".join(words)


@pytest.fixture(scope="module")
def cider_setup(tmp_path_factory):
    rng = np.random.default_rng(0)
    vocab = ["<pad>", "<unk>", "<bos>", "<eos>"] + [f"w{i}" for i in range(4, 60)]
    tok2id = {w: i for i, w in enumerate(vocab)}

    def sent(lo=3, hi=12):
        return " ".join(rng.choice(vocab[4:], rng.integers(lo, hi)))

    corpus = [[sent() for _ in range(5)] for _ in range(30)]
    df_path = str(tmp_path_factory.mktemp("df") / "df.p")
    build_df_pickle(corpus, df_path)
    scorer = CiderScorer.from_pickle(df_path)
    return vocab, tok2id, scorer, sent


def test_device_cider_matches_host_scorer(cider_setup):
    import jax
    import jax.numpy as jnp

    vocab, tok2id, scorer, sent = cider_setup
    rng = np.random.default_rng(1)
    b, spi, t = 6, 3, 12

    gts = [[sent() for _ in range(int(rng.integers(2, 6)))] for _ in range(b)]
    gts[0][0] += " zzz zzz qqq"  # OOV ref words: must never match a sampled id
    gts[1][0] += " <unk>"  # literal <unk> ref word DOES match sampled id 1

    ids = rng.integers(0, len(vocab), (b * spi, t)).astype(np.int32)
    ids[0, :] = 3  # empty caption (eos at position 0)
    ids[1, :4] = [5, 0, 2, 5]  # pad/bos noise inside the caption
    ids[1, 4:] = 3
    ids[2, :] = 7  # no eos at all + max repetition
    ids[3, :6] = [8, 9, 8, 9, 8, 3]  # repeated bigrams
    img_idx = np.repeat(np.arange(b), spi).astype(np.int32)

    host = CiderScorer(df=scorer.df, ref_len=scorer.ref_len)
    for k in range(b * spi):
        host.append(_host_decode(ids[k], vocab), gts[img_idx[k]])
    _, want = host.compute()

    table = devr.DfTable.build(scorer.df, scorer.ref_len, tok2id)
    fn = jax.jit(devr.make_cider_device_fn(table))
    pack = devr.build_ref_pack(gts, scorer.df, scorer.ref_len, tok2id,
                               vocab_size=len(vocab))
    got = np.asarray(fn(jnp.asarray(ids), jnp.asarray(img_idx),
                        table.device_arrays(), devr.ref_pack_device(pack)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    assert np.any(want > 0), "degenerate fixture: all-zero host scores"


def test_ref_pack_bucketing_pads_are_neutral(cider_setup):
    """Padding L/R up (the engine's bucketing) must not change scores."""
    import jax
    import jax.numpy as jnp

    vocab, tok2id, scorer, sent = cider_setup
    rng = np.random.default_rng(2)
    gts = [[sent() for _ in range(3)] for _ in range(2)]
    ids = rng.integers(4, len(vocab), (4, 10)).astype(np.int32)
    ids[:, -1] = 3
    img_idx = np.asarray([0, 0, 1, 1], np.int32)

    table = devr.DfTable.build(scorer.df, scorer.ref_len, tok2id)
    fn = jax.jit(devr.make_cider_device_fn(table))

    def run(**kw):
        pack = devr.build_ref_pack(gts, scorer.df, scorer.ref_len, tok2id,
                                   vocab_size=len(vocab), **kw)
        return np.asarray(fn(jnp.asarray(ids), jnp.asarray(img_idx),
                             table.device_arrays(), devr.ref_pack_device(pack)))

    np.testing.assert_allclose(run(), run(max_refs=7, max_grams=96), rtol=1e-6)


def test_leave_one_out_baseline_matches_host():
    import jax.numpy as jnp

    sc = np.random.default_rng(3).random(12).astype(np.float32)
    spi = 4
    sums = sc.reshape(-1, spi).sum(-1)
    want = (np.repeat(sums, spi) - sc) / (spi - 1)  # scst/scorers.py:104-105
    got = np.asarray(devr.leave_one_out_baseline(jnp.asarray(sc), spi))
    np.testing.assert_allclose(got, want, rtol=1e-5)


# --------------------------------------------------------------- engine level
from sparse_caption_tpu.config import Config  # noqa: E402
from sparse_caption_tpu.opts import parse_opt  # noqa: E402

TINY = ["--d_model", "8", "--dim_feedforward", "16", "--num_layers", "1", "--num_heads", "2"]


def _dense_module(fixture_dataset, tmp_path, extra=()):
    argv = [
        "--caption_model", "transformer",
        "--dataset", "mscoco_testing",
        "--dataset_dir", fixture_dataset,
        "--log_dir", str(tmp_path),
        "--tokenizer", "word",
        "--vocab_size", "64",
        "--batch_size", "2",
        "--max_epochs", "1",
        "--max_seq_length", "10",
        "--max_att_regions", "8",
        "--att_feat_size", "16",
        "--seq_per_img", "3",
        "--cache_min_free_ram", "1.0",
        "--scst_start_epoch", "0",
        "--scst_num_samples", "3",
        "--scst_sample", "random",
    ] + TINY + list(extra)
    args = parse_opt(argv)
    config = Config(**vars(args))
    from sparse_caption_tpu.engine.training import TrainingModule

    module = TrainingModule(config)
    module.prepare()
    module.init_state()
    return module


@pytest.mark.parametrize("baseline", ["greedy", "sample"])
def test_device_reward_step_matches_host_step(fixture_dataset, tmp_path, baseline):
    """Same state + batch + (state.step-derived) key: the device-reward SCST
    step reproduces the host-reward step's update (rewards f32 vs f64)."""
    import jax

    host = _dense_module(fixture_dataset, tmp_path / "host",
                         extra=["--scst_baseline", baseline])
    dev = _dense_module(fixture_dataset, tmp_path / "dev",
                        extra=["--scst_baseline", baseline, "--scst_reward", "device"])
    assert getattr(dev, "scst_device", None) is not None
    for a, b in zip(jax.tree.leaves(host.state.params), jax.tree.leaves(dev.state.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    batch_h = next(iter(host.train_loader))
    batch_d = next(iter(dev.train_loader))
    state_h, loss_h, aux_h = host.make_scst_step()(host.state, batch_h)
    state_d, loss_d, aux_d = dev.make_scst_step()(dev.state, batch_d)

    np.testing.assert_allclose(float(loss_h), float(loss_d), atol=1e-5)
    np.testing.assert_allclose(float(aux_h["avg_reward"]), float(aux_d["avg_reward"]),
                               atol=1e-5)
    for a, b in zip(jax.tree.leaves(state_h.params), jax.tree.leaves(state_d.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_device_fused_step_equals_device_two_phase(fixture_dataset, tmp_path):
    """The fused single-jit step with in-jit rewards (NO io_callback — the
    path that runs on callback-less TPU backends) equals the two-phase
    device step: both derive the same key from state.step."""
    import jax

    module = _dense_module(fixture_dataset, tmp_path / "fd",
                           extra=["--scst_baseline", "sample", "--scst_reward", "device"])
    two = module.make_scst_step()
    fused = module.make_scst_fused_step()
    batch = next(iter(module.train_loader))

    state_a, loss_a, _ = two(module.state, batch)
    state_b, loss_b, _ = fused(module.state, batch)
    np.testing.assert_allclose(float(loss_a), float(loss_b), atol=1e-6)
    for a, b in zip(jax.tree.leaves(state_a.params), jax.tree.leaves(state_b.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_pipelined_factory_defers_to_device_step(fixture_dataset, tmp_path):
    module = _dense_module(fixture_dataset, tmp_path / "pl",
                           extra=["--scst_baseline", "sample", "--scst_reward", "device",
                                  "--scst_pipeline"])
    step = module.make_scst_pipelined_step()
    assert not hasattr(step, "flush")  # the device serial step, not the pipeline


def test_device_reward_beam_mode_matches_host(fixture_dataset, tmp_path):
    """Beam-search sampling + device rewards: the grad pass differentiates
    through the beam recompute; rewards still match the host scorer."""
    import jax

    extra = ["--scst_sample", "beam_search", "--scst_baseline", "sample",
             "--scst_num_samples", "2"]
    host = _dense_module(fixture_dataset, tmp_path / "bh", extra=extra)
    dev = _dense_module(fixture_dataset, tmp_path / "bd",
                        extra=extra + ["--scst_reward", "device"])
    state_h, loss_h, _ = host.make_scst_step()(host.state, next(iter(host.train_loader)))
    state_d, loss_d, _ = dev.make_scst_step()(dev.state, next(iter(dev.train_loader)))
    np.testing.assert_allclose(float(loss_h), float(loss_d), atol=1e-5)
    for a, b in zip(jax.tree.leaves(state_h.params), jax.tree.leaves(state_d.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_device_reward_supermask_module(fixture_dataset, tmp_path):
    """Pruned (supermask) model: the device branch runs the scan-recompute
    grad path; rewards/updates match host scoring (the paper's sparse-SCST
    stages can use --scst_reward device)."""
    import jax

    argv_common = [
        "--caption_model", "transformer_prune",
        "--dataset", "mscoco_testing",
        "--dataset_dir", fixture_dataset,
        "--tokenizer", "word",
        "--vocab_size", "64",
        "--batch_size", "2",
        "--max_epochs", "1",
        "--max_seq_length", "10",
        "--max_att_regions", "8",
        "--att_feat_size", "16",
        "--seq_per_img", "3",
        "--cache_min_free_ram", "1.0",
        "--prune_type", "supermask",
        "--prune_sparsity_target", "0.5",
        "--scst_start_epoch", "0",
        "--scst_num_samples", "3",
        "--scst_sample", "random",
        "--scst_baseline", "sample",
    ] + TINY

    def mk(log_dir, extra):
        from sparse_caption_tpu.engine.prune_training import PruneTrainingModule

        args = parse_opt(argv_common + ["--log_dir", str(log_dir)] + list(extra),
                         include_pruning=True)
        m = PruneTrainingModule(Config(**vars(args)))
        m.prepare()
        m.init_state()
        return m

    host = mk(tmp_path / "sh", [])
    dev = mk(tmp_path / "sd", ["--scst_reward", "device"])
    state_h, loss_h, _ = host.make_scst_step()(host.state, next(iter(host.train_loader)))
    state_d, loss_d, _ = dev.make_scst_step()(dev.state, next(iter(dev.train_loader)))
    np.testing.assert_allclose(float(loss_h), float(loss_d), atol=1e-5)
    for a, b in zip(jax.tree.leaves(state_h.params), jax.tree.leaves(state_d.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
    for a, b in zip(jax.tree.leaves(state_h.masks), jax.tree.leaves(state_d.masks)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_device_weighted_cider_bleu_matches_host_scorer(cider_setup, tmp_path):
    """The published reward mix (cider 1.0 + bleu 0,0,0,1,
    commands_pruning.sh:69) on device vs the host CaptionScorer."""
    import jax
    import jax.numpy as jnp

    from sparse_caption_tpu.scst.scorers import CaptionScorer

    vocab, tok2id, scorer, sent = cider_setup
    rng = np.random.default_rng(4)
    b, spi, t = 4, 3, 12
    gts = [[sent(lo=6, hi=11) for _ in range(3)] for _ in range(b)]
    ids = rng.integers(0, len(vocab), (b * spi, t)).astype(np.int32)
    ids[0, :] = 3  # empty caption
    ids[1, 6:] = 3
    img_idx = np.repeat(np.arange(b), spi).astype(np.int32)
    # ref-copied candidates: real 4-gram matches so BLEU-4 is materially
    # nonzero (random captions never match a 4-gram)
    for k in (2, 5, 7, 10):
        i = img_idx[k]
        wids = [tok2id[w] for w in gts[i][k % 3].split()][: t - 1]
        if k in (5, 10):  # partial copy: brevity penalty + clipped counts
            wids = wids[:6]
        ids[k, :] = 3
        ids[k, : len(wids)] = wids

    # host: CaptionScorer combines CIDEr-D + per-image BLEU (closest)
    df_path = scorer  # scorer fixture already loaded from its pickle
    host_scorer = CaptionScorer.__new__(CaptionScorer)
    host_scorer.path_to_cached_tokens = ""
    host_scorer.cider_weight = 1.0
    host_scorer.bleu_weight = [0.0, 0.0, 0.0, 1.0]
    host_scorer._df_cache = (df_path.df, df_path.ref_len)
    sample = [[_host_decode(ids[i * spi + j], vocab) for j in range(spi)]
              for i in range(b)]
    sc_host, sc_base_host = host_scorer(refs=gts, sample=sample, baseline=None)

    table = devr.DfTable.build(scorer.df, scorer.ref_len, tok2id)
    fn = jax.jit(devr.make_reward_device_fn(table, cider_weight=1.0,
                                            bleu_weight=(0, 0, 0, 1)))
    pack = devr.build_ref_pack(gts, scorer.df, scorer.ref_len, tok2id,
                               vocab_size=len(vocab))
    got = np.asarray(fn(jnp.asarray(ids), jnp.asarray(img_idx),
                        table.device_arrays(), devr.ref_pack_device(pack)))
    np.testing.assert_allclose(got, sc_host, rtol=2e-4, atol=2e-5)
    got_base = np.asarray(devr.leave_one_out_baseline(jnp.asarray(got), spi))
    np.testing.assert_allclose(got_base, sc_base_host, rtol=2e-4, atol=2e-5)
    # the bleu term actually contributes (guards against a silent no-op)
    fn_cider = jax.jit(devr.make_reward_device_fn(table))
    cider_only = np.asarray(fn_cider(jnp.asarray(ids), jnp.asarray(img_idx),
                                     table.device_arrays(), devr.ref_pack_device(pack)))
    assert np.any(np.abs(got - cider_only) > 1e-4)


def test_device_reward_bleu_weighted_step_matches_host(fixture_dataset, tmp_path):
    """Engine step parity under the published cider+bleu4 reward mix."""
    import jax

    extra = ["--scst_baseline", "sample", "--scst_bleu_weight", "0,0,0,1"]
    host = _dense_module(fixture_dataset, tmp_path / "wh", extra=extra)
    dev = _dense_module(fixture_dataset, tmp_path / "wd",
                        extra=extra + ["--scst_reward", "device"])
    state_h, loss_h, aux_h = host.make_scst_step()(host.state, next(iter(host.train_loader)))
    state_d, loss_d, aux_d = dev.make_scst_step()(dev.state, next(iter(dev.train_loader)))
    np.testing.assert_allclose(float(loss_h), float(loss_d), atol=1e-5)
    np.testing.assert_allclose(float(aux_h["avg_reward"]), float(aux_d["avg_reward"]),
                               atol=1e-5)
    for a, b in zip(jax.tree.leaves(state_h.params), jax.tree.leaves(state_d.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


# ------------------------------------------------------------------ radix
@pytest.fixture(scope="module")
def radix_tok(cider_setup, tmp_path_factory):
    """A real RadixTokenizer over the cider_setup word vocab (base 6 ->
    3 digits/word), so host decode in the parity tests is the actual
    production decode, not a test mirror."""
    import json

    vocab = cider_setup[0]
    log_dir = tmp_path_factory.mktemp("radix_tok")
    tok_dir = log_dir / "tokenizer"
    tok_dir.mkdir()
    with open(tok_dir / "word.vocab.json", "w") as f:
        json.dump({"vocab": vocab}, f)
    from sparse_caption_tpu.tokenizers.radix import RadixTokenizer

    tok = RadixTokenizer(Config(log_dir=str(log_dir), radix_base=6))
    assert tok.tokens_per_word == 3  # 57 word slots need 3 base-6 digits
    return tok


def test_radix_regroup_matches_host_decode(cider_setup, radix_tok):
    """make_radix_to_word_fn == the tokenizer's digit->word decode on
    adversarial digit streams (pad/bos noise, mid-word eos truncation,
    unk/out-of-range groups, no eos, empty)."""
    import jax
    import jax.numpy as jnp

    vocab, tok2id, scorer, sent = cider_setup
    tok = radix_tok
    base, tpw = tok.radix_base, tok.tokens_per_word
    rng = np.random.default_rng(7)
    t = 14  # NOT a multiple of tpw: exercises the tail group
    n = 10
    ids = rng.integers(1, base + 1, (n, t)).astype(np.int32)  # digit soup
    # real radix encodings of actual words, with adversarial edits
    enc = tok.encode(sent(), max_seq_length=t)
    ids[0, : len(enc)] = enc
    ids[0, len(enc):] = 0
    ids[1] = ids[0]
    ids[1, 4] = 0  # pad inside a digit group (host decode skips it)
    ids[2] = ids[0]
    ids[2, 5] = tok.bos_token_id  # bos noise inside the caption
    ids[3, :] = 0  # all pad -> empty caption
    ids[4, 0] = tok.eos_token_id  # immediate eos
    ids[5, :] = base  # max digit everywhere -> out-of-range words -> <unk>
    ids[6] = ids[0]
    ids[6, 7] = tok.eos_token_id  # eos mid-word: truncated tail regroups
    ids[7] = np.concatenate([tok._unk_digits * (t // tpw),
                             [1] * (t - tpw * (t // tpw))]).astype(np.int32)

    regroup = devr.make_radix_to_word_fn(base, tpw, len(vocab))
    got_words = np.asarray(jax.vmap(regroup)(jnp.asarray(ids)))
    for k in range(n):
        want = tok.decode(list(ids[k]))
        got = " ".join(vocab[w] if w != 1 else "<unk>"
                       for w in got_words[k] if w != 0)
        assert got == want, f"row {k}: device '{got}' != host '{want}'"


def test_device_radix_reward_matches_host_scorer(cider_setup, radix_tok):
    """Full radix device scorer (regroup + CIDEr-D + BLEU4) == host
    CaptionScorer on tokenizer-decoded strings (VERDICT r4 item 3)."""
    import jax
    import jax.numpy as jnp

    from sparse_caption_tpu.scst.scorers import CaptionScorer

    vocab, tok2id, scorer, sent = cider_setup
    tok = radix_tok
    rng = np.random.default_rng(8)
    b, spi, t = 5, 3, 17

    gts = [[sent() for _ in range(int(rng.integers(2, 5)))] for _ in range(b)]
    gts[0][0] += " zzz qqq"  # OOV ref words stay unmatchable
    gts[1][0] += " <unk>"  # literal <unk> ref matches unk-decoding groups

    ids = rng.integers(1, tok.radix_base + 1, (b * spi, t)).astype(np.int32)
    for k in range(b * spi):
        enc = tok.encode(sent(), max_seq_length=t)
        ids[k, : len(enc)] = enc
        ids[k, len(enc):] = 0
    ids[2, :] = rng.integers(1, tok.radix_base + 1, t)  # no eos digit soup
    ids[3, 5] = 0  # pad mid-group
    ids[4, 2] = tok.bos_token_id
    ids[5, 8] = tok.eos_token_id  # mid-word truncation
    img_idx = np.repeat(np.arange(b), spi).astype(np.int32)

    host_scorer = CaptionScorer.__new__(CaptionScorer)
    host_scorer.path_to_cached_tokens = ""
    host_scorer.cider_weight = 1.0
    host_scorer.bleu_weight = [0.0, 0.0, 0.0, 1.0]
    host_scorer._df_cache = (scorer.df, scorer.ref_len)
    sample = [[tok.decode(list(ids[i * spi + j])) for j in range(spi)]
              for i in range(b)]
    want, _ = host_scorer(refs=gts, sample=sample, baseline=None)

    regroup = devr.make_radix_to_word_fn(tok.radix_base, tok.tokens_per_word,
                                         len(vocab))
    table = devr.DfTable.build(scorer.df, scorer.ref_len, tok2id)
    fn = jax.jit(devr.make_reward_device_fn(
        table, eos_id=3, pad_id=0, bos_id=2, cider_weight=1.0,
        bleu_weight=(0, 0, 0, 1), regroup=regroup))
    pack = devr.build_ref_pack(gts, scorer.df, scorer.ref_len, tok2id,
                               vocab_size=len(vocab))
    got = np.asarray(fn(jnp.asarray(ids), jnp.asarray(img_idx),
                        table.device_arrays(), devr.ref_pack_device(pack)))
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)
    assert np.any(want > 0), "degenerate fixture: all-zero host scores"


def test_device_reward_radix_step_matches_host(fixture_dataset, tmp_path):
    """ACORT-style engine parity: radix tokenizer + --scst_reward device
    reproduces the host-reward step (this is the config that unlocks
    multi-process ACORT SCST)."""
    import jax

    extra = ["--tokenizer", "radix", "--radix_base", "6",
             "--max_seq_length", "14", "--scst_baseline", "sample"]
    host = _dense_module(fixture_dataset, tmp_path / "rh", extra=extra)
    dev = _dense_module(fixture_dataset, tmp_path / "rd",
                        extra=extra + ["--scst_reward", "device"])
    assert getattr(dev, "scst_device", None) is not None
    state_h, loss_h, aux_h = host.make_scst_step()(host.state, next(iter(host.train_loader)))
    state_d, loss_d, aux_d = dev.make_scst_step()(dev.state, next(iter(dev.train_loader)))
    np.testing.assert_allclose(float(loss_h), float(loss_d), atol=1e-5)
    np.testing.assert_allclose(float(aux_h["avg_reward"]), float(aux_d["avg_reward"]),
                               atol=1e-5)
    for a, b in zip(jax.tree.leaves(state_h.params), jax.tree.leaves(state_d.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)
