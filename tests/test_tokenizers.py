"""Tokenizer tests (parity model: reference tests/test_tokenizer.py — every
registered tokenizer trains on fixture captions and produces an artifact;
plus round-trip and radix-specific checks)."""

import os

import numpy as np
import pytest

from sparse_caption_tpu.config import Config
from sparse_caption_tpu.tokenizers import get_tokenizer
from sparse_caption_tpu.tokenizers.radix import base_to_decimal, decimal_to_base

ALL_TOKENIZERS = ["word", "radix", "character", "bpe", "unigram"]


@pytest.mark.parametrize("name", ALL_TOKENIZERS)
def test_train_and_artifact(name, tiny_corpus, tmp_path):
    cfg = Config(log_dir=str(tmp_path / name), tokenizer_train_files=tiny_corpus, vocab_size=64, radix_base=8)
    tok = get_tokenizer(name)(cfg)
    assert os.path.isfile(tok.vocab_path)
    assert cfg.vocab_size == len(tok)
    # fixed special layout for flat tokenizers
    if name != "radix":
        assert (tok.pad_token_id, tok.unk_token_id, tok.bos_token_id, tok.eos_token_id) == (0, 1, 2, 3)


@pytest.mark.parametrize("name", ALL_TOKENIZERS)
def test_round_trip(name, tiny_corpus, tmp_path):
    cfg = Config(log_dir=str(tmp_path / name), tokenizer_train_files=tiny_corpus, vocab_size=64, radix_base=8)
    tok = get_tokenizer(name)(cfg)
    s = "a man riding a horse"
    ids = tok.encode(s, max_seq_length=64)
    assert ids[0] == tok.bos_token_id and ids[-1] == tok.eos_token_id
    assert tok.decode(ids) == s
    # numpy input decodes the same
    assert tok.decode(np.asarray(ids)) == s


@pytest.mark.parametrize("name", ALL_TOKENIZERS)
def test_bad_ending_ids_only_unambiguous_single_tokens(name, tiny_corpus, tmp_path):
    """The beam's bad-ending EOS suppression compares only the LAST emitted
    token, so bad_ending_ids must return ONLY ids that (a) encode a whole
    bad-ending word as one token and (b) never appear as the trailing token
    of a longer word (character tokenizers fail b: the id of word 'a' ends
    every '-a' word; radix fails a: every word is a digit sequence)."""
    from sparse_caption_tpu.decoding.constraints import BAD_ENDINGS, bad_ending_ids

    cfg = Config(log_dir=str(tmp_path / name), tokenizer_train_files=tiny_corpus,
                 vocab_size=64, radix_base=8)
    tok = get_tokenizer(name)(cfg)
    ids = bad_ending_ids(tok)
    if name in ("character", "radix"):
        assert ids == []
        return
    assert ids, f"{name}: some single-token bad-ending words expected"
    singles = set()
    for w in BAD_ENDINGS:
        t = [x for x in tok.encode(w, add_bos_eos=False, max_seq_length=8)
             if x != tok.pad_token_id]
        if len(t) == 1 and t[0] != tok.unk_token_id:
            singles.add(t[0])
    assert set(ids) <= singles
    cfg = Config(log_dir=str(tmp_path), tokenizer_train_files=tiny_corpus, vocab_size=64)
    tok = get_tokenizer("word")(cfg)
    ids = tok.encode("a zebra", add_bos_eos=False)
    assert ids[1] == tok.unk_token_id
    assert tok.decode(ids) == "a <unk>"


def test_word_truncation(tiny_corpus, tmp_path):
    cfg = Config(log_dir=str(tmp_path), tokenizer_train_files=tiny_corpus, vocab_size=64)
    tok = get_tokenizer("word")(cfg)
    ids = tok.encode("a man riding a horse on a beach", max_seq_length=5)
    assert len(ids) == 5 and ids[0] == tok.bos_token_id


def test_radix_base_conversion():
    for n in [0, 1, 7, 8, 63, 64, 100, 767, 768, 10000]:
        for base in [2, 8, 768]:
            digits = decimal_to_base(n, base)
            assert all(1 <= d <= base for d in digits)
            assert base_to_decimal(digits, base) == n


def test_radix_vocab_and_specials(tiny_corpus, tmp_path):
    cfg = Config(log_dir=str(tmp_path), tokenizer_train_files=tiny_corpus, vocab_size=64, radix_base=8)
    tok = get_tokenizer("radix")(cfg)
    assert len(tok) == 8 + 3
    assert tok.bos_token_id == 9 and tok.eos_token_id == 10 and tok.pad_token_id == 0
    ids = tok.encode("a man", max_seq_length=30)
    assert all(0 <= i < len(tok) for i in ids)
    # every word expands to exactly tokens_per_word digits
    assert len(ids) == 2 + 2 * tok.tokens_per_word


def test_radix_max_seq_is_in_radix_tokens(tiny_corpus, tmp_path):
    cfg = Config(log_dir=str(tmp_path), tokenizer_train_files=tiny_corpus, vocab_size=64, radix_base=8)
    tok = get_tokenizer("radix")(cfg)
    ids = tok.encode("a man riding a horse on a beach and a dog", max_seq_length=10)
    # word budget = (max-2)//tpw + 2 (reference tokenizer.py:604-615); the radix
    # expansion of that many word tokens is the hard bound (eos may be truncated)
    tpw = tok.tokens_per_word
    word_budget = (10 - 2) // tpw + 2
    assert len(ids) <= 1 + (word_budget - 1) * tpw


def test_radix_encode_never_exceeds_max_seq_length(tiny_corpus, tmp_path):
    """Hard cap in radix space (reference tokenizer.py:626-631): the word
    budget alone can leave bos + budget words one digit over the limit
    when truncation drops eos."""
    cfg = Config(log_dir=str(tmp_path), tokenizer_train_files=tiny_corpus, vocab_size=64, radix_base=8)
    tok = get_tokenizer("radix")(cfg)
    long = " ".join(["horse"] * 40)
    for max_len in range(4, 30):
        assert len(tok.encode(long, max_seq_length=max_len)) <= max_len
        assert len(tok.encode_tokenized(long.split(), max_seq_length=max_len)) <= max_len


def test_start_from_copies_vocab(tiny_corpus, tmp_path):
    cfg1 = Config(log_dir=str(tmp_path / "run1"), tokenizer_train_files=tiny_corpus, vocab_size=64)
    tok1 = get_tokenizer("word")(cfg1)
    cfg2 = Config(log_dir=str(tmp_path / "run2"), tokenizer_train_files=None, start_from=str(tmp_path / "run1"))
    tok2 = get_tokenizer("word")(cfg2)
    assert tok2.vocab == tok1.vocab


def test_encode_batch_matches_encode(tiny_corpus, tmp_path):
    """encode_batch (native C++ when available) == per-caption encode."""
    import numpy as np

    from sparse_caption_tpu.tokenizers import native as native_tok

    cfg = Config(log_dir=str(tmp_path), tokenizer_train_files=tiny_corpus, vocab_size=64)
    tok = get_tokenizer("word")(cfg)
    caps = ["a man riding a horse", "a zebra with unknown words", "",
            "a dog on a couch extra words beyond limit ok",
            # non-space whitespace: str.split() handles these; the native
            # path must normalize to match (tokenizer.cc splits on
            # space/tab/newline only)
            "a man\r\nriding\x0ba horse"]
    batch = tok.encode_batch(caps, 8)
    for i, c in enumerate(caps):
        ids = tok.encode(c, add_bos_eos=True, max_seq_length=8)
        ref = np.zeros(8, np.int32)
        ref[: len(ids)] = ids
        np.testing.assert_array_equal(batch[i], ref, err_msg=f"caption {i} (native={native_tok.is_available()})")


def test_bpe_merges_and_subwords(tiny_corpus, tmp_path):
    cfg = Config(log_dir=str(tmp_path), tokenizer_train_files=tiny_corpus, vocab_size=80)
    tok = get_tokenizer("bpe")(cfg)
    assert len(tok.merges) > 0
    # in-vocab word round trip
    s = "a man riding a horse"
    assert tok.decode(tok.encode(s, max_seq_length=64)) == s
    # OOV word decomposes to subwords/unk rather than a single unk when chars are known
    ids = tok.encode("horses", add_bos_eos=False, max_seq_length=64)
    assert len(ids) >= 1


def test_unigram_segmentation(tiny_corpus, tmp_path):
    cfg = Config(log_dir=str(tmp_path), tokenizer_train_files=tiny_corpus, vocab_size=80)
    tok = get_tokenizer("unigram")(cfg)
    s = "a man riding a horse"
    assert tok.decode(tok.encode(s, max_seq_length=64)) == s
    # OOV word still segmentable via single-char pieces
    ids = tok.encode("riderless", add_bos_eos=False, max_seq_length=64)
    assert tok.decode([tok.bos_token_id] + ids + [tok.eos_token_id]) == "riderless"
