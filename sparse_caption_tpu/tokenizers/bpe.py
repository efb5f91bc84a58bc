"""BPE subword tokenizer (parity: reference ``SentencePieceBPETokenizer``,
``sparse_caption/tokenizer.py:516-521`` — a SentencePiece ``bpe`` model).

Self-contained byte-pair-encoding implementation: training learns merge
rules over SP-style word-start-marked symbol sequences ("▁word"); encoding
applies merges greedily by rank.  Same fixed special layout
``pad=0 unk=1 bos=2 eos=3`` and ``<log_dir>/tokenizer`` artifact contract
as the other tokenizers (artifact JSON carries vocab + ordered merges).

No published paper config uses subword tokenizers (word/radix cover all
results); this exists for registry-surface parity and experimentation.
"""

from __future__ import annotations

import json
import logging
import os
from collections import Counter
from typing import Dict, List, Tuple

from sparse_caption_tpu.tokenizers import register_tokenizer
from sparse_caption_tpu.tokenizers.base import Tokenizer, maybe_copy_from
from sparse_caption_tpu.tokenizers.word import SPECIALS

logger = logging.getLogger(__name__)

MARK = "▁"  # word-start marker (SentencePiece convention)


def _word_symbols(word: str) -> Tuple[str, ...]:
    return (MARK + word[0],) + tuple(word[1:])


def train_bpe(word_counts: Dict[str, int], vocab_size: int) -> Tuple[List[str], List[Tuple[str, str]]]:
    """Learn merges until the symbol inventory reaches vocab_size."""
    sequences: Dict[Tuple[str, ...], int] = {_word_symbols(w): c for w, c in word_counts.items() if w}
    symbols = set()
    for seq in sequences:
        symbols.update(seq)
    merges: List[Tuple[str, str]] = []
    budget = vocab_size - len(SPECIALS)

    while len(symbols) + len(merges) < budget:
        pair_counts: Counter = Counter()
        for seq, c in sequences.items():
            for i in range(len(seq) - 1):
                pair_counts[(seq[i], seq[i + 1])] += c
        if not pair_counts:
            break
        # deterministic: highest count, then lexicographic
        (a, b), top = max(pair_counts.items(), key=lambda kv: (kv[1], kv[0]))
        if top < 2:
            break
        merges.append((a, b))
        merged = a + b
        new_sequences: Dict[Tuple[str, ...], int] = {}
        for seq, c in sequences.items():
            out = []
            i = 0
            while i < len(seq):
                if i + 1 < len(seq) and seq[i] == a and seq[i + 1] == b:
                    out.append(merged)
                    i += 2
                else:
                    out.append(seq[i])
                    i += 1
            new_sequences[tuple(out)] = new_sequences.get(tuple(out), 0) + c
        sequences = new_sequences

    vocab = list(SPECIALS) + sorted(symbols) + [a + b for a, b in merges]
    return vocab, merges


@register_tokenizer("bpe")
class BpeTokenizer(Tokenizer):
    MODEL_TYPE = "bpe"
    DEFAULT_MAX_SEQ_LENGTH = 24  # subword sequences run longer than words

    def __init__(self, config):
        self.config = config
        self.tokenizer_dir = os.path.join(config.log_dir, "tokenizer")
        self.vocab_path = os.path.join(self.tokenizer_dir, f"{self.MODEL_TYPE}.vocab.json")
        self._train_or_load()
        self._update_config(config)
        logger.info("%s: init complete, vocab_size=%d merges=%d",
                    type(self).__name__, len(self), len(self.merges))

    def _train_or_load(self) -> None:
        if not os.path.isfile(self.vocab_path):
            if not maybe_copy_from(self.config.get("start_from", ""),
                                   os.path.basename(self.vocab_path), self.tokenizer_dir):
                self._train()
        with open(self.vocab_path) as f:
            data = json.load(f)
        self.vocab: List[str] = data["vocab"]
        self.merges: List[Tuple[str, str]] = [tuple(m) for m in data["merges"]]
        self._token_to_id = {t: i for i, t in enumerate(self.vocab)}
        self._merge_rank = {tuple(m): r for r, m in enumerate(self.merges)}

    def _train(self) -> None:
        train_files = self.config.get("tokenizer_train_files")
        if not isinstance(train_files, str):
            raise ValueError(f"{type(self).__name__}: `tokenizer_train_files` required when no vocab artifact exists")
        counts: Counter = Counter()
        for path in train_files.split(","):
            with open(path) as f:
                for line in f:
                    counts.update(line.strip().split())
        vocab, merges = train_bpe(dict(counts), int(self.config.get("vocab_size", 10001)))
        os.makedirs(self.tokenizer_dir, exist_ok=True)
        with open(self.vocab_path, "w") as f:
            json.dump({"model_type": self.MODEL_TYPE, "vocab": vocab, "merges": merges}, f)

    # ------------------------------------------------------------- encode
    def _bpe_word(self, word: str) -> List[str]:
        seq = list(_word_symbols(word))
        while len(seq) > 1:
            ranked = [
                (self._merge_rank.get((seq[i], seq[i + 1])), i)
                for i in range(len(seq) - 1)
                if (seq[i], seq[i + 1]) in self._merge_rank
            ]
            if not ranked:
                break
            _, i = min(ranked)
            seq = seq[:i] + [seq[i] + seq[i + 1]] + seq[i + 2:]
        return seq

    def encode(self, input_str: str, add_bos_eos: bool = True, max_seq_length: int = 24) -> List[int]:
        pieces: List[str] = []
        for w in input_str.strip().split():
            pieces += self._bpe_word(w)
        ids = [self._token_to_id.get(p, self.unk_token_id) for p in pieces]
        if add_bos_eos:
            ids = [self.bos_token_id] + ids + [self.eos_token_id]
        if max_seq_length and max_seq_length > 0:
            ids = ids[:max_seq_length]
        return ids

    def encode_tokenized(self, input_list: List[str], add_bos_eos: bool = True, max_seq_length: int = 24) -> List[int]:
        return self.encode(" ".join(input_list), add_bos_eos, max_seq_length)

    def decode(self, input_ids) -> str:
        ids = self._ids_to_list(input_ids)
        pieces = []
        for i in ids:
            if i == self.eos_token_id:
                break
            if i in (self.pad_token_id, self.bos_token_id):
                continue
            pieces.append(self.vocab[i] if 0 <= i < len(self.vocab) else "<unk>")
        return "".join(pieces).replace(MARK, " ").strip()

    def token_to_id(self, token: str) -> int:
        return self._token_to_id.get(token, self.unk_token_id)

    def id_to_token(self, token_id: int) -> str:
        if not 0 <= token_id < len(self.vocab):
            raise ValueError(f"token_id {token_id} out of range")
        return self.vocab[token_id]

    def __len__(self) -> int:
        return len(self.vocab)

    @staticmethod
    def add_argparse_args(parser) -> None:
        parser.add_argument("--tokenizer_train_files", type=str, default=None)
        parser.add_argument("--vocab_size", type=int, default=10001)
