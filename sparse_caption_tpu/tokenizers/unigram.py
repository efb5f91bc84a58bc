"""Unigram-LM subword tokenizer (parity: reference
``SentencePieceUnigramTokenizer``, ``sparse_caption/tokenizer.py:234-515`` —
a SentencePiece ``unigram`` model).

Compact implementation of the unigram language-model tokenizer
(Kudo 2018): seed vocabulary from frequent substrings, EM over Viterbi
segmentations, prune to the target size, encode by Viterbi.  Same special
layout and artifact contract as the other tokenizers.

Not used by any published paper config (word/radix cover all results);
completes the tokenizer registry surface.
"""

from __future__ import annotations

import json
import logging
import math
import os
from collections import Counter
from typing import Dict, List, Tuple

from sparse_caption_tpu.tokenizers import register_tokenizer
from sparse_caption_tpu.tokenizers.base import Tokenizer, maybe_copy_from
from sparse_caption_tpu.tokenizers.word import SPECIALS

logger = logging.getLogger(__name__)

MARK = "▁"
MAX_PIECE = 8
EM_ITERS = 3
SEED_FACTOR = 4


def _viterbi(word: str, logp: Dict[str, float]) -> List[str]:
    """Best segmentation of `word` under piece log-probs (single chars must
    all be present as fallback)."""
    n = len(word)
    best = [(-math.inf, 0)] * (n + 1)
    best[0] = (0.0, 0)
    for end in range(1, n + 1):
        for start in range(max(0, end - MAX_PIECE), end):
            piece = word[start:end]
            lp = logp.get(piece)
            if lp is None:
                continue
            score = best[start][0] + lp
            if score > best[end][0]:
                best[end] = (score, start)
    if best[n][0] == -math.inf:  # unreachable if all chars are pieces
        return list(word)
    pieces = []
    end = n
    while end > 0:
        start = best[end][1]
        pieces.append(word[start:end])
        end = start
    return pieces[::-1]


def train_unigram(word_counts: Dict[str, int], vocab_size: int) -> List[Tuple[str, float]]:
    """-> [(piece, logprob)] of size <= vocab_size - len(SPECIALS)."""
    marked = {MARK + w: c for w, c in word_counts.items() if w}
    # seed: all substrings up to MAX_PIECE scored by count * len
    seed: Counter = Counter()
    chars: set = set()
    for w, c in marked.items():
        chars.update(w)
        for i in range(len(w)):
            for j in range(i + 1, min(i + MAX_PIECE, len(w)) + 1):
                seed[w[i:j]] += c * (j - i)
    budget = vocab_size - len(SPECIALS)
    keep = {p for p, _ in seed.most_common(budget * SEED_FACTOR)} | chars
    total = sum(seed[p] for p in keep)
    logp = {p: math.log(seed[p] / total) for p in keep}

    for _ in range(EM_ITERS):
        counts: Counter = Counter()
        for w, c in marked.items():
            for piece in _viterbi(w, logp):
                counts[piece] += c
        # prune toward budget, never dropping single chars
        scored = sorted(counts.items(), key=lambda kv: -kv[1])
        kept = [p for p, _ in scored if len(p) > 1][: max(budget - len(chars), 0)]
        keep = set(kept) | chars
        total = sum(counts.get(p, 1) for p in keep)
        logp = {p: math.log(counts.get(p, 1) / total) for p in keep}

    pieces = sorted(logp.items(), key=lambda kv: -kv[1])[:budget]
    return pieces


@register_tokenizer("unigram")
class UnigramTokenizer(Tokenizer):
    MODEL_TYPE = "unigram"
    DEFAULT_MAX_SEQ_LENGTH = 24

    def __init__(self, config):
        self.config = config
        self.tokenizer_dir = os.path.join(config.log_dir, "tokenizer")
        self.vocab_path = os.path.join(self.tokenizer_dir, f"{self.MODEL_TYPE}.vocab.json")
        self._train_or_load()
        self._update_config(config)
        logger.info("%s: init complete, vocab_size=%d", type(self).__name__, len(self))

    def _train_or_load(self) -> None:
        if not os.path.isfile(self.vocab_path):
            if not maybe_copy_from(self.config.get("start_from", ""),
                                   os.path.basename(self.vocab_path), self.tokenizer_dir):
                self._train()
        with open(self.vocab_path) as f:
            data = json.load(f)
        self.vocab: List[str] = data["vocab"]
        self._logp: Dict[str, float] = {p: lp for p, lp in zip(data["vocab"][len(SPECIALS):],
                                                               data["logprobs"])}
        self._token_to_id = {t: i for i, t in enumerate(self.vocab)}

    def _train(self) -> None:
        train_files = self.config.get("tokenizer_train_files")
        if not isinstance(train_files, str):
            raise ValueError(f"{type(self).__name__}: `tokenizer_train_files` required when no vocab artifact exists")
        counts: Counter = Counter()
        for path in train_files.split(","):
            with open(path) as f:
                for line in f:
                    counts.update(line.strip().split())
        pieces = train_unigram(dict(counts), int(self.config.get("vocab_size", 10001)))
        vocab = list(SPECIALS) + [p for p, _ in pieces]
        os.makedirs(self.tokenizer_dir, exist_ok=True)
        with open(self.vocab_path, "w") as f:
            json.dump({"model_type": self.MODEL_TYPE, "vocab": vocab,
                       "logprobs": [lp for _, lp in pieces]}, f)

    # ------------------------------------------------------------- encode
    def encode(self, input_str: str, add_bos_eos: bool = True, max_seq_length: int = 24) -> List[int]:
        pieces: List[str] = []
        for w in input_str.strip().split():
            pieces += _viterbi(MARK + w, self._logp)
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
