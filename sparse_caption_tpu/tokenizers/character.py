"""Character tokenizer (parity: reference ``CharacterTokenizer``,
``sparse_caption/tokenizer.py:524-541`` — a SentencePiece ``char`` model).

Characters (including the word separator, stored as the SP-style ``▁``)
form the vocabulary; specials keep the fixed ``pad=0 unk=1 bos=2 eos=3``
layout.  Default max_seq_length is 60 characters (reference
``tokenizer.py:531-538``).
"""

from __future__ import annotations

import json
import logging
import os
from collections import Counter
from typing import List

from sparse_caption_tpu.tokenizers import register_tokenizer
from sparse_caption_tpu.tokenizers.word import SPECIALS, WordTokenizer

logger = logging.getLogger(__name__)

SEP = "▁"  # SentencePiece-style whitespace marker


@register_tokenizer("character")
class CharacterTokenizer(WordTokenizer):
    MODEL_TYPE = "char"
    DEFAULT_MAX_SEQ_LENGTH = 60

    def _train(self) -> None:
        train_files = self.config.get("tokenizer_train_files")
        if not isinstance(train_files, str):
            raise ValueError(f"{type(self).__name__}: `tokenizer_train_files` required when no vocab artifact exists")
        counts: Counter = Counter()
        for path in train_files.split(","):
            with open(path) as f:
                for line in f:
                    counts.update(SEP.join(line.strip().split()))
        counts[SEP] += 1  # separator is always in-vocab
        max_chars = int(self.config.get("vocab_size", 10001)) - len(SPECIALS)
        chars = [c for c, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:max_chars]]
        vocab = list(SPECIALS) + chars
        os.makedirs(self.tokenizer_dir, exist_ok=True)
        with open(self.vocab_path, "w") as f:
            json.dump({"model_type": self.MODEL_TYPE, "vocab": vocab}, f)

    def _split(self, input_str: str) -> List[str]:
        return list(SEP.join(input_str.strip().split()))

    def decode(self, input_ids) -> str:
        ids = self._ids_to_list(input_ids)
        chars = []
        for i in ids:
            if i == self.eos_token_id:
                break
            if i in (self.pad_token_id, self.bos_token_id):
                continue
            chars.append(self.vocab[i] if 0 <= i < len(self.vocab) else "<unk>")
        return "".join(chars).replace(SEP, " ").strip()
