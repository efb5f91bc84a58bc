"""Decoding constraint helpers.

``BAD_ENDINGS``: dangling function words after which a caption must not end
(same word list as the reference, ``models/att_model.py:25-44``); beam
search suppresses EOS after these (the reference writes -inf on token id 0
— an artifact of its ancestor repo where 0 *was* EOS; the intent,
"don't end after a dangling word", is implemented here on the real EOS id).
"""

from __future__ import annotations

from typing import List

BAD_ENDINGS = [
    "a", "an", "the", "in", "for", "at", "of", "with", "before",
    "after", "on", "upon", "near", "to", "is", "are", "am",
]


def bad_ending_ids(tokenizer) -> List[int]:
    """Token ids of the bad-ending words under the given tokenizer.

    Sub-word/radix tokenizers get NO suppression: a radix word is a digit
    sequence and matching only its final digit would also suppress EOS after
    every unrelated word sharing that digit (broad over-suppression at radix
    vocab scale). Exact trailing-sequence matching would need multi-token
    state the reference doesn't model either — so the flag is a no-op there.
    """
    import logging

    ids: List[int] = []
    for w in BAD_ENDINGS:
        tid = tokenizer.token_to_id(w)
        if isinstance(tid, list):  # radix: word = digit sequence
            logging.getLogger(__name__).warning(
                "remove_bad_endings is a no-op for multi-token-per-word tokenizers (radix)")
            return []
        if tid != tokenizer.unk_token_id:
            ids.append(int(tid))
    return sorted(set(ids))
