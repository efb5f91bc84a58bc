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

    For the radix tokenizer each word maps to a digit sequence; suppression
    acts on the word's final digit (the token after which EOS could appear).
    """
    ids: List[int] = []
    for w in BAD_ENDINGS:
        tid = tokenizer.token_to_id(w)
        if isinstance(tid, list):  # radix: use the last digit of the word code
            if tid:
                ids.append(int(tid[-1]))
        elif tid != tokenizer.unk_token_id:
            ids.append(int(tid))
    return sorted(set(ids))
