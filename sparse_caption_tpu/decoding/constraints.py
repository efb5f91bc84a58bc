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

    The beam constraint compares only the LAST emitted token, so a word can
    be suppressed-after only when the tokenizer encodes it as EXACTLY one
    token — each word is verified by encoding it (``token_to_id`` alone is
    wrong for sub-word tokenizers: it can resolve 'a'/'in'/'on' to a
    CONTINUATION piece, suppressing EOS after any unrelated word whose
    final piece matches). Multi-token words (radix digit sequences, BPE/
    unigram splits, character spellings) are skipped with a warning — exact
    trailing-sequence matching would need multi-token state the reference
    doesn't model either.
    """
    import logging

    ids: List[int] = []
    skipped: List[str] = []
    for w in BAD_ENDINGS:
        toks = tokenizer.encode(w, add_bos_eos=False, max_seq_length=8)
        toks = [t for t in toks if t != tokenizer.pad_token_id]
        if len(toks) != 1 or toks[0] == tokenizer.unk_token_id:
            skipped.append(w)
            continue
        # ambiguity probe: under a CHARACTER-style tokenizer (no word-
        # boundary marking) the id of word 'a' is also the trailing token of
        # every '-a'-ending word — suppressing on it would over-suppress.
        # A longer word ending in w must NOT share the trailing token id.
        probe = tokenizer.encode("x" + w, add_bos_eos=False, max_seq_length=16)
        probe = [t for t in probe if t != tokenizer.pad_token_id]
        if probe and probe[-1] == toks[0]:
            skipped.append(w)
            continue
        ids.append(int(toks[0]))
    if skipped:
        logging.getLogger(__name__).warning(
            "remove_bad_endings: %d/%d bad-ending words are multi-token or OOV "
            "under this tokenizer and get no EOS suppression: %s",
            len(skipped), len(BAD_ENDINGS), ",".join(skipped))
    return sorted(set(ids))
