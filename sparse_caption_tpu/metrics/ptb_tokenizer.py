"""Pure-Python PTB-style tokenizer.

Replaces the reference's Stanford CoreNLP Java subprocess
(``coco_caption/pycocoevalcap/tokenizer/ptbtokenizer.py:18,46-74``) with a
dependency-free implementation of the same contract: lowercase, PTB word
splitting, then removal of the fixed punctuation list
(``ptbtokenizer.py:21-39``).

For the dominant input class — Karpathy pre-tokenized lowercase captions —
this is exactly whitespace splitting + punctuation removal, which is what
the Java pipeline produces.  For raw captions we approximate the PTB rules
(contractions, punctuation splitting); METEOR/SPICE-grade edge cases of the
Stanford tokenizer are out of scope and documented.
"""

from __future__ import annotations

import re
from typing import Dict, List

# ``ptbtokenizer.py:21-39`` — tokens removed after tokenization
PUNCTUATIONS = frozenset(
    ["''", "'", "``", "`", "-LRB-", "-RRB-", "-LCB-", "-RCB-", ".", "?", "!", ",", ":", "-", "--", "...", ";"]
)
# Stanford emits directional quote symbols (``/''), both removed; a raw
# double-quote token is equivalent post-removal
_DROP = PUNCTUATIONS | {'"'}

_CONTRACTIONS = re.compile(r"\b(can)(not)\b|(\w+)(n't)\b|(\w+)('(?:s|re|ve|ll|d|m))\b", re.IGNORECASE)
_TRAILING_APOS = re.compile(r"(\w)'(\s|$)")  # plural possessive: dogs' -> dogs '
_PUNCT_SPLIT = re.compile(r"([\.\,\?\!\:\;]+|[\"\(\)\[\]\{\}\$%])")
_NUM_SEP = re.compile(r"(?<=\d)([\.,])(?=\d)")  # 2,000 / 3.5 stay one token
# dotted abbreviations stay one token, as Stanford keeps them: t.v., u.s.
_ABBREV = re.compile(r"\b(?:[a-z]\.){2,}")
# Stanford normalizes unicode punctuation before tokenizing
_UNICODE_NORM = str.maketrans({"“": '"', "”": '"', "‘": "'", "’": "'",
                               "–": "-", "—": "--"})


def ptb_tokenize_sentence(sentence: str) -> List[str]:
    s = sentence.replace("\n", " ").strip().lower()
    s = s.translate(_UNICODE_NORM).replace("…", "...")
    # split contractions PTB-style: don't -> do n't; it's -> it 's
    s = _CONTRACTIONS.sub(lambda m: " ".join(x for x in m.groups() if x), s)
    s = _TRAILING_APOS.sub(r"\1 ' \2", s)
    # brackets to PTB symbols — LOWERCASE, as Stanford's -lowerCase emits
    # them; note the reference's PUNCTUATIONS list is uppercase
    # (ptbtokenizer.py:26-29), so these tokens are NOT removed downstream
    for lit, sym in [("(", " -lrb- "), (")", " -rrb- "), ("{", " -lcb- "), ("}", " -rcb- ")]:
        s = s.replace(lit, sym)
    # protect digit-internal separators (Stanford keeps 2,000 / 3.5 intact)
    # and dotted abbreviations (t.v. / u.s. stay one token)
    s = _ABBREV.sub(lambda m: m.group(0).replace(".", "\x02"), s)
    s = _NUM_SEP.sub(lambda m: "\x01" if m.group(1) == "," else "\x02", s)
    s = _PUNCT_SPLIT.sub(r" \1 ", s)
    s = s.replace("\x01", ",").replace("\x02", ".")
    tokens = [t for t in s.split() if t not in _DROP]
    return tokens


def ptb_tokenize(captions_for_image: Dict) -> Dict[object, List[str]]:
    """{img_id: [{'caption': str}, ...]} -> {img_id: [tokenized_str, ...]}
    (same contract as the reference PTBTokenizer.tokenize)."""
    out: Dict[object, List[str]] = {}
    for img_id, caps in captions_for_image.items():
        out[img_id] = [" ".join(ptb_tokenize_sentence(c["caption"])) for c in caps]
    return out
