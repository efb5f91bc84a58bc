"""Pure-Python METEOR 1.5 scorer (no Java required).

The reference scores METEOR by driving ``meteor-1.5.jar`` over a line
protocol (``coco_caption/pycocoevalcap/meteor/meteor.py:16-59``); the jar
is a git-lfs blob missing from this environment, so this module
reimplements the Meteor 1.5 scoring equations (Denkowski & Lavie 2014)
in Python:

* four match stages — exact, stem (Snowball English,
  :mod:`sparse_caption_tpu.metrics.snowball_en`), synonym, paraphrase —
  with the English stage weights ``(1.0, 0.6, 0.8, 0.6)``;
* a beam-search aligner choosing the one-to-one alignment that maximises
  matched words, then minimises chunks, then total match distance
  (Meteor's ``Aligner`` resolution order);
* segment score
  ``(1 - gamma * (chunks / avg_matches)^beta) * P*R / (alpha*P + (1-alpha)*R)``
  with the English task parameters ``alpha=.85 beta=.2 gamma=.6 delta=.75``,
  where P/R weight each matched word by its stage weight and by
  ``delta``/(1-``delta``) for content/function words;
* the corpus score aggregates SUMMED sufficient statistics across
  segments (micro-average, matching the jar's ``EVAL`` reply), not the
  mean of segment scores.

Data-dependent stages degrade gracefully: the synonym (WordNet synsets)
and paraphrase tables ship inside the jar and are unavailable here, so by
default only the exact and stem stages fire; the content/function
delta-weighting IS on by default via the built-in English function-word
list (:mod:`sparse_caption_tpu.metrics.meteor_data_en`, a curated
closed-class approximation of the jar's ``function/en.words``).
Supplying the extracted jar data via :class:`MeteorData` (or the
``SPARSE_CAPTION_METEOR_DATA`` directory) enables the full four-stage
scorer without any Java dependency. Scores from the default
configuration are therefore a documented LOWER BOUND on official
METEOR — they are reported as ``METEOR_py``, never as ``METEOR``.
"""

from __future__ import annotations

import os
import re
from dataclasses import dataclass, field
from typing import Dict, FrozenSet, List, Optional, Sequence, Tuple

from sparse_caption_tpu.metrics.snowball_en import stem

ALPHA, BETA, GAMMA, DELTA = 0.85, 0.2, 0.6, 0.75
STAGE_WEIGHTS = (1.0, 0.6, 0.8, 0.6)  # exact, stem, synonym, paraphrase
BEAM = 40

_PUNCT_RE = re.compile(r"([\.,!?:;\"\(\)\[\]])")


def normalize(text: str) -> List[str]:
    """Lowercase + punctuation-splitting tokenizer (the jar's ``-norm``
    flag). Inputs in the eval pipeline are already PTB-tokenized, for
    which this is an identity split."""
    text = _PUNCT_RE.sub(r" \1 ", text.lower())
    return text.split()


@dataclass(frozen=True)
class MeteorData:
    """Optional language data extracted from the meteor-1.5 jar.

    ``function_words``: the ``function/en.words`` list (one word/line).
    ``synonyms``: word -> frozenset of synset ids (from the jar's
    ``synonym/english`` files; any file of whitespace-separated synonym
    groups, one group per line, works).
    ``paraphrases``: phrase -> frozenset of line ids for every
    ``phrase1 ||| phrase2`` line the phrase appears on (the jar's
    paraphrase-en table); two phrases paraphrase-match iff they share a
    line id, so a phrase recurring across many lines matches every
    declared partner.
    """

    function_words: FrozenSet[str] = frozenset()
    synonyms: Dict[str, FrozenSet[int]] = field(default_factory=dict)
    paraphrases: Dict[Tuple[str, ...], FrozenSet[int]] = field(default_factory=dict)
    max_paraphrase_len: int = 1

    @classmethod
    def load(cls, data_dir: str) -> "MeteorData":
        fw: set = set()
        syn: Dict[str, set] = {}
        par: Dict[Tuple[str, ...], set] = {}
        max_len = 1
        fw_path = os.path.join(data_dir, "function.words")
        if os.path.isfile(fw_path):
            with open(fw_path) as f:
                fw = {w.strip() for w in f if w.strip()}
        syn_path = os.path.join(data_dir, "synonyms.txt")
        if os.path.isfile(syn_path):
            with open(syn_path) as f:
                for sid, line in enumerate(f):
                    for w in line.split():
                        syn.setdefault(w, set()).add(sid)
        par_path = os.path.join(data_dir, "paraphrases.txt")
        if os.path.isfile(par_path):
            with open(par_path) as f:
                for gid, line in enumerate(f):
                    if "|||" not in line:
                        continue
                    a, b = line.split("|||")[:2]
                    for phrase in (tuple(a.split()), tuple(b.split())):
                        if phrase:
                            par.setdefault(phrase, set()).add(gid)
                            max_len = max(max_len, len(phrase))
        return cls(
            function_words=frozenset(fw),
            synonyms={w: frozenset(s) for w, s in syn.items()},
            paraphrases={p: frozenset(s) for p, s in par.items()},
            max_paraphrase_len=max_len,
        )


_Match = Tuple[int, int, int, int, int]  # hyp_start, hyp_len, ref_start, ref_len, stage


def _find_matches(hyp: Sequence[str], ref: Sequence[str], data: MeteorData) -> List[_Match]:
    """All candidate matches, one entry per (hyp span, ref span, stage),
    keeping only the best (lowest) stage per span pair."""
    best: Dict[Tuple[int, int, int, int], int] = {}
    hyp_stems = [stem(w) for w in hyp]
    ref_stems = [stem(w) for w in ref]
    for i, hw in enumerate(hyp):
        for j, rw in enumerate(ref):
            if hw == rw:
                s = 0
            elif hyp_stems[i] == ref_stems[j]:
                s = 1
            elif data.synonyms and data.synonyms.get(hw, frozenset()) & data.synonyms.get(
                rw, frozenset()
            ):
                s = 2
            else:
                continue
            best[(i, 1, j, 1)] = min(best.get((i, 1, j, 1), 9), s)
    if data.paraphrases:
        L = data.max_paraphrase_len
        for i in range(len(hyp)):
            for li in range(1, min(L, len(hyp) - i) + 1):
                hp = data.paraphrases.get(tuple(hyp[i : i + li]))
                if not hp:
                    continue
                for j in range(len(ref)):
                    for lj in range(1, min(L, len(ref) - j) + 1):
                        rp = data.paraphrases.get(tuple(ref[j : j + lj]))
                        if rp and rp & hp:
                            key = (i, li, j, lj)
                            best[key] = min(best.get(key, 9), 3)
    return [(i, li, j, lj, s) for (i, li, j, lj), s in best.items()]


def _align(hyp_len: int, ref_len: int, matches: List[_Match]) -> List[_Match]:
    """Beam search over one-to-one alignments, resolved like Meteor's
    ``Aligner``: maximise total matched words, then minimise chunks, then
    minimise summed |hyp_start - ref_start| distance."""
    by_start: Dict[int, List[_Match]] = {}
    for m in matches:
        by_start.setdefault(m[0], []).append(m)
    # partial = (covered_words, chunks, dist, last_hyp_end, last_ref_end,
    #            hyp_mask, ref_mask, chosen)
    partials = [(0, 0, 0, -2, -2, 0, 0, ())]
    for i in range(hyp_len):
        nxt = []
        for p in partials:
            covered, chunks, dist, lhe, lre, hm, rm, chosen = p
            if hm >> i & 1:  # position already inside a chosen span
                nxt.append(p)
                continue
            nxt.append(p)  # leave hyp[i] unmatched
            for m in by_start.get(i, ()):
                hi, hl, ri, rl, s = m
                hmask = ((1 << hl) - 1) << hi
                rmask = ((1 << rl) - 1) << ri
                if hm & hmask or rm & rmask:
                    continue
                contiguous = hi == lhe + 1 and ri == lre + 1
                nxt.append(
                    (
                        covered + hl + rl,
                        chunks + (0 if contiguous else 1),
                        dist + abs(hi - ri),
                        hi + hl - 1,
                        ri + rl - 1,
                        hm | hmask,
                        rm | rmask,
                        chosen + (m,),
                    )
                )
        nxt.sort(key=lambda p: (-p[0], p[1], p[2]))
        partials = nxt[:BEAM]
    return list(partials[0][7])


@dataclass
class _Stats:
    """Meteor sufficient statistics; ``+`` gives the corpus aggregate."""

    tst_len_c: float = 0.0
    tst_len_f: float = 0.0
    ref_len_c: float = 0.0
    ref_len_f: float = 0.0
    w_match_tst: float = 0.0
    w_match_ref: float = 0.0
    matches_tst: float = 0.0
    matches_ref: float = 0.0
    chunks: float = 0.0

    def __add__(self, o: "_Stats") -> "_Stats":
        return _Stats(*(a + b for a, b in zip(self._tuple(), o._tuple())))

    def _tuple(self):
        return (
            self.tst_len_c, self.tst_len_f, self.ref_len_c, self.ref_len_f,
            self.w_match_tst, self.w_match_ref, self.matches_tst,
            self.matches_ref, self.chunks,
        )

    def score(self) -> float:
        w_tst_len = DELTA * self.tst_len_c + (1 - DELTA) * self.tst_len_f
        w_ref_len = DELTA * self.ref_len_c + (1 - DELTA) * self.ref_len_f
        if self.matches_tst == 0 or w_tst_len == 0 or w_ref_len == 0:
            return 0.0
        p = min(1.0, self.w_match_tst / w_tst_len)
        r = min(1.0, self.w_match_ref / w_ref_len)
        if p == 0 or r == 0:
            return 0.0
        fmean = p * r / (ALPHA * p + (1 - ALPHA) * r)
        avg_matches = (self.matches_tst + self.matches_ref) / 2.0
        pen = GAMMA * (self.chunks / avg_matches) ** BETA if self.chunks > 0 else 0.0
        return fmean * (1.0 - pen)


def _segment_stats(hyp: Sequence[str], ref: Sequence[str], data: MeteorData) -> _Stats:
    chosen = _align(len(hyp), len(ref), _find_matches(hyp, ref, data))
    is_func = lambda w: w in data.function_words  # noqa: E731
    st = _Stats()
    for w in hyp:
        if is_func(w):
            st.tst_len_f += 1
        else:
            st.tst_len_c += 1
    for w in ref:
        if is_func(w):
            st.ref_len_f += 1
        else:
            st.ref_len_c += 1
    for hi, hl, ri, rl, s in chosen:
        sw = STAGE_WEIGHTS[s]
        for k in range(hl):
            st.w_match_tst += sw * ((1 - DELTA) if is_func(hyp[hi + k]) else DELTA)
        for k in range(rl):
            st.w_match_ref += sw * ((1 - DELTA) if is_func(ref[ri + k]) else DELTA)
        st.matches_tst += hl
        st.matches_ref += rl
    # chunks of the chosen alignment: runs contiguous AND monotone on both
    # sides count as one chunk
    chunks = 0
    lhe = lre = -2
    for hi, hl, ri, rl, s in sorted(chosen):
        if not (hi == lhe + 1 and ri == lre + 1):
            chunks += 1
        lhe, lre = hi + hl - 1, ri + rl - 1
    # Meteor's identical-alignment special case: one chunk covering the
    # whole of both sides carries no fragmentation penalty.
    if chunks == 1 and st.matches_tst == len(hyp) and st.matches_ref == len(ref):
        chunks = 0
    st.chunks = chunks
    return st


class MeteorPy:
    """Drop-in for the jar wrapper's ``compute_score(gts, res)`` API
    (same (corpus_score, per_segment_scores) contract as
    ``coco_caption/pycocoevalcap/meteor/meteor.py:29-48``), computed
    in-process."""

    def __init__(self, data: Optional[MeteorData] = None):
        if data is None:
            data_dir = os.environ.get("SPARSE_CAPTION_METEOR_DATA", "")
            if data_dir and os.path.isdir(data_dir):
                data = MeteorData.load(data_dir)
            else:
                from sparse_caption_tpu.metrics.meteor_data_en import default_data

                data = default_data()  # built-in English function words
        self.data = data

    def score_segment(self, hypothesis: str, references: Sequence[str]) -> _Stats:
        hyp = normalize(hypothesis)
        best: Optional[_Stats] = None
        for ref_str in references:
            st = _segment_stats(hyp, normalize(ref_str), self.data)
            if best is None or st.score() > best.score():
                best = st
        return best if best is not None else _Stats()

    def compute_score(self, gts: Dict, res: Dict):
        ids = sorted(gts.keys())
        total = _Stats()
        per_segment = []
        for i in ids:
            st = self.score_segment(res[i][0], gts[i])
            per_segment.append(st.score())
            total = total + st
        return total.score(), per_segment

    def method(self) -> str:
        return "METEOR_py"
