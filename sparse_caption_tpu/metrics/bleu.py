"""Corpus + per-image BLEU 1..4.

Behavioral parity with pycocoevalcap's BleuScorer
(``coco_caption/pycocoevalcap/bleu/bleu_scorer.py:90-265``):

* clipped n-gram matches against per-ngram max reference counts
* effective reference length: "closest" (corpus with >1 segment) per image
* smoothing constants tiny=1e-15 / small=1e-9
* per-image scores use per-image brevity penalty; corpus score uses corpus
  totals
"""

from __future__ import annotations

import math
from collections import defaultdict
from typing import Dict, List, Sequence, Tuple

TINY = 1e-15
SMALL = 1e-9


def ngram_counts(words: Sequence[str], n: int = 4) -> Dict[Tuple[str, ...], int]:
    counts: Dict[Tuple[str, ...], int] = defaultdict(int)
    for k in range(1, n + 1):
        for i in range(len(words) - k + 1):
            counts[tuple(words[i : i + k])] += 1
    return counts


def _closest_reflen(reflens: Sequence[int], testlen: int) -> int:
    return min((abs(l - testlen), l) for l in reflens)[1]


class BleuScorer:
    """Accumulating scorer: add (hypothesis, references) pairs then compute."""

    def __init__(self, n: int = 4):
        self.n = n
        self._segments: List[dict] = []

    def append(self, hypothesis: str, references: Sequence[str]) -> None:
        hyp_words = hypothesis.split()
        testlen = len(hyp_words)
        hyp_counts = ngram_counts(hyp_words, self.n)

        reflens = []
        max_ref_counts: Dict[Tuple[str, ...], int] = {}
        for ref in references:
            ref_words = ref.split()
            reflens.append(len(ref_words))
            for ng, c in ngram_counts(ref_words, self.n).items():
                if c > max_ref_counts.get(ng, 0):
                    max_ref_counts[ng] = c

        guess = [max(0, testlen - k) for k in range(self.n)]
        correct = [0] * self.n
        for ng, c in hyp_counts.items():
            correct[len(ng) - 1] += min(max_ref_counts.get(ng, 0), c)
        self._segments.append(
            dict(testlen=testlen, reflens=reflens, guess=guess, correct=correct)
        )

    def compute(self, option: str | None = None) -> Tuple[List[float], List[List[float]]]:
        """-> (corpus bleu[1..n], per-image bleu lists [n][num_images])."""
        n = self.n
        if option is None:
            option = "average" if len(self._segments) == 1 else "closest"
        per_image: List[List[float]] = [[] for _ in range(n)]
        tot = dict(testlen=0, reflen=0.0, guess=[0] * n, correct=[0] * n)

        for seg in self._segments:
            testlen = seg["testlen"]
            if option == "closest":
                reflen = _closest_reflen(seg["reflens"], testlen)
            elif option == "average":
                reflen = sum(seg["reflens"]) / len(seg["reflens"])
            elif option == "shortest":
                reflen = min(seg["reflens"])
            else:
                raise ValueError(option)
            tot["testlen"] += testlen
            tot["reflen"] += reflen
            for k in range(n):
                tot["guess"][k] += seg["guess"][k]
                tot["correct"][k] += seg["correct"][k]

            bleu = 1.0
            for k in range(n):
                bleu *= (seg["correct"][k] + TINY) / (seg["guess"][k] + SMALL)
                per_image[k].append(bleu ** (1.0 / (k + 1)))
            ratio = (testlen + TINY) / (reflen + SMALL)
            if ratio < 1:
                for k in range(n):
                    per_image[k][-1] *= math.exp(1 - 1 / ratio)

        corpus = []
        bleu = 1.0
        for k in range(n):
            bleu *= (tot["correct"][k] + TINY) / (tot["guess"][k] + SMALL)
            corpus.append(bleu ** (1.0 / (k + 1)))
        ratio = (tot["testlen"] + TINY) / (tot["reflen"] + SMALL)
        if ratio < 1:
            corpus = [b * math.exp(1 - 1 / ratio) for b in corpus]
        return corpus, per_image


def compute_bleu(gts: Dict, res: Dict, n: int = 4):
    """pycocoevalcap-style API over {img_id: [str]} dicts."""
    scorer = BleuScorer(n)
    for img_id in sorted(gts.keys()):
        scorer.append(res[img_id][0], gts[img_id])
    return scorer.compute(option="closest")
