"""ROUGE-L (parity: pycocoevalcap rouge/rouge.py:38-107 — max-over-refs
precision/recall, F with beta=1.2)."""

from __future__ import annotations

from typing import Dict, Sequence

import numpy as np

BETA = 1.2


def lcs_length(a: Sequence[str], b: Sequence[str]) -> int:
    """Classic O(len(a)*len(b)) longest-common-subsequence length."""
    if not a or not b:
        return 0
    prev = [0] * (len(b) + 1)
    for x in a:
        cur = [0] * (len(b) + 1)
        for j, y in enumerate(b, 1):
            cur[j] = prev[j - 1] + 1 if x == y else max(prev[j], cur[j - 1])
        prev = cur
    return prev[-1]


def rouge_l_score(candidate: str, references: Sequence[str]) -> float:
    cand = candidate.split(" ")
    precs, recs = [], []
    for ref in references:
        r = ref.split(" ")
        lcs = lcs_length(r, cand)
        precs.append(lcs / float(len(cand)))
        recs.append(lcs / float(len(r)))
    p, r = max(precs), max(recs)
    if p != 0 and r != 0:
        return ((1 + BETA ** 2) * p * r) / float(r + BETA ** 2 * p)
    return 0.0


def compute_rouge(gts: Dict, res: Dict):
    ids = sorted(gts.keys())
    scores = np.array([rouge_l_score(res[i][0], gts[i]) for i in ids])
    return float(scores.mean()), scores
