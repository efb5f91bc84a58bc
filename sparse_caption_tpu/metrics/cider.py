"""CIDEr / CIDEr-D scorer.

One implementation serves both the offline eval metric
(``coco_caption/pycocoevalcap/cider/cider_scorer.py:61-196``) and the
SCST train-time reward
(``scst/cider/pyciderevalcap/ciderD/ciderD_scorer.py:57-226``) — the two
vendored scorers in the reference are numerically identical (tf-idf vectors
with count clipping and a gaussian length penalty); they differ only in
where document frequencies come from:

* ``df_mode="corpus"``: df computed from the references of the evaluated
  set, ``ref_len = log(#images)``
* precomputed df: a pickle built from the training corpus
  (``scripts/dataset/prepro_ngrams.py:115-133``) with a stored ref_len

Quirk preserved for parity: "length" used by the gaussian penalty counts
*bigrams* (``if n == 1: length += term_freq``) — i.e. len(words)-1.
"""

from __future__ import annotations

import math
import pickle
from collections import defaultdict
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np

N_GRAMS = 4
SIGMA = 6.0


def precook(sentence: str, n: int = N_GRAMS) -> Dict[Tuple[str, ...], int]:
    words = sentence.split()
    counts: Dict[Tuple[str, ...], int] = defaultdict(int)
    for k in range(1, n + 1):
        for i in range(len(words) - k + 1):
            counts[tuple(words[i : i + k])] += 1
    return counts


class CiderScorer:
    def __init__(self, df: Optional[Dict] = None, ref_len: Optional[float] = None,
                 n: int = N_GRAMS, sigma: float = SIGMA):
        """df=None -> corpus mode (df computed from appended references)."""
        self.n = n
        self.sigma = sigma
        self.df = df
        self.ref_len = ref_len
        self.ctest: List[Dict] = []
        self.crefs: List[List[Dict]] = []

    @classmethod
    def from_pickle(cls, path: str) -> "CiderScorer":
        """Load a precomputed-df pickle. Contract matches the reference
        (prepro_ngrams.py:130: {'document_frequency': {ngram: df},
        'ref_len': <raw image count>}; the scorer applies log at load,
        ciderD_scorer.py:82-87) — so reference-produced pickles such as
        coco-train-words.p load unchanged."""
        with open(path, "rb") as f:
            data = pickle.load(f, encoding="latin1")
        return cls(df=data["document_frequency"], ref_len=math.log(float(data["ref_len"])))

    def append(self, hypothesis: str, references: Sequence[str]) -> None:
        self.ctest.append(precook(hypothesis))
        self.crefs.append([precook(r) for r in references])

    # ------------------------------------------------------------------
    def _corpus_df(self) -> Dict:
        df: Dict = defaultdict(float)
        for refs in self.crefs:
            for ngram in set(ng for ref in refs for ng in ref):
                df[ngram] += 1
        return df

    def _counts2vec(self, cnts, df, ref_len):
        vec = [defaultdict(float) for _ in range(self.n)]
        norm = [0.0] * self.n
        length = 0
        for ngram, tf in cnts.items():
            dfv = math.log(max(1.0, df.get(ngram, 0.0)))
            n = len(ngram) - 1
            vec[n][ngram] = float(tf) * (ref_len - dfv)
            norm[n] += vec[n][ngram] ** 2
            if n == 1:
                length += tf  # reference quirk: bigram count as "length"
        return vec, [math.sqrt(x) for x in norm], length

    def _sim(self, vh, vr, nh, nr, lh, lr):
        delta = float(lh - lr)
        val = np.zeros(self.n)
        for n in range(self.n):
            for ngram in vh[n]:
                val[n] += min(vh[n][ngram], vr[n][ngram]) * vr[n][ngram]
            if nh[n] != 0 and nr[n] != 0:
                val[n] /= nh[n] * nr[n]
            val[n] *= math.e ** (-(delta ** 2) / (2 * self.sigma ** 2))
        return val

    def compute(self) -> Tuple[float, np.ndarray]:
        if self.df is None:
            df = self._corpus_df()
            ref_len = math.log(float(len(self.crefs)))
        else:
            df = self.df
            ref_len = self.ref_len
        scores = []
        for test, refs in zip(self.ctest, self.crefs):
            vec, norm, length = self._counts2vec(test, df, ref_len)
            score = np.zeros(self.n)
            for ref in refs:
                vr, nr, lr = self._counts2vec(ref, df, ref_len)
                score += self._sim(vec, vr, norm, nr, length, lr)
            score_avg = float(np.mean(score)) / len(refs) * 10.0
            scores.append(score_avg)
        arr = np.array(scores)
        return float(arr.mean()), arr


def compute_cider(gts: Dict, res: Dict, df: Optional[Dict] = None, ref_len: Optional[float] = None):
    scorer = CiderScorer(df=df, ref_len=ref_len)
    for img_id in sorted(gts.keys()):
        scorer.append(res[img_id][0], gts[img_id])
    return scorer.compute()


def build_df_pickle(tokenized_refs: Sequence[Sequence[str]], out_path: str) -> None:
    """Build the SCST df pickle from training captions (equivalent output
    contract to scripts/dataset/prepro_ngrams.py:115-133)."""
    df: Dict = defaultdict(float)
    for refs in tokenized_refs:
        ngrams = set()
        for r in refs:
            ngrams.update(precook(r).keys())
        for ng in ngrams:
            df[ng] += 1
    # document_frequency must stay a defaultdict(float): the reference scorer
    # indexes it with unseen ngrams (ciderD_scorer.py:147)
    data = {"document_frequency": df, "ref_len": float(len(tokenized_refs))}
    with open(out_path, "wb") as f:
        pickle.dump(data, f, protocol=pickle.HIGHEST_PROTOCOL)
