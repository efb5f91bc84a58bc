"""SCST reward scorer.

Parity with the reference ``CaptionScorer``
(``sparse_caption/scst/scorers.py:17-114``):

* reward = CIDEr-D (precomputed train-corpus df pickle) x cider_weight
  + BLEU-1..4 x per-order bleu_weight
* items laid out [baseline captions..., sample captions...] and scored in
  one pass
* greedy baseline: per-image baseline score repeated over samples
* sample-mean baseline: leave-one-out mean over the image's sample set
  (``scorers.py:104-105``)

Runs entirely on host (numpy n-gram math) — the device round-trip is
handled by the training engine.
"""

from __future__ import annotations

from typing import List, Optional, Sequence

import numpy as np

from sparse_caption_tpu.metrics.bleu import BleuScorer
from sparse_caption_tpu.metrics.cider import CiderScorer


def df_pickle_path(path: str) -> str:
    """Canonical df-pickle path: the reference appends ``.p`` when missing
    (``ciderD_scorer.py:82-87``); one helper so the host/native/device
    scorers cannot drift."""
    return path if path.endswith(".p") else path + ".p"


def split_sample_baseline(total: np.ndarray, num_baseline: int, spi: int,
                          use_baseline: bool):
    """Split one scored pass laid out [baselines..., samples...] into
    (sc_sample, sc_baseline) — greedy baselines repeat per sample; without
    a baseline the leave-one-out sample mean is used (reference
    ``scorers.py:104-105``). Shared by the host and native scorers (the
    device scorer has a jnp twin pinned equal by the parity tests)."""
    sc_sample = total[num_baseline:]
    if use_baseline:
        sc_baseline = np.repeat(total[:num_baseline], spi)
    else:
        assert spi >= 2, f"sample-mean baseline needs >=2 samples/image, got {spi}"
        sums = sc_sample.reshape(-1, spi).sum(-1)
        sc_baseline = (np.repeat(sums, spi) - sc_sample) / (spi - 1)
    return sc_sample, sc_baseline


class CaptionScorer:
    def __init__(self, path_to_cached_tokens: str, cider_weight: float = 1.0,
                 bleu_weight: Optional[Sequence[float]] = None):
        self.path_to_cached_tokens = path_to_cached_tokens
        self.cider_weight = float(cider_weight)
        self.bleu_weight = list(bleu_weight) if bleu_weight is not None else [0.0] * 4
        assert len(self.bleu_weight) == 4
        self._df_cache = None

    def _cider(self) -> CiderScorer:
        if self._df_cache is None:
            scorer = CiderScorer.from_pickle(df_pickle_path(self.path_to_cached_tokens))
            self._df_cache = (scorer.df, scorer.ref_len)
        df, ref_len = self._df_cache
        return CiderScorer(df=df, ref_len=ref_len)

    def __call__(self, refs: List[List[str]], sample: List[List[str]],
                 baseline: Optional[List[List[str]]] = None):
        """refs[i]: GT token strings for image i; sample[i]: sampled captions;
        baseline[i]: [greedy caption] or None.
        Returns (sc_sample (N*S,), sc_baseline (N*S,))."""
        assert len(refs) == len(sample)
        num_baseline = len(baseline) if baseline else 0
        spi = len(sample[0])
        assert all(len(s) == spi for s in sample), "equal samples per image required"

        hyps: List[str] = []
        hyp_refs: List[List[str]] = []
        if baseline:
            assert len(baseline) == len(sample)
            for i in range(num_baseline):
                hyps.append(baseline[i][0])
                hyp_refs.append(list(refs[i]))
        for i in range(len(sample)):
            for j in range(spi):
                hyps.append(sample[i][j])
                hyp_refs.append(list(refs[i]))
        n_items = len(hyps)

        total = np.zeros(n_items)
        if self.cider_weight > 0:
            cider = self._cider()
            for h, r in zip(hyps, hyp_refs):
                cider.append(h, r)
            _, sc = cider.compute()
            total += sc * self.cider_weight
        if max(self.bleu_weight) > 0:
            bleu = BleuScorer(4)
            for h, r in zip(hyps, hyp_refs):
                bleu.append(h, r)
            _, per_image = bleu.compute(option="closest")
            for k, w in enumerate(self.bleu_weight):
                # reference scorers.py:88-93 applies EVERY order's weight
                # (including negatives) once any weight is positive; only
                # exact zeros may be skipped
                if w != 0:
                    total += np.asarray(per_image[k]) * w

        return split_sample_baseline(total, num_baseline, spi, bool(baseline))
