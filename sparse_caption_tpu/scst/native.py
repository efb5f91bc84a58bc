"""ctypes bridge to the native (C++) SCST reward scorer.

Loads ``native/lib/libreward.so`` (built by ``native/build.sh``; auto-built
on first use when a compiler is available) and exposes
``NativeCaptionScorer`` with the exact ``CaptionScorer`` interface/semantics
(sparse_caption_tpu/scst/scorers.py).  Falls back transparently when the
library can't be built — the pure-Python scorer remains authoritative for
correctness (cross-checked in tests to 1e-9).

Interning protocol: caption tokens (and df n-gram words) are interned to
int32 ids in Python; the C++ side does all n-gram hashing + tf-idf math.
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess
from typing import Dict, List, Optional, Sequence

import numpy as np

logger = logging.getLogger(__name__)

_LIB_PATH = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
                         "native", "lib", "libreward.so")


def _load_library() -> Optional[ctypes.CDLL]:
    if not os.path.isfile(_LIB_PATH):
        build = os.path.join(os.path.dirname(os.path.dirname(_LIB_PATH)), "build.sh")
        try:
            subprocess.run(["sh", build], check=True, capture_output=True, timeout=120)
        except Exception as e:  # no compiler / build failure -> pure-python fallback
            logger.info("native reward scorer unavailable (%s); using pure-python path", e)
            return None
    try:
        lib = ctypes.CDLL(_LIB_PATH)
    except OSError as e:
        logger.info("failed to load %s (%s); using pure-python path", _LIB_PATH, e)
        return None
    lib.reward_scorer_new.restype = ctypes.c_void_p
    lib.reward_scorer_new.argtypes = [ctypes.c_double, ctypes.c_double]
    lib.reward_scorer_free.argtypes = [ctypes.c_void_p]
    lib.reward_scorer_set_df.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.int8),
        np.ctypeslib.ndpointer(np.float64), ctypes.c_int64,
    ]
    lib.reward_scorer_set_df.restype = ctypes.c_int64  # rejected-entry count
    lib.reward_score_batch.argtypes = [
        ctypes.c_void_p,
        np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.int64),
        np.ctypeslib.ndpointer(np.int32), np.ctypeslib.ndpointer(np.int64),
        np.ctypeslib.ndpointer(np.int64), ctypes.c_int64,
        ctypes.c_double, np.ctypeslib.ndpointer(np.float64),
        np.ctypeslib.ndpointer(np.float64),
    ]
    return lib


_LIB: Optional[ctypes.CDLL] = None
_LIB_TRIED = False


def get_lib() -> Optional[ctypes.CDLL]:
    global _LIB, _LIB_TRIED
    if not _LIB_TRIED:
        _LIB = _load_library()
        _LIB_TRIED = True
    return _LIB


def is_available() -> bool:
    return get_lib() is not None


class _Interner:
    def __init__(self):
        self.map: Dict[str, int] = {}

    def __call__(self, word: str) -> int:
        v = self.map.get(word)
        if v is None:
            v = len(self.map)
            self.map[word] = v
        return v


class NativeCaptionScorer:
    """Drop-in replacement for scst.scorers.CaptionScorer backed by C++."""

    def __init__(self, path_to_cached_tokens: str, cider_weight: float = 1.0,
                 bleu_weight: Optional[Sequence[float]] = None):
        lib = get_lib()
        if lib is None:
            raise RuntimeError("native reward library not available")
        self._lib = lib
        self.cider_weight = float(cider_weight)
        self.bleu_weight = np.asarray(bleu_weight if bleu_weight is not None else [0.0] * 4, np.float64)
        assert self.bleu_weight.shape == (4,)
        self._intern = _Interner()

        from sparse_caption_tpu.metrics.cider import CiderScorer
        from sparse_caption_tpu.scst.scorers import df_pickle_path

        base = CiderScorer.from_pickle(df_pickle_path(path_to_cached_tokens))
        self._handle = lib.reward_scorer_new(6.0, float(base.ref_len))
        self._upload_df(base.df)

    def _upload_df(self, df: Dict) -> None:
        flat_ids: List[int] = []
        lens = np.empty(len(df), np.int8)
        values = np.empty(len(df), np.float64)
        for i, (ngram, v) in enumerate(df.items()):
            lens[i] = len(ngram)
            values[i] = float(v)
            flat_ids.extend(self._intern(w) for w in ngram)
        rejected = self._lib.reward_scorer_set_df(
            self._handle, np.asarray(flat_ids, np.int32), lens, values, len(df)
        )
        if rejected:
            raise ValueError(
                f"df table contains {rejected} n-grams with order outside 1..4 "
                "(CIDEr-D is defined over 1..4-grams; rebuild the df pickle)")

    def _encode(self, caption: str) -> List[int]:
        return [self._intern(w) for w in caption.split()]

    def __call__(self, refs: List[List[str]], sample: List[List[str]],
                 baseline: Optional[List[List[str]]] = None):
        assert len(refs) == len(sample)
        num_baseline = len(baseline) if baseline else 0
        spi = len(sample[0])
        assert all(len(s) == spi for s in sample)

        hyps: List[List[int]] = []
        item_ref_group: List[int] = []  # index into the per-image ref groups
        if baseline:
            assert len(baseline) == len(sample)
            for i in range(num_baseline):
                hyps.append(self._encode(baseline[i][0]))
                item_ref_group.append(i)
        for i in range(len(sample)):
            for j in range(spi):
                hyps.append(self._encode(sample[i][j]))
                item_ref_group.append(i)

        # build the flat ref arrays: groups concatenated per image, then map
        # each item to its image's [start, end) ref slice
        ref_flat: List[int] = []
        ref_offsets = [0]
        group_bounds = []  # (start_ref_idx, end_ref_idx) per image
        for group in refs:
            start = len(ref_offsets) - 1
            for r in group:
                ids = self._encode(r)
                ref_flat.extend(ids)
                ref_offsets.append(len(ref_flat))
            group_bounds.append((start, len(ref_offsets) - 1))

        hyp_flat: List[int] = []
        hyp_offsets = [0]
        for h in hyps:
            hyp_flat.extend(h)
            hyp_offsets.append(len(hyp_flat))
        # items can share a reference group, so the C ABI takes per-item
        # (start, end) ref-index pairs packed adjacently: [s0, e0, s1, e1, ...]
        starts = [group_bounds[g][0] for g in item_ref_group]
        ends = [group_bounds[g][1] for g in item_ref_group]
        item_ref_offsets = np.empty(2 * len(hyps), np.int64)
        item_ref_offsets[0::2] = starts
        item_ref_offsets[1::2] = ends

        out = np.empty(len(hyps), np.float64)
        self._lib.reward_score_batch(
            self._handle,
            np.asarray(hyp_flat, np.int32), np.asarray(hyp_offsets, np.int64),
            np.asarray(ref_flat, np.int32), np.asarray(ref_offsets, np.int64),
            item_ref_offsets, len(hyps),
            self.cider_weight, self.bleu_weight, out,
        )

        from sparse_caption_tpu.scst.scorers import split_sample_baseline

        return split_sample_baseline(out, num_baseline, spi, bool(baseline))

    def __del__(self):
        try:
            self._lib.reward_scorer_free(self._handle)
        except Exception:
            pass
