"""Native (C++) SCST reward scorer: exact agreement with the pure-Python
CaptionScorer across weighting configs and baseline modes."""

import numpy as np
import pytest

from sparse_caption_tpu.metrics.cider import build_df_pickle
from sparse_caption_tpu.scst.scorers import CaptionScorer
from sparse_caption_tpu.scst import native as native_scst

pytestmark = pytest.mark.skipif(not native_scst.is_available(), reason="native library unavailable")

GTS = [
    ["a man riding a horse on a beach", "a person rides a horse", "man on a horse"],
    ["a dog sitting on a couch", "a small dog on a sofa"],
]
SAMPLE = [
    ["a man riding a horse", "a man on a beach", "a horse horse horse"],
    ["a dog on a couch", "the small dog", "a cat"],
]
BASELINE = [["a man riding a horse on a beach"], ["a dog sitting on a couch"]]


@pytest.fixture(scope="module")
def df_path(tmp_path_factory):
    d = tmp_path_factory.mktemp("df")
    path = str(d / "df.p")
    build_df_pickle(GTS + [["people at a table", "a meal on a table"]], path)
    return path


@pytest.mark.parametrize(
    "bleu_weight",
    # incl. a negative order weight: once any weight is positive the
    # reference applies EVERY order's weight (scorers.py:88-93) — the
    # python and native paths must agree on that, not drop negatives
    [[0, 0, 0, 0], [0, 0, 0, 1.0], [0.5, 0.3, 0.2, 1.0], [1.0, 0, 0, -0.5]],
)
@pytest.mark.parametrize("use_baseline", [True, False])
def test_native_matches_python(df_path, bleu_weight, use_baseline):
    py = CaptionScorer(df_path, 1.0, bleu_weight)
    nat = native_scst.NativeCaptionScorer(df_path, 1.0, bleu_weight)
    base = BASELINE if use_baseline else None
    s1, b1 = py(GTS, SAMPLE, base)
    s2, b2 = nat(GTS, SAMPLE, base)
    np.testing.assert_allclose(s1, s2, atol=1e-9)
    np.testing.assert_allclose(b1, b2, atol=1e-9)


def test_native_empty_caption(df_path):
    nat = native_scst.NativeCaptionScorer(df_path, 1.0, [0, 0, 0, 0])
    s, b = nat([GTS[0]], [["", "a man"]], None)
    assert s[0] == 0.0 and np.isfinite(s).all()


def test_native_oov_words(df_path):
    """Words absent from the df corpus still score (idf = ref_len)."""
    py = CaptionScorer(df_path, 1.0, [0, 0, 0, 0])
    nat = native_scst.NativeCaptionScorer(df_path, 1.0, [0, 0, 0, 0])
    sample = [["a zzz qqq horse", "totally unseen words here"]]
    s1, _ = py([GTS[0]], sample, None)
    s2, _ = nat([GTS[0]], sample, None)
    np.testing.assert_allclose(s1, s2, atol=1e-9)
