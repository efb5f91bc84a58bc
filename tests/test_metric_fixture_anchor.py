"""Fixture-anchored fidelity estimates for the jar-free metric analogs.

The reference's golden metric anchor (its ``tests/test_coco_caption.py:24-27``:
METEOR .288 / SPICE .220 over 5,000 real model predictions vs
``captions_val2014.json``) is unreproducible here — the annotation file and
all metric jars are missing git-lfs blobs and the image has no JVM.  What IS
reachable: exactly one of those 5,000 real predictions (image 391895,
``caption_00156000.json``) has ground truth in the shipped fixture
(``dataset_coco_testing.json``).  These tests pin our analogs on that real
(prediction, 5 references) pair, giving the documented point-sample delta
estimate next to the corpus anchors:

    METEOR_py (exact+stem+function-word delta-weighting) = 0.3182
                                      vs corpus METEOR anchor 0.288
    SPICE_py               = 0.1852   vs corpus SPICE  anchor 0.220
                                      (0.1481 before the r5 extraction
                                      rules + built-in synonym table)

Single-image values are NOT corpus values (the exact BLEU on this image is
0.889 vs the 0.806 corpus anchor — same-direction spread), so these are
regression pins + an honest plausibility check, not a fidelity bound; the
formula-level bounds live in test_meteor_py.py / test_spice_py.py.
"""

import json
import os

import pytest

REF_DATA = "/root/reference/tests/data"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(REF_DATA), reason="reference fixture mount not available")


@pytest.fixture(scope="module")
def anchor_pair():
    with open(os.path.join(REF_DATA, "dataset_coco_testing.json")) as f:
        data = json.load(f)
    img = next(i for i in data["images"] if i["cocoid"] == 391895)
    gts = [s["raw"].strip() for s in img["sentences"]]
    with open(os.path.join(REF_DATA, "caption_00156000.json")) as f:
        preds = {p["image_id"]: p["caption"] for p in json.load(f)}
    pred = preds[391895]

    from sparse_caption_tpu.metrics.ptb_tokenizer import ptb_tokenize

    g = ptb_tokenize({0: [{"caption": c} for c in gts]})
    r = ptb_tokenize({0: [{"caption": pred}]})
    return {0: g[0]}, {0: r[0]}


def test_meteor_py_fixture_anchor(anchor_pair):
    from sparse_caption_tpu.metrics.meteor_py import MeteorPy

    gts, res = anchor_pair
    score, _ = MeteorPy().compute_score(gts, res)
    # default = exact+stem stages + built-in function-word delta-weighting
    # (metrics/meteor_data_en.py); 0.2780 before the weighting shipped
    assert abs(score - 0.318217) < 1e-5
    # plausibility vs the corpus anchor: the lower bound on a single good
    # prediction lands in the same regime as official corpus METEOR 0.288
    # (it is NOT expected to equal it)
    assert 0.15 < score < 0.45

    from sparse_caption_tpu.metrics.meteor_py import MeteorData

    # the weighting is live by default and the bare exact+stem pin holds
    bare, _ = MeteorPy(MeteorData()).compute_score(gts, res)
    assert abs(bare - 0.278038) < 1e-5


def test_spice_py_fixture_anchor(anchor_pair):
    from sparse_caption_tpu.metrics.spice_py import compute_spice_py

    gts, res = anchor_pair
    score, per_img = compute_spice_py(gts, res)
    # r5 extraction rules (clause-subject copular/finite-verb attachment,
    # directional-PP-to-verb-subject, enhanced-dependency coordination
    # sharing) + the built-in synonym table (motorcycle~bike fires here):
    # 0.1481 -> 0.1852 = 2*m/(|cand|+|ref|) = 2*5/(6+48).  This is the
    # anchor's ceiling for a correct parse: the sixth candidate tuple
    # (man, down, road) has no reference counterpart under ANY extraction
    # (no reference contains "down"), so official SPICE's own parses cap
    # at the same m=5 — the corpus anchor 0.220 is an average over 5,000
    # predictions, not this image's value.
    assert abs(score - 0.185185) < 1e-5
    assert per_img == [score]
    assert 0.05 < score < 0.35


def test_exact_scorers_on_fixture_anchor(anchor_pair):
    """BLEU/ROUGE/CIDEr are exact reimplementations (differentially tested
    vs vendored pycocoevalcap in test_metrics.py); pin their values on the
    same real pair so all five metrics share one anchored example."""
    from sparse_caption_tpu.metrics.bleu import compute_bleu
    from sparse_caption_tpu.metrics.rouge import compute_rouge

    gts, res = anchor_pair
    bleu, _ = compute_bleu(gts, res)
    assert abs(bleu[0] - 0.888889) < 1e-4  # corpus anchor Bleu_1 = 0.806
    rouge, _ = compute_rouge(gts, res)
    assert abs(rouge - 0.596285) < 1e-4  # corpus anchor ROUGE_L = 0.584
