"""Metric stack tests.

Golden values below were produced by running the REFERENCE's vendored
pure-python scorers (pycocoevalcap BleuScorer/Rouge/Cider and the scst
ciderD scorer) on the same inputs — our implementations match them to
1e-9 (the rebuild's analogue of the reference golden metric test,
tests/test_coco_caption.py:18-27; the reference's exact fixture data is a
missing git-lfs blob here)."""

import json
import os

import numpy as np
import pytest

from sparse_caption_tpu.metrics.bleu import compute_bleu
from sparse_caption_tpu.metrics.cider import CiderScorer, build_df_pickle, compute_cider
from sparse_caption_tpu.metrics.eval import evaluate_caption_json
from sparse_caption_tpu.metrics.ptb_tokenizer import ptb_tokenize_sentence
from sparse_caption_tpu.metrics.rouge import compute_rouge, lcs_length
from sparse_caption_tpu.scst.scorers import CaptionScorer

GTS = {
    1: ["a man riding a horse on a beach", "a person rides a horse near the ocean", "man on a horse by the sea"],
    2: ["a dog sitting on a couch", "a small dog rests on a sofa", "the dog is on the couch"],
    3: ["two dogs playing with a ball", "a pair of dogs chase a ball", "dogs playing fetch in a yard"],
    4: ["a plate of food on a table", "a meal served on a white plate", "food arranged on a dinner table"],
}
RES = {
    1: ["a man riding a horse on the beach"],
    2: ["a dog sitting on the couch"],
    3: ["two dogs play with a ball in a yard"],
    4: ["a plate of food"],
}

# golden values from the reference scorers (see module docstring)
GOLDEN_BLEU = [0.9629629628916324, 0.8681147322153305, 0.758457259211569, 0.617544162171895]
GOLDEN_ROUGE = 0.7732812822098536
GOLDEN_CIDER = 2.86876386391936


def test_bleu_golden():
    corpus, per_image = compute_bleu(GTS, RES)
    np.testing.assert_allclose(corpus, GOLDEN_BLEU, atol=1e-9)
    assert all(len(p) == 4 for p in per_image)


def test_rouge_golden():
    mean, per = compute_rouge(GTS, RES)
    np.testing.assert_allclose(mean, GOLDEN_ROUGE, atol=1e-9)


def test_cider_golden():
    mean, per = compute_cider(GTS, RES)
    np.testing.assert_allclose(mean, GOLDEN_CIDER, atol=1e-9)


def test_perfect_prediction_scores_high():
    res = {i: [GTS[i][0]] for i in GTS}
    corpus, _ = compute_bleu(GTS, res)
    assert corpus[3] > 0.99
    mean, _ = compute_rouge(GTS, res)
    assert mean > 0.99
    cider_mean, _ = compute_cider(GTS, res)
    assert cider_mean > 3.0  # identical caption: high tf-idf cosine (1/3 refs exact)


def test_lcs():
    assert lcs_length("a b c d".split(), "a x c d".split()) == 3
    assert lcs_length([], ["a"]) == 0


def test_ptb_tokenizer_rules():
    assert ptb_tokenize_sentence("A man, riding; a horse.") == "a man riding a horse".split()
    assert ptb_tokenize_sentence("Don't stop!") == ["do", "n't", "stop"]
    # Stanford's -lowerCase emits -lrb-/-rrb- which the reference's UPPERCASE
    # punctuation filter keeps (see tests/test_java_metrics_protocol.py)
    assert ptb_tokenize_sentence("the dog (a pug) sat") == ["the", "dog", "-lrb-", "a", "pug", "-rrb-", "sat"]
    assert ptb_tokenize_sentence("it's nice...") == ["it", "'s", "nice"]


def test_cider_df_pickle_round_trip(tmp_path):
    train_refs = [GTS[i] for i in sorted(GTS)]
    path = str(tmp_path / "df.p")
    build_df_pickle(train_refs, path)
    scorer = CiderScorer.from_pickle(path)
    for i in sorted(GTS):
        scorer.append(RES[i][0], GTS[i])
    mean, per = scorer.compute()
    assert mean > 0 and len(per) == 4


def test_evaluate_caption_json(tmp_path):
    ann = dict(
        images=[{"id": i} for i in GTS],
        annotations=[{"caption": c, "id": j, "image_id": i} for j, (i, caps) in enumerate(GTS.items()) for c in caps],
        info="", type="captions", licenses="",
    )
    ann_file = str(tmp_path / "ann.json")
    json.dump(ann, open(ann_file, "w"))
    res_file = str(tmp_path / "res.json")
    json.dump([{"image_id": i, "caption": RES[i][0]} for i in RES], open(res_file, "w"))
    scores, per_image, _ = evaluate_caption_json(res_file, ann_file)
    np.testing.assert_allclose(scores["Bleu_4"], GOLDEN_BLEU[3], atol=1e-9)
    np.testing.assert_allclose(scores["CIDEr"], GOLDEN_CIDER, atol=1e-9)
    np.testing.assert_allclose(scores["ROUGE_L"], GOLDEN_ROUGE, atol=1e-9)
    # jar absent in this environment: explicit skip markers, not silent absence
    assert scores["METEOR"] == "skipped (jar unavailable)"
    assert scores["SPICE"] == "skipped (jar unavailable)"
    assert set(per_image.keys()) == set(GTS.keys())


def test_eval_rejects_unknown_image(tmp_path):
    ann = dict(images=[{"id": 1}], annotations=[{"caption": "a dog", "id": 0, "image_id": 1}],
               info="", type="captions", licenses="")
    ann_file = str(tmp_path / "ann.json"); json.dump(ann, open(ann_file, "w"))
    res_file = str(tmp_path / "res.json"); json.dump([{"image_id": 99, "caption": "x"}], open(res_file, "w"))
    with pytest.raises(ValueError):
        evaluate_caption_json(res_file, ann_file)


class TestCaptionScorer:
    @pytest.fixture()
    def scorer(self, tmp_path):
        path = str(tmp_path / "df.p")
        build_df_pickle([GTS[i] for i in sorted(GTS)], path)
        return CaptionScorer(path, cider_weight=1.0, bleu_weight=[0, 0, 0, 1.0])

    def test_greedy_baseline(self, scorer):
        refs = [GTS[1], GTS[2]]
        sample = [["a man riding a horse", "a man on a beach"], ["a dog on a couch", "a cat"]]
        baseline = [["a man riding a horse on a beach"], ["a dog sitting on a couch"]]
        sc_sample, sc_baseline = scorer(refs, sample, baseline)
        assert sc_sample.shape == (4,) and sc_baseline.shape == (4,)
        # baseline scores repeat per sample
        assert sc_baseline[0] == sc_baseline[1] and sc_baseline[2] == sc_baseline[3]
        # exact GT baseline should beat partial samples
        assert sc_baseline[0] > sc_sample[1]

    def test_sample_mean_baseline_leave_one_out(self, scorer):
        refs = [GTS[1]]
        sample = [["a man riding a horse", "a man on a beach", "a horse"]]
        sc_sample, sc_baseline = scorer(refs, sample, None)
        sums = sc_sample.sum()
        for j in range(3):
            np.testing.assert_allclose(sc_baseline[j], (sums - sc_sample[j]) / 2, rtol=1e-9)

    def test_reward_orders_quality(self, scorer):
        refs = [GTS[1]]
        sample = [["a man riding a horse on a beach", "the the the the"]]
        sc_sample, _ = scorer(refs, sample, None)
        assert sc_sample[0] > sc_sample[1]
