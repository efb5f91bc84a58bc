"""SPICE_py: rule-based scene graphs + the exact SPICE tuple-F1.

Anchors:
* the SPICE paper's (Anderson et al. 2016) Fig. 1 running example must
  produce the paper's published tuple set;
* F-score hand-derived values (the scoring machinery is exact even though
  the extraction is an approximation — reference jar contract in
  coco_caption/pycocoevalcap/spice/spice.py:32-90);
* synonym-group matching via SPARSE_CAPTION_SPICE_SYNONYMS;
* end-to-end flow through metrics.eval alongside METEOR_py/skip markers.
"""

import json

import pytest

from sparse_caption_tpu.metrics.spice_py import (
    compute_spice_py,
    f_score,
    graph_tuples,
    parse_scene_graph,
)


def g(sentence):
    return parse_scene_graph(sentence.split())


def test_paper_fig1_example_exact():
    # "A young girl standing on top of a tennis court" -> the paper's
    # tuples {(girl), (court), (girl, young), (girl, standing),
    # (court, tennis), (girl, on-top-of, court)} (stem-normalized)
    assert g("a young girl standing on top of a tennis court") == {
        ("girl",), ("court",), ("girl", "young"), ("girl", "stand"),
        ("court", "tenni"), ("girl", "on top of", "court"),
    }


def test_transitive_verb_relation():
    assert g("a man riding a horse") == {
        ("man",), ("hors",), ("man", "ride", "hors"),
    }


def test_verb_plus_prep_splits_attr_and_relation():
    # the paper's convention: the verb becomes an attribute, the
    # preposition carries the relation
    t = g("a man sitting on a wooden bench")
    assert ("man", "sit") in t
    assert ("man", "on", "bench") in t
    assert ("bench", "wooden") in t


def test_numeric_and_noun_modifiers_are_attributes():
    t = g("two dogs near a tennis ball")
    assert ("dog", "two") in t
    assert ("ball", "tenni") in t
    assert ("dog", "near", "ball") in t


def test_copula_transparent():
    assert ("cat", "on", "mat") in g("the cat is on the mat")
    assert ("pizza", "larg") in g("the pizza is large")


def test_coordination_shares_relations():
    t = g("a man and a woman sitting on a bench")
    assert ("man", "sit") in t and ("woman", "sit") in t
    assert ("man", "on", "bench") in t and ("woman", "on", "bench") in t


def test_inflections_normalize_across_sides():
    # "rides" vs "riding", "dogs" vs "dog" must produce identical tuples
    assert g("a dog rides a wave") == g("dogs riding waves")


def test_prenominal_participle_is_attribute():
    t = g("a parked car near a smiling man")
    assert ("car", "park") in t
    assert ("man", "smile") in t
    assert ("car", "near", "man") in t


def test_f_score_hand_derived():
    cand = {("dog",), ("dog", "red"), ("dog", "on", "mat")}
    ref = {("dog",), ("mat",), ("dog", "on", "mat"), ("dog", "brown")}
    # matches = 2; P = 2/3, R = 2/4, F = 2PR/(P+R) = 4/7
    assert f_score(cand, ref) == pytest.approx(4.0 / 7.0)
    assert f_score(set(), ref) == 0.0
    assert f_score(cand, set()) == 0.0
    assert f_score(cand, cand) == 1.0


def test_reference_union_semantics():
    # tuples union over references before matching (jar behavior)
    refs = graph_tuples(["a black dog", "a dog on a couch"])
    assert ("dog", "black") in refs and ("dog", "on", "couch") in refs


def test_synonym_groups_enable_matching(tmp_path, monkeypatch):
    syn = tmp_path / "syn.json"
    json.dump([["puppy", "dog"], ["sofa", "couch"]], open(syn, "w"))
    gts = {1: ["a dog on a couch"]}
    res = {1: ["a puppy on a sofa"]}
    # an explicit SPARSE_CAPTION_SPICE_SYNONYMS file REPLACES the built-in
    # table: an empty list recovers exact-only matching
    empty = tmp_path / "empty.json"
    json.dump([], open(empty, "w"))
    monkeypatch.setenv("SPARSE_CAPTION_SPICE_SYNONYMS", str(empty))
    _, per_exact = compute_spice_py(gts, res)
    assert per_exact[0] == 0.0  # no exact overlap
    monkeypatch.setenv("SPARSE_CAPTION_SPICE_SYNONYMS", str(syn))
    mean, per = compute_spice_py(gts, res)
    assert per[0] == pytest.approx(1.0)  # all three tuples match via synsets
    assert mean == pytest.approx(1.0)


def test_builtin_synonym_table_is_default(monkeypatch):
    # metrics/spice_synonyms_en.py fires without any env configuration:
    # couch~sofa share a WordNet-guided built-in group
    monkeypatch.delenv("SPARSE_CAPTION_SPICE_SYNONYMS", raising=False)
    _, per = compute_spice_py({1: ["a cat on a couch"]}, {1: ["a cat on a sofa"]})
    assert per[0] == pytest.approx(1.0)


def test_clause_subject_attachments():
    # copular PP binds the clause subject, not the nearest NP
    t = g("a man in a red shirt is on a motorcycle")
    assert ("man", "on", "motorcycl") in t
    assert ("shirt", "on", "motorcycl") not in t
    # finite verbs take the clause subject (nsubj)
    t = g("a dirt path with a person rests in the sun")
    assert ("path", "rest") in t and ("person", "rest") not in t
    # participles modify the nearest NP (acl attachment)
    t = g("a man with a dog riding a horse")
    assert ("dog", "ride", "hors") in t and ("man", "ride", "hors") not in t
    # ... unless after a copula ("is riding" is a finite progressive)
    t = g("a man with a dog is riding a horse")
    assert ("man", "ride", "hors") in t and ("dog", "ride", "hors") not in t


def test_directional_pp_attaches_to_verb_subject():
    t = g("a man riding a motorcycle down a dirt road")
    assert ("man", "down", "road") in t  # path PP modifies the motion
    assert ("motorcycl", "down", "road") not in t
    assert ("man", "ride", "motorcycl") in t and ("road", "dirt") in t
    # non-directional in-VP PP still attaches to the nearest NP
    t = g("a man holding a cup with a handle")
    assert ("cup", "with", "handl") in t and ("man", "with", "handl") not in t


def test_coordination_shares_incoming_relations():
    # enhanced-dependency conj propagation: the incoming relation extends
    # to the new conjunct, the trailing PP binds the nearest conjunct only
    t = g("an area with a bridge and a background of mountains")
    assert ("area", "with", "bridg") in t and ("area", "with", "background") in t
    assert ("background", "of", "mountain") in t
    assert ("bridg", "of", "mountain") not in t


def test_compute_spice_py_mean_and_per_image():
    gts = {1: ["a man riding a horse"], 2: ["a cat on a mat"]}
    res = {1: ["a man riding a horse"], 2: ["a blue truck"]}
    mean, per = compute_spice_py(gts, res)
    assert per[0] == pytest.approx(1.0)
    assert per[1] == 0.0
    assert mean == pytest.approx(0.5)


def test_eval_driver_reports_spice_py():
    from sparse_caption_tpu.metrics.eval import evaluate_captions

    gts = {7: [{"caption": "A man riding a horse on a beach."}],
           9: [{"caption": "Two dogs play with a ball."}]}
    res = {7: [{"caption": "a man rides a horse"}],
           9: [{"caption": "two dogs playing with a ball"}]}
    scores, per_image = evaluate_captions(gts, res)
    assert isinstance(scores["SPICE_py"], float) and 0 < scores["SPICE_py"] <= 1
    assert scores["SPICE"] == "skipped (jar unavailable)"
    assert set(per_image) == {7, 9}
    assert all("SPICE_py" in v for v in per_image.values())
