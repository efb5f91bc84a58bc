"""Offline caption evaluation driver.

Parity surface: reference ``coco_caption/eval.py:15-86`` +
``pycocoevalcap/eval.py:10-76`` — load a COCO-style annotation JSON and a
prediction JSON, PTB-tokenize both, run BLEU-1..4 / METEOR / ROUGE_L /
CIDEr / SPICE, return (overall scores, per-image scores, eval object).

METEOR and SPICE run only when their jars are available (they are git-lfs
blobs missing from this environment); the required core is the pure-Python
BLEU/ROUGE/CIDEr stack. ``METEOR_py`` (``metrics/meteor_py.py``) is a
jar-free Meteor 1.5 reimplementation always reported under its own key:
exact+stem stages by default (a documented lower bound on official
METEOR), all four stages when the jar's language data is supplied via
``SPARSE_CAPTION_METEOR_DATA``. ``SPICE_py`` (``metrics/spice_py.py``) is
the analogous jar-free SPICE path: the exact SPICE tuple-F1 machinery over
a rule-based scene-graph extraction (optional synonym matching via
``SPARSE_CAPTION_SPICE_SYNONYMS``), likewise reported only under its own
key.
"""

from __future__ import annotations

import json
from collections import defaultdict
from typing import Dict, List, Tuple

from sparse_caption_tpu.metrics import meteor as meteor_mod
from sparse_caption_tpu.metrics import meteor_py
from sparse_caption_tpu.metrics import spice as spice_mod
from sparse_caption_tpu.metrics import spice_py
from sparse_caption_tpu.metrics.bleu import compute_bleu
from sparse_caption_tpu.metrics.cider import compute_cider
from sparse_caption_tpu.metrics.ptb_tokenizer import ptb_tokenize
from sparse_caption_tpu.metrics.rouge import compute_rouge

ALL_METRICS = [
    "Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR", "METEOR_py",
    "ROUGE_L", "CIDEr", "SPICE", "SPICE_py",
]


def load_annotations(ann_file: str) -> Dict[int, List[dict]]:
    with open(ann_file) as f:
        ann = json.load(f)
    gts: Dict[int, List[dict]] = defaultdict(list)
    for a in ann["annotations"]:
        gts[a["image_id"]].append({"caption": a["caption"]})
    return gts


def evaluate_captions(gts_raw: Dict[int, List[dict]], res_raw: Dict[int, List[dict]]):
    """Tokenize + score. Returns (scores, per_image_scores)."""
    ids = sorted(res_raw.keys())
    gts_tok = ptb_tokenize({i: gts_raw[i] for i in ids})
    res_tok = ptb_tokenize({i: res_raw[i] for i in ids})

    scores: Dict[str, float] = {}
    per_image: Dict[int, Dict[str, float]] = {i: {} for i in ids}

    bleu_corpus, bleu_per = compute_bleu(gts_tok, res_tok)
    for k in range(4):
        scores[f"Bleu_{k + 1}"] = bleu_corpus[k]
        for idx, i in enumerate(ids):
            per_image[i][f"Bleu_{k + 1}"] = bleu_per[k][idx]

    rouge_mean, rouge_per = compute_rouge(gts_tok, res_tok)
    scores["ROUGE_L"] = rouge_mean
    for idx, i in enumerate(ids):
        per_image[i]["ROUGE_L"] = float(rouge_per[idx])

    cider_mean, cider_per = compute_cider(gts_tok, res_tok)
    scores["CIDEr"] = cider_mean
    for idx, i in enumerate(ids):
        per_image[i]["CIDEr"] = float(cider_per[idx])

    if meteor_mod.is_available():
        m_mean, m_per = meteor_mod.Meteor().compute_score(gts_tok, res_tok)
        scores["METEOR"] = m_mean
        for idx, i in enumerate(ids):
            per_image[i]["METEOR"] = float(m_per[idx])
    else:
        # explicit marker rather than a silently absent key, so downstream
        # score JSONs distinguish "not run" from "score of 0"
        scores["METEOR"] = "skipped (jar unavailable)"
    # pure-Python Meteor 1.5 engine (metrics/meteor_py.py) — always
    # reported under its own key: with the jar's language data supplied it
    # reproduces the four-stage scorer; exact+stem-only (the default here)
    # is a documented lower bound on official METEOR, so it never
    # impersonates the "METEOR" key
    mpy_mean, mpy_per = meteor_py.MeteorPy().compute_score(gts_tok, res_tok)
    scores["METEOR_py"] = mpy_mean
    for idx, i in enumerate(ids):
        per_image[i]["METEOR_py"] = float(mpy_per[idx])
    if spice_mod.is_available():
        s_mean, s_per = spice_mod.Spice().compute_score(gts_tok, res_tok)
        scores["SPICE"] = s_mean
        for idx, i in enumerate(ids):
            per_image[i]["SPICE"] = float(s_per[idx])
    else:
        scores["SPICE"] = "skipped (jar unavailable)"
    # jar-free SPICE analog (metrics/spice_py.py) — like METEOR_py, always
    # reported under its own key: exact SPICE F-score machinery over a
    # rule-based scene-graph extraction, never impersonating the jar's
    # dependency-parsed "SPICE" numbers
    spy_mean, spy_per = spice_py.compute_spice_py(gts_tok, res_tok)
    scores["SPICE_py"] = spy_mean
    for idx, i in enumerate(ids):
        per_image[i]["SPICE_py"] = float(spy_per[idx])
    return scores, per_image


def evaluate_caption_json(res_file: str, ann_file: str) -> Tuple[Dict, Dict, None]:
    """(scores, per-image detailed scores, eval_obj placeholder) — same
    triple shape as the reference evaluate_caption_json (coco_caption/
    eval.py:15-86)."""
    gts = load_annotations(ann_file)
    with open(res_file) as f:
        preds = json.load(f)
    res: Dict[int, List[dict]] = {}
    for p in preds:
        # one result per image (reference asserts uniqueness upstream)
        res[p["image_id"]] = [{"caption": p["caption"]}]
    missing = [i for i in res if i not in gts]
    if missing:
        raise ValueError(f"predictions contain image ids without annotations: {missing[:5]}")
    scores, per_image = evaluate_captions(gts, res)
    return scores, per_image, None
