#!/usr/bin/env python
"""Caption comparison across runs (capability parity: reference
``scripts/collect_captions_plus.py`` — side-by-side captions per image from
multiple run dirs with per-image metric scores, sorted by the score delta
vs a baseline run, plus IMAGE CONTACT SHEETS).

The reference version is an interactive viewer (keypress categorization);
this one batch-exports instead: the top/bottom ``--sheets`` images by
(model - baseline) score delta become ``model_correct_*`` /
``baseline_correct_*`` composites (image + wrapped captions + scores),
mirroring the reference's categories without a display.

    python scripts/collect_captions_plus.py \
        --runs baseline:runs/dense ours:runs/pruned \
        --split test --image_dir data/val2014 --sheets 8 --output captions_compare
"""

from __future__ import annotations

import argparse
import csv
import glob
import json
import os
import sys
import textwrap
from pathlib import Path
from typing import Dict, Optional

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def latest_eval_files(run_dir: str, split: str):
    """(caption_json, detailed_score_json or None) of the latest eval step."""
    cands = sorted(glob.glob(os.path.join(run_dir, f"{split}_beam_*", "caption_*.json")))
    cands = [c for c in cands if not c.endswith("_val2014.json")]
    if not cands:
        raise FileNotFoundError(f"no caption JSONs under {run_dir}/{split}_beam_*/")
    cap = cands[-1]
    detailed = cap.replace("caption_", "score_").replace(".json", "_detailed.json")
    return cap, (detailed if os.path.isfile(detailed) else None)


def load_run(run_dir: str, split: str):
    cap_path, det_path = latest_eval_files(run_dir, split)
    with open(cap_path) as f:
        captions = {p["image_id"]: p["caption"] for p in json.load(f)}
    scores: Dict[int, Dict[str, float]] = {}
    if det_path:
        with open(det_path) as f:
            scores = {int(k): v for k, v in json.load(f).items()}
    return captions, scores


def find_image(image_dir: Optional[str], image_id: int) -> Optional[str]:
    if not image_dir:
        return None
    hits = glob.glob(os.path.join(image_dir, f"*{image_id:012d}.jpg")) or glob.glob(
        os.path.join(image_dir, f"*{image_id}*"))
    return hits[0] if hits else None


def make_sheet(image_path: Optional[str], lines, out_path: str, img_size: int = 384):
    """One contact sheet: image (or placeholder) + wrapped caption lines."""
    from PIL import Image, ImageDraw, ImageFont

    font = ImageFont.load_default(16)
    wrapped = []
    for text in lines:
        wrapped += textwrap.wrap(text, width=64) + [""]
    text_h = 22 * len(wrapped) + 20
    bg = Image.new("RGB", (max(640, img_size + 40), img_size + 40 + text_h), "white")
    if image_path and os.path.isfile(image_path):
        try:
            img = Image.open(image_path).convert("RGB")
            img.thumbnail((img_size, img_size))
            bg.paste(img, (20, 20))
        except Exception:
            pass
    draw = ImageDraw.Draw(bg)
    y = img_size + 40
    for line in wrapped:
        draw.text((20, y), line, fill="black", font=font)
        y += 22
    bg.save(out_path)


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--runs", nargs="+", required=True,
                   help="name:run_dir pairs; the FIRST is the baseline for deltas")
    p.add_argument("--split", default="test")
    p.add_argument("--sort_metric", default="CIDEr")
    p.add_argument("--image_dir", default=None, help="directory with the COCO images")
    p.add_argument("--sheets", type=int, default=0,
                   help="write this many contact sheets per category (PNG)")
    p.add_argument("--annotation_json", default=None,
                   help="COCO-style GT annotations (defaults to the first run's annotations/)")
    p.add_argument("--output", default="captions_compare")
    args = p.parse_args()

    runs, run_scores = {}, {}
    for spec in args.runs:
        name, _, run_dir = spec.partition(":")
        assert run_dir, f"expected name:dir, got `{spec}`"
        runs[name], run_scores[name] = load_run(run_dir, args.split)
    names = list(runs)
    baseline = names[0]

    gts: Dict[int, list] = {}
    ann_path = args.annotation_json
    if ann_path is None:
        first = args.runs[0].partition(":")[2]
        cands = glob.glob(os.path.join(first, "annotations", "*.json"))
        ann_path = cands[0] if cands else None
    if ann_path and os.path.isfile(ann_path):
        with open(ann_path) as f:
            ann = json.load(f)
        for a in ann["annotations"]:
            gts.setdefault(a["image_id"], []).append(a["caption"])

    image_ids = sorted(set.union(*(set(r) for r in runs.values())))

    def delta(i) -> float:
        """Mean model score minus baseline score (reference sort_data use_diff)."""
        others = [run_scores[n].get(i, {}).get(args.sort_metric) for n in names[1:]]
        others = [x for x in others if x is not None]
        base = run_scores[baseline].get(i, {}).get(args.sort_metric)
        if not others or base is None:
            return 0.0
        return sum(others) / len(others) - base

    image_ids.sort(key=delta, reverse=True)

    def fmt(name, i) -> str:
        sc = run_scores[name].get(i, {}).get(args.sort_metric)
        tag = f" ({args.sort_metric}={sc:.2f})" if sc is not None else ""
        return f"{name}{tag}: {runs[name].get(i, '(missing)')}"

    headers = ["image_id", f"delta_{args.sort_metric}", "gt"] + names
    with open(args.output + ".csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(headers)
        for i in image_ids:
            w.writerow([i, f"{delta(i):.4f}", " | ".join(gts.get(i, [])[:2])]
                       + [runs[n].get(i, "") for n in names])

    with open(args.output + ".md", "w") as f:
        f.write(f"# Caption comparison ({args.split}, sorted by {args.sort_metric} delta vs {baseline})\n\n")
        for i in image_ids:
            f.write(f"## image {i} (delta {delta(i):+.3f})\n\n")
            for g in gts.get(i, [])[:3]:
                f.write(f"> GT: {g}\n")
            f.write("\n")
            for n in names:
                f.write(f"- **{fmt(n, i)}**\n")
            f.write("\n")

    n_sheets = 0
    if args.sheets > 0:
        sheet_dir = args.output + "_sheets"
        os.makedirs(sheet_dir, exist_ok=True)
        picks = [("model_correct", image_ids[: args.sheets]),
                 ("baseline_correct", image_ids[-args.sheets:][::-1])]
        for category, ids in picks:
            for i in ids:
                lines = [f"image {i}  [{category}]  delta {delta(i):+.3f}"]
                lines += [f"GT: {g}" for g in gts.get(i, [])[:2]]
                lines += [fmt(n, i) for n in names]
                out = os.path.join(sheet_dir, f"{category}_{delta(i):+.3f}_{i}.png".replace("+", "p"))
                make_sheet(find_image(args.image_dir, i), lines, out)
                n_sheets += 1
        print(f"wrote {n_sheets} contact sheets to {sheet_dir}")
    print(f"wrote {args.output}.csv and {args.output}.md ({len(image_ids)} images, {len(runs)} runs)")


if __name__ == "__main__":
    main()
