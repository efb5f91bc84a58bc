#!/usr/bin/env python
"""Caption comparison across runs (capability parity: reference
``scripts/collect_captions_plus.py`` — side-by-side predicted captions per
image from multiple run dirs, for qualitative comparison).

Writes a CSV (image_id, image_path, gt captions, one column per run) and a
markdown contact sheet.

    python scripts/collect_captions_plus.py \
        --runs run1:path/to/run1 run2:path/to/run2 \
        --split test --output captions_compare
"""

from __future__ import annotations

import argparse
import csv
import glob
import json
import os
import sys
from pathlib import Path
from typing import Dict

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))


def latest_caption_json(run_dir: str, split: str) -> str:
    cands = sorted(glob.glob(os.path.join(run_dir, f"{split}_beam_*", "caption_*.json")))
    if not cands:
        raise FileNotFoundError(f"no caption JSONs under {run_dir}/{split}_beam_*/")
    return cands[-1]


def load_predictions(path: str) -> Dict[int, str]:
    with open(path) as f:
        return {p["image_id"]: p["caption"] for p in json.load(f)}


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--runs", nargs="+", required=True, help="name:run_dir pairs")
    p.add_argument("--split", default="test")
    p.add_argument("--annotation_json", default=None,
                   help="COCO-style GT annotations (defaults to the first run's annotations/)")
    p.add_argument("--output", default="captions_compare")
    args = p.parse_args()

    runs = {}
    for spec in args.runs:
        name, _, run_dir = spec.partition(":")
        assert run_dir, f"expected name:dir, got `{spec}`"
        runs[name] = load_predictions(latest_caption_json(run_dir, args.split))

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
    headers = ["image_id", "gt"] + list(runs)
    with open(args.output + ".csv", "w", newline="") as f:
        w = csv.writer(f)
        w.writerow(headers)
        for i in image_ids:
            w.writerow([i, " | ".join(gts.get(i, [])[:2])] + [runs[n].get(i, "") for n in runs])

    with open(args.output + ".md", "w") as f:
        f.write(f"# Caption comparison ({args.split})\n\n")
        for i in image_ids:
            f.write(f"## image {i}\n\n")
            for g in gts.get(i, [])[:3]:
                f.write(f"> GT: {g}\n")
            f.write("\n")
            for n in runs:
                f.write(f"- **{n}**: {runs[n].get(i, '(missing)')}\n")
            f.write("\n")
    print(f"wrote {args.output}.csv and {args.output}.md ({len(image_ids)} images, {len(runs)} runs)")


if __name__ == "__main__":
    main()
