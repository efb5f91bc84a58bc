#!/usr/bin/env python
"""Build the CIDEr-D document-frequency pickle from the Karpathy JSON
(capability parity: reference ``scripts/dataset/prepro_ngrams.py:72-133``;
output contract identical — {'document_frequency': defaultdict, 'ref_len':
raw image count} readable by both this framework and the reference).

    python scripts/dataset/prepro_ngrams.py \
        --input_json dataset_coco.json --split train \
        --output_pkl data/coco-train-words
"""

from __future__ import annotations

import argparse
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))

from sparse_caption_tpu.metrics.cider import build_df_pickle


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_json", required=True, help="Karpathy dataset JSON")
    p.add_argument("--split", default="train", choices=["train", "val", "test", "all"])
    p.add_argument("--output_pkl", required=True, help="output path (`.p` appended)")
    args = p.parse_args()

    with open(args.input_json) as f:
        data = json.load(f)
    refs = []
    for img in data["images"]:
        split = "train" if img["split"] == "restval" else img["split"]
        if args.split != "all" and split != args.split:
            continue
        refs.append([" ".join(s["tokens"]) for s in img["sentences"]])
    out = args.output_pkl if args.output_pkl.endswith(".p") else args.output_pkl + ".p"
    build_df_pickle(refs, out)
    print(f"df pickle over {len(refs)} images -> {out}")


if __name__ == "__main__":
    main()
