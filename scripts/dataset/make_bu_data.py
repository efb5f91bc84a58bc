#!/usr/bin/env python
"""Bottom-up feature TSV -> per-image `.npy` conversion (capability parity:
reference ``scripts/dataset/make_bu_data.py:22-67``).

Reads the Anderson et al. bottom-up-attention TSVs (base64-encoded region
features + boxes) and writes ``<out>_att/<id>.npy`` (R x 2048),
``<out>_fc/<id>.npy`` (2048, mean-pooled), ``<out>_box/<id>.npy`` (R x 4
absolute xyxy).  The three images with known-corrupt rows upstream
(300104, 147295, 321486) are skipped on the corrupt file and recovered
from their duplicate rows, exactly like the reference.
"""

from __future__ import annotations

import argparse
import base64
import csv
import os
import sys

import numpy as np

csv.field_size_limit(sys.maxsize)

FIELDNAMES = ["image_id", "image_w", "image_h", "num_boxes", "boxes", "features"]
KNOWN_BAD = {300104, 147295, 321486}

DEFAULT_INFILES = [
    "trainval/karpathy_test_resnet101_faster_rcnn_genome.tsv",
    "trainval/karpathy_val_resnet101_faster_rcnn_genome.tsv",
    "trainval/karpathy_train_resnet101_faster_rcnn_genome.tsv.0",
    "trainval/karpathy_train_resnet101_faster_rcnn_genome.tsv.1",
    "test2014/test2014_resnet101_faster_rcnn_genome.tsv.0",
    "test2014/test2014_resnet101_faster_rcnn_genome.tsv.1",
    "test2014/test2014_resnet101_faster_rcnn_genome.tsv.2",
]


def convert(downloaded_feats: str, output_dir: str, infiles=None) -> int:
    infiles = infiles or [f for f in DEFAULT_INFILES if os.path.isfile(os.path.join(downloaded_feats, f))]
    for suffix in ("_att", "_fc", "_box"):
        os.makedirs(output_dir + suffix, exist_ok=True)
    n = 0
    for infile in infiles:
        with open(os.path.join(downloaded_feats, infile)) as f:
            for item in csv.DictReader(f, delimiter="\t", fieldnames=FIELDNAMES):
                image_id = int(item["image_id"])
                num_boxes = int(item["num_boxes"])
                if len(item["boxes"]) % 4 != 0 or len(item["features"]) % 4 != 0:
                    assert image_id in KNOWN_BAD, f"unexpected corrupt row for image {image_id}"
                    continue
                feats = np.frombuffer(base64.decodebytes(item["features"].encode()), np.float32)
                boxes = np.frombuffer(base64.decodebytes(item["boxes"].encode()), np.float32)
                feats = feats.reshape(num_boxes, -1)
                boxes = boxes.reshape(num_boxes, -1)
                np.save(os.path.join(output_dir + "_att", str(image_id)), feats)
                np.save(os.path.join(output_dir + "_fc", str(image_id)), feats.mean(0))
                np.save(os.path.join(output_dir + "_box", str(image_id)), boxes)
                n += 1
    return n


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--downloaded_feats", required=True)
    p.add_argument("--output_dir", required=True, help="prefix; writes <out>_att/_fc/_box")
    args = p.parse_args()
    n = convert(args.downloaded_feats, args.output_dir)
    print(f"converted {n} images")
