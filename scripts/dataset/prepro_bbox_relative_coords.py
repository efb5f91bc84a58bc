#!/usr/bin/env python
"""Absolute box coords -> relative [0, 1] coords (capability parity:
reference ``scripts/dataset/prepro_bbox_relative_coords.py:60-93``): divide
each xyxy box by (W, H, W, H) of its image, clip to [0, 1].

Image sizes come from the images themselves (like the reference) or, when
``--sizes_json`` is given, from a {image_id: [width, height]} JSON — useful
when images are not stored locally.
"""

from __future__ import annotations

import argparse
import glob
import json
import os

import numpy as np


def image_size(path: str):
    # minimal header readers to avoid a PIL dependency for JPEG/PNG
    with open(path, "rb") as f:
        head = f.read(64 * 1024)
    if head[:8] == b"\x89PNG\r\n\x1a\n":
        w = int.from_bytes(head[16:20], "big")
        h = int.from_bytes(head[20:24], "big")
        return w, h
    # JPEG: scan for SOFn
    i = 2
    while i + 9 < len(head):
        if head[i] != 0xFF:
            i += 1
            continue
        marker = head[i + 1]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            h = int.from_bytes(head[i + 5 : i + 7], "big")
            w = int.from_bytes(head[i + 7 : i + 9], "big")
            return w, h
        seg_len = int.from_bytes(head[i + 2 : i + 4], "big")
        i += 2 + seg_len
    raise ValueError(f"cannot determine image size of {path}")


def main():
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_box_dir", required=True)
    p.add_argument("--input_json", required=True, help="Karpathy dataset JSON (for id -> path)")
    p.add_argument("--image_root", required=True)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--sizes_json", default=None)
    args = p.parse_args()

    with open(args.input_json) as f:
        coco = json.load(f)
    id_to_path = {str(img["cocoid"]): os.path.join(args.image_root, img.get("filepath", ""), img["filename"])
                  for img in coco["images"]}
    sizes = json.load(open(args.sizes_json)) if args.sizes_json else None
    os.makedirs(args.output_dir, exist_ok=True)

    n = 0
    for box_file in sorted(glob.glob(os.path.join(args.input_box_dir, "*.npy"))):
        img_id = os.path.basename(box_file).split(".")[0]
        if sizes is not None:
            w, h = sizes[img_id]
        else:
            path = id_to_path.get(
                img_id, os.path.join(args.image_root, "test2014", f"COCO_test2014_{int(img_id):012d}.jpg")
            )
            w, h = image_size(path)
        box = np.load(box_file)
        rel = np.clip(box / np.array([w, h, w, h], np.float32), 0.0, 1.0)
        np.save(os.path.join(args.output_dir, f"{img_id}.npy"), rel.astype(np.float32))
        n += 1
    print(f"wrote {n} relative-box files to {args.output_dir}")


if __name__ == "__main__":
    main()
