#!/usr/bin/env python
"""Generate a tiny synthetic fixture dataset in the reference's on-disk layout.

Layout produced (same contract as the reference's tests/data fixtures +
scripts/dataset/make_bu_data.py outputs):

    <out>/dataset_coco_testing.json      Karpathy-format caption JSON
    <out>/train2014/COCO_train2014_*.jpg (placeholder image files)
    <out>/val2014/COCO_val2014_*.jpg
    <out>/bu/cocobu_att/<id>.npy         (R, att_feat_size) float32
    <out>/bu/cocobu_fc/<id>.npy          (att_feat_size,)   float32
    <out>/bu/cocobu_box_relative/<id>.npy (R, 4) in [0,1]

Unlike the reference fixtures (real COCO images + real BU features), these
are synthetic: random features, hand-written captions.
"""

from __future__ import annotations

import argparse
import json
import os

import numpy as np

CAPTIONS = [
    ["a man riding a horse on a beach", "a person rides a horse near the ocean",
     "man on a horse by the sea", "a rider and his horse on sand", "someone riding a brown horse"],
    ["a dog sitting on a couch", "a small dog rests on a sofa",
     "the dog is on the couch", "a puppy sitting on furniture", "a dog relaxing indoors"],
    ["two dogs playing with a ball", "a pair of dogs chase a ball",
     "dogs playing fetch in a yard", "two puppies play with a toy", "dogs running after a ball"],
    ["a group of people riding horses", "several riders on horseback",
     "people ride horses down a trail", "a group on horses outdoors", "riders on a dirt path"],
    ["a plate of food on a table", "a meal served on a white plate",
     "food arranged on a dinner table", "a plate with vegetables and meat", "dinner on a wooden table"],
    ["a man holding a surfboard", "a surfer carries his board",
     "man with a surfboard at the beach", "a person holding a white surfboard", "surfer walking on the sand"],
    ["a cat sleeping on a bed", "a kitten curled up on blankets",
     "the cat naps on a pillow", "a cat resting on white sheets", "a sleepy cat on a bed"],
    ["a bus driving down a street", "a city bus on the road",
     "the bus travels past buildings", "a large bus on a busy street", "a bus moving through traffic"],
]


def make_fixtures(output_dir: str, att_feat_size: int = 2048, max_regions: int = 5, seed: int = 8888) -> str:
    rng = np.random.default_rng(seed)
    os.makedirs(output_dir, exist_ok=True)
    splits = ["train", "train", "val", "val", "test", "test", "train", "train"]
    images = []
    for i, (split, caps) in enumerate(zip(splits, CAPTIONS)):
        coco_split = "train2014" if split == "train" else "val2014"
        img_id = 100000 + i
        filename = f"COCO_{coco_split}_{img_id:012d}.jpg"
        img_dir = os.path.join(output_dir, coco_split)
        os.makedirs(img_dir, exist_ok=True)
        with open(os.path.join(img_dir, filename), "wb") as f:
            f.write(b"\xff\xd8\xff\xd9")  # minimal JPEG marker pair (placeholder)
        images.append(
            dict(
                filepath=coco_split,
                filename=filename,
                imgid=i,
                split=split,
                sentences=[dict(tokens=c.split(), raw=c.capitalize() + ".", imgid=i, sentid=i * 10 + j)
                           for j, c in enumerate(caps)],
                cocoid=img_id,
            )
        )
        # bottom-up features
        n_regions = int(rng.integers(3, max_regions + 1))
        att = rng.standard_normal((n_regions, att_feat_size)).astype(np.float32)
        fc = rng.standard_normal((att_feat_size,)).astype(np.float32)
        xywh = rng.uniform(0.0, 1.0, size=(n_regions, 4)).astype(np.float32)
        for sub, arr in [("cocobu_att", att), ("cocobu_fc", fc), ("cocobu_box_relative", xywh)]:
            d = os.path.join(output_dir, "bu", sub)
            os.makedirs(d, exist_ok=True)
            np.save(os.path.join(d, f"{img_id}.npy"), arr)

    json_path = os.path.join(output_dir, "dataset_coco_testing.json")
    with open(json_path, "w") as f:
        json.dump(dict(images=images, dataset="coco"), f)
    return output_dir


if __name__ == "__main__":
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--output_dir", required=True)
    p.add_argument("--att_feat_size", type=int, default=2048)
    p.add_argument("--max_regions", type=int, default=5)
    p.add_argument("--seed", type=int, default=8888)
    args = p.parse_args()
    make_fixtures(args.output_dir, args.att_feat_size, args.max_regions, args.seed)
    print(f"fixtures written to {args.output_dir}")
