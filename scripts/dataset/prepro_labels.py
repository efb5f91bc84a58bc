#!/usr/bin/env python
"""Encode Karpathy-JSON captions into padded label arrays + vocab JSON.

Capability parity with the reference's legacy exporter
(``scripts/dataset/prepro_labels.py:41-183``), which packs captions into
the h5/json pair consumed by the original data_loader.lua lineage.  The
framework's own pipeline never reads these files (data/karpathy.py builds
per-caption records directly), but the exporter is kept so artifacts from
the old toolchain can be reproduced bit-compatibly:

* vocab: words with count > ``--word_count_threshold`` kept (insertion
  order, matching the reference's dict iteration), ``UNK`` appended only
  when at least one word fell below the threshold;
* ``labels``: (M, max_length) uint32, 1-indexed word ids, zero padded,
  captions clipped at ``--max_length``;
* ``label_start_ix`` / ``label_end_ix``: (N,) uint32 1-indexed INCLUSIVE
  (Lua-style) pointers into the caption rows of each image;
* ``label_length``: (M,) uint32 pre-clip-aware lengths
  (``min(max_length, len(tokens))``);
* JSON side: 1-indexed ``ix_to_word`` plus per-image split/file_path/id.

Output container is ``.npz`` by default (TPU-native stack has no h5
dependency in the hot path); ``--hdf5`` writes the reference's exact
``<output_h5>_label.h5`` layout when h5py is available.

    python scripts/dataset/prepro_labels.py \
        --input_json dataset_coco.json --output_json data.json --output_h5 data
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent.parent))


def build_vocab(imgs, count_thr):
    """Thresholded word vocab over sentence tokens (reference
    prepro_labels.py:41-91): keep count > thr, map the rest to UNK."""
    counts = {}
    for img in imgs:
        for sent in img["sentences"]:
            for w in sent["tokens"]:
                counts[w] = counts.get(w, 0) + 1
    total_words = sum(counts.values())
    vocab = [w for w, n in counts.items() if n > count_thr]
    bad_count = sum(n for n in counts.values() if n <= count_thr)
    print(f"total words: {total_words}")
    print(f"vocab size (count > {count_thr}): {len(vocab)}")
    print(f"UNK replacements: {bad_count}/{total_words} = "
          f"{bad_count * 100.0 / max(total_words, 1):.2f}%")
    if bad_count > 0:
        vocab.append("UNK")
    final_captions = []
    for img in imgs:
        final_captions.append(
            [[w if counts[w] > count_thr else "UNK" for w in sent["tokens"]]
             for sent in img["sentences"]])
    return vocab, final_captions


def encode_captions(final_captions, max_length, wtoi):
    """One (M, max_length) array + Lua-style inclusive per-image pointers
    (reference prepro_labels.py:94-136)."""
    n_imgs = len(final_captions)
    m = sum(len(caps) for caps in final_captions)
    labels = np.zeros((m, max_length), dtype=np.uint32)
    label_start_ix = np.zeros(n_imgs, dtype=np.uint32)
    label_end_ix = np.zeros(n_imgs, dtype=np.uint32)
    label_length = np.zeros(m, dtype=np.uint32)
    row, counter = 0, 1
    for i, caps in enumerate(final_captions):
        if not caps:
            raise ValueError(f"image index {i} has no captions")
        for s in caps:
            if not s:
                raise ValueError(f"image index {i} has an empty caption")
            label_length[row] = min(max_length, len(s))
            for k, w in enumerate(s[:max_length]):
                labels[row, k] = wtoi[w]
            row += 1
        label_start_ix[i] = counter
        label_end_ix[i] = counter + len(caps) - 1
        counter += len(caps)
    return labels, label_start_ix, label_end_ix, label_length


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--input_json", required=True, help="Karpathy dataset JSON")
    p.add_argument("--output_json", default="data.json")
    p.add_argument("--output_h5", default="data",
                   help="label-array path stem (`_label.npz` / `_label.h5` appended)")
    p.add_argument("--images_root", default="",
                   help="if set, read each image's width/height into the JSON (needs PIL)")
    p.add_argument("--max_length", type=int, default=16)
    p.add_argument("--word_count_threshold", type=int, default=5)
    p.add_argument("--hdf5", action="store_true",
                   help="write the reference's `<stem>_label.h5` layout (needs h5py)")
    args = p.parse_args(argv)

    with open(args.input_json) as f:
        imgs = json.load(f)["images"]

    vocab, final_captions = build_vocab(imgs, args.word_count_threshold)
    itow = {i + 1: w for i, w in enumerate(vocab)}
    wtoi = {w: i + 1 for i, w in enumerate(vocab)}
    labels, start_ix, end_ix, lengths = encode_captions(
        final_captions, args.max_length, wtoi)
    print(f"encoded captions to array of size {labels.shape}")

    arrays = {"labels": labels, "label_start_ix": start_ix,
              "label_end_ix": end_ix, "label_length": lengths}
    if args.hdf5:
        import h5py

        out_h5 = args.output_h5 + "_label.h5"
        with h5py.File(out_h5, "w") as f:
            for name, arr in arrays.items():
                f.create_dataset(name, dtype="uint32", data=arr)
    else:
        out_h5 = args.output_h5 + "_label.npz"
        np.savez(out_h5, **arrays)
    print(f"wrote {out_h5}")

    out = {"ix_to_word": itow, "images": []}
    for img in imgs:
        jimg = {"split": img["split"]}
        if "filename" in img:
            jimg["file_path"] = os.path.join(img.get("filepath", ""), img["filename"])
        if "cocoid" in img:
            jimg["id"] = img["cocoid"]
        if args.images_root:
            from PIL import Image

            with Image.open(os.path.join(args.images_root, img.get("filepath", ""),
                                         img["filename"])) as im:
                jimg["width"], jimg["height"] = im.size
        out["images"].append(jimg)
    with open(args.output_json, "w") as f:
        json.dump(out, f)
    print(f"wrote {args.output_json}")


if __name__ == "__main__":
    main()
