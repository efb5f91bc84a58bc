"""Karpathy-split caption dataset ingestion.

Behavioral parity with the reference ``sparse_caption/data/karpathy.py:24-239``:

* one record per (image, caption) in train; ``get_split(generation_mode=True)``
  dedups to one record per image (reference ``karpathy.py:55-80``)
* ``restval`` folds into ``train`` (reference ``karpathy.py:108``)
* per record: img_path, img_id, caption (raw or pre-tokenized per
  ``retokenize_captions``), all_captions, and always-pre-tokenized ``all_gts``
  for SCST (reference ``karpathy.py:110-113``)
* dumps ``<log_dir>/tokenizer/train_captions.txt`` for tokenizer training
  and COCO-style annotation/prediction JSONs for the metric stack
"""

from __future__ import annotations

import json
import logging
import os
import random
from abc import ABC, abstractmethod
from collections import defaultdict
from typing import Iterable, List, Tuple

logger = logging.getLogger(__name__)


class KarpathyDataset(ABC):
    ANNOTATION_FILE = RAW_JSON_FILE = ""

    def __init__(self, config):
        self.config = config
        self.dataset_dir = config.dataset_dir
        self.data = None

    @property
    def train_size(self) -> int:
        return len(self.data["train"])

    @staticmethod
    @abstractmethod
    def image_filename_to_id(filename: str) -> int:
        ...

    @abstractmethod
    def prepare_data(self) -> None:
        ...

    # ------------------------------------------------------------- splits
    def get_split(self, split: str, generation_mode: bool = False) -> List[dict]:
        if split not in ("train", "val", "test"):
            raise ValueError(f"invalid split `{split}`; expected train/val/test")
        data = self.data[split]
        if generation_mode:
            # one record per image (images can have >5 captions, so no striding)
            dedup = {}
            for d in data:
                dedup[d["img_id"]] = d
            data = list(dedup.values())
        return list(data)

    # ---------------------------------------------------------- ingestion
    # Karpathy split archive, fetched when the raw JSON is absent
    # (reference karpathy.py:82-93). Override via --dataset_archive_url to a
    # mirror or a local file:// path on air-gapped machines.
    CAPTION_DATASETS_URL = "https://cs.stanford.edu/people/karpathy/deepimagesent/caption_datasets.zip"

    def process_karpathy_json(self) -> None:
        raw_json = os.path.join(self.dataset_dir, self.RAW_JSON_FILE)
        if not os.path.isfile(raw_json):
            from sparse_caption_tpu.utils.file_io import get_file

            origin = self.config.get("dataset_archive_url") or self.CAPTION_DATASETS_URL
            try:
                get_file("caption_datasets.zip", origin, self.dataset_dir, extract=True)
            except Exception as e:  # zero-egress hosts land here
                raise FileNotFoundError(
                    f"caption JSON not found: {raw_json}, and fetching `{origin}` failed "
                    f"({e}). Download the Karpathy splits (caption_datasets.zip) into the "
                    "dataset dir, pass --dataset_archive_url file:///path/to/archive.zip, "
                    "or generate fixtures with scripts/dataset/make_test_fixtures.py"
                ) from e
        if not os.path.isfile(raw_json):
            raise FileNotFoundError(f"archive fetched but `{self.RAW_JSON_FILE}` still missing in {self.dataset_dir}")
        with open(raw_json) as f:
            raw = json.load(f)

        retokenize = bool(self.config.get("retokenize_captions", False))
        self.data = defaultdict(list)
        all_ids, all_names = set(), set()
        for d in raw["images"]:
            img_id = self.image_filename_to_id(d["filename"])
            all_ids.add(img_id)
            all_names.add(d["filename"])
            img_path = os.path.join(self.dataset_dir, d.get("filepath", "images"), d["filename"])
            split = "train" if d["split"] == "restval" else d["split"]
            all_gts = [" ".join(s["tokens"]) for s in d["sentences"]]
            all_captions = [s["raw"] if retokenize else " ".join(s["tokens"]) for s in d["sentences"]]
            for cap in all_captions:
                self.data[split].append(
                    dict(
                        split=split,
                        img_path=img_path,
                        img_id=img_id,
                        caption=cap,
                        all_captions=all_captions,
                        all_gts=all_gts,
                    )
                )
        if len(all_ids) != len(all_names):
            raise ValueError("image IDs are not unique across filenames")

    def random_image_check(self, num_samples: int = 5) -> None:
        sample = random.sample(self.data["train"], min(num_samples, len(self.data["train"])))
        if not all(os.path.isfile(d["img_path"]) for d in sample):
            raise FileNotFoundError("one or more training images are missing")

    # ------------------------------------------------------------ outputs
    def train_captions_txt_dump(self) -> None:
        tokenizer_dir = os.path.join(self.config.log_dir, "tokenizer")
        train_txt = os.path.join(tokenizer_dir, "train_captions.txt")
        self.config.tokenizer_train_files = train_txt
        # gate on the FILE, not the dir, and write atomically (tmp + rename):
        # a crash mid-write used to leave the dir with a truncated txt that
        # every later run trusted ("existing dir wins") — silently training
        # the tokenizer on truncated caption data
        if os.path.isfile(train_txt):
            return  # existing artifact wins (resume / start_from)
        os.makedirs(tokenizer_dir, exist_ok=True)
        tmp_path = train_txt + ".tmp"
        with open(tmp_path, "w") as f:
            # one caption per LINE: raw COCO captions (--retokenize mode)
            # can contain embedded newlines, which would split a caption
            # into two bogus training sentences for the tokenizer trainers
            f.write("\n".join(" ".join(d["caption"].split()) for d in self.data["train"]))
        os.replace(tmp_path, train_txt)

    _ANNOT_SPLITS = ("train", "val", "test")

    def annotation_file_path(self) -> str:
        """COCO-style GT annotation JSON used by the metric stack.

        Regenerates a cached file that predates train-GT inclusion (its
        ``__splits__`` marker is absent/short) — otherwise an old run dir
        evaluated with ``--split train`` would score against empty
        reference lists and crash deep in the BLEU scorer."""
        path = os.path.join(self.config.log_dir, "annotations", self.ANNOTATION_FILE)
        if os.path.isfile(path):
            try:
                with open(path) as f:
                    marker = json.load(f).get("__splits__", [])
            except (json.JSONDecodeError, OSError):
                marker = []
            if list(marker) == list(self._ANNOT_SPLITS):
                return path
        self.coco_annot_json_dump(path)
        return path

    def coco_annot_json_dump(self, json_fpath: str) -> None:
        # train GT included so `eval_model --split train` (memorization eval,
        # beyond the reference) can score; the metric stack subsets the GT to
        # prediction ids (metrics/eval.py:53), so val/test scores are
        # unaffected — mirroring the official captions_val2014.json, which
        # also carries non-eval (restval train) images
        annot = dict(images=[], annotations=[], info="", type="captions", licenses="",
                     __splits__=list(self._ANNOT_SPLITS))
        ann_id = 0
        for split in self._ANNOT_SPLITS:
            for d in self.get_split(split, generation_mode=True):
                annot["images"].append({"id": d["img_id"]})
                for cap in d["all_captions"]:
                    annot["annotations"].append({"caption": cap, "id": ann_id, "image_id": d["img_id"]})
                    ann_id += 1
        os.makedirs(os.path.dirname(json_fpath), exist_ok=True)
        with open(json_fpath, "w") as f:
            json.dump(annot, f)

    def coco_caption_json_dump(self, img_fname_caption_pair: Iterable[Tuple[str, str]], output_fpath: str) -> None:
        coco_json = []
        for img_fname, caption in img_fname_caption_pair:
            image_id = self.image_filename_to_id(os.path.basename(img_fname))
            coco_json.append({"image_id": image_id, "caption": str(caption)})
        os.makedirs(os.path.dirname(output_fpath) or ".", exist_ok=True)
        with open(output_fpath, "w") as f:
            json.dump(coco_json, f)

    @staticmethod
    def add_argparse_args(parser) -> None:
        parser.add_argument("--dataset_dir", type=str, default=None, help="dataset directory")
        parser.add_argument("--retokenize_captions", action="store_true",
                            help="use raw captions instead of Karpathy-tokenized ones")
