"""MS-COCO datasets (parity: reference ``sparse_caption/data/mscoco.py:18-103``)."""

from __future__ import annotations

import logging
import os

from sparse_caption_tpu.data import register_dataset
from sparse_caption_tpu.data.karpathy import KarpathyDataset

logger = logging.getLogger(__name__)


@register_dataset("mscoco")
class MscocoDataset(KarpathyDataset):
    ANNOTATION_FILE = "captions_val2014.json"
    RAW_JSON_FILE = "dataset_coco.json"

    def prepare_data(self) -> None:
        self.process_karpathy_json()
        if self.config.get("mscoco_online_test", False):
            # online-test remap: train = train+val, val = karpathy test,
            # test = test2014 images with empty GT (reference mscoco.py:36-49)
            self.data = {
                "train": self.data["train"] + self.data["val"],
                "val": self.data["test"],
                "test": self.get_test2014_split(),
            }
        else:
            self.data = {s: self.data[s] for s in ("train", "val", "test")}
        self.train_captions_txt_dump()

    def get_test2014_split(self):
        test_dir = os.path.join(self.dataset_dir, "test2014")
        img_paths = sorted(
            os.path.join(test_dir, f) for f in os.listdir(test_dir) if f.endswith(".jpg")
        )
        return [
            dict(split="test", img_path=p, img_id=self.image_filename_to_id(os.path.basename(p)),
                 caption="", all_captions=[""], all_gts=[""])
            for p in img_paths
        ]

    # official val2014 annotation archive (reference mscoco.py:50-59 fetches
    # it when captions_val2014.json is absent; --dataset_archive_url-style
    # override via --annotations_archive_url, incl. file:// for air-gapped)
    ANNOTATIONS_URL = "https://images.cocodataset.org/annotations/annotations_trainval2014.zip"

    def annotation_file_path(self) -> str:
        """Prefer the OFFICIAL captions_val2014.json (the reference's metric
        GT, tests/test_coco_caption.py golden anchor) when present in the
        dataset dir or fetchable; otherwise fall back to the synthesized
        COCO-style GT built from the Karpathy split captions."""
        official = os.path.join(self.dataset_dir, "annotations", self.ANNOTATION_FILE)
        if os.path.isfile(official):
            return official
        if self.config.get("fetch_official_annotations", False):
            from sparse_caption_tpu.utils.file_io import get_file

            origin = self.config.get("annotations_archive_url") or self.ANNOTATIONS_URL
            get_file("annotations_trainval2014.zip", origin, self.dataset_dir, extract=True)
            if os.path.isfile(official):
                return official
            logger.warning("annotations archive fetched but `%s` missing; using synthesized GT", official)
        return super().annotation_file_path()

    @staticmethod
    def image_filename_to_id(filename: str) -> int:
        # "COCO_val2014_000000522418.jpg" -> 522418
        if not filename.endswith(".jpg"):
            raise ValueError(f"expected .jpg MS-COCO image, got `{filename}`")
        return int(filename[: -len(".jpg")].split("_")[-1])

    @staticmethod
    def add_argparse_args(parser) -> None:
        KarpathyDataset.add_argparse_args(parser)
        parser.add_argument("--mscoco_online_test", action="store_true",
                            help="train on train+val, validate on karpathy test, test on test2014")


@register_dataset("mscoco_testing")
class MscocoTesting(MscocoDataset):
    """Tiny fixture variant (parity: reference mscoco.py:101-103)."""

    RAW_JSON_FILE = "dataset_coco_testing.json"
