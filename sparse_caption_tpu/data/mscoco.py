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
