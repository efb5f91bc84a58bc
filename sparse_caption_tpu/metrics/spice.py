"""SPICE 1.0 via batch Java subprocess (optional).

Same contract as the reference (``coco_caption/pycocoevalcap/spice/
spice.py:32-87``): dump {image_id, test, refs} JSON to a temp file, run
``java -jar spice-1.0.jar input.json -cache <dir> -out out.json -subset
-silent``, read per-image F-scores.

Availability-gated like METEOR (jar path via ``SPARSE_CAPTION_SPICE_JAR``);
the eval driver skips SPICE when absent.
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import tempfile
from typing import Dict

import numpy as np

JAR_ENV = "SPARSE_CAPTION_SPICE_JAR"


def jar_path() -> str:
    return os.environ.get(JAR_ENV, "")


def is_available() -> bool:
    return bool(jar_path()) and os.path.isfile(jar_path()) and shutil.which("java") is not None


class Spice:
    def __init__(self):
        if not is_available():
            raise RuntimeError(f"SPICE jar not available (set ${JAR_ENV})")

    def compute_score(self, gts: Dict, res: Dict):
        ids = sorted(gts.keys())
        input_data = [
            {"image_id": str(i), "test": res[i][0], "refs": list(gts[i])} for i in ids
        ]
        jar_dir = os.path.dirname(os.path.abspath(jar_path()))
        with tempfile.TemporaryDirectory() as tmp:
            in_file = os.path.join(tmp, "input.json")
            out_file = os.path.join(tmp, "output.json")
            cache_dir = os.path.join(jar_dir, "cache")
            os.makedirs(cache_dir, exist_ok=True)
            with open(in_file, "w") as f:
                json.dump(input_data, f)
            subprocess.check_call(
                ["java", "-jar", "-Xmx8G", jar_path(), in_file, "-cache", cache_dir,
                 "-out", out_file, "-subset", "-silent"],
                cwd=jar_dir,
            )
            with open(out_file) as f:
                results = json.load(f)
        by_id = {item["image_id"]: item["scores"]["All"]["f"] for item in results}
        scores = [float(np.nan_to_num(by_id[str(i)])) for i in ids]
        return float(np.mean(scores)), scores
