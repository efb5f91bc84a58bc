"""Per-image bottom-up feature loading with an in-RAM cache.

Capability parity with the reference collate feature path
(``sparse_caption/data/collate.py:92-137, 193-262``): per image id, `.npy`
files under ``cocobu_att`` (R x 2048), ``cocobu_fc`` (2048,) and
``cocobu_box_relative`` (R x 4); cache inserts gated on free RAM
(reference ``collate.py:92-105`` + ``utils/misc.py:79-95``).

TPU-first delta: the loader is a single-process thread pool (numpy `.load`
releases the GIL) rather than forked DataLoader workers, so the cache is a
plain dict — no multiprocessing Manager proxy needed.
"""

from __future__ import annotations

import logging
import os
import threading
from typing import Callable, Dict, Optional

import numpy as np

logger = logging.getLogger(__name__)


def get_memory_info() -> Dict[str, int]:
    """Read /proc/meminfo (kB). Parity: reference utils/misc.py:79-95."""
    info = {}
    try:
        with open("/proc/meminfo") as f:
            for line in f:
                parts = line.split()
                if parts[0] in ("MemTotal:", "MemFree:", "MemAvailable:"):
                    info[parts[0][:-1]] = int(parts[1])
    except OSError:
        return {"total": 1, "free": 1}
    return {"total": info.get("MemTotal", 1), "free": info.get("MemAvailable", info.get("MemFree", 1))}


class FeatureCache:
    """Free-RAM-gated dict cache: inserts only while free/total stays above
    max(0.2, min_free_ram) (reference collate.py:92-105)."""

    def __init__(self, min_free_ram: float = 0.2):
        self.min_free_ram = float(min_free_ram)
        self._data: Dict[str, np.ndarray] = {}
        self._lock = threading.Lock()
        self.hits = self.misses = 0

    def get(self, key: str, load_fn: Callable[[str], np.ndarray]) -> np.ndarray:
        with self._lock:
            if key in self._data:
                self.hits += 1
                return self._data[key]
        value = load_fn(key)
        self.misses += 1
        mem = get_memory_info()
        if mem["free"] / mem["total"] > max(0.2, self.min_free_ram):
            with self._lock:
                self._data[key] = value
        return value

    def __len__(self) -> int:
        return len(self._data)


class FeatureSource:
    """Loads att / fc / box `.npy` features for an image id, padded to static
    shapes for XLA (regions padded/truncated to ``max_regions``)."""

    def __init__(
        self,
        att_dir: Optional[str] = None,
        fc_dir: Optional[str] = None,
        box_dir: Optional[str] = None,
        max_regions: int = 36,
        att_feat_size: int = 2048,
        cache: Optional[FeatureCache] = None,
    ):
        self.att_dir, self.fc_dir, self.box_dir = att_dir, fc_dir, box_dir
        self.max_regions = max_regions
        self.att_feat_size = att_feat_size
        self.cache = cache if cache is not None else FeatureCache()

    @staticmethod
    def _load_npy(path: str) -> np.ndarray:
        data = np.load(path)
        return data.reshape(-1, data.shape[-1]).astype(np.float32) if data.ndim > 1 else data.astype(np.float32)

    def _cached(self, path: str) -> np.ndarray:
        return self.cache.get(path, self._load_npy)

    def _pad_regions(self, x: np.ndarray) -> tuple[np.ndarray, int]:
        """(R, D) -> (max_regions, D) zero-padded; returns true region count."""
        r = min(x.shape[0], self.max_regions)
        out = np.zeros((self.max_regions, x.shape[1]), dtype=np.float32)
        out[:r] = x[:r]
        return out, r

    def load(self, image_id: int) -> Dict[str, np.ndarray]:
        out: Dict[str, np.ndarray] = {}
        if self.att_dir:
            att, r = self._pad_regions(self._cached(os.path.join(self.att_dir, f"{image_id}.npy")))
            out["att_feats"] = att
            mask = np.zeros((self.max_regions,), dtype=np.float32)
            mask[:r] = 1.0
            out["att_masks"] = mask
        if self.fc_dir:
            fc = self._cached(os.path.join(self.fc_dir, f"{image_id}.npy"))
            out["fc_feats"] = fc.reshape(-1).astype(np.float32)
        if self.box_dir:
            box, _ = self._pad_regions(self._cached(os.path.join(self.box_dir, f"{image_id}.npy")))
            out["boxes"] = box
        return out


def default_bu_dirs(dataset_dir: str) -> Dict[str, str]:
    """Default bottom-up feature layout (reference collate.py:85-90,193-194,233-234)."""
    bu = os.path.join(dataset_dir, "bu")
    return {
        "att_dir": os.path.join(bu, "cocobu_att"),
        "fc_dir": os.path.join(bu, "cocobu_fc"),
        "box_dir": os.path.join(bu, "cocobu_box_relative"),
    }
