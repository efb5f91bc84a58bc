"""Logging + small helpers (parity: reference sparse_caption/utils/misc.py)."""

from __future__ import annotations

import json
import logging
import os
import time

logger = logging.getLogger("sparse_caption_tpu")


def configure_logging(level: str = "INFO", log_file: str | None = None) -> None:
    fmt = "%(asctime)s %(levelname)s %(name)s: %(message)s"
    handlers: list = [logging.StreamHandler()]
    if log_file:
        os.makedirs(os.path.dirname(log_file) or ".", exist_ok=True)
        handlers.append(logging.FileHandler(log_file))
    logging.basicConfig(level=getattr(logging, level.upper(), logging.INFO), format=fmt, handlers=handlers, force=True)


class Timer:
    """Wall-clock timer for throughput logs (ex/sec, img/sec)."""

    def __init__(self):
        self.reset()

    def reset(self):
        self.t0 = time.perf_counter()

    def elapsed(self) -> float:
        return time.perf_counter() - self.t0

    def rate(self, n: int) -> float:
        dt = self.elapsed()
        return n / dt if dt > 0 else float("inf")


def dump_json(path: str, obj, **kwargs) -> str:
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(obj, f, **kwargs)
    return path


def read_json(path: str):
    with open(path) as f:
        return json.load(f)


def csv_append_row(path: str, header: list, row: list) -> None:
    """Append one row to a CSV, writing the header when the file is new
    (parity: per-eval score CSVs, reference utils/training.py:303-318)."""
    new = not os.path.isfile(path)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "a") as f:
        if new:
            f.write(",".join(str(h) for h in header) + "\n")
        f.write(",".join(str(x) for x in row) + "\n")
