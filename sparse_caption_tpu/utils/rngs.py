"""Seeding helpers (parity: reference utils/model_utils.py:18-26 set_seed)."""

from __future__ import annotations

import random

import numpy as np


def set_global_seed(seed: int = 8888) -> None:
    random.seed(seed)
    np.random.seed(seed)
