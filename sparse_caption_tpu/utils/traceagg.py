"""Aggregate device-op time from a jax.profiler trace directory.

Shared by the profiling scripts (``scripts/profile_decode.py``,
``scripts/profile_xe.py``). The profiler writes a Chrome-trace
``*.trace.json.gz``; we keep only the device (TensorCore) lanes and sum
event durations by op-name prefix (collapsing XLA's fusion numbering,
``fusion.123`` -> ``fusion``), which is the round-2/3 profile recipe
recorded in CLAUDE.md.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
from collections import defaultdict
from typing import Dict, Tuple


def aggregate_device_ops(trace_dir: str) -> Tuple[Dict[str, float], float]:
    """Return ({op_base_name: seconds}, total_seconds) across all traces."""
    traces = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    agg: Dict[str, float] = defaultdict(float)
    total = 0.0
    for tr in traces:
        with gzip.open(tr, "rt") as f:
            data = json.load(f)
        dev_pids = set()
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M" and ev.get("name") == "process_name":
                nm = str(ev.get("args", {}).get("name", ""))
                if "TPU" in nm or "Device" in nm or "/device" in nm.lower():
                    dev_pids.add(ev.get("pid"))
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and ev.get("pid") in dev_pids:
                base = ev.get("name", "?").split(".")[0]
                dur = float(ev.get("dur", 0.0)) / 1e6  # us -> s
                agg[base] += dur
                total += dur
    return dict(agg), total
