"""Aggregate device-op time from a jax.profiler trace directory.

Shared by the profiling scripts (``scripts/profile_decode.py``,
``scripts/profile_xe.py``). The profiler writes a Chrome-trace
``*.trace.json.gz``; we keep only the device (TensorCore) lanes and sum
EXCLUSIVE (self) time by op-name prefix, collapsing XLA's fusion
numbering (``fusion.123`` -> ``fusion``).

Two double-counting hazards (the committed r3 artifacts initially showed
device_s 1.7s against wall_s 0.63s — impossible on one chip):

* each device pid carries PARALLEL lanes covering the same wall span —
  ``Steps`` (iteration envelopes), ``XLA Modules`` (one ``jit_*`` event
  per dispatch), and ``XLA Ops`` (the leaf fusions). Only the ``XLA
  Ops`` lane is aggregated when thread names are present.
* within a lane, ``X`` events may NEST; each event is credited with its
  EXCLUSIVE time (``dur - sum(child durs)``) via an interval stack.

Together the per-op totals decompose device busy time exactly once.
"""

from __future__ import annotations

import glob
import gzip
import json
import os
from collections import defaultdict
from typing import Dict, Tuple


def _self_times(lane):
    """Exclusive time per event for one lane of nested (ts, dur, name)."""
    lane.sort(key=lambda e: (e[0], -e[1]))
    out: Dict[str, float] = defaultdict(float)
    stack = []  # [name, end_ts, child_dur_sum, dur]

    def pop():
        name, _end, child, dur = stack.pop()
        out[name] += max(dur - child, 0.0)

    for ts, dur, name in lane:
        # close every interval that ends at/before this event's start
        while stack and ts >= stack[-1][1] - 1e-6:
            pop()
        if stack:
            stack[-1][2] += dur  # credit full dur to the parent as child time
        stack.append([name, ts + dur, 0.0, dur])
    while stack:
        pop()
    return out


def aggregate_device_ops(trace_dir: str) -> Tuple[Dict[str, float], float]:
    """Return ({op_base_name: exclusive_seconds}, total_seconds)."""
    traces = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
    agg: Dict[str, float] = defaultdict(float)
    for tr in traces:
        with gzip.open(tr, "rt") as f:
            data = json.load(f)
        dev_pids = set()
        thread_names = {}
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "M":
                if ev.get("name") == "process_name":
                    nm = str(ev.get("args", {}).get("name", ""))
                    if "TPU" in nm or "Device" in nm or "/device" in nm.lower():
                        dev_pids.add(ev.get("pid"))
                elif ev.get("name") == "thread_name":
                    thread_names[(ev.get("pid"), ev.get("tid"))] = str(
                        ev.get("args", {}).get("name", ""))
        # leaf-op lanes only; "Steps"/"XLA Modules" are parallel envelopes
        # of the same device time
        op_lanes = {k for k, v in thread_names.items()
                    if k[0] in dev_pids and v == "XLA Ops"}
        have_names = any(k[0] in dev_pids for k in thread_names)

        def keep(pid, tid):
            if not have_names:
                return pid in dev_pids  # old traces: fall back to everything
            return (pid, tid) in op_lanes

        lanes = defaultdict(list)
        for ev in data.get("traceEvents", []):
            if ev.get("ph") == "X" and keep(ev.get("pid"), ev.get("tid")):
                lanes[(ev.get("pid"), ev.get("tid"))].append(
                    (float(ev.get("ts", 0.0)), float(ev.get("dur", 0.0)), ev.get("name", "?")))
        for lane in lanes.values():
            for name, self_us in _self_times(lane).items():
                agg[name.split(".")[0]] += self_us / 1e6  # us -> s
    return dict(agg), sum(agg.values())
