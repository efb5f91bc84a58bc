"""Exclusive-time trace aggregation (utils/traceagg.py).

Chrome-trace X events nest; the aggregator must decompose each device
lane's busy time exactly once (naive summation double-counts envelopes —
the committed r3 profile artifacts showed device_s > wall_s before the
fix)."""

import gzip
import json
import os

from sparse_caption_tpu.utils.traceagg import aggregate_device_ops


def _write_trace(path, events):
    meta = [{"ph": "M", "name": "process_name", "pid": 1,
             "args": {"name": "/device:TPU:0"}},
            {"ph": "M", "name": "process_name", "pid": 9,
             "args": {"name": "python host thread"}}]
    with gzip.open(path, "wt") as f:
        json.dump({"traceEvents": meta + events}, f)


def test_nested_events_counted_once(tmp_path):
    d = tmp_path / "plugins" / "profile" / "run"
    os.makedirs(d)
    events = [
        # device lane: jit envelope > while region > two leaf fusions
        {"ph": "X", "pid": 1, "tid": 1, "ts": 0.0, "dur": 100.0, "name": "jit_step(123)"},
        {"ph": "X", "pid": 1, "tid": 1, "ts": 10.0, "dur": 80.0, "name": "while"},
        {"ph": "X", "pid": 1, "tid": 1, "ts": 10.0, "dur": 50.0, "name": "fusion.1"},
        {"ph": "X", "pid": 1, "tid": 1, "ts": 60.0, "dur": 30.0, "name": "fusion.2"},
        # sibling leaf after the envelope closes
        {"ph": "X", "pid": 1, "tid": 1, "ts": 100.0, "dur": 20.0, "name": "copy"},
        # host lane must be excluded entirely
        {"ph": "X", "pid": 9, "tid": 1, "ts": 0.0, "dur": 500.0, "name": "hostwork"},
    ]
    _write_trace(str(d / "x.trace.json.gz"), events)
    agg, total = aggregate_device_ops(str(tmp_path))
    # leaves keep full time; envelopes keep only their exclusive remainder
    assert abs(agg["fusion"] - 80e-6) < 1e-12          # 50 + 30, numbering collapsed
    assert abs(agg["while"] - 0.0) < 1e-12             # fully covered by children
    assert abs(agg["jit_step(123)"] - 20e-6) < 1e-12   # 100 - 80 exclusive
    assert abs(agg["copy"] - 20e-6) < 1e-12
    assert "hostwork" not in agg
    # total equals lane busy time (120us), NOT the naive 280us event sum
    assert abs(total - 120e-6) < 1e-12


def test_parallel_lanes_sum(tmp_path):
    d = tmp_path / "p"
    os.makedirs(d)
    events = [
        {"ph": "X", "pid": 1, "tid": 1, "ts": 0.0, "dur": 10.0, "name": "fusion.9"},
        {"ph": "X", "pid": 1, "tid": 2, "ts": 0.0, "dur": 10.0, "name": "fusion.10"},
    ]
    _write_trace(str(d / "y.trace.json.gz"), events)
    agg, total = aggregate_device_ops(str(tmp_path))
    assert abs(agg["fusion"] - 20e-6) < 1e-12
    assert abs(total - 20e-6) < 1e-12


def test_parallel_envelope_lanes_excluded_via_thread_names(tmp_path):
    """Real TPU traces carry three lanes per device pid covering the SAME
    span (Steps / XLA Modules / XLA Ops); only the leaf-op lane counts."""
    d = tmp_path / "q"
    os.makedirs(d)
    meta = [{"ph": "M", "name": "process_name", "pid": 3,
             "args": {"name": "/device:TPU:0"}},
            {"ph": "M", "name": "thread_name", "pid": 3, "tid": 1,
             "args": {"name": "Steps"}},
            {"ph": "M", "name": "thread_name", "pid": 3, "tid": 2,
             "args": {"name": "XLA Modules"}},
            {"ph": "M", "name": "thread_name", "pid": 3, "tid": 3,
             "args": {"name": "XLA Ops"}}]
    events = [
        {"ph": "X", "pid": 3, "tid": 1, "ts": 0.0, "dur": 100.0, "name": "0"},
        {"ph": "X", "pid": 3, "tid": 2, "ts": 0.0, "dur": 100.0, "name": "jit_step(9)"},
        {"ph": "X", "pid": 3, "tid": 3, "ts": 0.0, "dur": 60.0, "name": "fusion.3"},
        {"ph": "X", "pid": 3, "tid": 3, "ts": 60.0, "dur": 40.0, "name": "copy.1"},
    ]
    with gzip.open(str(d / "z.trace.json.gz"), "wt") as f:
        json.dump({"traceEvents": meta + events}, f)
    agg, total = aggregate_device_ops(str(tmp_path))
    assert set(agg) == {"fusion", "copy"}
    assert abs(total - 100e-6) < 1e-12
