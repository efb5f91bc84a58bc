#!/usr/bin/env python
"""Aggregate scores across run directories (capability parity: reference
``scripts/collect_scores.py`` — walks run dirs, picks the best-step row from
each eval CSV, joins val/test (+ sparsity summary when present), writes
``compiled_scores.csv`` and a x100 variant).

Usage:
    python scripts/collect_scores.py --runs_dir runs/ [--output compiled_scores.csv]
"""

from __future__ import annotations

import argparse
import csv
import json
import os
import sys
from pathlib import Path
from typing import Dict, List, Optional

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

METRICS = ["Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR", "ROUGE_L", "CIDEr", "SPICE"]


def read_scores_csv(path: str) -> List[Dict[str, str]]:
    with open(path) as f:
        return list(csv.DictReader(f))


def best_row(rows: List[Dict[str, str]], key: str = "CIDEr") -> Optional[Dict[str, str]]:
    scored = [r for r in rows if r.get(key) not in (None, "", "nan")]
    if not scored:
        return rows[-1] if rows else None
    return max(scored, key=lambda r: float(r[key]))


def collect_run(run_dir: str) -> Optional[Dict[str, str]]:
    config_path = os.path.join(run_dir, "config.json")
    if not os.path.isfile(config_path):
        return None
    with open(config_path) as f:
        cfg = json.load(f)
    out: Dict[str, str] = {"run": os.path.basename(run_dir.rstrip("/")),
                           "model": str(cfg.get("caption_model", "")),
                           "prune_type": str(cfg.get("prune_type", "")),
                           "sparsity_target": str(cfg.get("prune_sparsity_target", ""))}
    best_step = str(cfg.get("best_global_step", ""))

    for split_dir in sorted(os.listdir(run_dir)):
        full = os.path.join(run_dir, split_dir)
        csv_path = os.path.join(full, "scores.csv")
        if not (os.path.isdir(full) and os.path.isfile(csv_path)):
            continue
        rows = read_scores_csv(csv_path)
        row = None
        if best_step:
            matches = [r for r in rows if str(int(r["Step"])) == str(int(best_step or 0))]
            row = matches[0] if matches else None
        row = row or best_row(rows)
        if row:
            for m in METRICS:
                if m in row and row[m] not in ("", "nan"):
                    out[f"{split_dir}/{m}"] = row[m]
            out[f"{split_dir}/Step"] = row.get("Step", "")

    sp_csv = os.path.join(run_dir, "sparsities.csv")
    if os.path.isfile(sp_csv):
        rows = read_scores_csv(sp_csv)
        if rows:
            vals = [float(r["sparsity"]) for r in rows]
            out["sparsity_mean"] = f"{sum(vals) / len(vals):.4f}"
    return out


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--runs_dir", required=True)
    p.add_argument("--output", default="compiled_scores.csv")
    args = p.parse_args()

    results = []
    for entry in sorted(os.listdir(args.runs_dir)):
        run_dir = os.path.join(args.runs_dir, entry)
        if os.path.isdir(run_dir):
            r = collect_run(run_dir)
            if r:
                results.append(r)
    if not results:
        print("no runs with config.json found", file=sys.stderr)
        sys.exit(1)

    headers: List[str] = []
    for r in results:
        for k in r:
            if k not in headers:
                headers.append(k)
    for path, scale in [(args.output, 1.0), (args.output.replace(".csv", "_100x.csv"), 100.0)]:
        with open(path, "w", newline="") as f:
            w = csv.DictWriter(f, fieldnames=headers)
            w.writeheader()
            for r in results:
                row = dict(r)
                if scale != 1.0:
                    for k, v in row.items():
                        if any(k.endswith(m) for m in METRICS):
                            try:
                                row[k] = f"{float(v) * scale:.1f}"
                            except ValueError:
                                pass
                w.writerow(row)
        print(f"wrote {path} ({len(results)} runs)")


if __name__ == "__main__":
    main()
