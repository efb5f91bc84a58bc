#!/usr/bin/env python
"""Aggregate scores across run directories (capability parity: reference
``scripts/collect_scores.py:100-368``): walks run dirs, joins the val row at
the test checkpoint step across eval CSVs, computes caption statistics
(vocab coverage, % unique vs train captions, average length — reference
``compute_caption_stats``), adds model-parameter totals with the ORT
attention/embedding param-group sums, folds in ``sparsities.csv``, and
writes ``compiled_scores.csv`` plus a x100 variant.

Usage:
    python scripts/collect_scores.py --runs_dir runs/ [--output compiled_scores.csv]
"""

from __future__ import annotations

import argparse
import csv
import glob
import json
import os
import sys
from pathlib import Path
from typing import Dict, List, Optional

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

METRICS = ["Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4", "METEOR", "METEOR_py",
           "ROUGE_L", "CIDEr", "SPICE", "SPICE_py"]


def caption_stats(split_dir: str, vocab_size: int, train_captions: Optional[set]) -> Dict[str, str]:
    """Vocab coverage / % unique vs train / avg length / count for the
    latest caption JSON of an eval dir (reference collect_scores.py:247-290)."""
    cands = sorted(glob.glob(os.path.join(split_dir, "caption_*.json")))
    cands = [c for c in cands if not c.endswith("_val2014.json")]
    if not cands:
        return {}
    with open(cands[-1]) as f:
        captions = [d["caption"] for d in json.load(f)]
    if not captions:
        return {}
    words: Dict[str, int] = {}
    in_train = 0
    lengths = []
    for c in captions:
        if train_captions is not None and c in train_captions:
            in_train += 1
        toks = c.split(" ")
        lengths.append(len(toks))
        for w in toks:
            words[w] = words.get(w, 0) + 1
    out = {
        "vocab_coverage": f"{len(words) / max(vocab_size - 2, 1) * 100.0:.1f}",
        "avg_len": f"{sum(lengths) / len(lengths):.2f}",
        "num_captions": str(len(captions)),
    }
    if train_captions is not None:
        out["pct_unique"] = f"{(1.0 - in_train / len(captions)) * 100.0:.1f}"
    return out


def param_groups(model_params: Dict, model: str) -> Dict[str, str]:
    """Total + ORT attention/embedding param-group sums
    (reference collect_scores.py:190-201)."""
    out = {"params": str(model_params.get("total", ""))}
    breakdown = model_params.get("breakdown") or {}
    if model.startswith("relation_transformer") and breakdown:
        att = sum(v for k, v in breakdown.items() if "_attn/" in k or "self_attn/" in k or "src_attn/" in k)
        emb = sum(v for k, v in breakdown.items() if "generator/" in k or "tgt_embed/" in k)
        out["attention_params"] = str(att)
        out["embedding_params"] = str(emb)
    return out


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
    model = str(cfg.get("caption_model", ""))
    out: Dict[str, str] = {"run": os.path.basename(run_dir.rstrip("/")),
                           "model": model,
                           "prune_type": str(cfg.get("prune_type", "")),
                           "sparsity_target": str(cfg.get("prune_sparsity_target", ""))}
    best_step = str(cfg.get("best_global_step", ""))

    # the reference joins each VAL row at the TEST checkpoint step
    # (collect_scores.py:154-164); prefer that, fall back to best_global_step
    test_step = None
    for split_dir in sorted(os.listdir(run_dir)):
        if split_dir.startswith("test"):
            csv_path = os.path.join(run_dir, split_dir, "scores.csv")
            if os.path.isfile(csv_path):
                rows = read_scores_csv(csv_path)
                if rows:
                    test_step = rows[-1].get("Step")
    join_step = test_step or best_step

    train_captions = None
    tc_path = os.path.join(run_dir, "tokenizer", "train_captions.txt")
    if os.path.isfile(tc_path):
        with open(tc_path) as f:
            train_captions = set(line.rstrip("\n") for line in f)

    mp_path = os.path.join(run_dir, "model_params.json")
    if os.path.isfile(mp_path):
        with open(mp_path) as f:
            out.update(param_groups(json.load(f), model))

    for split_dir in sorted(os.listdir(run_dir)):
        full = os.path.join(run_dir, split_dir)
        csv_path = os.path.join(full, "scores.csv")
        if not (os.path.isdir(full) and os.path.isfile(csv_path)):
            continue
        rows = read_scores_csv(csv_path)
        row = None
        if join_step:
            matches = [r for r in rows if str(int(r["Step"])) == str(int(join_step or 0))]
            row = matches[0] if matches else None
        row = row or best_row(rows)
        if row:
            for m in METRICS:
                if m in row and row[m] not in ("", "nan"):
                    out[f"{split_dir}/{m}"] = row[m]
            out[f"{split_dir}/Step"] = row.get("Step", "")
        for k, v in caption_stats(full, int(cfg.get("vocab_size", 2)), train_captions).items():
            out[f"{split_dir}/{k}"] = v

    sp_csv = os.path.join(run_dir, "sparsities.csv")
    if os.path.isfile(sp_csv):
        rows = read_scores_csv(sp_csv)
        if rows:
            vals = [float(r["sparsity"]) for r in rows]
            out["sparsity_mean"] = f"{sum(vals) / len(vals):.4f}"
    return out


def check_compiled_scores(runs_dir: str, compiled_csv: str) -> bool:
    """Re-derive every run's metrics and verify the previously compiled CSV
    still matches (reference collect_scores.py:292-311 — guards against
    stale aggregations after re-evals). Returns True iff consistent."""
    with open(compiled_csv, newline="") as f:
        rows = list(csv.DictReader(f))
    ok = True
    for row in rows:
        run_dir = os.path.join(runs_dir, row.get("run", ""))
        if not os.path.isdir(run_dir):
            print(f"check: `{row.get('run')}` missing on disk", file=sys.stderr)
            continue
        fresh = collect_run(run_dir) or {}
        for k, v in row.items():
            if any(k.endswith(m) for m in METRICS) and v:
                if fresh.get(k, "") != v:
                    ok = False
                    print(f"check: MISMATCH {row.get('run')}:{k} compiled={v} fresh={fresh.get(k, '')}",
                          file=sys.stderr)
    print(f"check_compiled_scores: {'OK' if ok else 'MISMATCHES FOUND'} ({len(rows)} runs)")
    return ok


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--runs_dir", required=True)
    p.add_argument("--output", default="compiled_scores.csv")
    p.add_argument("--check_compiled_scores", "-c", action="store_true",
                   help="verify a previously written compiled CSV against the per-run "
                        "scores.csv files instead of recompiling (reference flag)")
    args = p.parse_args()

    if args.check_compiled_scores:
        sys.exit(0 if check_compiled_scores(args.runs_dir, args.output) else 1)

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
