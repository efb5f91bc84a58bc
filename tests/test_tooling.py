"""Results-tooling tests: collect_scores / collect_captions_plus over
synthetic run dirs (capability parity: reference scripts/collect_scores.py,
collect_captions_plus.py)."""

import csv
import json
import os
import subprocess
import sys

SCRIPTS = os.path.join(os.path.dirname(__file__), "..", "scripts")


def make_run(root, name, cider, model="relation_transformer", step="00000002"):
    run = os.path.join(root, name)
    os.makedirs(os.path.join(run, "val_beam_1"), exist_ok=True)
    os.makedirs(os.path.join(run, "test_beam_2"), exist_ok=True)
    json.dump({"caption_model": model, "best_global_step": int(step), "config_version": 1},
              open(os.path.join(run, "config.json"), "w"))
    for split, beam in [("val", 1), ("test", 2)]:
        d = os.path.join(run, f"{split}_beam_{beam}")
        with open(os.path.join(d, "scores.csv"), "w") as f:
            f.write("Step,Bleu_1,Bleu_2,Bleu_3,Bleu_4,METEOR,ROUGE_L,CIDEr,SPICE\n")
            f.write(f"00000001,0.5,0.4,0.3,0.2,nan,0.45,{cider - 0.1:.3f},nan\n")
            f.write(f"{step},0.6,0.5,0.4,0.3,nan,0.5,{cider:.3f},nan\n")
        json.dump([{"image_id": 1, "caption": f"a {name} caption"}],
                  open(os.path.join(d, f"caption_{step}.json"), "w"))
    return run


def test_collect_scores(tmp_path):
    make_run(str(tmp_path), "run_a", 1.1)
    make_run(str(tmp_path), "run_b", 0.9)
    out = str(tmp_path / "compiled.csv")
    r = subprocess.run([sys.executable, os.path.join(SCRIPTS, "collect_scores.py"),
                        "--runs_dir", str(tmp_path), "--output", out],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    rows = list(csv.DictReader(open(out)))
    assert len(rows) == 2
    by_run = {row["run"]: row for row in rows}
    # best-step row selected via best_global_step
    assert by_run["run_a"]["test_beam_2/CIDEr"] == "1.100"
    assert by_run["run_b"]["val_beam_1/CIDEr"] == "0.900"
    assert os.path.isfile(out.replace(".csv", "_100x.csv"))


def test_collect_captions_plus(tmp_path):
    a = make_run(str(tmp_path), "run_a", 1.1)
    b = make_run(str(tmp_path), "run_b", 0.9)
    out = str(tmp_path / "cc")
    r = subprocess.run([sys.executable, os.path.join(SCRIPTS, "collect_captions_plus.py"),
                        "--runs", f"A:{a}", f"B:{b}", "--split", "test", "--output", out],
                       capture_output=True, text=True)
    assert r.returncode == 0, r.stderr
    rows = list(csv.DictReader(open(out + ".csv")))
    assert rows[0]["A"] == "a run_a caption" and rows[0]["B"] == "a run_b caption"
    assert os.path.isfile(out + ".md")
