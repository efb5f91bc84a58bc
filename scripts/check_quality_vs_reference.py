#!/usr/bin/env python
"""End-to-end quality A/B vs the LIVE reference on its real fixture data.

The reference ships 5 real COCO images with real bottom-up features
(``/root/reference/tests/data``: 2 train / 1 val / 1 test / 1 restval,
``dataset_coco_testing.json``) and trains on exactly this fixture in its
own test suite (reference ``tests/test_train.py:80-102``).  This script
climbs the last reachable rung of the cross-framework quality ladder:
it trains BOTH frameworks on that fixture with matched configs (word
tokenizer, same model dims / optimizer / epochs, fp32 CPU, same seed)
and compares the val-split CIDEr trajectory each framework reports from
its OWN eval stack.

Env caveat, handled in-harness: the reference's eval chain shells out to
Java at three points (PTBTokenizer / METEOR / SPICE jars) and this image
has no JVM, so for the reference run we substitute our pure-Python PTB
analog (differentially tested vs the official tokenizer in
``tests/test_metrics.py``) and zero-stub METEOR/SPICE — its vendored
Bleu/Rouge/CIDEr scorers (the comparison metrics) run UNMODIFIED.

The two sides run in fresh subprocesses (torch and jax contaminate each
other's thread pools in-process — see bench_cpu_vs_reference.py).

    python scripts/check_quality_vs_reference.py [--epochs 300] [--seeds 8888,777,42]

The quality gate is MEMORIZATION: after training, each framework
greedy-decodes its 3 TRAIN images from the final checkpoint and scores
against their own GT (``--split train`` on our eval entry; a direct
``eval_on_split`` drive on the reference). A 3-image corpus gives CIDEr a
non-degenerate idf, and fitting the train set is the one deterministic
target this fixture supports — it exercises the full loop (data pipeline,
optimizer, schedule, decode, scoring) on both sides. Pass criterion:
across-seed mean train-split CIDEr and Bleu_4, ours >= reference * (1 -
rel_eps).

The conventional val comparison is recorded but NOT gated: the val split
is ONE unseen image that 3 training images cannot teach. Both frameworks
emit degenerate all-stopword captions there; val CIDEr is identically 0
for ANY predictions by construction (1-image corpus => idf = log(1/df) =
0), and val Bleu_1/ROUGE_L differences only measure the degenerate
string's length.

Prints one JSON line with memorization scores, val diagnostics, and
"pass".
"""

from __future__ import annotations

import argparse
import csv
import glob
import json
import os
import sys

REPO = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE = os.environ.get("SPARSE_CAPTION_REFERENCE", "/root/reference")
REF_DATA = os.path.join(REFERENCE, "tests", "data")


METRICS = ["Bleu_1", "Bleu_4", "ROUGE_L", "CIDEr"]


def matched_args(log_dir: str, epochs: int, seed: int = 8888) -> list:
    """Flags valid (and meaning the same thing) in BOTH CLIs."""
    ckpt_every = max(25, epochs // 12)
    return [
        "--seed", str(seed),
        # short warmup so the tiny run actually leaves the lr ramp (noam
        # default 10000 keeps lr microscopic for the whole horizon)
        "--noamopt_warmup", "200",
        "--caption_model", "transformer",
        "--dataset", "mscoco_testing",
        # SC_QUALITY_AB_DATA: fold-rotated copies of the fixture (--folds)
        "--dataset_dir", os.environ.get("SC_QUALITY_AB_DATA", REF_DATA),
        "--log_dir", log_dir,
        "--tokenizer", "word",
        "--vocab_size", "100",
        "--batch_size", "2",
        "--batch_size_eval", "2",
        "--max_epochs", str(epochs),
        "--save_checkpoint_every", str(ckpt_every),
        "--cache_min_free_ram", "1.0",
        "--lr_scheduler", "noam",
        "--learning_rate", "0.01",
        "--optim_epsilon", "0.01",
        "--d_model", "32",
        "--dim_feedforward", "64",
        "--num_layers", "2",
    ]


def read_trajectories(log_dir: str) -> dict:
    """{metric: [(step, score), ...]} from the run's val scores.csv (both
    frameworks write the identical reference CSV layout: Step + ALL_METRICS)."""
    paths = sorted(glob.glob(os.path.join(log_dir, "**", "val_beam_*", "scores.csv"),
                             recursive=True))
    assert paths, f"no val scores.csv under {log_dir}"
    out = {m: [] for m in METRICS}
    with open(paths[0]) as f:
        for row in csv.DictReader(f):
            step_key = "Step" if "Step" in row else "step"
            for m in METRICS:
                out[m].append([int(row[step_key]), float(row[m])])
    return out


def read_memorization_scores(log_dir: str) -> dict:
    """{metric: score} from the train-split eval's score json (the one
    memorization eval per run; both frameworks write train_beam_1/)."""
    paths = sorted(glob.glob(os.path.join(log_dir, "**", "train_beam_1", "score_*.json"),
                             recursive=True))
    paths = [p for p in paths if "detailed" not in p]
    assert paths, f"no train-split score json under {log_dir}"
    with open(paths[-1]) as f:
        scores = json.load(f)
    return {m: round(float(scores[m]), 4) for m in METRICS}


def run_ours(log_dir: str, epochs: int, seed: int) -> None:
    import subprocess

    env = os.environ.copy()
    env.pop("JAX_PLATFORMS", None)
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "train_transformer.py")]
        + matched_args(log_dir, epochs, seed) + ["--platform", "cpu"],
        env=env, capture_output=True, text=True, timeout=7200)
    assert r.returncode == 0, f"our training failed:\n{r.stderr[-4000:]}"
    # memorization eval: greedy-decode the TRAIN images from the final ckpt
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "eval_model.py"),
         "--log_dir", log_dir, "--ckpt", "last", "--split", "train",
         "--beam_size", "1", "--platform", "cpu"],
        env=env, capture_output=True, text=True, timeout=3600)
    assert r.returncode == 0, f"our train-split eval failed:\n{r.stderr[-4000:]}"


def _install_sentencepiece_word_stub() -> None:
    """Functional pure-Python mimic of the SentencePiece WORD model (the
    only model_type this harness exercises): ``train`` builds a frequency
    vocab with the reference's forced special ids (pad=0 unk=1 bos=2 eos=3,
    ``tokenizer.py:418-427``), ``encode`` is whole-word lookup with the
    ``▁`` piece convention. Lets the reference's SP-bound tokenizer
    stack run without the sentencepiece wheel (absent from this image)."""
    import re
    import types
    from collections import Counter

    SPECIALS = ["<pad>", "<unk>", "<bos>", "<eos>"]

    class SentencePieceProcessor:
        def __init__(self):
            self.pieces = []
            self._ids = {}

        def load(self, path):
            with open(path) as f:
                self.pieces = json.load(f)["pieces"]
            self._ids = {p: i for i, p in enumerate(self.pieces)}

        def __len__(self):
            return len(self.pieces)

        def _word_id(self, w):
            return self._ids.get("▁" + w, self._ids.get(w, 1))

        def encode(self, text, add_bos=False, add_eos=False, out_type=int, **kw):
            ids = [self._word_id(w) for w in text.strip().split()]
            if add_bos:
                ids = [2] + ids
            if add_eos:
                ids = ids + [3]
            return ids

        def encode_as_pieces(self, text):
            return ["▁" + w for w in text.strip().split()]

        def piece_to_id(self, piece):
            if isinstance(piece, (list, tuple)):
                return [self.piece_to_id(p) for p in piece]
            return self._ids.get(piece, self._ids.get("▁" + piece, 1))

        def id_to_piece(self, i):
            return self.pieces[i]

        def decode_ids(self, ids):
            out = []
            for i in ids:
                if i in (0, 2, 3):  # control symbols are skipped by SP
                    continue
                out.append("<unk>" if i == 1 else self.pieces[i])
            return "".join(out).replace("▁", " ")

        def bos_id(self):
            return 2

        def eos_id(self):
            return 3

        def unk_id(self):
            return 1

        def pad_id(self):
            return 0

    class SentencePieceTrainer:
        @staticmethod
        def train(arg_str):
            args = dict(re.findall(r"--(\w+)=(\S+)", arg_str))
            assert args.get("model_type") == "word", (
                "the SP stub supports the word model only (quality A/B harness)")
            counts = Counter()
            for path in args["input"].split(","):
                with open(path) as f:
                    for line in f:
                        counts.update(line.strip().split())
            max_words = int(args["vocab_size"]) - len(SPECIALS)
            words = [w for w, _ in sorted(counts.items(), key=lambda kv: (-kv[1], kv[0]))[:max_words]]
            pieces = SPECIALS + ["▁" + w for w in words]
            prefix = args["model_prefix"]
            with open(prefix + ".model", "w") as f:
                json.dump({"model_type": "word", "pieces": pieces}, f)
            with open(prefix + ".vocab", "w") as f:
                f.write("\n".join(f"{p}\t0" for p in pieces))

    import importlib.machinery

    m = types.ModuleType("sentencepiece")
    m.SentencePieceProcessor = SentencePieceProcessor
    m.SentencePieceTrainer = SentencePieceTrainer
    m.__spec__ = importlib.machinery.ModuleSpec("sentencepiece", None)
    sys.modules["sentencepiece"] = m


def run_reference(log_dir: str, epochs: int, seed: int) -> None:
    """Train the reference in-process (this function runs in its own
    subprocess via --only reference)."""
    import types

    from bench_cpu_vs_reference import _stub_reference_deps

    _install_sentencepiece_word_stub()  # must precede the inert setdefault stub
    _stub_reference_deps()
    # pycocotools is absent; COCOEvalCap is bypassed entirely below, the
    # stub only lets `coco_caption.eval` import
    if "pycocotools" not in sys.modules:
        import importlib.machinery

        pc = types.ModuleType("pycocotools")
        pcc = types.ModuleType("pycocotools.coco")
        pcc.COCO = object
        pc.coco = pcc
        pc.__spec__ = importlib.machinery.ModuleSpec("pycocotools", None)
        pcc.__spec__ = importlib.machinery.ModuleSpec("pycocotools.coco", None)
        sys.modules["pycocotools"] = pc
        sys.modules["pycocotools.coco"] = pcc
    import torch

    torch.set_num_threads(os.cpu_count() or 1)

    # The reference's eval chain is env-blocked at FOUR points: pycocotools,
    # the captions_val2014.json LFS blob (plus a zero-egress download into
    # its read-only mount), and the PTBTokenizer/METEOR/SPICE jars (no JVM).
    # Shim `evaluate_caption_json` with a driver that scores its prediction
    # JSON using the reference's OWN vendored Bleu/Rouge/Cider scorers
    # against GT from its own fixture; only the COCO-API plumbing and the
    # Java tokenizer are replaced (our pure-Python PTB analog,
    # differentially tested vs the official jar output).
    from sparse_caption_tpu.metrics.ptb_tokenizer import ptb_tokenize

    with open(os.path.join(REF_DATA, "dataset_coco_testing.json")) as f:
        _fixture = json.load(f)
    gts_raw = {img["cocoid"]: [{"caption": s["raw"].strip()} for s in img["sentences"]]
               for img in _fixture["images"]}

    def shim_evaluate(res_file, ann_file):
        from sparse_caption.coco_caption.pycocoevalcap.bleu.bleu import Bleu
        from sparse_caption.coco_caption.pycocoevalcap.cider.cider import Cider
        from sparse_caption.coco_caption.pycocoevalcap.rouge.rouge import Rouge

        with open(res_file) as fh:
            preds = json.load(fh)
        res_raw = {p["image_id"]: [{"caption": p["caption"]}] for p in preds}
        ids = [i for i in res_raw if i in gts_raw]
        assert ids, f"no prediction ids overlap fixture GT: {sorted(res_raw)}"
        gts_tok = ptb_tokenize({i: gts_raw[i] for i in ids})
        res_tok = ptb_tokenize({i: res_raw[i] for i in ids})
        scores = {"METEOR": 0.0, "SPICE": 0.0}
        bleu, _ = Bleu(4).compute_score(gts_tok, res_tok)
        scores.update(dict(zip(["Bleu_1", "Bleu_2", "Bleu_3", "Bleu_4"], bleu)))
        scores["ROUGE_L"] = Rouge().compute_score(gts_tok, res_tok)[0]
        scores["CIDEr"] = Cider().compute_score(gts_tok, res_tok)[0]
        return scores, [], None

    import sparse_caption.utils.training as ref_training

    ref_training.evaluate_caption_json = shim_evaluate

    # neutralize the annotations-zip download (zero egress; its copy
    # destination inside the mount is read-only) — the shim above is the
    # only consumer of the annotation file
    import sparse_caption.data.mscoco as ref_mscoco

    ref_mscoco.file_utils.get_file = lambda **kw: None
    ref_mscoco.copyfile = lambda src, dst: None

    from sparse_caption.opts import parse_opt as ref_parse_opt
    from sparse_caption.utils.config import Config as RefConfig

    # load the reference's train script by file path (both repos have a
    # `scripts/` dir on sys.path — namespace resolution is ambiguous)
    import importlib.util

    spec = importlib.util.spec_from_file_location(
        "ref_train_transformer", os.path.join(REFERENCE, "scripts", "train_transformer.py"))
    ref_mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ref_mod)
    ref_main = ref_mod.main
    # the reference defines `logger` only under __main__ (its line 154), so
    # driving main() programmatically leaves eval_test's logger.info
    # (line 140) a NameError — reached only when val improves enough to
    # write model_best.pth (the fold-rotated splits do; the degenerate
    # 1-val-image default split never does)
    import logging

    ref_mod.logger = logging.getLogger("ref_train_transformer")

    argv = matched_args(log_dir, epochs, seed) + ["--id", "QUALAB"]
    config = RefConfig(**vars(ref_parse_opt(argv)))
    try:
        ref_main(config)
    except FileNotFoundError as e:
        # the reference's own test tolerates exactly this (its final
        # eval_test step wants model_best.pth which the tiny run may not
        # produce) — reference tests/test_train.py:72-77
        if "model_best" not in str(e):
            raise

    # memorization eval: greedy-decode the TRAIN images from the final ckpt
    # (the reference's eval_model classmethod restricts split to val/test,
    # utils/training.py:330-344, so drive eval_on_split directly with an
    # eval-collate generation-mode train loader — same machinery its
    # val_dataloader uses, utils/training.py:89-116)
    from torch.utils.data import DataLoader

    run_dir = os.path.join(log_dir, "QUALAB")
    cfg2 = RefConfig.load_config_json(os.path.join(run_dir, "config.json"))
    module = ref_mod.CaptioningModel(cfg2)
    module.model.load_state_dict(torch.load(os.path.join(run_dir, "model_last.pth")))
    module.model.eval()
    module.global_step = int(cfg2.get("best_global_step", 0)) or epochs
    loader = DataLoader(
        dataset=module.data.get_split("train", True),
        batch_size=cfg2.get("batch_size_eval", cfg2.batch_size),
        shuffle=False, num_workers=0, collate_fn=module.collate_fn["eval"],
        drop_last=False)
    module.eval_on_split(loader, split="train")


def make_fold_dataset(src: str, dst: str, fold: int) -> None:
    """Write a fold-rotated copy of the fixture: 2 train / 2 val / 1 test
    split labels permuted per fold, features and images symlinked.  The
    original fixture's 1-image val split is CIDEr-degenerate by
    construction (idf = log(1/df) = 0); a 2-image val corpus gives unique
    grams idf log 2, and rotating 3 folds scores 6 val decodes total."""
    os.makedirs(dst, exist_ok=True)
    with open(os.path.join(src, "dataset_coco_testing.json")) as f:
        data = json.load(f)
    imgs = sorted(data["images"], key=lambda im: im["cocoid"])
    n = len(imgs)
    order = [imgs[(fold * 2 + i) % n] for i in range(n)]
    for i, im in enumerate(order):
        im["split"] = "train" if i < 2 else ("val" if i < 4 else "test")
    with open(os.path.join(dst, "dataset_coco_testing.json"), "w") as f:
        json.dump(data, f)
    for name in ("bu", "train2014", "val2014"):
        link = os.path.join(dst, name)
        if not os.path.exists(link):
            os.symlink(os.path.join(src, name), link)


def run_folds(args) -> None:
    """--folds K: per-fold dense A/B (one seed each) gating on a
    NON-degenerate val CIDEr (VERDICT r4 item 9) next to the main
    memorization gate."""
    import shutil
    import subprocess

    shutil.rmtree(args.log_root, ignore_errors=True)
    os.makedirs(args.log_root, exist_ok=True)
    per_fold = {"ours": [], "reference": []}
    memo = {"ours": [], "reference": []}
    for k in range(args.folds):
        data_dir = os.path.join(args.log_root, f"fold{k}_data")
        make_fold_dataset(REF_DATA, data_dir, k)
        fold_root = os.path.join(args.log_root, f"fold{k}")
        env = dict(os.environ, SC_QUALITY_AB_DATA=data_dir)
        for side in ("reference", "ours"):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--only", side,
                 "--epochs", str(args.epochs), "--log_root", fold_root,
                 "--seed", str(args.seed)],
                env=env, capture_output=True, text=True, timeout=7200)
            assert r.returncode == 0, f"{side} fold {k} failed:\n{r.stderr[-4000:]}"
            side_dir = os.path.join(fold_root, f"{side}_{args.seed}")
            traj = read_trajectories(side_dir)
            per_fold[side].append({m: round(max(c for _, c in traj[m]), 4)
                                   for m in METRICS})
            memo[side].append(read_memorization_scores(side_dir))

    mean_val = {side: {m: round(sum(f[m] for f in per_fold[side]) / args.folds, 4)
                       for m in METRICS} for side in per_fold}
    mean_memo = {side: {m: round(sum(f[m] for f in memo[side]) / args.folds, 4)
                        for m in METRICS} for side in memo}
    # the val gate needs signal on the reference side to be meaningful:
    # a 2-image-trained model CAN produce all-zero val CIDEr on a fold —
    # the mean over folds is gated only when the reference shows any
    nondegenerate = mean_val["reference"]["CIDEr"] > 0
    ok_val = (not nondegenerate) or (
        mean_val["ours"]["CIDEr"] >= mean_val["reference"]["CIDEr"] * (1 - args.rel_eps)
        - 0.05)
    ok_memo = all(mean_memo["ours"][m] >= mean_memo["reference"][m] * (1 - args.rel_eps)
                  for m in ("CIDEr", "Bleu_4"))
    out = {
        "config": f"fold-rotated fixture (2 train / 2 val / 1 test x {args.folds} "
                  f"folds), transformer d32/ff64/2L, noam warmup 200, "
                  f"{args.epochs} epochs, fp32 CPU, seed {args.seed}",
        "val_best_mean": mean_val,
        "val_best_per_fold": per_fold,
        "memorization_mean": mean_memo,
        "memorization_per_fold": memo,
        "val_gate_nondegenerate": bool(nondegenerate),
        "gates": {"val_cider": bool(ok_val), "memorization": bool(ok_memo)},
        "pass": bool(ok_val and ok_memo),
    }
    line = json.dumps(out)
    print(line)
    if args.out:
        with open(args.out, "w") as f:
            f.write(line + "\n")


def main() -> None:
    ap = argparse.ArgumentParser(description=__doc__.split("\n")[0])
    ap.add_argument("--epochs", type=int, default=300)
    ap.add_argument("--rel_eps", type=float, default=0.1,
                    help="relative tolerance on across-seed mean train-split CIDEr/Bleu_4")
    ap.add_argument("--seeds", type=str, default="8888,777,42")
    ap.add_argument("--log_root", type=str, default="/tmp/sc_quality_ab")
    ap.add_argument("--only", type=str, default=None, choices=[None, "ours", "reference"])
    ap.add_argument("--seed", type=int, default=8888, help="(with --only) this run's seed")
    ap.add_argument("--folds", type=int, default=0,
                    help="rotate the 5 fixture images through K train/val folds and "
                         "gate on the (non-degenerate) mean val CIDEr")
    ap.add_argument("--out", type=str, default=None)
    args = ap.parse_args()
    if not os.path.isdir(REF_DATA):
        print(json.dumps({"error": f"reference fixture not found at {REF_DATA}"}))
        return

    if args.folds and not args.only:
        run_folds(args)
        return

    if args.only == "ours":
        run_ours(os.path.join(args.log_root, f"ours_{args.seed}"), args.epochs, args.seed)
        return
    if args.only == "reference":
        run_reference(os.path.join(args.log_root, f"reference_{args.seed}"),
                      args.epochs, args.seed)
        return

    import shutil
    import subprocess

    seeds = [int(s) for s in args.seeds.split(",") if s]
    shutil.rmtree(args.log_root, ignore_errors=True)
    os.makedirs(args.log_root, exist_ok=True)
    best = {"ours": {m: [] for m in METRICS}, "reference": {m: [] for m in METRICS}}
    memo = {"ours": {m: [] for m in METRICS}, "reference": {m: [] for m in METRICS}}
    trajectories = {}
    for seed in seeds:
        for side in ("reference", "ours"):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--only", side,
                 "--epochs", str(args.epochs), "--log_root", args.log_root,
                 "--seed", str(seed)],
                capture_output=True, text=True, timeout=7200)
            assert r.returncode == 0, f"{side} seed {seed} failed:\n{r.stderr[-4000:]}"
            side_dir = os.path.join(args.log_root, f"{side}_{seed}")
            traj = read_trajectories(side_dir)
            for m in METRICS:
                best[side][m].append(round(max(c for _, c in traj[m]), 4))
                memo[side][m].append(read_memorization_scores(side_dir)[m])
            if seed == seeds[0]:
                trajectories[side] = {m: [[s, round(c, 4)] for s, c in traj[m]]
                                      for m in METRICS}

    def means(d):
        return {side: {m: round(sum(v) / len(v), 4) for m, v in d[side].items()}
                for side in d}

    mean, mean_memo = means(best), means(memo)
    # THE quality gate is MEMORIZATION: greedy-decode the 3 TRAIN images
    # from the final checkpoint and score against their GT (3-image corpus
    # => CIDEr idf is non-degenerate). It exercises the full loop — data
    # pipeline, optimizer, schedule, decode, scoring — against a
    # deterministic target. The val split is ONE unseen image that 3
    # training images cannot teach: both frameworks emit degenerate
    # all-stopword captions there, CIDEr is 0 by construction (idf =
    # log(1/df) = 0 over a 1-image corpus), and Bleu_1/ROUGE_L only
    # measure the degenerate string's length — recorded, not gated.
    gate_metrics = ["CIDEr", "Bleu_4"]
    ok = all(mean_memo["ours"][m] >= mean_memo["reference"][m] * (1 - args.rel_eps)
             for m in gate_metrics)
    out = {
        "config": "transformer d32/ff64/2L, word tokenizer, noam warmup 200, "
                  f"{args.epochs} epochs (1 step/epoch: 3 train imgs incl. restval, "
                  "batch 2, drop_last), fp32 CPU, reference fixture, "
                  f"seeds {seeds}",
        "memorization_mean": mean_memo,
        "memorization_per_seed": memo,
        "gate": f"train-split {gate_metrics}: ours >= reference * (1 - {args.rel_eps})",
        "pass": bool(ok),
        "val_note": "1 unseen val img: CIDEr 0 by construction for both "
                    "(idf = log(1/df) = 0); Bleu_1/ROUGE_L measure degenerate "
                    "caption length only — recorded, not gated",
        "val_best_mean": mean,
        "val_best_per_seed": best,
        "first_seed_val_trajectories": trajectories,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
