"""Flag-surface completeness vs the reference CLIs.

Extracts every ``--flag`` literal from the reference's Python sources and
asserts each one either exists in this framework's sources or is on the
explicit, justified exception list below. Guards the 'a reference user
finds everything they need' contract at the CLI level.
"""

import os
import re

import pytest

REFERENCE = "/root/reference"
REPO = os.path.join(os.path.dirname(__file__), "..")

pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference mount not available")

# flags intentionally absent, with the reason (documented deltas)
EXCEPTIONS = {
    "--gpus": "CUDA device selection; TPU/JAX uses --platform / --mesh_shape",
    "--cache_dir": "reference multiprocessing cache dir; the RAM cache here is in-process",
    "--num_gpus": "as --gpus",
    "--load_as_float16": "superseded by eval_model --cast {bf16,fp16} (bf16 is the TPU dtype)",
    "--reduce_on_plateau": "declared but not implemented in the reference (opts.py dead flag)",
    "--skip_check_train_file": "reference tokenizer-cache guard; tokenizer artifacts are rebuilt deterministically here",
}


def _flags(root, subdirs):
    out = set()
    for sub in subdirs:
        for dirpath, dirnames, filenames in os.walk(os.path.join(root, sub)):
            dirnames[:] = [d for d in dirnames if d not in ("coco_caption", "__pycache__", ".git")]
            for fn in filenames:
                if fn.endswith(".py"):
                    with open(os.path.join(dirpath, fn), errors="ignore") as f:
                        out.update(re.findall(r'"(--[a-z_0-9]+)"', f.read()))
    return out


def test_every_reference_flag_is_covered():
    ref = _flags(REFERENCE, ["sparse_caption", "scripts"])
    ours = _flags(REPO, ["sparse_caption_tpu", "scripts"])
    missing = sorted(f for f in ref if f not in ours and f not in EXCEPTIONS)
    assert not missing, f"reference flags with no counterpart or documented exception: {missing}"
    # exceptions list stays honest: drop entries that became implemented
    stale = sorted(f for f in EXCEPTIONS if f in ours)
    assert not stale, f"EXCEPTIONS now implemented, remove: {stale}"


# flags whose only legitimate consumer is argparse/Config itself
_READ_EXEMPT = {
    "logging_level",  # consumed by configure_logging(args.logging_level) pre-Config
    "id",  # run-name component of log_dir, resolved at parse time (opts.py)
}


def test_every_parsed_flag_is_read_somewhere():
    """Anti-'parsed but ignored' check: every --flag our parsers declare must
    be READ as a config/args key somewhere outside its own add_argument
    line. The name-coverage test above would pass for a flag that parses
    into Config and is never looked at again; this one fails for it."""
    declared = set()
    sources = []  # (path, text)
    for sub in ("sparse_caption_tpu", "scripts"):
        for dirpath, dirnames, filenames in os.walk(os.path.join(REPO, sub)):
            dirnames[:] = [d for d in dirnames if d != "__pycache__"]
            for fn in filenames:
                if fn.endswith(".py"):
                    with open(os.path.join(dirpath, fn), errors="ignore") as f:
                        text = f.read()
                    sources.append((os.path.join(dirpath, fn), text))
                    declared.update(re.findall(r'add_argument\(\s*"--([a-z_0-9]+)"', text))
    for path in ("bench.py", "__graft_entry__.py"):
        with open(os.path.join(REPO, path), errors="ignore") as f:
            sources.append((path, f.read()))
    assert len(declared) > 80, f"flag extraction broke? found only {len(declared)}"

    unread = []
    for key in sorted(declared - _READ_EXEMPT):
        # a read looks like `.key`, `"key"` or `'key'` on a line that is not
        # the add_argument declaration; dynamic f-string reads like
        # f"beam_size_{split}" cover beam_size_val/... via the prefix
        # alternatives (`beam_size_{`)
        prefixes = [key]
        parts = key.split("_")
        for i in range(1, len(parts)):
            prefixes.append("_".join(parts[:i]) + "_")
        alts = "|".join(rf"[\"']{re.escape(p)}\{{" for p in prefixes)
        pat = re.compile(rf"(\.{key}\b|[\"']{key}[\"']|{alts})")
        hits = 0
        for _, text in sources:
            for line in text.splitlines():
                if "add_argument" in line:
                    continue
                if pat.search(line):
                    hits += 1
        if hits == 0:
            unread.append(key)
    assert not unread, f"flags parsed but never read anywhere: {unread}"
