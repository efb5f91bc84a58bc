"""Learning sanity: overfitting the 2-image fixture must drive the XE loss
down and make greedy decode reproduce exact ground-truth captions — wires
together model, optimizer, schedule, decode, and tokenizer round-trip."""

import jax
import jax.numpy as jnp
import numpy as np

from sparse_caption_tpu.config import Config
from sparse_caption_tpu.engine.training import TrainingModule
from sparse_caption_tpu.opts import parse_opt


def test_overfit_fixture(fixture_dataset, tmp_path):
    args = parse_opt([
        "--caption_model", "relation_transformer", "--dataset", "mscoco_testing",
        "--dataset_dir", fixture_dataset, "--log_dir", str(tmp_path),
        "--vocab_size", "64", "--batch_size", "2", "--batch_size_eval", "2",
        "--max_epochs", "250", "--max_seq_length", "12", "--save_checkpoint_every", "100000",
        "--max_att_regions", "8", "--att_feat_size", "16", "--seq_per_img", "5",
        "--d_model", "32", "--dim_feedforward", "64", "--num_layers", "2", "--num_heads", "4",
        "--lr_scheduler", "noam", "--noamopt_warmup", "100", "--cache_min_free_ram", "1.0",
        "--drop_prob_src", "0.1",
    ])
    m = TrainingModule(Config(**vars(args)))
    m.prepare()
    m.init_state()
    xe = m.make_xe_step()
    rng = jax.random.PRNGKey(0)
    first = last = None
    for _ in range(250):
        for batch in m.train_loader:
            rng, k = jax.random.split(rng)
            m.state, loss, _ = xe(m.state, m._model_inputs(batch), jnp.asarray(batch["masks"]), k)
        if first is None:
            first = float(loss)
        last = float(loss)
    assert last < first * 0.3, (first, last)

    decode = m._cached_decode("eval_beam1", {"beam_size": 1})
    batch = next(iter(m.get_loader("train", train=False)))
    seq, _ = decode(m._variables(m.state), m._model_inputs(batch, with_seqs=False), jax.random.PRNGKey(0))
    memorized = 0
    for i in range(batch["batch_valid"]):
        pred = m.tokenizer.decode(np.asarray(seq[i, 0]))
        memorized += pred in batch["gts"][i]
    assert memorized >= 1, "overfit model failed to reproduce any training caption"


def test_scst_improves_cider():
    """The paper's training recipe rests on SCST raising CIDEr after XE
    pre-training (reference README.md:84-96 gains ~10 CIDEr from SCST on
    the dense baselines). The equivalence tests prove our REINFORCE update
    matches the fused oracle; this pins the OPTIMIZATION claim itself:
    from an under-trained XE start on a memorizable synthetic task,
    device-reward SCST must raise the greedy-decode CIDEr-D (paper-scale
    on-chip trajectory: scripts/check_scst_improves.py, STATUS.md)."""
    import json
    import os
    import subprocess
    import sys as _sys

    r = subprocess.run(
        [_sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "scripts", "check_scst_improves.py"),
         "--platform", "cpu", "--d_model", "32", "--dim_feedforward", "64",
         "--num_layers", "1", "--num_heads", "2", "--vocab_size", "64",
         "--att_feat_size", "16", "--regions", "4", "--max_len", "9",
         "--images", "8", "--batch_images", "4", "--xe_steps", "120",
         "--scst_steps", "120", "--scst_num_samples", "8", "--eval_every", "40"],
        capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["improved"], out
    assert out["cider_after"] > out["cider_before"], out


def test_sparse_quality_pipeline():
    """End-to-end paper pipeline probe (scripts/check_sparse_quality.py):
    dense warmup -> matched-horizon [dense control | supermask prune] arms
    -> binarize -> mask-freeze SCST, all scored with greedy CIDEr-D. At
    this toy scale (d32/1L, 90% target) the test pins the MECHANICS — the
    sparsity endpoint and the sparse model staying in the dense control's
    quality neighborhood; the paper-scale quality verdicts live in the
    on-chip artifact (resources/sparse_quality_ort512.json, STATUS.md)."""
    import json
    import os
    import subprocess
    import sys as _sys

    r = subprocess.run(
        [_sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "scripts", "check_sparse_quality.py"),
         "--platform", "cpu", "--d_model", "32", "--dim_feedforward", "64",
         "--num_layers", "1", "--num_heads", "2", "--vocab_size", "64",
         "--att_feat_size", "16", "--regions", "4", "--max_len", "9",
         "--images", "8", "--batch_images", "4", "--xe_steps", "200",
         "--prune_steps", "1000", "--chunk", "20", "--sparsity_target", "0.9",
         "--sparsity_weight", "30", "--scst_steps", "40",
         "--scst_batch_images", "4", "--scst_num_samples", "16"],
        capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["sparsity_on_target"], out
    # the supermask arm must stay in the dense control's quality
    # neighborhood (paper-scale chips land ~1.0x; toy d32@90% gives ~0.84)
    assert out["cider_sparse"] >= 0.7 * out["cider_dense_control"], out
    # SCST on an at-ceiling toy model may wobble but must not collapse
    assert out["cider_sparse_scst"] >= 0.7 * out["cider_sparse"], out
