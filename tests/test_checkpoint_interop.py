"""Published-checkpoint interop: a reference-format sparse-COO ``.pth``
(synthesized with the reference's own ``state_dict_sparse``,
pruning/prune.py:200-221) plus a SentencePiece vocabulary converts and loads
end-to-end — through scripts/convert_reference_checkpoint.py and
scripts/eval_model.py — with forward parity on the converted weights."""

import json
import os
import struct
import subprocess
import sys

import numpy as np
import pytest

REFERENCE = "/root/reference"
REPO = os.path.join(os.path.dirname(__file__), "..")
pytestmark = pytest.mark.skipif(not os.path.isdir(REFERENCE), reason="reference mount not available")


@pytest.fixture(scope="module")
def ref_prune_model():
    sys.path.insert(0, os.path.dirname(__file__))
    from test_torch_parity import ref_modules  # reuse the stubbed import fixture

    # run the fixture body directly for its reference-dep stubbing side effects
    ref_modules.__wrapped__()
    import torch
    from sparse_caption.models import get_model as ref_get_model
    from sparse_caption.utils.config import Config as RefConfig

    cfg = RefConfig(
        d_model=16, dim_feedforward=32, num_layers=2, num_heads=4,
        drop_prob_src=0.0, att_feat_size=8, max_seq_length=7, vocab_size=20,
        bos_token_id=2, eos_token_id=3, unk_token_id=1, pad_token_id=0,
        share_att_encoder=None, share_att_decoder=None,
        share_layer_encoder=None, share_layer_decoder=None,
        no_box_trigonometric_embedding=False,
        prune_type="mag_blind", prune_supermask_init=5.0, prune_mask_freeze_scope="",
        drop_prob_lm=0.0, logit_layers=1, rnn_size=16, input_encoding_size=16,
        att_hid_size=8, fc_feat_size=8,
    )
    torch.manual_seed(21)
    model = ref_get_model("relation_transformer_prune")(cfg)
    model.eval()
    model.update_masks_once(sparsity_target=0.5)
    return model


def test_sparse_pth_roundtrip_forward_parity(ref_prune_model, tmp_path):
    """reference state_dict_sparse -> convert CLI -> our model: logprob
    parity < 1e-4 against the reference's pruned forward."""
    import torch

    model = ref_prune_model
    sparse_sd = model.state_dict_sparse()  # prunes weights, drops masks, COO-sparsifies
    assert any(getattr(v, "is_sparse", False) for v in sparse_sd.values())
    pth = tmp_path / "model_best_pruned_sparse.pth"
    torch.save(sparse_sd, pth)

    out = tmp_path / "converted.msgpack"
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "convert_reference_checkpoint.py"),
         "--ckpt", str(pth), "--model_type", "relation_transformer_prune", "--out", str(out)],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert out.is_file()

    import jax.numpy as jnp

    from sparse_caption_tpu.engine.checkpoints import load_pytree
    from sparse_caption_tpu.models.relation_transformer import RelationTransformer

    ckpt = load_pytree(str(out))
    mine = RelationTransformer(vocab_size=20, d_model=16, dim_feedforward=32, num_layers=2,
                               num_heads=4, att_feat_size=8, max_seq_length=7, drop_prob_src=0.0)
    rng = np.random.default_rng(42)
    att = rng.standard_normal((2, 5, 8)).astype(np.float32)
    amask = np.ones((2, 5), np.float32)
    boxes = rng.uniform(0.05, 0.95, (2, 5, 4)).astype(np.float32)
    seqs = np.array([[2, 4, 5, 6, 7, 3, 0], [2, 8, 9, 3, 0, 0, 0]], np.int64)
    with torch.no_grad():
        ref_out = model(att_feats=torch.tensor(att), boxes=torch.tensor(boxes),
                        seqs=torch.tensor(seqs), att_masks=torch.tensor(amask), mode="forward")
    out_j = mine.apply({"params": ckpt["params"]}, jnp.asarray(att), jnp.asarray(amask),
                       jnp.asarray(seqs, jnp.int32), boxes=jnp.asarray(boxes))
    d = float(np.max(np.abs(ref_out.numpy() - np.asarray(out_j))))
    assert d < 1e-4, f"converted sparse checkpoint mismatch {d}"
    # the sparsity actually survived the round trip
    kernels = [np.asarray(x) for x in _kernel_leaves(ckpt["params"])]
    zeros = sum((k == 0).sum() for k in kernels)
    total = sum(k.size for k in kernels)
    assert zeros / total > 0.3


def _kernel_leaves(params):
    import jax

    flat = jax.tree_util.tree_flatten_with_path(params)[0]
    for path, leaf in flat:
        names = [getattr(k, "key", str(k)) for k in path]
        if names[-1] in ("kernel", "embedding") and leaf.ndim == 2:
            yield leaf


# ------------------------------------------------------------------ SPM vocab
def _encode_spm_model(pieces):
    """Hand-encode a SentencePiece ModelProto with the given (piece, type)
    pairs — the same wire format the real library writes."""
    def varint(n):
        out = b""
        while True:
            b7 = n & 0x7F
            n >>= 7
            out += bytes([b7 | (0x80 if n else 0)])
            if not n:
                return out

    buf = b""
    for piece, ptype in pieces:
        pb = piece.encode("utf-8")
        msg = bytes([0x0A]) + varint(len(pb)) + pb  # field 1: piece
        msg += bytes([0x15]) + struct.pack("<f", 0.0)  # field 2: score (fixed32)
        msg += bytes([0x18]) + varint(ptype)  # field 3: type
        buf += bytes([0x0A]) + varint(len(msg)) + msg  # ModelProto.pieces
    return buf


def test_spm_vocab_import_preserves_reference_ordering(tmp_path):
    from sparse_caption_tpu.config import Config
    from sparse_caption_tpu.tokenizers.spm_import import (
        parse_sentencepiece_model,
        pieces_to_word_vocab,
        write_word_vocab_artifact,
    )
    from sparse_caption_tpu.tokenizers.word import WordTokenizer

    sp_pieces = [("<pad>", 3), ("<unk>", 2), ("<s>", 3), ("</s>", 3),
                 ("▁a", 1), ("▁dog", 1), ("▁man", 1)]
    model_path = tmp_path / "word.model"
    model_path.write_bytes(_encode_spm_model(sp_pieces))

    pieces = parse_sentencepiece_model(str(model_path))
    assert pieces == ["<pad>", "<unk>", "<s>", "</s>", "▁a", "▁dog", "▁man"]
    vocab = pieces_to_word_vocab(pieces)
    assert vocab == ["<pad>", "<unk>", "<bos>", "<eos>", "a", "dog", "man"]

    # a subword-style model whose pieces collapse after marker stripping
    # must be rejected (the word tokenizer maps string -> LAST id, so a
    # collision silently re-maps the earlier piece's embedding row)
    import pytest

    with pytest.raises(ValueError, match="duplicate"):
        pieces_to_word_vocab(["<pad>", "<unk>", "<s>", "</s>", "▁dog", "dog"])

    run_dir = tmp_path / "run"
    write_word_vocab_artifact(vocab, str(run_dir / "tokenizer"))
    tok = WordTokenizer(Config(log_dir=str(run_dir), vocab_size=len(vocab)))
    assert tok.token_to_id("dog") == 5  # the reference SP id, not retrain order
    assert tok.encode("a dog", add_bos_eos=True, max_seq_length=8) == [2, 4, 5, 3]
    assert tok.decode([2, 6, 5, 3]) == "man dog"


def test_converted_checkpoint_drives_eval_model(ref_prune_model, tmp_path):
    """Full interop flow: sparse .pth + SP vocab -> convert CLI -> a run dir
    that scripts/eval_model.py evaluates end-to-end (beam decode + metrics)."""
    import torch

    sys.path.insert(0, os.path.join(REPO, "scripts", "dataset"))
    from make_test_fixtures import make_fixtures

    dataset = make_fixtures(str(tmp_path / "data"), att_feat_size=8, max_regions=5)

    model = ref_prune_model
    pth = tmp_path / "sparse.pth"
    torch.save(model.state_dict_sparse(), pth)
    run_dir = tmp_path / "run"
    spm = tmp_path / "word.model"
    # reference-ordered vocab: specials + a few caption words (rest are unk)
    words = ["a", "man", "dog", "horse", "riding", "on", "beach", "couch",
             "sitting", "playing", "with", "ball", "people", "group", "of", "the"]
    spm.write_bytes(_encode_spm_model(
        [("<pad>", 3), ("<unk>", 2), ("<s>", 3), ("</s>", 3)] + [("▁" + w, 1) for w in words]))

    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "convert_reference_checkpoint.py"),
         "--ckpt", str(pth), "--model_type", "relation_transformer_prune",
         "--out", str(run_dir / "model_best.msgpack"), "--spm_model", str(spm)],
        capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stderr[-3000:]

    from sparse_caption_tpu.config import Config

    cfg = Config(
        caption_model="relation_transformer", dataset="mscoco_testing", dataset_dir=dataset,
        log_dir=str(run_dir), tokenizer="word", vocab_size=20, batch_size=2, batch_size_eval=2,
        max_epochs=1, max_seq_length=7, max_att_regions=5, att_feat_size=8, seq_per_img=3,
        d_model=16, dim_feedforward=32, num_layers=2, num_heads=4, drop_prob_src=0.0,
        cache_min_free_ram=1.0, save_checkpoint_every=1,
    )
    cfg.save_config(str(run_dir), exist_ok=True)

    # --platform cpu, NOT the JAX_PLATFORMS env: the axon TPU plugin's
    # sitecustomize ignores the env var, so without the flag this subprocess
    # silently runs on the tunneled TPU and inherits the relay's
    # nondeterministic 30-500 s compile stalls (flaky CI timeout).
    r = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "eval_model.py"),
         "--log_dir", str(run_dir), "--ckpt", "best", "--split", "val", "--beam_size", "3",
         "--platform", "cpu"],
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "CIDEr" in r.stdout
