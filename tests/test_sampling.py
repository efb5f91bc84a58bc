"""sample_next_word variants (greedy / gumbel / top-k / nucleus) — parity
with the reference ``CaptionModel.sample_next_word`` (caption_model.py:228-268)
and functional behavior through the decode loop."""

import os
import sys
import types

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from sparse_caption_tpu.decoding.sample import modified_sample_logits, sample_next_word

REFERENCE = "/root/reference"


def _rand_logprobs(b=4, v=12, seed=0):
    rng = np.random.default_rng(seed)
    logits = rng.standard_normal((b, v)).astype(np.float32) * 2.0
    return jax.nn.log_softmax(jnp.asarray(logits), axis=-1)


@pytest.fixture(scope="module")
def ref_sample_next_word():
    if not os.path.isdir(REFERENCE):
        pytest.skip("reference mount not available")
    for name, mod in {
        "sentencepiece": dict(SentencePieceTrainer=object, SentencePieceProcessor=object),
        "tqdm": dict(tqdm=lambda x, **k: x),
    }.items():
        m = types.ModuleType(name)
        for k, v in mod.items():
            setattr(m, k, v)
        sys.modules.setdefault(name, m)
    if "pkg_resources" not in sys.modules:
        import packaging
        import packaging.version  # noqa: F401

        pr = types.ModuleType("pkg_resources")
        pr.packaging = packaging
        sys.modules["pkg_resources"] = pr
    if "torchvision" not in sys.modules:
        tv = types.ModuleType("torchvision")
        tvt = types.ModuleType("torchvision.transforms")

        class _Compose:
            def __init__(self, *a, **k):
                pass

        tvt.Compose = _Compose
        tv.transforms = tvt
        sys.modules["torchvision"] = tv
        sys.modules["torchvision.transforms"] = tvt
    sys.path.insert(0, REFERENCE)
    from sparse_caption.models.caption_model import CaptionModel

    return CaptionModel.sample_next_word


def _capture_ref_modified_logits(ref_fn, logprobs_np, method, temperature):
    """Run the reference sample_next_word with Categorical stubbed out so the
    final (modified) sampling logits are captured instead of sampled from."""
    import torch

    captured = {}

    class _FakeCategorical:
        def __init__(self, logits=None):
            captured["logits"] = logits.detach().clone()
            self._logits = logits

        def sample(self):
            return torch.argmax(self._logits, dim=1)

    real = torch.distributions.Categorical
    torch.distributions.Categorical = _FakeCategorical
    try:
        it, lp = ref_fn(torch.tensor(logprobs_np), method, temperature)
    finally:
        torch.distributions.Categorical = real
    return captured["logits"].numpy(), it.numpy(), lp.numpy().reshape(-1)


@pytest.mark.parametrize("method,temperature", [
    ("top3", 1.0), ("top5", 0.7), ("top0.9", 1.0), ("top0.5", 1.3),
])
def test_modified_logits_match_reference(ref_sample_next_word, method, temperature):
    lp = _rand_logprobs()
    ref_logits, ref_it, ref_lp = _capture_ref_modified_logits(
        ref_sample_next_word, np.asarray(lp), method, temperature
    )
    ours = np.asarray(modified_sample_logits(lp, method, temperature))
    # -inf-masked entries: same mask; kept entries: same values
    ref_masked = ~np.isfinite(ref_logits)
    our_masked = ours <= -1e29
    np.testing.assert_array_equal(ref_masked, our_masked)
    np.testing.assert_allclose(
        np.where(our_masked, 0.0, ours), np.where(ref_masked, 0.0, ref_logits), atol=1e-5
    )
    # the deterministic argmax decision + its gathered logprob also agree
    it = np.argmax(np.where(our_masked, -np.inf, ours), axis=-1)
    np.testing.assert_array_equal(ref_it, it)
    np.testing.assert_allclose(ref_lp, np.take_along_axis(ours, it[:, None], axis=1)[:, 0], atol=1e-5)


def test_greedy_matches_reference(ref_sample_next_word):
    import torch

    lp = _rand_logprobs(seed=3)
    ref_it, ref_lp = ref_sample_next_word(torch.tensor(np.asarray(lp)), "greedy", 1.0)
    it, chosen = sample_next_word(lp, "greedy", 1.0, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(ref_it.numpy(), np.asarray(it))
    np.testing.assert_allclose(ref_lp.numpy(), np.asarray(chosen), atol=1e-6)


def test_gumbel_is_argmax_of_perturbed_logits():
    """Gumbel sampling = argmax(logprobs + g) with sample_logprobs gathered
    from the ORIGINAL logprobs (reference caption_model.py:233-243)."""
    lp = _rand_logprobs(seed=5)
    key = jax.random.PRNGKey(42)
    it, chosen = sample_next_word(lp, "gumbel", 0.5, key)
    eps = 1e-20
    u = jax.random.uniform(key, lp.shape)
    g = -jnp.log(-jnp.log(u + eps) + eps)
    np.testing.assert_array_equal(np.asarray(jnp.argmax(lp + g, axis=-1)), np.asarray(it))
    np.testing.assert_allclose(
        np.asarray(jnp.take_along_axis(lp, it[:, None].astype(int), axis=-1)[:, 0]),
        np.asarray(chosen), atol=1e-6,
    )


def test_topk_sampling_stays_in_topk():
    lp = _rand_logprobs(b=16, v=10, seed=7)
    top2 = np.argsort(-np.asarray(lp), axis=-1)[:, :2]
    for s in range(8):
        it, _ = sample_next_word(lp, "top2", 1.0, jax.random.PRNGKey(s))
        for b in range(lp.shape[0]):
            assert int(it[b]) in top2[b]


def test_sample_method_through_generate(fixture_dataset, tmp_path):
    """sample_method plumbs from config through generate() (top-k variant)."""
    from sparse_caption_tpu.config import Config
    from sparse_caption_tpu.decoding import generate
    from sparse_caption_tpu.models.transformer import Transformer

    model = Transformer(vocab_size=16, d_model=8, dim_feedforward=16, num_layers=1,
                        num_heads=2, att_feat_size=4, max_seq_length=6, drop_prob_src=0.0)
    att = jnp.asarray(np.random.default_rng(0).standard_normal((2, 3, 4)), jnp.float32)
    amask = jnp.ones((2, 3))
    variables = model.init({"params": jax.random.PRNGKey(0)}, att, amask,
                           jnp.zeros((2, 6), jnp.int32))
    memory = model.apply({"params": variables["params"]}, att, amask, method="encode")
    opt = {"num_random_sample": 3, "beam_size": 0, "max_seq_length": 5,
           "sample_method": "top3", "temperature": 0.8}
    seq, seq_lp = generate(model, {"params": variables["params"]}, memory, opt,
                           rng=jax.random.PRNGKey(1))
    assert seq.shape == (2, 3, 5) and seq_lp.shape == (2, 3, 5)
    assert np.asarray(seq).min() >= 0


def test_opts_expose_sampling_flags(fixture_dataset):
    from sparse_caption_tpu.opts import parse_opt

    args = parse_opt([
        "--caption_model", "transformer", "--dataset", "mscoco_testing",
        "--dataset_dir", fixture_dataset,
        "--num_random_sample", "4", "--temperature", "0.7",
        "--sample_method", "top0.9", "--ss_prob", "0.25",
    ])
    assert args.num_random_sample == 4
    assert args.temperature == 0.7
    assert args.sample_method == "top0.9"
    assert args.ss_prob == 0.25
