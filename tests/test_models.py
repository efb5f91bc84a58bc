"""Model tests: XE shapes, cached-decode parity, layer/attention sharing,
generation loops (parity model: reference decode paths + new JAX-specific
jit/cache-parity checks per SURVEY §4)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from sparse_caption_tpu.decoding import generate
from sparse_caption_tpu.models import get_model
from sparse_caption_tpu.models.relation_transformer import RelationTransformer
from sparse_caption_tpu.models.transformer import Transformer
from sparse_caption_tpu.models.up_down import UpDownModel

V, D, F, S, T = 20, 16, 8, 5, 7
KEY = jax.random.PRNGKey(0)


def tiny_transformer(**kw):
    return Transformer(vocab_size=V, d_model=D, dim_feedforward=2 * D, num_layers=2,
                       num_heads=4, att_feat_size=F, max_seq_length=T - 1, **kw)


def tiny_ort(**kw):
    return RelationTransformer(vocab_size=V, d_model=D, dim_feedforward=2 * D, num_layers=2,
                               num_heads=4, att_feat_size=F, max_seq_length=T - 1, **kw)


def tiny_updown(**kw):
    return UpDownModel(vocab_size=V, rnn_size=D, input_encoding_size=D, att_hid_size=D,
                       fc_feat_size=F, att_feat_size=F, max_seq_length=T - 1, **kw)


@pytest.fixture(scope="module")
def batch():
    att = jax.random.normal(KEY, (2, S, F))
    amask = jnp.ones((2, S)).at[1, 3:].set(0.0)
    fc = jax.random.normal(jax.random.fold_in(KEY, 1), (2, F))
    boxes = jax.random.uniform(jax.random.fold_in(KEY, 2), (2, S, 4))
    seqs = jnp.array([[2, 4, 5, 6, 3, 0, 0], [2, 7, 8, 9, 10, 3, 0]], dtype=jnp.int32)
    return att, amask, fc, boxes, seqs


def _init(m, att, amask, seqs, **kw):
    return m.init({"params": KEY}, att, amask, seqs, **kw)


class TestTransformer:
    def test_xe_shapes_and_normalization(self, batch):
        att, amask, fc, boxes, seqs = batch
        m = tiny_transformer()
        vs = _init(m, att, amask, seqs)
        lp = jax.jit(lambda v: m.apply(v, att, amask, seqs))(vs)
        assert lp.shape == (2, T - 1, V)
        np.testing.assert_allclose(np.exp(np.asarray(lp)).sum(-1), 1.0, rtol=1e-4)

    def test_seq_per_img_repeat(self, batch):
        att, amask, fc, boxes, seqs = batch
        m = tiny_transformer()
        vs = _init(m, att, amask, seqs)
        seqs4 = jnp.concatenate([seqs, seqs], 0)
        lp = jax.jit(lambda v: m.apply(v, att, amask, seqs4))(vs)
        assert lp.shape == (4, T - 1, V)

    def test_cache_parity_exact(self, batch):
        """Incremental KV-cache decode must equal full teacher forcing."""
        att, amask, fc, boxes, seqs = batch
        m = tiny_transformer()
        vs = _init(m, att, amask, seqs)

        @jax.jit
        def diff(vs):
            full = m.apply(vs, att, amask, seqs)
            enc = m.apply(vs, att, amask, method="encode")
            cache = m.apply(vs, enc, method="init_cache")
            lps = []
            for t in range(4):
                lp, cache = m.apply(vs, seqs[:, t], cache, t, enc, method="decode_step")
                lps.append(lp)
            return jnp.max(jnp.abs(full[:, :4] - jnp.stack(lps, 1)))

        assert float(diff(vs)) < 1e-5

    def test_cache_parity_exact_kv_shared(self, batch):
        """ACORT's kv-shared attention caches ONE K/V array (K == V under
        the kv projection) — incremental decode must still equal full
        teacher forcing, and the cache must actually be deduplicated."""
        att, amask, fc, boxes, seqs = batch
        m = tiny_transformer(share_att_encoder="kv", share_att_decoder="kv")
        vs = _init(m, att, amask, seqs)
        enc = m.apply(vs, att, amask, method="encode")
        cache = m.apply(vs, enc, method="init_cache")
        for entry in cache["layers"]:
            assert "self_v" not in entry  # single-array self cache
        for entry in cache["static"]["cross"]:
            assert "cross_v" not in entry  # single-array cross cache

        @jax.jit
        def diff(vs):
            full = m.apply(vs, att, amask, seqs)
            enc = m.apply(vs, att, amask, method="encode")
            cache = m.apply(vs, enc, method="init_cache")
            lps = []
            for t in range(4):
                lp, cache = m.apply(vs, seqs[:, t], cache, t, enc, method="decode_step")
                lps.append(lp)
            return jnp.max(jnp.abs(full[:, :4] - jnp.stack(lps, 1)))

        assert float(diff(vs)) < 1e-5

    def test_kv_shared_beam_decode(self, batch):
        """Beam search (ancestry mode) over the deduplicated kv cache."""
        att, amask, fc, boxes, seqs = batch
        m = tiny_transformer(share_att_encoder="kv", share_att_decoder="kv")
        vs = _init(m, att, amask, seqs)
        enc = m.apply(vs, att, amask, method="encode")
        seq, lp = jax.jit(lambda: generate(m, vs, enc, {"beam_size": 3}))()
        assert seq.shape == (2, 3, T - 1)
        assert not (np.asarray(seq[0, 0]) == np.asarray(seq[0, 1])).all()

    def test_layer_sharing_param_count(self, batch):
        att, amask, fc, boxes, seqs = batch
        full = tiny_transformer()
        shared = tiny_transformer(share_layer_encoder=(0, 0), share_layer_decoder=(0, 0))
        n_full = sum(x.size for x in jax.tree.leaves(_init(full, att, amask, seqs)))
        n_shared = sum(x.size for x in jax.tree.leaves(_init(shared, att, amask, seqs)))
        assert n_shared < n_full

    def test_share_att_param_count(self, batch):
        att, amask, fc, boxes, seqs = batch
        kv = tiny_transformer(share_att_encoder="kv", share_att_decoder="kv")
        n_base = sum(x.size for x in jax.tree.leaves(_init(tiny_transformer(), att, amask, seqs)))
        n_kv = sum(x.size for x in jax.tree.leaves(_init(kv, att, amask, seqs)))
        assert n_kv < n_base


class TestRelationTransformer:
    def test_xe_and_cache_parity(self, batch):
        att, amask, fc, boxes, seqs = batch
        m = tiny_ort()
        vs = m.init({"params": KEY}, att, amask, seqs, boxes=boxes)

        @jax.jit
        def run(vs):
            full = m.apply(vs, att, amask, seqs, boxes=boxes)
            enc = m.apply(vs, att, amask, boxes, method="encode")
            cache = m.apply(vs, enc, method="init_cache")
            lps = []
            for t in range(4):
                lp, cache = m.apply(vs, seqs[:, t], cache, t, enc, method="decode_step")
                lps.append(lp)
            return full, jnp.max(jnp.abs(full[:, :4] - jnp.stack(lps, 1)))

        full, d = run(vs)
        assert full.shape == (2, T - 1, V)
        assert float(d) < 1e-5

    def test_box_geometry_affects_output(self, batch):
        att, amask, fc, boxes, seqs = batch
        m = tiny_ort()
        vs = m.init({"params": KEY}, att, amask, seqs, boxes=boxes)
        lp1 = m.apply(vs, att, amask, seqs, boxes=boxes)
        lp2 = m.apply(vs, att, amask, seqs, boxes=boxes * 0.3 + 0.1)
        assert float(jnp.max(jnp.abs(lp1 - lp2))) > 1e-6


class TestUpDown:
    def test_xe_shapes(self, batch):
        att, amask, fc, boxes, seqs = batch
        m = tiny_updown()
        vs = m.init({"params": KEY}, att, amask, seqs, fc_feats=fc)
        lp = jax.jit(lambda v: m.apply(v, att, amask, seqs, fc_feats=fc))(vs)
        assert lp.shape == (2, T - 1, V)
        np.testing.assert_allclose(np.exp(np.asarray(lp)).sum(-1), 1.0, rtol=1e-4)

    def test_xe_decode_consistency(self, batch):
        """Teacher-forced unroll must match step-by-step decode_step calls."""
        att, amask, fc, boxes, seqs = batch
        m = tiny_updown()
        vs = m.init({"params": KEY}, att, amask, seqs, fc_feats=fc)

        @jax.jit
        def run(vs):
            full = m.apply(vs, att, amask, seqs, fc_feats=fc)
            mem = m.apply(vs, att, amask, fc, method="encode")
            cache = m.apply(vs, mem, method="init_cache")
            lps = []
            for t in range(T - 1):
                lp, cache = m.apply(vs, seqs[:, t], cache, t, mem, method="decode_step")
                lps.append(lp)
            return jnp.max(jnp.abs(full - jnp.stack(lps, 1)))

        assert float(run(vs)) < 1e-5

    def test_scheduled_sampling_runs(self, batch):
        att, amask, fc, boxes, seqs = batch
        m = tiny_updown(ss_prob=0.5)
        vs = m.init({"params": KEY}, att, amask, seqs, fc_feats=fc)
        lp = m.apply(vs, att, amask, seqs, fc_feats=fc, train=True,
                     rngs={"ss": KEY, "dropout": KEY})
        assert lp.shape == (2, T - 1, V)


class TestGeneration:
    @pytest.fixture(scope="class")
    def model_and_memory(self):
        att = jax.random.normal(KEY, (2, S, F))
        amask = jnp.ones((2, S))
        seqs = jnp.array([[2, 4, 5, 3, 0, 0, 0], [2, 7, 8, 9, 3, 0, 0]], dtype=jnp.int32)
        m = tiny_transformer()
        vs = m.init({"params": KEY}, att, amask, seqs)
        mem = m.apply(vs, att, amask, method="encode")
        return m, vs, mem

    def test_greedy(self, model_and_memory):
        m, vs, mem = model_and_memory
        seq, lp = jax.jit(lambda: generate(m, vs, mem, {"beam_size": 1}))()
        assert seq.shape == (2, 1, T - 1) and lp.shape == (2, 1, T - 1)
        seq = np.asarray(seq)
        # pad-after-eos structure
        for row in seq[:, 0]:
            if (row == 3).any():
                e = int(np.argmax(row == 3))
                assert (row[e + 1:] == 0).all()

    def test_random_sampling(self, model_and_memory):
        m, vs, mem = model_and_memory
        seq, lp = jax.jit(
            lambda: generate(m, vs, mem, {"beam_size": 0, "num_random_sample": 3, "temperature": 1.0},
                             rng=jax.random.PRNGKey(5))
        )()
        assert seq.shape == (2, 3, T - 1)
        # different samples should not all be identical
        assert not (np.asarray(seq[0, 0]) == np.asarray(seq[0, 1])).all() or not (
            np.asarray(seq[0, 0]) == np.asarray(seq[0, 2])
        ).all()

    def test_beam_search(self, model_and_memory):
        m, vs, mem = model_and_memory
        seq, lp = jax.jit(lambda: generate(m, vs, mem, {"beam_size": 3}))()
        assert seq.shape == (2, 3, T - 1)
        seq = np.asarray(seq)
        # beams are distinct and every finished beam ends with eos then pads
        assert not (seq[0, 0] == seq[0, 1]).all()
        for b in range(2):
            for kk in range(3):
                row = seq[b, kk]
                if (row == 3).any():  # eos'd beams: pads after eos
                    e = int(np.argmax(row == 3))
                    assert (row[e + 1:] == 0).all()
                else:  # length-forced beams carry max_len real tokens
                    assert (row != 0).all()

    def test_row_topk_modes_agree(self):
        """The beam step's V-wide top-k strategies (decoding/beam.py
        _row_topk): bf16-select returns the exact f32 values for its
        winners, and agrees with exact top-k away from sub-ulp ties."""
        from sparse_caption_tpu.decoding import beam as beam_mod

        rng = np.random.default_rng(0)
        scores = jnp.asarray(rng.standard_normal((64, 1000)) * 4, jnp.float32)
        k = 5
        v_exact, i_exact = jax.lax.top_k(scores, k)
        # the mode env var is read at trace time (post-import settings work)
        import os as _os

        old = _os.environ.get("SPARSE_CAPTION_BEAM_TOPK")
        _os.environ["SPARSE_CAPTION_BEAM_TOPK"] = "bf16"
        try:
            v_b, i_b = beam_mod._row_topk(scores, k)
        finally:
            if old is None:
                _os.environ.pop("SPARSE_CAPTION_BEAM_TOPK", None)
            else:
                _os.environ["SPARSE_CAPTION_BEAM_TOPK"] = old
        # values are true f32 gathers, not bf16-rounded
        np.testing.assert_array_equal(
            np.asarray(v_b), np.take_along_axis(np.asarray(scores), np.asarray(i_b), axis=1))
        # winner SETS match wherever no two candidates tie within a bf16 ulp
        for r in range(scores.shape[0]):
            se, sb = set(np.asarray(i_exact[r])), set(np.asarray(i_b[r]))
            if se != sb:
                disputed = (se | sb) - (se & sb)
                vals = np.sort([float(scores[r, i]) for i in disputed])
                assert np.max(np.diff(vals)) < np.abs(vals).max() * 2 ** -7

    def test_beam_top1_beats_greedy_score(self, model_and_memory):
        """Beam-1 top candidate == greedy (same argmax path)."""
        m, vs, mem = model_and_memory
        g_seq, g_lp = jax.jit(lambda: generate(m, vs, mem, {"beam_size": 1}))()
        b_seq, b_lp = jax.jit(lambda: generate(m, vs, mem, {"beam_size": 3}))()
        g_score = np.asarray((g_lp[:, 0] * (np.asarray(g_seq[:, 0]) != 0)).sum(-1))
        b_score = np.asarray((b_lp[:, 0] * (np.asarray(b_seq[:, 0]) != 0)).sum(-1))
        assert (b_score >= g_score - 1e-4).all()

    def test_decoding_constraint(self, model_and_memory):
        m, vs, mem = model_and_memory
        seq, _ = jax.jit(lambda: generate(m, vs, mem, {"beam_size": 1, "decoding_constraint": 1}))()
        row = np.asarray(seq[0, 0])
        nz = row[row != 0]
        assert all(nz[i] != nz[i + 1] for i in range(len(nz) - 1))
