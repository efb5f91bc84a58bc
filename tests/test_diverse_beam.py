"""Diverse beam search (group_size > 1): runs, returns all groups, and
produces more diverse top beams than plain beam search."""

import jax
import jax.numpy as jnp
import numpy as np

from sparse_caption_tpu.decoding import generate
from sparse_caption_tpu.models.transformer import Transformer

V, D, F, S, T = 20, 16, 8, 5, 7
KEY = jax.random.PRNGKey(0)


def setup():
    m = Transformer(vocab_size=V, d_model=D, dim_feedforward=2 * D, num_layers=1,
                    num_heads=2, att_feat_size=F, max_seq_length=T - 1)
    att = jax.random.normal(KEY, (2, S, F))
    amask = jnp.ones((2, S))
    seqs = jnp.ones((2, T), jnp.int32)
    vs = m.init({"params": KEY}, att, amask, seqs)
    mem = m.apply(vs, att, amask, method="encode")
    return m, vs, mem


def n_distinct(seq_b):
    return len({tuple(np.asarray(row).tolist()) for row in seq_b})


def test_diverse_groups_shapes_and_diversity():
    m, vs, mem = setup()
    plain, _ = jax.jit(lambda: generate(m, vs, mem, {"beam_size": 4}))()
    div, div_lp = jax.jit(
        lambda: generate(m, vs, mem, {"beam_size": 4, "group_size": 2, "diversity_lambda": 2.0})
    )()
    assert div.shape == (2, 4, T - 1) and div_lp.shape == (2, 4, T - 1)
    # with a large diversity penalty, group 2's beams differ from group 1's
    for b in range(2):
        assert n_distinct(div[b]) >= n_distinct(plain[b])
        g1 = {tuple(np.asarray(div[b, i]).tolist()) for i in range(2)}
        g2 = {tuple(np.asarray(div[b, i]).tolist()) for i in range(2, 4)}
        assert g1 != g2


def test_group_size_one_equals_plain():
    m, vs, mem = setup()
    a, _ = jax.jit(lambda: generate(m, vs, mem, {"beam_size": 3}))()
    b, _ = jax.jit(lambda: generate(m, vs, mem, {"beam_size": 3, "group_size": 1}))()
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
