#!/usr/bin/env python
"""SCST teacher-forced-replay fidelity on the CURRENT backend.

The dense SCST gradient pass replays the whole train-mode sampling decode
in one parallel forward (TimeDropout replay; engine/training.py
make_scst_step). On CPU the replay is exact to float rounding; on TPU the
MXU's internal bf16 matmul passes reassociate differently between the
grouped step path and the parallel path, leaving a small residual. This
script measures that residual at paper scale (dense ORT, B=5 x 15
samples) over every loss-relevant (non-pad) token position.

Recorded TPU v5e result: max |dlogprob| 5.5e-3, mean 9.0e-4, max relative
error 6.0e-4 (STATUS.md) — gradient-quality noise far below the REINFORCE
estimator's own variance.
"""

import os
import sys
import time  # noqa: F401

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
from sparse_caption_tpu.utils.jax_setup import enable_persistent_cache
enable_persistent_cache()
import jax, jax.numpy as jnp, numpy as np
import bench
from sparse_caption_tpu.decoding import generate
from sparse_caption_tpu.decoding.api import decode_train_keys

model, *_ = bench._make_train_pieces(jax, jnp, prune=False)
REGIONS, FEAT, MAX_LEN, VOCAB = bench.REGIONS, bench.FEAT, bench.MAX_LEN, bench.VOCAB
b, S, t = 5, 15, MAX_LEN
rng = np.random.default_rng(2)
att = jnp.asarray(rng.standard_normal((b, REGIONS, FEAT)), jnp.float32)
amask = jnp.ones((b, REGIONS), jnp.float32)
boxes = jnp.asarray(rng.uniform(0, 1, (b, REGIONS, 4)), jnp.float32)
seqs0 = jnp.asarray(rng.integers(4, VOCAB, (b, t + 1)), jnp.int32)
variables = model.init({"params": jax.random.PRNGKey(3)}, att, amask, seqs0, boxes=boxes)
sample_opt = {"num_random_sample": S, "beam_size": 0, "max_seq_length": t,
              "temperature": 1.0, "decode_train": True}

@jax.jit
def phase1(variables, key):
    kd, km, kdec = jax.random.split(key, 3)
    memory = model.apply(variables, att, amask, boxes, train=True,
                         rngs={"dropout": kd, "mask": km}, method="encode")
    seq, seq_lp = generate(model, variables, memory, sample_opt, rng=kdec)
    return seq, seq_lp

@jax.jit
def phase2(variables, key, seq):
    kd, km, kdec = jax.random.split(key, 3)
    memory = model.apply(variables, att, amask, boxes, train=True,
                         rngs={"dropout": kd, "mask": km}, method="encode")
    _, dropout_key, _, _ = decode_train_keys(kdec)
    n = b * S
    flat = seq.reshape(n, t)
    seqs_in = jnp.concatenate([jnp.full((n, 1), model.bos_id, jnp.int32), flat], axis=1)
    lp = model.apply(variables, memory, seqs_in, True,
                     method="decode_teacher_forced", rngs={"dropout": dropout_key})
    return jnp.take_along_axis(lp, flat[..., None], axis=2)[..., 0]

key = jax.random.PRNGKey(9)
seq, seq_lp = phase1(variables, key)
lp_tf = phase2(variables, key, seq)
seq, seq_lp, lp_tf = map(np.asarray, (seq, seq_lp, lp_tf))
flat = seq.reshape(b * S, t)
valid = flat != model.pad_id
d = np.abs(lp_tf - seq_lp.reshape(b * S, t))[valid]
rel = d / np.maximum(np.abs(seq_lp.reshape(b * S, t))[valid], 1e-6)
print(f"TPU f32-stored: positions={valid.sum()}  max|dlp|={d.max():.3e}  mean|dlp|={d.mean():.3e}  max rel={rel.max():.3e}")
