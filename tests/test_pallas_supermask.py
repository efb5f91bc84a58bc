"""Pallas supermask-matmul kernel tests.

These require a real TPU (the TPU PRNG primitives have no CPU lowering), so
they skip in the CPU-mesh suite; run them standalone on TPU with
``python -m pytest tests/test_pallas_supermask.py --no-header -q`` after
unsetting the conftest platform pin (JAX_PLATFORMS left to the environment).

The same checks were executed on the real chip during development:
on/off deterministic limits exact, Bernoulli(0.5) |y| ratio = sqrt(2),
dx/dw/dm exact at deterministic masks, and dw's 0/1 structure proves the
backward regenerates the forward's draw (see commit history).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.skipif(jax.default_backend() != "tpu", reason="TPU-only (in-kernel PRNG)")


def test_deterministic_limits_and_grads():
    from sparse_caption_tpu.ops.pallas_supermask import supermask_matmul

    rng = np.random.default_rng(0)
    M, K, N = 32, 300, 520
    x = jnp.asarray(rng.standard_normal((M, K)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32) * 0.1
    y_on = supermask_matmul(x, w, jnp.full((K, N), 20.0), 0)
    np.testing.assert_allclose(np.asarray(y_on), np.asarray(x @ w), atol=1e-4)
    y_off = supermask_matmul(x, w, jnp.full((K, N), -20.0), 0)
    assert float(jnp.max(jnp.abs(y_off))) == 0.0

    def loss(x, w, m):
        return jnp.sum(supermask_matmul(x, w, m, 0) * 1e-3)

    gx, gw, gm = jax.grad(loss, argnums=(0, 1, 2))(x, w, jnp.full((K, N), 20.0))
    np.testing.assert_allclose(np.asarray(gx), np.asarray(jnp.full((M, N), 1e-3) @ w.T), atol=1e-6)
    np.testing.assert_allclose(np.asarray(gw), np.asarray(x.T @ jnp.full((M, N), 1e-3)), atol=1e-6)
    assert float(jnp.max(jnp.abs(gm))) < 1e-8  # sigmoid'(20) ~ 0


def test_fwd_bwd_same_bernoulli_draw():
    from sparse_caption_tpu.ops.pallas_supermask import supermask_matmul

    rng = np.random.default_rng(1)
    K, N = 256, 256
    x = jnp.asarray(rng.standard_normal((8, K)), jnp.float32)
    w = jnp.asarray(rng.standard_normal((K, N)), jnp.float32)
    m = jnp.zeros((K, N))

    y = supermask_matmul(x, w, m, 7)
    gw = jax.grad(lambda w_: jnp.sum(supermask_matmul(x, w_, m, 7)), argnums=0)(w)
    t = np.asarray(x.sum(0))[:, None] * np.ones((1, N))
    b = (np.abs(np.asarray(gw)) > 1e-12).astype(np.float32)  # dw = t*b
    np.testing.assert_allclose(np.asarray(y), np.asarray(x @ (w * b)), atol=1e-3)
