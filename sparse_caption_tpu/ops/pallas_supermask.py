"""Pallas TPU kernel: supermask matmul with in-kernel Bernoulli sampling.

The supermask training forward multiplies every weight by a fresh
``Bernoulli(sigmoid(mask))`` draw per forward (reference
``pruning/masked_layer.py:84-110``).  The XLA path materializes the sampled
mask in HBM (bernoulli output the size of the weight), then reads it again
inside the fused matmul — 2x weight-sized HBM traffic beyond the weights
themselves.  This kernel generates the Bernoulli draw *inside* the matmul
tile loop with the TPU PRNG (`pltpu.prng_seed` / `prng_random_bits`), so
the sampled mask never exists in HBM, and regenerates the identical draw in
the backward kernels by reseeding per (k, n) tile.

A/B at paper scale (ORT-512 supermask XE step, v5e): 80.9 ms/step via this
kernel vs 74.1 ms/step via the XLA path — XLA's own mask fusion wins at
these weight sizes, so the kernel is opt-in (SPARSE_CAPTION_PALLAS_SUPERMASK=1)
and expected to pay off only for much larger masked weights.

Gradients (matching ops/ste.py semantics):
  dx = g @ (w * b)^T
  dw = (x^T @ g) * b
  dm = (x^T @ g) * w * sigmoid'(m)   [or * 1 with bypass_sigmoid_grad]

Tile layout: grids over (M, N, K) with K innermost for accumulation; the
mask sample for tile (k, n) is seeded by ``seed + k_tile * grid_n + n_tile``
in every kernel, so forward/backward see the same draw.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 256  # MXU-aligned tile edge (multiple of 128)


def _interpret() -> bool:
    """Interpret mode on non-TPU backends (tests on the CPU mesh)."""
    return jax.default_backend() != "tpu"


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _tile_bernoulli(m_tile, seed_scalar):
    """Bernoulli(sigmoid(m_tile)) from the per-core PRNG, f32 in {0, 1}."""
    pltpu.prng_seed(seed_scalar)
    # prng_random_bits yields int32 and Mosaic can't cast uint32->f32, so
    # shift then mask to the low 24 bits (clears propagated sign bits) for a
    # non-negative int32 -> uniform [0, 1)
    bits = pltpu.prng_random_bits(m_tile.shape)
    u = ((bits >> 8) & ((1 << 24) - 1)).astype(jnp.float32) * (1.0 / (1 << 24))
    return (u < jax.nn.sigmoid(m_tile)).astype(jnp.float32)


def _fwd_kernel(seed_ref, x_ref, w_ref, m_ref, o_ref, acc_ref, *, grid_n):
    k_t = pl.program_id(2)
    n_t = pl.program_id(1)

    @pl.when(k_t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    b = _tile_bernoulli(m_ref[:], seed_ref[0] + k_t * grid_n + n_t)
    acc_ref[:] += jnp.dot(x_ref[:], w_ref[:] * b, preferred_element_type=jnp.float32)

    @pl.when(k_t == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _dx_kernel(seed_ref, g_ref, w_ref, m_ref, o_ref, acc_ref, *, grid_n):
    # grid (M/TM, K/TK, N/TN): dx[m,k] = sum_n g[m,n] (w*b)[k,n]
    n_t = pl.program_id(2)
    k_t = pl.program_id(1)

    @pl.when(n_t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    b = _tile_bernoulli(m_ref[:], seed_ref[0] + k_t * grid_n + n_t)
    wb = w_ref[:] * b  # (TK, TN)
    acc_ref[:] += jax.lax.dot_general(
        g_ref[:], wb, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(n_t == pl.num_programs(2) - 1)
    def _():
        o_ref[:] = acc_ref[:]


def _dwm_kernel(seed_ref, x_ref, g_ref, w_ref, m_ref, dw_ref, dm_ref, acc_ref, *, grid_n, bypass):
    # grid (K/TK, N/TN, M/TM): t[k,n] = sum_m x[m,k] g[m,n]
    m_t = pl.program_id(2)
    k_t = pl.program_id(0)
    n_t = pl.program_id(1)

    @pl.when(m_t == 0)
    def _():
        acc_ref[:] = jnp.zeros_like(acc_ref)

    acc_ref[:] += jax.lax.dot_general(
        x_ref[:], g_ref[:], dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )

    @pl.when(m_t == pl.num_programs(2) - 1)
    def _():
        t = acc_ref[:]
        b = _tile_bernoulli(m_ref[:], seed_ref[0] + k_t * grid_n + n_t)
        dw_ref[:] = t * b
        tw = t * w_ref[:]
        if bypass:
            dm_ref[:] = tw
        else:
            s = jax.nn.sigmoid(m_ref[:])
            dm_ref[:] = tw * s * (1.0 - s)


def _pad2(x, r, c):
    return jnp.pad(x, ((0, r - x.shape[0]), (0, c - x.shape[1])))


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def supermask_matmul(x, w, m, seed, bypass_sigmoid_grad: bool = False):
    """y = x @ (w * Bernoulli(sigmoid(m))) with straight-through gradients.

    x: (M, K); w, m: (K, N); seed: int32 scalar. fp32.
    """
    y, _ = _supermask_fwd(x, w, m, seed, bypass_sigmoid_grad)
    return y


def _run_fwd(x, w, m, seed):
    M, K = x.shape
    K2, N = w.shape
    assert K == K2 and m.shape == w.shape
    Mp, Kp, Np = _round_up(M, TILE), _round_up(K, TILE), _round_up(N, TILE)
    xp, wp, mp = _pad2(x, Mp, Kp), _pad2(w, Kp, Np), _pad2(m, Kp, Np)
    grid = (Mp // TILE, Np // TILE, Kp // TILE)
    out = pl.pallas_call(
        functools.partial(_fwd_kernel, grid_n=grid[1]),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((TILE, TILE), lambda i, j, k, s_: (i, k)),
                pl.BlockSpec((TILE, TILE), lambda i, j, k, s_: (k, j)),
                pl.BlockSpec((TILE, TILE), lambda i, j, k, s_: (k, j)),
            ],
            out_specs=pl.BlockSpec((TILE, TILE), lambda i, j, k, s_: (i, j)),
            scratch_shapes=[pltpu.VMEM((TILE, TILE), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, Np), jnp.float32),
        interpret=_interpret(),
    )(jnp.asarray([seed], jnp.int32), xp, wp, mp)
    return out[:M, :N]


def _supermask_fwd(x, w, m, seed, bypass):
    y = _run_fwd(x, w, m, seed)
    return y, (x, w, m, seed)


def _supermask_bwd(bypass, res, g):
    x, w, m, seed = res
    M, K = x.shape
    _, N = w.shape
    Mp, Kp, Np = _round_up(M, TILE), _round_up(K, TILE), _round_up(N, TILE)
    xp, wp, mp, gp = _pad2(x, Mp, Kp), _pad2(w, Kp, Np), _pad2(m, Kp, Np), _pad2(g, Mp, Np)
    grid_n = Np // TILE

    dx = pl.pallas_call(
        functools.partial(_dx_kernel, grid_n=grid_n),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Mp // TILE, Kp // TILE, Np // TILE),
            in_specs=[
                pl.BlockSpec((TILE, TILE), lambda i, k, n, s_: (i, n)),  # g
                pl.BlockSpec((TILE, TILE), lambda i, k, n, s_: (k, n)),  # w
                pl.BlockSpec((TILE, TILE), lambda i, k, n, s_: (k, n)),  # m
            ],
            out_specs=pl.BlockSpec((TILE, TILE), lambda i, k, n, s_: (i, k)),
            scratch_shapes=[pltpu.VMEM((TILE, TILE), jnp.float32)],
        ),
        out_shape=jax.ShapeDtypeStruct((Mp, Kp), jnp.float32),
        interpret=_interpret(),
    )(jnp.asarray([seed], jnp.int32), gp, wp, mp)[:M, :K]

    dw, dm = pl.pallas_call(
        functools.partial(_dwm_kernel, grid_n=grid_n, bypass=bypass),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(Kp // TILE, Np // TILE, Mp // TILE),
            in_specs=[
                pl.BlockSpec((TILE, TILE), lambda k, n, i, s_: (i, k)),  # x
                pl.BlockSpec((TILE, TILE), lambda k, n, i, s_: (i, n)),  # g
                pl.BlockSpec((TILE, TILE), lambda k, n, i, s_: (k, n)),  # w
                pl.BlockSpec((TILE, TILE), lambda k, n, i, s_: (k, n)),  # m
            ],
            out_specs=[
                pl.BlockSpec((TILE, TILE), lambda k, n, i, s_: (k, n)),
                pl.BlockSpec((TILE, TILE), lambda k, n, i, s_: (k, n)),
            ],
            scratch_shapes=[pltpu.VMEM((TILE, TILE), jnp.float32)],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((Kp, Np), jnp.float32),
            jax.ShapeDtypeStruct((Kp, Np), jnp.float32),
        ],
        interpret=_interpret(),
    )(jnp.asarray([seed], jnp.int32), xp, gp, wp, mp)
    return dx, dw[:K, :N], dm[:K, :N], None


supermask_matmul.defvjp(_supermask_fwd, _supermask_bwd)
