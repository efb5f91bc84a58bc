"""Pruning behavioral tests — port of the reference toy-model convergence
suite (tests/test_prune.py:95-160): a small masked model trained per mask
type; asserts initial sparsity 0, one-shot methods hit target +-0.05,
supermask converges toward target, frozen scope raises active > all
sparsity, and weights stay dense until prune_weights()."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest
from flax import linen as nn

from sparse_caption_tpu.engine.losses import language_model_loss
from sparse_caption_tpu.ops.masked import MaskConfig, MaskedDense, MaskedEmbed
from sparse_caption_tpu.models.up_down import MaskedLSTMCell
from sparse_caption_tpu.pruning import (
    MAG_BLIND, MAG_DIST, MAG_UNIFORM, REGULAR, SNIP, SUPER_MASKS, TRAINABLE_MASKS,
)
from sparse_caption_tpu.pruning import engine as pe

V, D, T, B = 12, 8, 6, 4
KEY = jax.random.PRNGKey(8888)


class ToyModel(nn.Module):
    """Embed -> LSTM -> 2x Dense -> out head (out head mask-frozen in tests)."""

    mask_cfg: MaskConfig

    @nn.compact
    def __call__(self, ids, train: bool = False):
        x = MaskedEmbed(V, D, mask_cfg=self.mask_cfg, name="embed")(ids, train)
        cell = MaskedLSTMCell(D, self.mask_cfg, name="lstm")
        h = jnp.zeros((ids.shape[0], D))
        c = jnp.zeros((ids.shape[0], D))
        outs = []
        for t in range(ids.shape[1]):
            h, c = cell(x[:, t], (h, c), train)
            outs.append(h)
        y = jnp.stack(outs, 1)
        y = nn.relu(MaskedDense(D, mask_cfg=self.mask_cfg, name="fc1")(y, train))
        y = nn.relu(MaskedDense(D, mask_cfg=self.mask_cfg, name="fc2")(y, train))
        return jax.nn.log_softmax(MaskedDense(V, mask_cfg=self.mask_cfg, name="out")(y, train), axis=-1)


def make_data():
    rng = np.random.default_rng(0)
    return jnp.asarray(rng.integers(1, V, size=(B, T + 1)), dtype=jnp.int32)


def init_toy(mask_type, init_value=5.0):
    cfg = MaskConfig(mask_type=mask_type, mask_init_value=init_value if mask_type in SUPER_MASKS else 1.0)
    model = ToyModel(mask_cfg=cfg)
    data = make_data()
    variables = model.init({"params": KEY, "mask": KEY}, data[:, :-1], train=False)
    return model, variables["params"], variables["masks"], data


FREEZE = ["out"]


class TestStructure:
    def test_mask_weight_pairing(self):
        _, params, masks, _ = init_toy(MAG_BLIND)
        pairs = pe.mask_weight_pairs(params, masks)
        assert len(pairs) == 6  # embed, lstm ih+hh, fc1, fc2, out
        for p, w, m in pairs:
            assert w.shape == m.shape

    def test_initial_sparsity_zero(self):
        for mt in (MAG_BLIND, REGULAR):
            _, params, masks, _ = init_toy(mt)
            s, _, per = pe.mask_sparsity(masks, mt)
            assert float(s) == 0.0

    def test_freeze_scope(self):
        _, params, masks, _ = init_toy(MAG_BLIND)
        act = pe.active_paths(masks, FREEZE)
        assert len(act) == 5
        assert all(not pe.path_str(p).startswith("out") for p in act)


class TestOneShot:
    @pytest.mark.parametrize("mt", [MAG_BLIND, MAG_UNIFORM, MAG_DIST])
    def test_hits_target(self, mt):
        _, params, masks, _ = init_toy(mt)
        target = 0.7
        new_masks = pe.update_masks_once(params, masks, mt, target, FREEZE)
        s, _, _ = pe.mask_sparsity(new_masks, mt, FREEZE)
        assert abs(float(s) - target) < 0.05
        # frozen scope untouched -> overall sparsity lower than active
        s_all, _, _ = pe.mask_sparsity(new_masks, mt)
        assert float(s_all) < float(s)

    def test_uniform_per_tensor(self):
        _, params, masks, _ = init_toy(MAG_UNIFORM)
        new_masks = pe.update_masks_once(params, masks, MAG_UNIFORM, 0.5, FREEZE)
        _, _, per = pe.mask_sparsity(new_masks, MAG_UNIFORM, FREEZE)
        for name, s in per.items():
            assert abs(float(s) - 0.5) < 0.1, name

    def test_weights_dense_until_folded(self):
        _, params, masks, _ = init_toy(MAG_BLIND)
        new_masks = pe.update_masks_once(params, masks, MAG_BLIND, 0.7, FREEZE)
        ws, _ = pe.weight_sparsity(params, new_masks)
        assert float(ws) < 0.05  # untouched weights
        pruned = pe.prune_weights(params, new_masks, MAG_BLIND)
        ws2, _ = pe.weight_sparsity(pruned, new_masks)
        assert abs(float(ws2) - pe.mask_sparsity(new_masks, MAG_BLIND)[0]) < 1e-5


class TestSnip:
    def test_snip_prunes_with_saliency(self):
        model, params, masks, data = init_toy(SNIP)

        def loss_fn(masks_):
            lp = model.apply({"params": params, "masks": masks_}, data[:, :-1], train=False)
            return language_model_loss(lp, data[:, 1:], jnp.ones_like(data[:, 1:]))

        saliency = jax.grad(loss_fn)(masks)
        new_masks = pe.update_masks_once(params, masks, SNIP, 0.6, FREEZE, snip_saliency=saliency)
        s, _, _ = pe.mask_sparsity(new_masks, SNIP, FREEZE)
        assert abs(float(s) - 0.6) < 0.05


class TestSupermask:
    def test_sparsity_loss_anneal(self):
        _, params, masks, _ = init_toy(REGULAR)
        loss0, aux0 = pe.compute_sparsity_loss(masks, 0.8, 10.0, 0, 100, FREEZE)
        loss_mid, aux_mid = pe.compute_sparsity_loss(masks, 0.8, 10.0, 50, 100, FREEZE)
        loss_end, aux_end = pe.compute_sparsity_loss(masks, 0.8, 10.0, 100, 100, FREEZE)
        # anneal: 0 at step 0, full weight at the end
        assert float(loss0) < 1e-6
        assert float(loss_mid) < float(loss_end)
        np.testing.assert_allclose(float(aux_end["sparsity_loss"]), 0.8, atol=1e-6)  # init logit 5 -> all ones

    def test_supermask_training_converges_to_target(self):
        """Train only masks with the sparsity loss for a few hundred steps."""
        model, params, masks, data = init_toy(REGULAR)
        target = 0.8
        opt = optax.adam(100.0, eps=1e-2)
        opt_state = opt.init(masks)

        @jax.jit
        def step(masks_, opt_state_, step_no):
            def loss_fn(m):
                scaled, aux = pe.compute_sparsity_loss(m, target, 20.0, step_no, 100, FREEZE)
                return scaled, aux

            (l, aux), g = jax.value_and_grad(loss_fn, has_aux=True)(masks_)
            updates, opt_state_ = opt.update(g, opt_state_)
            return optax.apply_updates(masks_, updates), opt_state_, aux

        for i in range(120):
            masks, opt_state, aux = step(masks, opt_state, jnp.asarray(i, jnp.float32))
        s, _, _ = pe.mask_sparsity(masks, REGULAR, FREEZE)
        assert abs(float(s) - target) < 0.3  # reference tolerance +-0.3 for supermask
        # frozen scope stays dense
        s_all, _, per = pe.mask_sparsity(masks, REGULAR)
        assert per["out/mask"] < 0.05

    def test_forward_uses_sampled_mask(self):
        model, params, masks, data = init_toy(REGULAR)
        # set all mask logits very negative -> eval forward sees zeroed weights
        masks_off = jax.tree.map(lambda m: jnp.full_like(m, -10.0), masks)
        lp = model.apply({"params": params, "masks": masks_off}, data[:, :-1], train=False)
        # all-zero weights -> uniform distribution
        np.testing.assert_allclose(np.asarray(lp), np.log(1.0 / V), atol=1e-5)

    def test_train_forward_stochastic(self):
        model, params, masks, data = init_toy(REGULAR)
        masks_half = jax.tree.map(lambda m: jnp.zeros_like(m), masks)  # p=0.5
        lp1 = model.apply({"params": params, "masks": masks_half}, data[:, :-1], train=True,
                          rngs={"mask": jax.random.PRNGKey(1)})
        lp2 = model.apply({"params": params, "masks": masks_half}, data[:, :-1], train=True,
                          rngs={"mask": jax.random.PRNGKey(2)})
        assert float(jnp.max(jnp.abs(lp1 - lp2))) > 1e-6


class TestExport:
    def test_binarize(self):
        _, params, masks, _ = init_toy(REGULAR)
        b = pe.binarize_masks(masks)
        vals = np.unique(np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(b)]))
        assert set(vals.tolist()) <= {0.0, 1.0}

    def test_sparse_round_trip(self):
        _, params, masks, _ = init_toy(MAG_BLIND)
        new_masks = pe.update_masks_once(params, masks, MAG_BLIND, 0.7, FREEZE)
        exported = pe.sparse_export(params, new_masks, MAG_BLIND)
        restored = pe.sparse_import(exported)
        pruned = pe.prune_weights(params, new_masks, MAG_BLIND)
        for (p1, a), (p2, b) in zip(
            sorted(jax.tree_util.tree_leaves_with_path(pruned), key=str),
            sorted(jax.tree_util.tree_leaves_with_path(restored), key=str),
        ):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-6)


def test_supermask_recipe_converges_at_intermediate_scale():
    """The REFERENCE pruning recipe (mask Adam lr 100 eps 1e-2, sparsity
    weight max(5, 1.5/(1-s)) = 30 at target 0.95, reversed-cosine anneal
    over the full horizon — train_n_prune_transformer.py:69-82,306-312)
    converges at an intermediate model scale, not just the d8-16 toys:
    ORT d64/ff256/1L vocab 512 on a memorizable synthetic task reaches
    NNZ within +-5% (relative) of the 5% target with DECREASING caption
    loss. Horizon note (VERDICT r2 next #1): time-to-target scales with
    the mask count — d64/1L needs ~800 steps, the paper-scale ORT-512 run
    is the TPU probe scripts/check_supermask_dynamics.py (results in
    STATUS.md)."""
    import json
    import subprocess
    import sys as _sys

    r = subprocess.run(
        [_sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "scripts", "check_supermask_dynamics.py"),
         "--platform", "cpu", "--d_model", "64", "--dim_feedforward", "256",
         "--num_layers", "1", "--num_heads", "2", "--vocab_size", "512",
         "--att_feat_size", "64", "--steps", "800", "--chunk", "50", "--skip_scst"],
        capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["nnz_within_5pct"], out
    assert out["loss_decreasing"], out
    # sparsity is monotone through the anneal tail (the mask optimizer is
    # in control, not oscillating)
    sps = [c["sparsity"] for c in out["curve"]]
    assert all(b >= a - 1e-3 for a, b in zip(sps, sps[1:])), sps


def test_supermask_recipe_converges_up_down():
    """Same reference recipe on the paper's SECOND model family: the
    Up-Down LSTM (masked LSTM cells + additive attention, reference
    commands_pruning.sh UD supermask runs). rnn-64 intermediate scale on
    CPU; the paper-scale rnn-1000 run is the TPU probe
    (scripts/check_supermask_dynamics.py --model up_down, STATUS.md)."""
    import json
    import subprocess
    import sys as _sys

    r = subprocess.run(
        [_sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "scripts", "check_supermask_dynamics.py"),
         "--model", "up_down", "--platform", "cpu", "--d_model", "64",
         "--vocab_size", "512", "--att_feat_size", "64",
         "--steps", "800", "--chunk", "50", "--skip_scst"],
        capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["nnz_within_5pct"], out
    assert out["loss_decreasing"], out
    sps = [c["sparsity"] for c in out["curve"]]
    assert all(b >= a - 1e-3 for a, b in zip(sps, sps[1:])), sps


def test_gradual_recipe_converges_at_intermediate_scale():
    """The Zhu&Gupta gradual magnitude schedule (the reference's
    best-scoring method at 0.95, README.md:89; engine mirror in
    prune_training.pre_log_hook) reaches the target NNZ with the caption
    loss still decreasing — same probe script, --prune_type mag_grad_*."""
    import json
    import subprocess
    import sys as _sys

    r = subprocess.run(
        [_sys.executable,
         os.path.join(os.path.dirname(__file__), "..", "scripts", "check_supermask_dynamics.py"),
         "--prune_type", "mag_grad_uniform", "--platform", "cpu",
         "--d_model", "64", "--dim_feedforward", "256", "--num_layers", "1",
         "--num_heads", "2", "--vocab_size", "512", "--att_feat_size", "64",
         "--steps", "600", "--chunk", "50", "--skip_scst"],
        capture_output=True, text=True, timeout=1800,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    out = json.loads(r.stdout.strip().splitlines()[-1])
    assert out["nnz_within_5pct"], out
    assert out["loss_decreasing"], out
    # the schedule is monotone: sparsity never decreases between chunks
    sps = [c["sparsity"] for c in out["curve"]]
    assert all(b >= a - 1e-6 for a, b in zip(sps, sps[1:])), sps


def test_device_mask_update_matches_host():
    """update_masks_once_device (jnp.quantile thresholds, jit-compatible —
    the --prune_gradual_on_device path) reproduces the host argsort
    bottom-k for every magnitude family up to interpolation rounding
    (+-2 elements per pool)."""
    import functools

    import jax
    import jax.numpy as jnp

    from sparse_caption_tpu.pruning.engine import (
        update_masks_once,
        update_masks_once_device,
    )

    rng = np.random.default_rng(11)
    params = {
        "enc": {"w_1": {"kernel": jnp.asarray(rng.standard_normal((64, 96)), jnp.float32)}},
        "dec": {"lut": {"embedding": jnp.asarray(rng.standard_normal((50, 32)), jnp.float32)}},
    }
    masks = {
        "enc": {"w_1": {"mask": jnp.ones((64, 96), jnp.float32)}},
        "dec": {"lut": {"mask": jnp.ones((50, 32), jnp.float32)}},
    }
    for mt in ("mag_uniform", "mag_blind", "mag_dist",
               "mag_grad_uniform", "mag_grad_blind"):
        for st in (0.5, 0.95):
            host = update_masks_once(params, masks, mt, st)
            dev = jax.jit(functools.partial(update_masks_once_device, mask_type=mt))(
                params, masks, sparsity_target=st)
            h = np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(host)])
            d = np.concatenate([np.asarray(x).ravel() for x in jax.tree.leaves(dev)])
            ndiff = int(np.sum(h != d))
            assert ndiff <= 4, (mt, st, ndiff)  # quantile interpolation rounding
            # and the jitted instance is reusable at a different traced target
        dev2 = jax.jit(functools.partial(update_masks_once_device, mask_type=mt))(
            params, masks, sparsity_target=jnp.asarray(0.7, jnp.float32))
        frac = 1.0 - float(np.mean(np.concatenate(
            [np.asarray(x).ravel() for x in jax.tree.leaves(dev2)])))
        assert abs(frac - 0.7) < 0.01, (mt, frac)


def test_device_mask_update_respects_freeze_scope():
    import functools

    import jax
    import jax.numpy as jnp

    from sparse_caption_tpu.pruning.engine import update_masks_once_device

    rng = np.random.default_rng(12)
    params = {
        "enc": {"w_1": {"kernel": jnp.asarray(rng.standard_normal((16, 16)), jnp.float32)}},
        "dec": {"w_2": {"kernel": jnp.asarray(rng.standard_normal((16, 16)), jnp.float32)}},
    }
    masks = {
        "enc": {"w_1": {"mask": jnp.ones((16, 16), jnp.float32)}},
        "dec": {"w_2": {"mask": jnp.ones((16, 16), jnp.float32)}},
    }
    out = jax.jit(functools.partial(
        update_masks_once_device, mask_type="mag_grad_uniform",
        freeze_scope=["enc"]))(params, masks, sparsity_target=0.5)
    np.testing.assert_array_equal(np.asarray(out["enc"]["w_1"]["mask"]), 1.0)
    assert abs(float(np.mean(np.asarray(out["dec"]["w_2"]["mask"]))) - 0.5) < 0.02
