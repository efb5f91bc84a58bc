"""Mesh parallelism tests on the 8-device virtual CPU mesh: dp-sharded
training matches single-device numerics; TP kernels shard as specified;
TrainingModule runs end-to-end with --mesh_shape."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from sparse_caption_tpu.parallel import make_mesh, param_sharding, shard_batch

pytestmark = pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")


def test_mesh_shapes():
    m = make_mesh("4,2")
    assert dict(m.shape) == {"data": 4, "model": 2}
    m = make_mesh(None)
    assert dict(m.shape) == {"data": 8, "model": 1}
    with pytest.raises(AssertionError):
        make_mesh("16,2")


def test_batch_sharding():
    mesh = make_mesh("8,1")
    batch = shard_batch({"x": np.ones((16, 4)), "y": np.ones((16,))}, mesh)
    assert batch["x"].sharding.spec == P("data", None)
    assert batch["y"].sharding.spec == P("data")


def test_param_tp_specs():
    from sparse_caption_tpu.models.transformer import Transformer

    mesh = make_mesh("4,2")
    m = Transformer(vocab_size=16, d_model=8, dim_feedforward=16, num_layers=1,
                    num_heads=2, att_feat_size=4, max_seq_length=5)
    vs = m.init({"params": jax.random.PRNGKey(0)}, jnp.ones((2, 3, 4)), jnp.ones((2, 3)),
                jnp.ones((2, 5), jnp.int32))
    shardings = param_sharding(vs["params"], mesh)
    flat = dict(jax.tree_util.tree_flatten_with_path(shardings)[0])
    specs = {"/".join(getattr(k, "key", str(k)) for k in path): s.spec
             for path, s in jax.tree_util.tree_flatten_with_path(shardings)[0]}
    assert specs["encoder_layers_0/feed_forward/w_1/kernel"] == P(None, "model")
    assert specs["encoder_layers_0/feed_forward/w_2/kernel"] == P("model", None)
    assert specs["encoder_layers_0/self_attn/q_proj/kernel"] == P(None, "model")
    assert specs["encoder_layers_0/self_attn/out_proj/kernel"] == P("model", None)
    assert specs["encoder_norm/scale"] == P()


def test_param_tp_unknown_kernel_fails_loudly():
    """A 2-D kernel whose module name matches no TP rule must raise (a
    rename cannot silently de-parallelize the model) — and every kernel of
    every registered model family must classify cleanly."""
    mesh = make_mesh("4,2")
    bogus = {"encoder_layers_0": {"totally_new_proj_name": {"kernel": jnp.ones((8, 8))}}}
    with pytest.raises(ValueError, match="matches no"):
        param_sharding(bogus, mesh)
    # 1-D / scalar leaves never trip the guard
    ok = {"some_norm": {"scale": jnp.ones((8,))}}
    param_sharding(ok, mesh)

    # all three model families classify without raising
    from sparse_caption_tpu.models.relation_transformer import RelationTransformer
    from sparse_caption_tpu.models.up_down import UpDownModel

    ort = RelationTransformer(vocab_size=16, d_model=8, dim_feedforward=16, num_layers=1,
                              num_heads=2, att_feat_size=4, max_seq_length=5)
    vs = ort.init({"params": jax.random.PRNGKey(0)}, att_feats=jnp.ones((2, 3, 4)),
                  att_masks=jnp.ones((2, 3)), boxes=jnp.ones((2, 3, 4)),
                  seqs=jnp.ones((2, 5), jnp.int32))
    param_sharding(vs["params"], mesh)

    ud = UpDownModel(vocab_size=16, rnn_size=8, input_encoding_size=8, att_hid_size=8,
                     fc_feat_size=8, att_feat_size=4, max_seq_length=5)
    vs = ud.init({"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
                  "ss": jax.random.PRNGKey(2)},
                 att_feats=jnp.ones((2, 3, 4)), att_masks=jnp.ones((2, 3)),
                 fc_feats=jnp.ones((2, 8)), seqs=jnp.ones((2, 5), jnp.int32), train=True)
    param_sharding(vs["params"], mesh)


def test_opt_state_sharding_structure_matched():
    """Adam mu/nu shard exactly like the params they track; counters replicated."""
    import optax

    from sparse_caption_tpu.models.transformer import Transformer
    from sparse_caption_tpu.parallel import opt_state_sharding

    mesh = make_mesh("4,2")
    m = Transformer(vocab_size=16, d_model=8, dim_feedforward=16, num_layers=1,
                    num_heads=2, att_feat_size=4, max_seq_length=5)
    params = m.init({"params": jax.random.PRNGKey(0)}, jnp.ones((2, 3, 4)), jnp.ones((2, 3)),
                    jnp.ones((2, 5), jnp.int32))["params"]
    opt = optax.chain(optax.clip(0.1), optax.adam(1e-3))
    st = opt.init(params)
    sh = opt_state_sharding(st, params, mesh)
    shardings = param_sharding(params, mesh)
    # adam = chain(scale_by_adam, scale): its ScaleByAdamState is sh[1][0];
    # mu/nu must equal the param shardings leaf-for-leaf
    adam = sh[1][0]
    assert jax.tree_util.tree_structure(adam.mu) == jax.tree_util.tree_structure(shardings)
    for a, b in zip(jax.tree.leaves(adam.mu), jax.tree.leaves(shardings)):
        assert a.spec == b.spec
    for a, b in zip(jax.tree.leaves(adam.nu), jax.tree.leaves(shardings)):
        assert a.spec == b.spec
    assert adam.count.spec == P()


def _built_module(fixture_dataset, log_dir, mesh_shape, extra=()):
    import sys, os

    sys.path.insert(0, os.path.dirname(__file__))
    from test_train import TINY_TRANSFORMER, tiny_args

    from sparse_caption_tpu.config import Config
    from sparse_caption_tpu.engine.training import TrainingModule
    from sparse_caption_tpu.opts import parse_opt

    argv = tiny_args(fixture_dataset, log_dir, "transformer", TINY_TRANSFORMER) + list(extra)
    argv += ["--batch_size", "2"]
    if mesh_shape:
        argv += ["--mesh_shape", mesh_shape]
    args = parse_opt(argv)
    m = TrainingModule(Config(**vars(args)))
    m.prepare()
    m.init_state()
    return m


def test_beam_decode_matches_single_device(fixture_dataset, tmp_path):
    """Beam-5 decode (ancestry reorder + TP attention heads) under a dp x tp
    mesh emits the same tokens as one device."""
    m1 = _built_module(fixture_dataset, tmp_path / "single", None)
    m2 = _built_module(fixture_dataset, tmp_path / "mesh", "2,2")
    batch = next(iter(m1.val_loader))
    opt = {"beam_size": 5}
    d1 = m1.make_decode_fn(opt)
    d2 = m2.make_decode_fn(opt)
    seq1, _ = d1(m1._variables(m1.state), m1._model_inputs(batch, with_seqs=False), jax.random.PRNGKey(0))
    with m2.mesh:
        seq2, _ = d2(m2._variables(m2.state), m2._model_inputs(batch, with_seqs=False), jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(seq1), np.asarray(seq2))


def test_scst_step_matches_single_device(fixture_dataset, tmp_path):
    """The two-phase SCST step (train-mode sampling + recompute grads) under
    a dp mesh produces the same update as one device."""
    extra = ["--scst_start_epoch", "0", "--scst_num_samples", "3",
             "--scst_sample", "random", "--scst_baseline", "sample"]
    m1 = _built_module(fixture_dataset, tmp_path / "single", None, extra)
    m2 = _built_module(fixture_dataset, tmp_path / "mesh", "2,1", extra)
    s1_fn, s2_fn = m1.make_scst_step(), m2.make_scst_step()
    batch = next(iter(m1.train_loader))
    rng = jax.random.PRNGKey(3)
    s1, loss1, aux1 = s1_fn(m1.state, batch, rng)
    s2, loss2, aux2 = s2_fn(m2.state, batch, rng)
    np.testing.assert_allclose(float(loss1), float(loss2), atol=1e-5)
    np.testing.assert_allclose(aux1["avg_reward"], aux2["avg_reward"], atol=1e-6)
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.params, s2.params)
    assert max(jax.tree.leaves(d)) < 1e-5


def test_dp_step_matches_single_device(fixture_dataset, tmp_path):
    """One XE step on an 8-way dp mesh == the same step on one device."""
    import sys, os

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "scripts"))
    from test_train import TINY_TRANSFORMER, tiny_args  # reuse tiny config helpers

    from sparse_caption_tpu.config import Config
    from sparse_caption_tpu.engine.training import TrainingModule
    from sparse_caption_tpu.opts import parse_opt

    def build(mesh_shape, log_dir):
        argv = tiny_args(fixture_dataset, log_dir, "transformer", TINY_TRANSFORMER)
        argv += ["--batch_size", "2"]
        if mesh_shape:
            argv += ["--mesh_shape", mesh_shape]
        args = parse_opt(argv)
        m = TrainingModule(Config(**vars(args)))
        m.prepare()
        m.init_state()
        return m

    m1 = build(None, tmp_path / "single")
    m2 = build("2,1", tmp_path / "mesh")
    step1, step2 = m1.make_xe_step(), m2.make_xe_step()
    batch = next(iter(m1.train_loader))
    rng = jax.random.PRNGKey(0)
    # same init seed -> same params; run the identical batch through both
    s1, loss1, _ = step1(m1.state, m1._model_inputs(batch), jnp.asarray(batch["masks"]), rng)
    s2, loss2, _ = step2(m2.state, m2._model_inputs(batch), jnp.asarray(batch["masks"]), rng)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.params, s2.params)
    assert max(jax.tree.leaves(d)) < 1e-5


def test_scst_device_reward_step_matches_single_device(fixture_dataset, tmp_path):
    """--scst_reward device under a dp mesh: the in-jit CIDEr-D scoring
    partitions with the batch (no host scoring to bottleneck a pod) and
    reproduces the single-device update."""
    extra = ["--scst_start_epoch", "0", "--scst_num_samples", "3",
             "--scst_sample", "random", "--scst_baseline", "sample",
             "--scst_reward", "device"]
    m1 = _built_module(fixture_dataset, tmp_path / "single", None, extra)
    m2 = _built_module(fixture_dataset, tmp_path / "mesh", "2,1", extra)
    s1_fn, s2_fn = m1.make_scst_step(), m2.make_scst_step()
    # rng=None routes through the device-reward branch; both modules sit at
    # state.step=0 so they derive the identical sampling key
    s1, loss1, aux1 = s1_fn(m1.state, next(iter(m1.train_loader)))
    s2, loss2, aux2 = s2_fn(m2.state, next(iter(m2.train_loader)))
    np.testing.assert_allclose(float(loss1), float(loss2), atol=1e-5)
    np.testing.assert_allclose(float(aux1["avg_reward"]), float(aux2["avg_reward"]),
                               atol=1e-5)
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.params, s2.params)
    assert max(jax.tree.leaves(d)) < 1e-5


def test_zero_opt_state_sharding_specs():
    """ZeRO-1: adam moments shard their first free divisible axis over the
    data axis on top of the TP spec; params themselves stay TP-only."""
    import optax

    from sparse_caption_tpu.models.transformer import Transformer
    from sparse_caption_tpu.parallel import opt_state_sharding

    mesh = make_mesh("4,2")
    m = Transformer(vocab_size=16, d_model=8, dim_feedforward=16, num_layers=1,
                    num_heads=2, att_feat_size=4, max_seq_length=5)
    params = m.init({"params": jax.random.PRNGKey(0)}, jnp.ones((2, 3, 4)), jnp.ones((2, 3)),
                    jnp.ones((2, 5), jnp.int32))["params"]
    opt = optax.chain(optax.clip(0.1), optax.adam(1e-3))
    sh = opt_state_sharding(opt.init(params), params, mesh, zero=True)
    adam = sh[1][0]
    specs = {"/".join(getattr(k, "key", str(k)) for k in path): s.spec
             for path, s in jax.tree_util.tree_flatten_with_path(adam.mu)[0]}
    # col-parallel (8, 16) kernel: axis0 8 % dp 4 == 0 -> ("data", "model")
    assert specs["encoder_layers_0/feed_forward/w_1/kernel"] == P("data", "model")
    # row-parallel (16, 8): axis0 free and divisible -> ("data", None)? no —
    # axis0 carries "model"; first FREE axis is 1 (8 % 4 == 0)
    assert specs["encoder_layers_0/feed_forward/w_2/kernel"] == P("model", "data")
    # replicated (16, 8) embedding: axis0 16 % 4 == 0 -> ("data", None)
    assert specs["tgt_embed/lut/embedding"] == P("data", None)
    # 1-D biases of size 8: 8 % 4 == 0 -> sharded too
    assert specs["encoder_layers_0/feed_forward/w_2/bias"] == P("data")
    assert adam.count.spec == P()


def test_zero_opt_step_matches_single_device(fixture_dataset, tmp_path):
    """--zero_opt under a dp mesh: one XE step reproduces the single-device
    update bit-for-bit-ish, and the new optimizer state REMAINS sharded
    over data after the step (the memory saving persists, XLA derives the
    reduce-scatter/all-gather)."""
    m1 = _built_module(fixture_dataset, tmp_path / "single", None)
    m2 = _built_module(fixture_dataset, tmp_path / "mesh", "2,2", ["--zero_opt"])
    step1, step2 = m1.make_xe_step(), m2.make_xe_step()
    batch = next(iter(m1.train_loader))
    rng = jax.random.PRNGKey(0)
    s1, loss1, _ = step1(m1.state, m1._model_inputs(batch), jnp.asarray(batch["masks"]), rng)
    s2, loss2, _ = step2(m2.state, m2._model_inputs(batch), jnp.asarray(batch["masks"]), rng)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.params, s2.params)
    assert max(jax.tree.leaves(d)) < 1e-5
    # the data axis still partitions at least the big moment tensors after
    # the jitted update (no silent re-replication)
    def data_sharded(tree):
        return [x for x in jax.tree.leaves(tree)
                if hasattr(x, "sharding") and "data" in str(getattr(x.sharding, "spec", ""))]
    before = data_sharded(m2.state.opt_w)
    after = data_sharded(s2.opt_w)
    assert before, "init opt state should carry data-sharded leaves"
    assert len(after) >= len(before) // 2, (
        f"opt state lost its ZeRO sharding in the step: {len(before)} -> {len(after)}")


def test_train_e2e_mesh_zero_and_resume_resharded(fixture_dataset, tmp_path):
    """Full train() loop under --mesh_shape 2,1 --zero_opt, then a resumed
    run: restore returns host arrays, so train() must RE-SHARD the state
    (TP/ZeRO shardings survive a crash-restart) — pins the re-shard branch
    after maybe_load_checkpoint."""
    import os, sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_train import TINY_TRANSFORMER, run_train, tiny_args

    argv = tiny_args(fixture_dataset, tmp_path / "runA", "transformer", TINY_TRANSFORMER)
    argv += ["--mesh_shape", "2,1", "--zero_opt"]
    mod_a = run_train(argv)
    assert mod_a.global_step > 0

    def data_sharded(tree):
        return [x for x in jax.tree.leaves(tree)
                if hasattr(x, "sharding") and "data" in str(getattr(x.sharding, "spec", ""))]

    assert data_sharded(mod_a.state.opt_w), "ZeRO moments must be data-sharded after train()"

    argv_b = tiny_args(fixture_dataset, tmp_path / "runB", "transformer",
                       TINY_TRANSFORMER + ["--start_from", mod_a.config.log_dir,
                                           "--resume_training"])
    argv_b += ["--mesh_shape", "2,1", "--zero_opt"]
    mod_b = run_train(argv_b)
    # resumed, not restarted — and the restored state is sharded again
    assert mod_b.global_step > mod_a.global_step
    assert data_sharded(mod_b.state.opt_w), "restored optimizer state must be re-sharded"


def test_zero_mask_opt_state_sharding():
    """--zero_opt also shards the MASK optimizer's moments (supermask logits
    are kernel-sized: at 95%-sparsity training they are half the optimizer
    memory); the masks themselves stay replicated (shared-draw semantics)."""
    import optax

    from sparse_caption_tpu.parallel import opt_state_sharding

    mesh = make_mesh("4,2")
    masks = {"encoder_layers_0": {"feed_forward": {"w_1": {"mask": jnp.ones((8, 16))},
                                                   "w_2": {"mask": jnp.ones((16, 8))}}},
             "norm": {"scale_like": jnp.ones((6,))}}  # indivisible 1-D: untouched
    opt = optax.adam(100.0, eps=1e-2)
    sh = opt_state_sharding(opt.init(masks), masks, mesh, zero=True)
    adam = sh[0]
    specs = {"/".join(getattr(k, "key", str(k)) for k in path): s.spec
             for path, s in jax.tree_util.tree_flatten_with_path(adam.mu)[0]}
    assert specs["encoder_layers_0/feed_forward/w_1/mask"] == P("data", "model")
    assert specs["encoder_layers_0/feed_forward/w_2/mask"] == P("model", "data")
    assert specs["norm/scale_like"] == P()  # 6 % 4 != 0 -> replicated


def test_fsdp_param_sharding_specs():
    """--fsdp (ZeRO-3): the params THEMSELVES shard their first free
    divisible axis over data, composing with the Megatron TP axis; tiny or
    indivisible leaves stay replicated."""
    from sparse_caption_tpu.models.transformer import Transformer

    mesh = make_mesh("4,2")
    m = Transformer(vocab_size=16, d_model=8, dim_feedforward=16, num_layers=1,
                    num_heads=2, att_feat_size=4, max_seq_length=5)
    params = m.init({"params": jax.random.PRNGKey(0)}, jnp.ones((2, 3, 4)), jnp.ones((2, 3)),
                    jnp.ones((2, 5), jnp.int32))["params"]
    sh = param_sharding(params, mesh, fsdp=True)
    specs = {"/".join(getattr(k, "key", str(k)) for k in path): s.spec
             for path, s in jax.tree_util.tree_flatten_with_path(sh)[0]}
    # col-parallel (8, 16): axis1 carries "model"; axis0 8 % dp 4 == 0
    assert specs["encoder_layers_0/feed_forward/w_1/kernel"] == P("data", "model")
    # row-parallel (16, 8): axis0 carries "model"; axis1 8 % 4 == 0
    assert specs["encoder_layers_0/feed_forward/w_2/kernel"] == P("model", "data")
    # TP-replicated (16, 8) embedding fully shards axis0 over data
    assert specs["tgt_embed/lut/embedding"] == P("data", None)
    # 1-D bias of size 8 shards; a scalar-sized norm stays replicated
    assert specs["encoder_layers_0/feed_forward/w_2/bias"] == P("data")
    # fsdp=False leaves params TP-only (no data axis anywhere)
    sh_tp = param_sharding(params, mesh, fsdp=False)
    assert all("data" not in str(s.spec) for s in jax.tree.leaves(sh_tp))


def test_fsdp_step_matches_single_device(fixture_dataset, tmp_path):
    """--fsdp under a dp x tp mesh: one XE step reproduces the single-device
    update, and the updated params REMAIN data-sharded after the jitted
    step (the 1/dp parameter memory persists; XLA derives the just-in-time
    all-gathers and the gradient reduce-scatter)."""
    m1 = _built_module(fixture_dataset, tmp_path / "single", None)
    m2 = _built_module(fixture_dataset, tmp_path / "mesh", "2,2", ["--fsdp"])
    step1, step2 = m1.make_xe_step(), m2.make_xe_step()
    batch = next(iter(m1.train_loader))
    rng = jax.random.PRNGKey(0)
    s1, loss1, _ = step1(m1.state, m1._model_inputs(batch), jnp.asarray(batch["masks"]), rng)
    s2, loss2, _ = step2(m2.state, m2._model_inputs(batch), jnp.asarray(batch["masks"]), rng)
    np.testing.assert_allclose(float(loss1), float(loss2), rtol=1e-5)
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.params, s2.params)
    assert max(jax.tree.leaves(d)) < 1e-5

    def data_sharded(tree):
        return [x for x in jax.tree.leaves(tree)
                if hasattr(x, "sharding") and "data" in str(getattr(x.sharding, "spec", ""))]

    before_p, after_p = data_sharded(m2.state.params), data_sharded(s2.params)
    assert before_p, "init params should carry data-sharded leaves under --fsdp"
    assert len(after_p) >= len(before_p) // 2, (
        f"params lost their FSDP sharding in the step: {len(before_p)} -> {len(after_p)}")
    # optimizer moments follow the fully-sharded params
    assert data_sharded(s2.opt_w), "fsdp moments must stay data-sharded after the step"


def test_fsdp_scst_device_reward_step_matches_single_device(fixture_dataset, tmp_path):
    """--fsdp composes with the device-reward SCST step: fully-sharded
    params through the sampling scan + in-jit CIDEr-D + grad update match
    single-device, and params stay data-sharded afterward."""
    extra = ["--scst_start_epoch", "0", "--scst_num_samples", "3",
             "--scst_sample", "random", "--scst_baseline", "sample",
             "--scst_reward", "device"]
    m1 = _built_module(fixture_dataset, tmp_path / "single", None, extra)
    m2 = _built_module(fixture_dataset, tmp_path / "mesh", "2,1", extra + ["--fsdp"])
    s1_fn, s2_fn = m1.make_scst_step(), m2.make_scst_step()
    s1, loss1, aux1 = s1_fn(m1.state, next(iter(m1.train_loader)))
    s2, loss2, aux2 = s2_fn(m2.state, next(iter(m2.train_loader)))
    np.testing.assert_allclose(float(loss1), float(loss2), atol=1e-5)
    np.testing.assert_allclose(float(aux1["avg_reward"]), float(aux2["avg_reward"]),
                               atol=1e-5)
    d = jax.tree.map(lambda a, b: float(jnp.max(jnp.abs(a - b))), s1.params, s2.params)
    assert max(jax.tree.leaves(d)) < 1e-5
    assert any("data" in str(getattr(x.sharding, "spec", ""))
               for x in jax.tree.leaves(s2.params)), "params must stay FSDP-sharded"


def test_prune_gradual_on_device_under_mesh(fixture_dataset, tmp_path):
    """Gradual magnitude pruning (device-side jnp.quantile mask updates)
    through the full prune train loop under a dp mesh + --fsdp reaches the
    same sparsity target as single-device."""
    import os, sys

    sys.path.insert(0, os.path.dirname(__file__))
    from test_train import TINY_TRANSFORMER, run_train, tiny_args

    extra = ["--prune_type", "mag_grad_uniform", "--prune_sparsity_target", "0.5",
             "--prune_gradual_frequency", "2", "--max_epochs", "8",
             "--save_checkpoint_every", "50", "--prune_gradual_on_device",
             "--mesh_shape", "2,1", "--fsdp"]
    argv = tiny_args(fixture_dataset, tmp_path / "mesh",
                     "relation_transformer_prune", TINY_TRANSFORMER + extra)
    module = run_train(argv, prune=True)
    from sparse_caption_tpu.pruning.engine import mask_sparsity

    s, _, _ = mask_sparsity(module.state.masks, "mag_grad_uniform")
    assert abs(float(s) - 0.5) < 0.05


def test_fsdp_decode_matches_single_device(fixture_dataset, tmp_path):
    """Beam-5 decode with fully-sharded params emits the same tokens as one
    device (GSPMD all-gathers each kernel just-in-time inside the scan)."""
    m1 = _built_module(fixture_dataset, tmp_path / "single", None)
    m2 = _built_module(fixture_dataset, tmp_path / "mesh", "2,2", ["--fsdp"])
    batch = next(iter(m1.val_loader))
    opt = {"beam_size": 5}
    d1, d2 = m1.make_decode_fn(opt), m2.make_decode_fn(opt)
    seq1, _ = d1(m1._variables(m1.state), m1._model_inputs(batch, with_seqs=False),
                 jax.random.PRNGKey(0))
    with m2.mesh:
        seq2, _ = d2(m2._variables(m2.state), m2._model_inputs(batch, with_seqs=False),
                     jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(seq1), np.asarray(seq2))


# ---------------------------------------------------------------- pipeline

def _tiny_transformer_forward():
    from sparse_caption_tpu.models.transformer import Transformer

    model = Transformer(vocab_size=16, d_model=8, dim_feedforward=16, num_layers=4,
                        num_heads=2, att_feat_size=4, max_seq_length=5)
    rng = jax.random.PRNGKey(0)
    att = jax.random.normal(rng, (8, 3, 4))
    amask = jnp.ones((8, 3))
    tgt = jax.random.randint(jax.random.PRNGKey(1), (8, 5), 0, 16)
    vs = model.init({"params": rng}, att, amask, tgt)
    memory = model.apply(vs, att, amask, method=Transformer.encode)
    seq = model.apply(vs, tgt, memory["memory"], memory["mask"], False,
                      method=Transformer._decode_full)
    return model, vs, tgt, memory, seq


@pytest.mark.parametrize("n_stages,n_micro", [(4, 4), (2, 4), (4, 8), (1, 2)])
def test_pipeline_decoder_matches_sequential(n_stages, n_micro):
    """GPipe-microbatched decoder stack over a ("pipe",) mesh equals the
    sequential layer loop — for 1 layer/stage, 2 layers/stage (in-stage
    lax.scan), more microbatches than stages, and the degenerate 1-stage
    pipe."""
    from sparse_caption_tpu.parallel.pipeline import make_pipe_mesh, pipelined_decode_full

    model, vs, tgt, memory, seq = _tiny_transformer_forward()
    mesh = make_pipe_mesh(n_stages)
    out = pipelined_decode_full(model, vs, tgt, memory, mesh, n_micro=n_micro)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), rtol=2e-5, atol=2e-6)


@pytest.mark.parametrize("n_stages,n_micro", [(4, 4), (2, 8)])
def test_pipeline_train_grads_match_sequential(n_stages, n_micro):
    """GPipe BACKWARD: the XE loss and the full param-tree gradients
    through the pipelined decoder stack equal the sequential backward
    (the tick loop's ppermute transposes into the reverse-stage grad
    hops), and an adam update applies to the unstacked grads."""
    import optax

    from sparse_caption_tpu.engine import losses as losses_mod
    from sparse_caption_tpu.parallel.pipeline import make_pipe_mesh, pipeline_xe_loss_and_grads

    model, vs, tgt, memory, _ = _tiny_transformer_forward()
    seqs = jnp.concatenate(
        [jnp.full((tgt.shape[0], 1), model.bos_id, jnp.int32), tgt[:, :-1]], axis=1)

    def seq_loss(params):
        lp = model.apply({"params": params}, memory, seqs, False,
                         method="decode_teacher_forced")
        m = (seqs[:, 1:] != model.pad_id).astype(lp.dtype)
        return losses_mod.language_model_loss(lp, seqs[:, 1:], m)

    ref_loss, ref_g = jax.value_and_grad(seq_loss)(vs["params"])
    mesh = make_pipe_mesh(n_stages)
    loss, g = pipeline_xe_loss_and_grads(model, vs, seqs, memory, mesh, n_micro)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-6)
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_g)
    flat_g = dict(jax.tree_util.tree_flatten_with_path(g)[0])
    assert len(flat_ref) == len(flat_g)
    for path, leaf in flat_ref:
        np.testing.assert_allclose(np.asarray(flat_g[path]), np.asarray(leaf),
                                   rtol=2e-4, atol=2e-6, err_msg=str(path))

    # the unstacked grads drive a standard optax update unchanged
    opt = optax.adam(1e-3)
    updates, _ = opt.update(g, opt.init(vs["params"]), vs["params"])
    new_params = optax.apply_updates(vs["params"], updates)
    assert jax.tree_util.tree_structure(new_params) == jax.tree_util.tree_structure(vs["params"])


def test_pipeline_guards():
    from sparse_caption_tpu.parallel.pipeline import make_pipe_mesh, pipelined_decode_full

    model, vs, tgt, memory, _ = _tiny_transformer_forward()
    with pytest.raises(AssertionError, match="stages"):
        pipelined_decode_full(model, vs, tgt, memory, make_pipe_mesh(3), n_micro=4)
    with pytest.raises(AssertionError, match="n_micro"):
        pipelined_decode_full(model, vs, tgt, memory, make_pipe_mesh(2), n_micro=3)


@pytest.mark.parametrize("n_stages,dp,n_micro", [(2, 2, 4), (2, 4, 2), (4, 2, 4)])
def test_pipeline_dp_composition_matches_sequential(n_stages, dp, n_micro):
    """dp x pp: the 2-D ("data", "pipe") mesh — each data shard running its
    own lock-step pipeline over its microbatch slice — still equals the
    sequential decoder stack."""
    from sparse_caption_tpu.parallel.pipeline import make_pipe_mesh, pipelined_decode_full

    model, vs, tgt, memory, seq = _tiny_transformer_forward()
    mesh = make_pipe_mesh(n_stages, dp=dp)
    assert dict(mesh.shape) == {"data": dp, "pipe": n_stages}
    out = pipelined_decode_full(model, vs, tgt, memory, mesh, n_micro=n_micro)
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), rtol=2e-5, atol=2e-6)


def test_pipeline_dp_train_grads_match_sequential():
    """dp x pp BACKWARD: gradients through the data-sharded pipeline equal
    the sequential backward (param cotangents psum over the data axis via
    shard_map's replicated-input transpose rule)."""
    from sparse_caption_tpu.engine import losses as losses_mod
    from sparse_caption_tpu.parallel.pipeline import make_pipe_mesh, pipeline_xe_loss_and_grads

    model, vs, tgt, memory, _ = _tiny_transformer_forward()
    seqs = jnp.concatenate(
        [jnp.full((tgt.shape[0], 1), model.bos_id, jnp.int32), tgt[:, :-1]], axis=1)

    def seq_loss(params):
        lp = model.apply({"params": params}, memory, seqs, False,
                         method="decode_teacher_forced")
        m = (seqs[:, 1:] != model.pad_id).astype(lp.dtype)
        return losses_mod.language_model_loss(lp, seqs[:, 1:], m)

    ref_loss, ref_g = jax.value_and_grad(seq_loss)(vs["params"])
    mesh = make_pipe_mesh(2, dp=2)
    loss, g = pipeline_xe_loss_and_grads(model, vs, seqs, memory, mesh, n_micro=4)
    np.testing.assert_allclose(float(loss), float(ref_loss), rtol=2e-6)
    flat_ref = jax.tree_util.tree_leaves_with_path(ref_g)
    flat_g = dict(jax.tree_util.tree_flatten_with_path(g)[0])
    for path, leaf in flat_ref:
        np.testing.assert_allclose(np.asarray(flat_g[path]), np.asarray(leaf),
                                   rtol=2e-4, atol=2e-6, err_msg=str(path))


def test_pipeline_masked_stack_matches_sequential():
    """Masked (supermask) decoder stack: eval-mode round-sigmoid masks
    sampled OUTSIDE the pipeline and applied as plain multipliers inside
    the stages equal the in-model masked sequential forward."""
    from sparse_caption_tpu.models.transformer import Transformer
    from sparse_caption_tpu.ops.masked import MaskConfig
    from sparse_caption_tpu.parallel.pipeline import (
        _sample_mask_tree,
        make_pipe_mesh,
        pipelined_decoder_stack,
        stack_decoder_layers,
    )

    cfg = MaskConfig(mask_type="supermask", mask_init_value=0.1)
    model = Transformer(vocab_size=16, d_model=8, dim_feedforward=16, num_layers=4,
                        num_heads=2, att_feat_size=4, max_seq_length=5, mask_cfg=cfg)
    rng = jax.random.PRNGKey(0)
    att = jax.random.normal(rng, (8, 3, 4))
    amask = jnp.ones((8, 3))
    tgt = jax.random.randint(jax.random.PRNGKey(1), (8, 5), 0, 16)
    vs = model.init({"params": rng, "mask": rng}, att, amask, tgt)
    # perturb the logits so round(sigmoid) is a non-trivial 0/1 pattern
    masks = jax.tree.map(
        lambda m: m + 3.0 * jax.random.normal(jax.random.PRNGKey(7), m.shape), vs["masks"])
    vs = {"params": vs["params"], "masks": masks}
    memory = model.apply(vs, att, amask, method=Transformer.encode)
    seq = model.apply(vs, tgt, memory["memory"], memory["mask"], False,
                      method=Transformer._decode_full)  # eval: round-sigmoid masks

    from sparse_caption_tpu.models.transformer import subsequent_mask

    sampled = _sample_mask_tree(masks, cfg, None)  # eval-mode: deterministic
    layer_masks = {k: v for k, v in sampled.items() if k.startswith("decoder_layers_")}
    stacked_m = stack_decoder_layers(layer_masks)
    t = tgt.shape[1]
    tgt_mask = (tgt != model.pad_id)[:, None, None, :] & subsequent_mask(t)
    src_mask = memory["mask"][:, None, None, :]
    x = model.apply(vs, tgt,
                    method=lambda m, tg: m.pos_enc(m.tgt_embed(tg, False), train=False))
    y = pipelined_decoder_stack(model, vs["params"], x, memory["memory"], src_mask,
                                tgt_mask, make_pipe_mesh(2), n_micro=4,
                                stacked_masks=stacked_m)
    out = model.apply(vs, y, method=lambda m, h: m.decoder_norm(h))
    np.testing.assert_allclose(np.asarray(out), np.asarray(seq), rtol=2e-5, atol=2e-6)


def test_pipeline_masked_train_grads_flow():
    """pipeline_xe_train_loss_and_grads with masks: supermask Bernoulli
    sampling outside the pipeline, straight-through mask grads reach every
    logit tree (encoder + decoder layers), and N=1 == N=2 with the same
    rng."""
    from sparse_caption_tpu.models.transformer import Transformer
    from sparse_caption_tpu.ops.masked import MaskConfig
    from sparse_caption_tpu.engine.losses import language_model_loss
    from sparse_caption_tpu.parallel.pipeline import (
        make_pipe_mesh, pipeline_xe_train_loss_and_grads)

    cfg = MaskConfig(mask_type="supermask", mask_init_value=1.0)
    model = Transformer(vocab_size=16, d_model=8, dim_feedforward=16, num_layers=4,
                        num_heads=2, att_feat_size=4, max_seq_length=5, mask_cfg=cfg)
    rng = jax.random.PRNGKey(0)
    att = jax.random.normal(rng, (8, 3, 4))
    amask = jnp.ones((8, 3))
    seqs = jax.random.randint(jax.random.PRNGKey(1), (8, 6), 4, 16)
    vs = model.init({"params": rng, "mask": rng}, att, amask, seqs[:, :-1])
    seq_masks = jnp.ones_like(seqs, jnp.float32)
    crit = lambda lp, tgt, m: language_model_loss(lp, tgt, m)  # noqa: E731
    inputs = {"att_feats": att, "att_masks": amask, "seqs": seqs}

    results = {}
    for n in (1, 2):
        results[n] = pipeline_xe_train_loss_and_grads(
            model, vs["params"], inputs, seq_masks, crit, make_pipe_mesh(n),
            n_micro=4, masks=vs["masks"], mask_rng=jax.random.PRNGKey(5))
    l1, g1, gm1 = results[1]
    l2, g2, gm2 = results[2]
    np.testing.assert_allclose(float(l1), float(l2), rtol=2e-6)
    for a, b in zip(jax.tree.leaves(g1), jax.tree.leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)
    for a, b in zip(jax.tree.leaves(gm1), jax.tree.leaves(gm2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=2e-4, atol=2e-6)
    # straight-through grads reach both in-pipeline and outside-pipeline masks
    flat = dict(jax.tree_util.tree_flatten_with_path(gm1)[0])
    dec = [v for k, v in flat.items() if "decoder_layers" in str(k)]
    other = [v for k, v in flat.items() if "decoder_layers" not in str(k)]
    assert dec and other
    assert max(float(jnp.max(jnp.abs(v))) for v in dec) > 0
    assert max(float(jnp.max(jnp.abs(v))) for v in other) > 0
