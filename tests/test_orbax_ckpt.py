"""--ckpt_backend orbax: async sharded checkpoints (per-shard writes, no
host gather) as a drop-in for the msgpack layout — same tags, same restore
semantics, cross-backend reads via find_ckpt."""

import os
import sys

import jax
import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(__file__))
from test_train import TINY_TRANSFORMER, run_train, tiny_args  # noqa: E402


def test_orbax_train_resume_and_cross_backend(fixture_dataset, tmp_path):
    """Full train() under --ckpt_backend orbax writes .orbax dirs (and no
    msgpack twins), a resumed run restores step + optimizer from them, and
    a msgpack-format run restores under the orbax backend (find_ckpt)."""
    argv = tiny_args(fixture_dataset, tmp_path / "runA", "transformer", TINY_TRANSFORMER)
    argv += ["--ckpt_backend", "orbax"]
    mod_a = run_train(argv)
    assert mod_a.global_step > 0
    for tag in ("init", "last"):
        assert os.path.isdir(tmp_path / "runA" / f"model_{tag}.orbax"), tag
        assert not os.path.exists(tmp_path / "runA" / f"model_{tag}.msgpack"), tag
    assert os.path.isdir(tmp_path / "runA" / "optimizer_last.orbax")

    # resume: step + optimizer state come back from the orbax artifacts
    argv_b = tiny_args(fixture_dataset, tmp_path / "runB", "transformer",
                       TINY_TRANSFORMER + ["--start_from", mod_a.config.log_dir,
                                           "--resume_training"])
    argv_b += ["--ckpt_backend", "orbax"]
    mod_b = run_train(argv_b)
    assert mod_b.global_step > mod_a.global_step

    # cross-backend: a msgpack run restores when the new run saves orbax
    argv_c = tiny_args(fixture_dataset, tmp_path / "runC", "transformer", TINY_TRANSFORMER)
    mod_c = run_train(argv_c)  # msgpack (default backend)
    assert os.path.isfile(tmp_path / "runC" / "model_last.msgpack")
    argv_d = tiny_args(fixture_dataset, tmp_path / "runD", "transformer",
                       TINY_TRANSFORMER + ["--start_from", mod_c.config.log_dir,
                                           "--resume_training"])
    argv_d += ["--ckpt_backend", "orbax"]
    mod_d = run_train(argv_d)
    assert mod_d.global_step > mod_c.global_step
    assert os.path.isdir(tmp_path / "runD" / "model_last.orbax")


def test_orbax_roundtrip_values_match_msgpack(fixture_dataset, tmp_path):
    """The params saved through the orbax path restore bit-identical to the
    in-memory state (same contract the msgpack path has)."""
    from sparse_caption_tpu.engine.checkpoints import (
        load_pytree, save_pytree, wait_for_checkpoints)

    argv = tiny_args(fixture_dataset, tmp_path / "run", "transformer", TINY_TRANSFORMER)
    mod = run_train(argv)
    tree = {"params": mod.state.params, "masks": mod.state.masks}
    p = save_pytree(str(tmp_path / "x.orbax"), tree)
    wait_for_checkpoints()
    back = load_pytree(p, tree)
    for a, b in zip(jax.tree.leaves(tree), jax.tree.leaves(back)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_orbax_restores_directly_onto_fsdp_shardings(tmp_path):
    """load_pytree_orbax(target, shardings) restores each array straight
    onto its mesh shard (values exact, sharding spec preserved) — the
    no-host-gather restore path for FSDP/ZeRO state at multi-chip scale."""
    import jax.numpy as jnp

    from sparse_caption_tpu.engine.checkpoints import (
        load_pytree_orbax, save_pytree, wait_for_checkpoints)
    from sparse_caption_tpu.models.transformer import Transformer
    from sparse_caption_tpu.parallel import make_mesh, param_sharding

    mesh = make_mesh("4,2")
    m = Transformer(vocab_size=16, d_model=8, dim_feedforward=16, num_layers=1,
                    num_heads=2, att_feat_size=4, max_seq_length=5)
    params = m.init({"params": jax.random.PRNGKey(0)}, jnp.ones((2, 3, 4)), jnp.ones((2, 3)),
                    jnp.ones((2, 5), jnp.int32))["params"]
    sh = param_sharding(params, mesh, fsdp=True)
    sharded = jax.tree.map(jax.device_put, params, sh)
    p = save_pytree(str(tmp_path / "fsdp.orbax"), sharded)
    wait_for_checkpoints()

    back = load_pytree_orbax(p, params, shardings=sh)
    for a, b, s in zip(jax.tree.leaves(params), jax.tree.leaves(back), jax.tree.leaves(sh)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert b.sharding == s, (b.sharding, s)


@pytest.mark.skipif(jax.device_count() < 8, reason="needs 8 virtual devices")
def test_orbax_restore_across_mesh_shape_change(tmp_path):
    """A checkpoint written from one mesh topology restores onto a DIFFERENT
    one (values exact, new shardings honored) — the shard-layout mechanics of
    restoring after a process-count change (SURVEY §2.11: a run saved on
    N hosts must resume on M). Orbax per-shard files are keyed by the global
    array, not the writing topology, so a (4,2)-mesh FSDP save must land on
    (2,4) and pure-dp (8,) shardings unchanged."""
    import jax.numpy as jnp

    from sparse_caption_tpu.engine.checkpoints import (
        load_pytree_orbax, save_pytree, wait_for_checkpoints)
    from sparse_caption_tpu.models.transformer import Transformer
    from sparse_caption_tpu.parallel import make_mesh, param_sharding

    m = Transformer(vocab_size=16, d_model=8, dim_feedforward=16, num_layers=1,
                    num_heads=2, att_feat_size=4, max_seq_length=5)
    params = m.init({"params": jax.random.PRNGKey(0)}, jnp.ones((2, 3, 4)), jnp.ones((2, 3)),
                    jnp.ones((2, 5), jnp.int32))["params"]
    mesh_a = make_mesh("4,2")
    sh_a = param_sharding(params, mesh_a, fsdp=True)
    p = save_pytree(str(tmp_path / "a.orbax"), jax.tree.map(jax.device_put, params, sh_a))
    wait_for_checkpoints()

    for shape, fsdp in (("2,4", True), ("8", True), ("8", False)):
        mesh_b = make_mesh(shape)
        sh_b = param_sharding(params, mesh_b, fsdp=fsdp)
        back = load_pytree_orbax(p, params, shardings=sh_b)
        for a, b, s in zip(jax.tree.leaves(params), jax.tree.leaves(back),
                           jax.tree.leaves(sh_b)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
            assert b.sharding == s, (shape, fsdp, b.sharding, s)


def test_orbax_prune_run_exports_pruned_artifacts(fixture_dataset, tmp_path):
    """A prune run under --ckpt_backend orbax must still produce the pruned
    exports (model_best_pruned, sparse npz, bin-mask, sparsities.csv):
    export_pruned_best gates on the best checkpoint existing, and with
    orbax that is a DIRECTORY, not a file (ADVICE r3: os.path.isfile gate
    silently skipped the whole export)."""
    argv = tiny_args(
        fixture_dataset, tmp_path / "run", "relation_transformer_prune",
        TINY_TRANSFORMER + ["--prune_type", "mag_blind", "--prune_sparsity_target", "0.5",
                            "--ckpt_backend", "orbax"])
    mod = run_train(argv, prune=True)
    run = tmp_path / "run"
    if not os.path.isdir(run / "model_best.orbax"):
        # the untrained fixture model scores CIDEr 0.0, so train() never
        # takes the best branch — force the best save through the same
        # code path, then run the export exactly as train() does
        mod.save_checkpoint("best")
        mod.export_pruned_best()
        from sparse_caption_tpu.engine.checkpoints import wait_for_checkpoints

        wait_for_checkpoints()
    assert os.path.isdir(run / "model_best.orbax"), "precondition: best ckpt saved as orbax dir"
    assert os.path.isdir(run / "model_best_pruned.orbax"), "pruned export missing"
    assert os.path.isfile(run / "model_best_pruned_sparse.npz")
    assert os.path.isfile(run / "sparsities.csv")
    # the async export saves were joined before process exit: no partial tmp dirs
    leftovers = [p for p in os.listdir(run) if ".orbax" in p and "tmp" in p.lower()]
    assert not leftovers, leftovers
    # and the committed artifact is readable
    from sparse_caption_tpu.engine.checkpoints import load_pytree

    tree = load_pytree(str(run / "model_best_pruned.orbax"))
    assert "params" in tree


def test_is_orbax_path_rejects_plain_dirs(tmp_path):
    """A random directory is not an orbax checkpoint; load_pytree on it
    raises a clear error instead of an opaque orbax one (ADVICE r3)."""
    from sparse_caption_tpu.engine.checkpoints import is_orbax_path, load_pytree

    d = tmp_path / "not_a_ckpt"
    d.mkdir()
    assert not is_orbax_path(str(d))
    with pytest.raises(ValueError, match="not an orbax checkpoint"):
        load_pytree(str(d))
    # but .orbax-suffixed paths and marker-bearing dirs are accepted
    assert is_orbax_path(str(tmp_path / "x.orbax"))
    (d / "_CHECKPOINT_METADATA").write_text("{}")
    assert is_orbax_path(str(d))


def test_find_ckpt_prefers_newer_when_both_backends_exist(tmp_path):
    """A run restarted in place after switching --ckpt_backend leaves both
    artifacts; resume/eval must pick the NEWER one (ADVICE r3: the
    unconditional msgpack preference rewound training to stale weights)."""
    import time as _time

    from sparse_caption_tpu.engine.checkpoints import find_ckpt

    msg = tmp_path / "model_last.msgpack"
    orb = tmp_path / "model_last.orbax"
    msg.write_bytes(b"x")
    orb.mkdir()
    now = _time.time()
    os.utime(msg, (now - 100, now - 100))
    os.utime(orb, (now, now))
    assert find_ckpt(str(tmp_path), "model_last") == str(orb)
    os.utime(msg, (now + 100, now + 100))
    assert find_ckpt(str(tmp_path), "model_last") == str(msg)


def test_eval_model_reads_orbax_run(fixture_dataset, tmp_path):
    """scripts/eval_model.py evaluates a run whose checkpoints are orbax
    dirs (find_ckpt resolves model_best/model_last across backends)."""
    import subprocess

    argv = tiny_args(fixture_dataset, tmp_path / "run", "transformer", TINY_TRANSFORMER)
    argv += ["--ckpt_backend", "orbax"]
    run_train(argv)

    repo = os.path.join(os.path.dirname(__file__), "..")
    r = subprocess.run(
        [sys.executable, os.path.join(repo, "scripts", "eval_model.py"),
         "--log_dir", str(tmp_path / "run"), "--ckpt", "last", "--split", "val",
         "--beam_size", "2", "--platform", "cpu"],
        capture_output=True, text=True, timeout=900,
    )
    assert r.returncode == 0, r.stderr[-3000:]
    assert "CIDEr" in r.stdout
