"""Multi-process (multi-host) execution — SURVEY §2.11's new distributed
component (the reference's only nod to multi-device is a commented-out
``--gpus`` flag, ``/root/reference/sparse_caption/utils/training.py:354-357``).

Two layers of evidence:

* a host-only unit test pinning the BatchLoader's per-process shards to
  reassemble EXACTLY into the single-process global batch (same seed,
  same shuffle, same caption sampling — the rng-consumption contract in
  ``data/batching.py:147-158``)
* a real 2-process e2e: two OS processes x 2 virtual CPU devices each,
  gloo collectives through ``jax.distributed.initialize``, training the
  tiny transformer through the actual CLI entry on a shared log_dir —
  final params/optimizer state pinned equal to the single-process
  4-device run with identical seeds and global batches
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

ROOT = os.path.abspath(os.path.join(os.path.dirname(__file__), ".."))
TRAIN = os.path.join(ROOT, "scripts", "train_transformer.py")

sys.path.insert(0, os.path.join(ROOT, "scripts"))

TINY = [
    "--caption_model", "transformer",
    "--dataset", "mscoco_testing",
    "--tokenizer", "word",
    "--vocab_size", "64",
    "--batch_size", "4",
    "--batch_size_eval", "4",
    "--max_epochs", "2",
    "--max_seq_length", "10",
    "--save_checkpoint_every", "2",
    "--losses_log_every", "1",
    "--max_att_regions", "8",
    "--att_feat_size", "16",
    "--seq_per_img", "3",
    "--cache_min_free_ram", "1.0",
    "--d_model", "8", "--dim_feedforward", "16",
    "--num_layers", "1", "--num_heads", "2",
    "--platform", "cpu",
]


def _free_port() -> int:
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _env_with(n_local):
    env = os.environ.copy()
    env["XLA_FLAGS"] = f"--xla_force_host_platform_device_count={n_local}"
    env.pop("JAX_PLATFORMS", None)  # --platform cpu does the pinning
    return env


def _communicate_all(procs, timeout):
    """Drain every process's stdout CONCURRENTLY: the processes synchronize
    via collectives, so a sequential communicate() can deadlock when one
    fills its 64KB pipe while the caller is still blocked reading another."""
    import threading

    outs = [None] * len(procs)

    def drain(i, p):
        outs[i], _ = p.communicate(timeout=timeout)

    threads = [threading.Thread(target=drain, args=(i, p), daemon=True)
               for i, p in enumerate(procs)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=timeout)
    return outs


def _assert_ckpts_close(dir_a, dir_b, tol=1e-5):
    """Leaf-by-leaf checkpoint comparison: float leaves within tol, other
    dtypes exact (only cross-process reduction order may differ)."""
    import jax

    from sparse_caption_tpu.engine.checkpoints import load_pytree

    for name in ("model_last.msgpack", "optimizer_last.msgpack"):
        a_leaves = jax.tree.leaves(load_pytree(str(os.path.join(dir_a, name))))
        b_leaves = jax.tree.leaves(load_pytree(str(os.path.join(dir_b, name))))
        assert len(a_leaves) == len(b_leaves) > 0
        worst = 0.0
        for a, b in zip(a_leaves, b_leaves):
            a, b = np.asarray(a), np.asarray(b)
            assert a.shape == b.shape
            if a.dtype.kind == "f":
                worst = max(worst, float(np.max(np.abs(a - b))) if a.size else 0.0)
            else:
                np.testing.assert_array_equal(a, b)
        assert worst < tol, f"{name}: max |a - b| = {worst}"


def test_loader_process_shards_reassemble_global_batch(fixture_dataset, tmp_path):
    """Every process enumerates the identical global batch order and loads
    only its contiguous slice; concatenating the slices must reproduce the
    single-process batch bit-for-bit (features AND sampled captions)."""
    from sparse_caption_tpu.config import Config
    from sparse_caption_tpu.data.batching import BatchLoader
    from sparse_caption_tpu.engine.training import TrainingModule
    from sparse_caption_tpu.opts import parse_opt

    argv = TINY + ["--dataset_dir", fixture_dataset, "--log_dir", str(tmp_path)]
    module = TrainingModule(Config(**vars(parse_opt(argv))))
    recs = module.data.get_split("train", generation_mode=False)

    def loaders(train):
        full = BatchLoader(recs, module.batcher, 4, train=train, seed=7, prefetch=0)
        parts = [BatchLoader(recs, module.batcher, 4, train=train, seed=7, prefetch=0,
                             process_index=i, process_count=2) for i in range(2)]
        return full, parts

    for train in (True, False):
        full, (p0, p1) = loaders(train)
        n = 0
        for fb, b0, b1 in zip(full, p0, p1):
            n += 1
            assert fb["batch_valid"] == b0["batch_valid"] == b1["batch_valid"]
            # global metadata carried in full on every process
            assert fb["image_ids"] == b0["image_ids"] == b1["image_ids"]
            for k, v in fb.items():
                if not isinstance(v, np.ndarray):
                    continue
                got = np.concatenate([np.asarray(b0[k]), np.asarray(b1[k])], axis=0)
                np.testing.assert_array_equal(got, v, err_msg=f"key={k} train={train}")
        assert n == len(full) > 0


def test_dist_flags_never_persist_to_config_json(tmp_path):
    """Launch-topology keys (dist_*) and the auto-derived mesh_shape must
    NOT be written to config.json: a later eval/resume entry loading that
    config would re-enter jax.distributed.initialize and block waiting for
    processes that no longer exist (or rebuild a mesh the eval host cannot
    satisfy)."""
    import json

    from sparse_caption_tpu.config import Config

    cfg = Config(log_dir=str(tmp_path), dist_coordinator="127.0.0.1:9",
                 dist_num_processes=2, dist_process_id=0, dist_platform="cpu",
                 dist_local_device_count=2, mesh_shape="4", mesh_shape_auto=True,
                 caption_model="transformer")
    path = cfg.save_config(str(tmp_path))
    saved = json.load(open(path))
    for k in Config.TRANSIENT_KEYS + ("mesh_shape", "mesh_shape_auto"):
        assert k not in saved, k
    assert saved["caption_model"] == "transformer"
    # an EXPLICIT user mesh persists (same-topology resume keeps it)
    cfg2 = Config(log_dir=str(tmp_path), mesh_shape="4,2")
    saved2 = json.load(open(cfg2.save_config(str(tmp_path))))
    assert saved2["mesh_shape"] == "4,2"


@pytest.mark.slow
def test_two_process_tensor_parallel_matches_single_process(fixture_dataset, tmp_path):
    """2 processes x 2 devices with an explicit dp x tp mesh (2,2): the
    data-parallel gradient all-reduce crosses the process boundary (gloo)
    while attention/FFN kernels are tensor-parallel-sharded — the combined
    placement path (global_put via make_array_from_process_local_data on
    TP-sharded params) that the dp-only e2e never exercises. Pinned equal
    to the single-process (2,2) run."""
    port = _free_port()
    mp_dir = tmp_path / "mp_tp"
    sp_dir = tmp_path / "sp_tp"

    procs = []
    for pid in (0, 1):
        argv = TINY + [
            "--dataset_dir", fixture_dataset, "--log_dir", str(mp_dir),
            "--mesh_shape", "2,2",
            "--dist_coordinator", f"127.0.0.1:{port}",
            "--dist_num_processes", "2", "--dist_process_id", str(pid),
            "--dist_platform", "cpu",
        ]
        procs.append(subprocess.Popen(
            [sys.executable, TRAIN] + argv, env=_env_with(2),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = _communicate_all(procs, timeout=1800)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{(out or '')[-4000:]}"

    r = subprocess.run(
        [sys.executable, TRAIN] + TINY + [
            "--dataset_dir", fixture_dataset, "--log_dir", str(sp_dir),
            "--mesh_shape", "2,2"],
        env=_env_with(4), capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stderr[-4000:]

    _assert_ckpts_close(mp_dir, sp_dir)


@pytest.mark.slow
def test_two_process_train_matches_single_process(fixture_dataset, tmp_path):
    """2 processes x 2 virtual CPU devices (gloo) == 1 process x 4 devices:
    same seeds, same global batches, same mesh size -> same final params."""
    port = _free_port()
    mp_dir = tmp_path / "mp"
    sp_dir = tmp_path / "sp"

    procs = []
    for pid in (0, 1):
        argv = TINY + [
            "--dataset_dir", fixture_dataset, "--log_dir", str(mp_dir),
            "--dist_coordinator", f"127.0.0.1:{port}",
            "--dist_num_processes", "2", "--dist_process_id", str(pid),
            "--dist_platform", "cpu",
        ]
        procs.append(subprocess.Popen(
            [sys.executable, TRAIN] + argv, env=_env_with(2),
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = _communicate_all(procs, timeout=1800)
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"process {pid} failed:\n{(out or '')[-4000:]}"

    r = subprocess.run(
        [sys.executable, TRAIN] + TINY + [
            "--dataset_dir", fixture_dataset, "--log_dir", str(sp_dir),
            "--mesh_shape", "4"],
        env=_env_with(4), capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stderr[-4000:]

    # process 0 owns the host-side artifacts on the shared log_dir
    for name in ("model_last.msgpack", "optimizer_last.msgpack", "config.json"):
        assert os.path.isfile(mp_dir / name), name
    # only cross-process reduction order can differ (gloo ring vs
    # single-host all-reduce) — a few ulps over 4 optimizer steps
    _assert_ckpts_close(mp_dir, sp_dir)

    # eval artifacts were produced exactly once (primary only)
    assert os.path.isfile(mp_dir / "val_beam_1" / "scores.csv")

    # resume across a process-count change: a SINGLE process picks up the
    # 2-process run's checkpoints and trains on (SURVEY §2.11: a run saved
    # on N hosts must resume on M)
    resume_dir = tmp_path / "resumed"
    argv = list(TINY)
    argv[argv.index("--max_epochs") + 1] = "4"
    r = subprocess.run(
        [sys.executable, TRAIN] + argv + [
            "--dataset_dir", fixture_dataset, "--log_dir", str(resume_dir),
            "--start_from", str(mp_dir), "--resume_training", "--mesh_shape", "4"],
        env=_env_with(4), capture_output=True, text=True, timeout=1800)
    assert r.returncode == 0, r.stderr[-4000:]
    from sparse_caption_tpu.engine.checkpoints import load_pytree

    resumed = load_pytree(str(resume_dir / "optimizer_last.msgpack"))
    started = load_pytree(str(mp_dir / "optimizer_last.msgpack"))
    assert int(np.asarray(resumed["step"])) > int(np.asarray(started["step"]))
