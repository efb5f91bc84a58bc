"""Checkpoint save/restore.

File-per-artifact layout mirroring the reference run dir
(``scripts/train_transformer.py:31,44-50,118-129``):
``config.json``, ``model_init.msgpack``, ``model_last.msgpack``,
``model_best.msgpack``, ``optimizer_{last,best}.msgpack`` (+ pruning
exports ``model_best_pruned*.npz``, ``model_best_bin_mask.msgpack``,
``sparsities.csv`` written by the prune trainer).

Serialization is flax msgpack over pytrees — the TPU-native analogue of
torch ``state_dict`` pickles.  Missing/extra keys on restore are logged to
``restore_log.txt`` instead of failing (reference utils/training.py:189-199).

``--ckpt_backend orbax`` swaps every ``model_*.msgpack`` file for a
``model_*.orbax`` directory written by orbax's async checkpointer: the
save is dispatched from device shards without gathering params to host
and the write overlaps subsequent training steps (the multi-chip-scale
checkpoint path — msgpack must first fetch the full state through the
relay).  ``load_pytree``/``restore_lenient`` dispatch on the artifact
kind, so every consumer (eval, lottery rewind, sparse export, interop)
reads either format transparently.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Dict, Optional, Tuple

import jax
from flax import serialization, traverse_util

logger = logging.getLogger(__name__)

ORBAX_SUFFIX = ".orbax"
_async_ckptr = None  # lazily-built singleton (owns a background thread)


def _orbax_checkpointer():
    global _async_ckptr
    if _async_ckptr is None:
        import orbax.checkpoint as ocp

        _async_ckptr = ocp.AsyncCheckpointer(ocp.StandardCheckpointHandler())
    return _async_ckptr


def wait_for_checkpoints() -> None:
    """Block until any in-flight async orbax save has committed."""
    if _async_ckptr is not None:
        _async_ckptr.wait_until_finished()


def is_orbax_path(path: str) -> bool:
    """An orbax artifact is a ``*.orbax`` directory, or any directory
    containing orbax metadata markers.  A plain directory without markers
    is NOT treated as a checkpoint — load_pytree on it raises a clear
    error instead of an opaque orbax one."""
    path = str(path)
    if path.endswith(ORBAX_SUFFIX):
        return True
    if not os.path.isdir(path):
        return False
    return any(
        os.path.exists(os.path.join(path, marker))
        for marker in ("_CHECKPOINT_METADATA", "_METADATA", "manifest.ocdbt")
    )


def find_ckpt(dirname: str, stem: str) -> str:
    """Resolve ``<dirname>/<stem>`` to whichever backend artifact exists.
    When both a ``.msgpack`` file and an ``.orbax`` dir exist (e.g. a run
    restarted in place after switching ``--ckpt_backend``), the NEWER
    mtime wins — preferring one format unconditionally would silently
    resume/evaluate stale weights.  Returns the msgpack path when neither
    exists so callers produce a familiar error."""
    msg = os.path.join(dirname, stem + ".msgpack")
    orb = os.path.join(dirname, stem + ORBAX_SUFFIX)
    has_msg, has_orb = os.path.isfile(msg), os.path.isdir(orb)
    if has_msg and has_orb:
        pick = msg if os.path.getmtime(msg) >= os.path.getmtime(orb) else orb
        logger.warning("both %s and %s exist; picking newer: %s", msg, orb, pick)
        return pick
    if has_msg:
        return msg
    if has_orb:
        return orb
    return msg


def save_pytree(path: str, tree: Any) -> str:
    if str(path).endswith(ORBAX_SUFFIX):
        return save_pytree_orbax(path, tree)
    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "wb") as f:
        f.write(serialization.to_bytes(tree))
    return path


def save_pytree_orbax(path: str, tree: Any) -> str:
    """Async sharded save: dispatches per-shard writes and returns; the
    next save (or ``wait_for_checkpoints``) joins the previous one, so the
    disk write overlaps training compute."""
    import orbax.checkpoint as ocp

    ckptr = _orbax_checkpointer()
    ckptr.wait_until_finished()  # one in-flight save per process
    # orbax rejects sub-second-mtime overwrites of a *partial* dir; force
    # replaces the previous artifact of the same tag atomically
    ckptr.save(os.path.abspath(path), args=ocp.args.StandardSave(tree), force=True)
    return path


def load_pytree(path: str, target: Any = None) -> Any:
    if is_orbax_path(path):
        return load_pytree_orbax(path, target)
    if os.path.isdir(path):
        raise ValueError(
            f"{path} is a directory but not an orbax checkpoint (no orbax metadata markers)")
    with open(path, "rb") as f:
        data = f.read()
    if target is None:
        return serialization.msgpack_restore(data)
    return serialization.from_bytes(target, data)


def load_pytree_orbax(path: str, target: Any = None, shardings: Any = None) -> Any:
    """Restore an orbax artifact.  With ``target`` (and optionally a
    matching ``shardings`` pytree) the arrays restore strictly onto the
    target structure — directly onto device shards when shardings are
    given, no host gather.  Without a target, returns the raw saved tree
    (host numpy) for lenient merging."""
    import orbax.checkpoint as ocp

    ckptr = _orbax_checkpointer()
    ckptr.wait_until_finished()
    path = os.path.abspath(path)
    if target is None:
        return ckptr.restore(path)

    def abstract(leaf, sh):
        if not hasattr(leaf, "shape"):
            return leaf
        return jax.ShapeDtypeStruct(leaf.shape, leaf.dtype, sharding=sh)

    if shardings is None:
        ab = jax.tree.map(lambda l: abstract(l, None), target)
    else:
        ab = jax.tree.map(abstract, target, shardings)
    return ckptr.restore(path, args=ocp.args.StandardRestore(ab))


def restore_lenient(target: Dict, path: str, restore_log: Optional[str] = None) -> Tuple[Dict, list, list]:
    """Restore matching leaves; report missing/unexpected keys like the
    reference's strict=False + restore_log.txt contract."""
    raw = load_pytree(path)
    flat_t = traverse_util.flatten_dict(target, sep="/")
    flat_r = traverse_util.flatten_dict(raw, sep="/")
    missing = sorted(set(flat_t) - set(flat_r))
    unexpected = sorted(set(flat_r) - set(flat_t))
    merged = dict(flat_t)
    for k in set(flat_t) & set(flat_r):
        leaf = flat_r[k]
        if hasattr(flat_t[k], "shape") and hasattr(leaf, "shape") and tuple(flat_t[k].shape) != tuple(leaf.shape):
            missing.append(f"{k} (shape mismatch {leaf.shape} vs {flat_t[k].shape})")
            continue
        merged[k] = jax.numpy.asarray(leaf)
    if restore_log and (missing or unexpected):
        os.makedirs(os.path.dirname(restore_log) or ".", exist_ok=True)
        with open(restore_log, "a") as f:
            if missing:
                f.write(f"Checkpoint `{path}` is missing parameters:\n" + "\n".join(missing) + "\n\n")
            if unexpected:
                f.write(f"Checkpoint `{path}` contains extra parameters:\n" + "\n".join(unexpected) + "\n\n")
        logger.info("restore: %d missing, %d unexpected keys (see %s)", len(missing), len(unexpected), restore_log)
    return traverse_util.unflatten_dict(merged, sep="/"), missing, unexpected


class NullScalarLogger:
    """No-op scalar sink for non-primary processes in multi-process runs
    (process 0 owns every host-side artifact; see parallel/distributed.py)."""

    def add_scalar(self, tag: str, value, step: int) -> None:
        pass

    def close(self) -> None:
        pass


class ScalarLogger:
    """TensorBoard writer with JSONL fallback (reference logs scalars via
    SummaryWriter, utils/training.py:132)."""

    def __init__(self, log_dir: str):
        os.makedirs(log_dir, exist_ok=True)
        self._jsonl = open(os.path.join(log_dir, "scalars.jsonl"), "a")
        try:
            from torch.utils.tensorboard import SummaryWriter

            self._tb = SummaryWriter(log_dir)
        except Exception:  # tensorboard optional
            self._tb = None

    def add_scalar(self, tag: str, value, step: int) -> None:
        import json

        self._jsonl.write(json.dumps({"tag": tag, "value": float(value), "step": int(step)}) + "\n")
        self._jsonl.flush()
        if self._tb is not None:
            self._tb.add_scalar(tag, float(value), step)

    def close(self) -> None:
        self._jsonl.close()
        if self._tb is not None:
            self._tb.close()
