"""Multi-process (multi-host) execution over DCN — the build's new
distributed component (SURVEY §2.11: the reference has nothing here; its
only nod to multi-device is a commented-out ``--gpus`` flag,
``/root/reference/sparse_caption/utils/training.py:354-357``).

Design (the JAX multi-controller model):

* one process per host, each seeing only its local chips;
  ``jax.distributed.initialize`` connects them through the coordination
  service, after which ``jax.devices()`` is the GLOBAL device list
* the mesh is built over global devices exactly as in single-process mode
  (``parallel.mesh.make_mesh``); pjit/GSPMD inserts ICI collectives inside
  a slice and DCN collectives across hosts — no hand-written comms
* each process's :class:`~sparse_caption_tpu.data.batching.BatchLoader`
  enumerates the SAME global batch order (same seed) and loads only its
  ``1/process_count`` slice of every batch's features;
  :func:`sparse_caption_tpu.parallel.mesh.shard_batch` assembles the
  global arrays with ``jax.make_array_from_process_local_data``
* params/optimizer state initialize identically on every process (same
  seed) and are placed onto the global mesh as replicated (or TP/FSDP
  sharded) global arrays
* host-side file artifacts (config.json, TB scalars, score CSVs, msgpack
  checkpoints) are written by process 0 only; orbax saves are collective
  (every process writes its own shards)

CPU testing: ``tests/test_multiprocess.py`` spawns N real processes with
``--dist_*`` flags, K virtual CPU devices each, gloo collectives, and pins
the resulting params equal to the single-process K*N-device run.
"""

from __future__ import annotations

import logging
import os
from typing import Any, Optional

import numpy as np

logger = logging.getLogger(__name__)

_initialized = False


def initialize(coordinator: str, num_processes: int, process_id: int,
               local_device_count: Optional[int] = None,
               platform: Optional[str] = None) -> None:
    """Connect this process to the multi-process run.

    MUST be called before any JAX backend use (first device touch).  The
    train entry scripts call :func:`maybe_initialize_from_config` right
    after ``parse_opt`` for exactly this reason.

    ``local_device_count`` forces N virtual host devices (CPU testing);
    ``platform="cpu"`` pins the CPU backend + gloo cross-process
    collectives (the axon sitecustomize ignores ``JAX_PLATFORMS`` env, so
    this must be a config update — CLAUDE.md environment notes).
    """
    global _initialized
    if _initialized:
        return
    if local_device_count:
        flags = os.environ.get("XLA_FLAGS", "")
        if "xla_force_host_platform_device_count" not in flags:
            os.environ["XLA_FLAGS"] = (
                flags + f" --xla_force_host_platform_device_count={int(local_device_count)}"
            ).strip()
    import jax

    if platform:
        jax.config.update("jax_platforms", platform)
    if platform == "cpu":
        # cross-process collectives on the CPU backend go through gloo
        try:
            jax.config.update("jax_cpu_collectives_implementation", "gloo")
        except Exception:  # older/newer jaxlib without the option
            logger.warning("jax_cpu_collectives_implementation unavailable; "
                           "relying on backend defaults")
    jax.distributed.initialize(
        coordinator_address=coordinator,
        num_processes=int(num_processes),
        process_id=int(process_id),
    )
    _initialized = True
    logger.info("jax.distributed initialized: process %d/%d, %d local / %d global devices",
                jax.process_index(), jax.process_count(),
                jax.local_device_count(), jax.device_count())


def maybe_initialize_from_config(config) -> bool:
    """Read ``--dist_coordinator/--dist_num_processes/--dist_process_id``
    (or their ``SPARSE_CAPTION_DIST_*`` env fallbacks) and initialize.
    Returns True when running multi-process."""
    coord = config.get("dist_coordinator") or os.environ.get("SPARSE_CAPTION_DIST_COORDINATOR")
    if not coord:
        return False
    nproc = int(config.get("dist_num_processes")
                or os.environ.get("SPARSE_CAPTION_DIST_NUM_PROCESSES", 1))
    pid = int(config.get("dist_process_id")
              if config.get("dist_process_id") is not None
              else os.environ.get("SPARSE_CAPTION_DIST_PROCESS_ID", 0))
    initialize(coord, nproc, pid,
               local_device_count=config.get("dist_local_device_count"),
               platform=config.get("dist_platform"))
    return nproc > 1


def process_index() -> int:
    import jax

    return jax.process_index()


def process_count() -> int:
    import jax

    return jax.process_count()


def is_multiprocess() -> bool:
    return process_count() > 1


def is_primary() -> bool:
    """True on the process that owns host-side file artifacts."""
    return process_index() == 0


def put_replicated(tree: Any, mesh) -> Any:
    """Place host arrays as fully-replicated GLOBAL arrays on the mesh.

    Every process must hold the identical value (same-seed init, shared
    df tables, per-batch ref packs built from global metadata).  In
    single-process mode this is a plain replicated device_put."""
    import jax
    from jax.sharding import NamedSharding, PartitionSpec as P

    repl = NamedSharding(mesh, P())
    if not is_multiprocess():
        return jax.tree.map(lambda x: jax.device_put(x, repl), tree)

    def put(x):
        x = np.asarray(x)
        return jax.make_array_from_process_local_data(repl, x, x.shape)

    return jax.tree.map(put, tree)


def fetch_global(x) -> np.ndarray:
    """Host numpy of a global jax.Array, on EVERY process.

    Fully-addressable arrays (single-process, or replicated across local
    devices only) fetch directly; otherwise the value is gathered across
    processes (multihost_utils.process_allgather returns the assembled
    global value everywhere)."""
    import jax

    if not hasattr(x, "sharding"):
        return np.asarray(x)
    if x.is_fully_addressable:
        return np.asarray(x)
    if x.is_fully_replicated:
        return np.asarray(x.addressable_data(0))
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))


def fetch_global_tree(tree: Any) -> Any:
    import jax

    return jax.tree.map(fetch_global, tree)


def sync() -> None:
    """Barrier across processes (no-op single-process)."""
    if is_multiprocess():
        from jax.experimental import multihost_utils

        multihost_utils.sync_global_devices("sparse_caption_sync")


def broadcast_scalar(value: float) -> float:
    """Process 0's scalar, on every process (e.g. the val CIDEr that gates
    the best checkpoint — metric files are written by process 0 only)."""
    if not is_multiprocess():
        return float(value)
    from jax.experimental import multihost_utils

    out = multihost_utils.broadcast_one_to_all(np.asarray(float(value), np.float32))
    return float(out)
