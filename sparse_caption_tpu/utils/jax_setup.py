"""JAX runtime setup helpers."""

from __future__ import annotations

import os


def select_platform(platform: str | None) -> None:
    """Pin the JAX platform. Must run before any backend initialization.

    Needed because environment plugins (e.g. the axon TPU plugin) can force
    a platform regardless of ``JAX_PLATFORMS``; ``jax.config`` wins.
    """
    if not platform:
        return
    import jax

    jax.config.update("jax_platforms", platform)


def ensure_host_device_count(n: int) -> None:
    """Force >= n virtual host (CPU) devices. Must run before backend
    initialization — XLA reads the flag at first device touch. Used by the
    train entries so ``--platform cpu --pipeline_stages N`` (or a CPU mesh
    run) works without hand-setting XLA_FLAGS."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" in flags:
        return
    os.environ["XLA_FLAGS"] = (
        flags + f" --xla_force_host_platform_device_count={int(n)}").strip()


def enable_persistent_cache(cache_dir: str | None = None) -> None:
    """Enable the XLA persistent compilation cache (big win on slow hosts;
    TPU executables are cached too, cutting the ~20-40s first-compile cost
    on relaunch).

    Default location is ``<repo>/.jax_cache`` (gitignored), NOT /tmp: large-
    batch TPU graphs compile in minutes through tunneled backends, /tmp is
    wiped between sessions, and the repo tree persists — so a warmed cache
    survives to the next run of bench/eval with identical graphs."""
    import jax

    default_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
                               ".jax_cache")
    cache_dir = cache_dir or os.environ.get("SPARSE_CAPTION_JAX_CACHE", default_dir)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
