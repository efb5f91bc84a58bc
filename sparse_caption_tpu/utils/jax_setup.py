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


def tpu_compiler_options() -> dict | None:
    """XLA:TPU compiler options carrying a measured win for the hot jits.

    Round-5 A/B on the chip (scripts/ab_xla_flags.py,
    resources/ab_xla_flags_vmem*_r5.json): raising
    ``xla_tpu_scoped_vmem_limit_kib`` lets the fusion cost model keep
    bigger fusions VMEM-resident — +11% on the paper-dims XE train step at
    batch 256 (48M == 64M > 96M > 128M ~ 192M > 32M-but-still-+10.5% >
    default) and +3.0% on the beam-5 decode at batch 2048 at 48 MiB
    (64M only +0.7% there), the only non-neutral knob in the 8-option
    sweep (layout/fusion/scheduler flags all within noise, matching the
    r2-r4 model-level closures). 48 MiB is optimal for BOTH workloads.

    Returns None off-TPU (other backends reject unknown options).
    Override the value via ``SPARSE_CAPTION_SCOPED_VMEM_KIB``; set it
    empty to disable. Pass the result to ``jax.jit(...,
    compiler_options=...)`` — the only override path that reaches a
    relay's server-side compiler (client XLA_FLAGS do not propagate).
    """
    kib = os.environ.get("SPARSE_CAPTION_SCOPED_VMEM_KIB", "49152")
    if not kib:
        return None
    try:
        import jax

        if jax.default_backend() != "tpu":
            return None
    except Exception:  # noqa: BLE001 — no backend is a valid state (docs builds)
        return None
    return {"xla_tpu_scoped_vmem_limit_kib": str(int(kib))}


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
