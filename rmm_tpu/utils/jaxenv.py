"""JAX environment knobs shared by every entry point."""
from __future__ import annotations

import os

import jax

_done = False


def setup(cache_dir: str | None = None) -> None:
    """Enable the persistent XLA compilation cache. On this build host the
    TPU compiler runs behind a remote relay, so cold compiles cost minutes;
    the on-disk cache makes every repeated program instant."""
    global _done
    if _done:
        return
    cache_dir = cache_dir or os.environ.get(
        "RMM_JAX_CACHE", os.path.expanduser("~/.cache/rmm_jax_cache"))
    try:
        jax.config.update("jax_compilation_cache_dir", cache_dir)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    _done = True


def ensure_devices(n: int) -> None:
    """Guarantee ≥ n devices for a mesh; falls back to the virtual CPU mesh
    when the current platform can't provide them (must run before any
    backend initializes — the ambient tunnel pins a single-chip platform
    regardless of JAX_PLATFORMS)."""
    flags = os.environ.get("XLA_FLAGS", "")
    if "host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + f" --xla_force_host_platform_device_count={n}").strip()
    # the single-chip tunnel platform can never provide n > 1: decide
    # BEFORE the first backend init (probing would lock the platform in)
    pinned = getattr(jax.config, "jax_platforms", None) or ""
    if n > 1 and "axon" in pinned:
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    if len(jax.devices()) < n:
        try:
            jax.config.update("jax_platforms", "cpu")
        except RuntimeError:
            pass
    if len(jax.devices()) < n:
        raise RuntimeError(
            f"need {n} devices, have {len(jax.devices())} "
            f"({jax.default_backend()}); set XLA_FLAGS="
            "--xla_force_host_platform_device_count before jax initializes")
