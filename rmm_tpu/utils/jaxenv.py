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
