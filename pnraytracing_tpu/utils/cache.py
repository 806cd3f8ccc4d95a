"""Persistent XLA compile-cache setup.

The integrator's traversal loops compile slowly (minutes for large configs);
caching compiled executables on disk makes every process after the first
start in seconds.  Call :func:`enable_compile_cache` before the first jit
execution (safe to call multiple times)."""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__)))),
    ".jax_cache",
)


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", path or _DEFAULT_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:
        pass
