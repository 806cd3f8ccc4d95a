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


def host_cpu_tag() -> str:
    """Fingerprint of this host's CPU feature set.  CPU-backend cache
    directories are keyed by it: XLA:CPU executables are compiled for the
    build host's machine features, and loading one cached on a different
    machine can SIGILL (XLA's cache-load warning)."""
    import hashlib
    import platform

    try:
        with open("/proc/cpuinfo") as f:
            src = next((ln for ln in f if ln.startswith("flags")), "")
    except OSError:
        src = ""
    src = src or platform.processor() or platform.machine() or "unknown"
    return hashlib.sha1(src.encode()).hexdigest()[:10]


def enable_compile_cache(path: str | None = None) -> None:
    import jax

    jax.config.update("jax_compilation_cache_dir", path or _DEFAULT_DIR)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    try:
        jax.config.update("jax_persistent_cache_enable_xla_caches", "all")
    except Exception:
        pass
