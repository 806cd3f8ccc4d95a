"""Test env: force the CPU backend with 8 virtual devices so sharding tests
run anywhere (SURVEY.md §4: fake-cluster testing).

NOTE: env vars (JAX_PLATFORMS / XLA_FLAGS) are NOT sufficient here — the
runtime's sitecustomize imports jax before pytest starts, so the platform
must be switched through jax.config."""

import os

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 8)

# Persistent compile cache: the traversal while-loops are expensive to
# compile; cache them across pytest runs.  Separate directory from the
# TPU-side cache — the remote compile service's CPU artifacts target
# different machine features than this host — and keyed by THIS host's
# CPU features: a cache populated on a different machine otherwise loads
# executables that can SIGILL here (XLA warns about exactly this).
from pnraytracing_tpu.utils.cache import host_cpu_tag  # noqa: E402

jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".jax_cache_cpu", host_cpu_tag()))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
