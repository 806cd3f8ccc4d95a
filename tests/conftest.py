"""Test env: force the CPU backend with 8 virtual devices so sharding tests
run anywhere (SURVEY.md §4: fake-cluster testing via
``xla_force_host_platform_device_count``).  Must run before jax imports."""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ.setdefault("JAX_ENABLE_X64", "0")

import jax  # noqa: E402

# Persistent compile cache: the traversal while-loops are expensive to
# compile on the CPU backend; cache them across pytest runs.
jax.config.update("jax_compilation_cache_dir", os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".jax_cache"))
jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
