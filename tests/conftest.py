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

# --- segfault-proof cache writes ------------------------------------------
# This jax/XLA build's CPU `executable.serialize()` SEGFAULTS for some
# programs (reproduced 3x, different tests each time, always at
# compilation_cache.py:265).  Probe each serialization in a forked child
# first; if the child dies, skip caching that one entry (it just
# recompiles next run) instead of killing the whole test session.
import signal  # noqa: E402

from jax._src import compilation_cache as _cc  # noqa: E402

_orig_put = _cc.put_executable_and_time


def _safe_put(cache_key, module_name, executable, backend, compile_time):
    """Run the WHOLE cache write (serialize + compress + disk write) in a
    forked child: a crashing entry costs a recompile next run instead of
    the test session.  The parent never touches serialize()."""
    try:
        pid = os.fork()
    except OSError:
        return _orig_put(cache_key, module_name, executable, backend,
                         compile_time)
    if pid == 0:  # child
        try:
            import faulthandler

            faulthandler.disable()  # expected deaths; keep logs clean
            signal.alarm(120)  # a fork of a threaded process can deadlock
            _orig_put(cache_key, module_name, executable, backend,
                      compile_time)
            os._exit(0)
        except BaseException:
            os._exit(1)
    _, status = os.waitpid(pid, 0)
    if not (os.WIFEXITED(status) and os.WEXITSTATUS(status) == 0):
        print(f"[conftest] skipped caching {module_name}: cache write "
              f"died in the sacrificial child (status {status})",
              flush=True)


_cc.put_executable_and_time = _safe_put


# Defense-in-depth against in-process XLA state accumulation (the
# full-suite crashes cluster late in the run): drop jit/executable
# caches every N tests — entries reload from the persistent disk cache.
import pytest  # noqa: E402

_TEST_COUNT = {"n": 0}


@pytest.fixture(autouse=True)
def _periodic_cache_clear():
    yield
    _TEST_COUNT["n"] += 1
    if _TEST_COUNT["n"] % 40 == 0:
        jax.clear_caches()
