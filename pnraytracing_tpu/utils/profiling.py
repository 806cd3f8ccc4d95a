"""Profiling / observability.

The reference's surfaces: wall-clock brackets around BVH build and buffer
upload (main.cpp:368-371, 566-567) and a window-title FPS counter
(main.cpp:578-583).  TPU equivalents: step timers, per-kernel XLA cost
analysis, and ``jax.profiler`` trace capture."""

from __future__ import annotations

import contextlib
import time

import jax


@contextlib.contextmanager
def wallclock(label: str, sink=print):
    """Wall-clock bracket (the clock() pattern of main.cpp:368-371)."""
    t0 = time.perf_counter()
    yield
    sink(f"{label}: {(time.perf_counter() - t0) * 1e3:.1f} ms")


class StepTimer:
    """Running frame/step statistics (the FPS counter of main.cpp:578-583)."""

    def __init__(self, window: int = 32):
        self.window = window
        self.samples: list[float] = []

    @contextlib.contextmanager
    def measure(self):
        t0 = time.perf_counter()
        yield
        self.samples.append(time.perf_counter() - t0)
        if len(self.samples) > self.window:
            self.samples.pop(0)

    @property
    def mean_s(self) -> float:
        return sum(self.samples) / max(len(self.samples), 1)

    @property
    def fps(self) -> float:
        m = self.mean_s
        return 1.0 / m if m > 0 else 0.0


def cost_analysis(fn, *args, **kwargs) -> dict:
    """XLA cost model for a jitted function: flops, bytes accessed,
    arithmetic intensity — the inputs to a roofline estimate."""
    lowered = jax.jit(fn).lower(*args, **kwargs)
    compiled = lowered.compile()
    costs = compiled.cost_analysis()
    if isinstance(costs, list):
        costs = costs[0]
    flops = float(costs.get("flops", 0.0))
    bytes_accessed = float(costs.get("bytes accessed", 0.0))
    return {
        "flops": flops,
        "bytes_accessed": bytes_accessed,
        "arithmetic_intensity": flops / bytes_accessed if bytes_accessed else 0.0,
        "raw": dict(costs),
    }


@contextlib.contextmanager
def trace(log_dir: str = "/tmp/pnrt_trace"):
    """Capture a jax.profiler trace viewable in XProf/TensorBoard."""
    jax.profiler.start_trace(log_dir)
    try:
        yield log_dir
    finally:
        jax.profiler.stop_trace()
