"""Failure detection and recovery for the device path (SURVEY §5).

The TPU worker behind the tunnel can kill a program execution that
overruns its deadline, or crash outright; after that EVERY call in the
client process fails with ``UNAVAILABLE: TPU worker process crashed or
restarted`` until the worker comes back (minutes).  The reference has no
analogue (a GL device loss just kills the app); a production renderer
needs the frame loop to survive it.

Building blocks:

* :func:`is_device_loss` — classify an exception as a recoverable device
  failure (vs a programming error that must surface);
* :func:`wait_for_device` — poll with a tiny fetch-bounded probe until
  the worker accepts work again;
* :func:`run_resilient` — run a step function, and on device loss wait
  for recovery, re-upload the pytrees the caller declared (device state
  is gone after a worker restart), and retry;
* :class:`ResilientRenderLoop` — progressive accumulation whose state
  lives on the HOST between frames: a crashed worker loses at most the
  in-flight sample, never the accumulation.
"""

from __future__ import annotations

import time
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

# Signatures of recoverable device-loss failures (observed on the
# tunneled v5e; see BASELINE.md round-2/3 notes).
_DEVICE_LOSS_SIGNATURES = (
    "UNAVAILABLE",
    "worker process crashed",
    "FAILED_PRECONDITION",
    "DEADLINE_EXCEEDED",
    "Socket closed",
    "Connection reset",
)


def is_device_loss(exc: BaseException) -> bool:
    """True for failures where retry-after-recovery is meaningful."""
    if type(exc).__name__ not in ("JaxRuntimeError", "XlaRuntimeError"):
        return False
    msg = str(exc)
    return any(sig in msg for sig in _DEVICE_LOSS_SIGNATURES)


def probe_device(timeout_s: float = 90.0) -> bool:
    """One tiny fetch-bounded computation in a SUBPROCESS with a hard
    timeout; False if the device path is still broken.

    Subprocess isolation matters twice over: a wedged tunnel can HANG an
    RPC forever (observed >17 min on a 256^2 matmul), and a worker crash
    poisons the client process that saw it — the probe must be neither."""
    import subprocess
    import sys as _sys

    code = (
        "import jax, jax.numpy as jnp;"
        "x = jnp.ones((8, 8));"
        "print(float((x @ x).sum()))"
    )
    try:
        out = subprocess.run(
            [_sys.executable, "-c", code], capture_output=True,
            timeout=timeout_s,
        )
        return out.returncode == 0 and b"512.0" in out.stdout
    except subprocess.TimeoutExpired:
        return False
    except Exception:
        return False


def wait_for_device(
    timeout_s: float = 1800.0,
    poll_s: float = 30.0,
    log: Callable[[str], None] | None = None,
) -> bool:
    """Poll until the worker accepts work again.  Returns False on
    timeout."""
    deadline = time.monotonic() + timeout_s
    attempt = 0
    while time.monotonic() < deadline:
        attempt += 1
        if probe_device():
            if log:
                log(f"device recovered after {attempt} probe(s)")
            return True
        if log:
            log(f"device still down (probe {attempt}); sleeping {poll_s:.0f}s")
        time.sleep(poll_s)
    return False


def run_resilient(
    step: Callable[..., object],
    *args,
    reupload: dict | None = None,
    max_retries: int = 3,
    log: Callable[[str], None] | None = None,
    **kwargs,
):
    """Run ``step(*args, **kwargs)``; on device loss, wait for recovery,
    re-``device_put`` the pytrees in ``reupload`` (name -> pytree, passed
    through to ``step`` as keyword arguments), and retry.

    Non-device-loss exceptions propagate immediately — a shape error must
    not be retried into a 30-minute poll loop.
    """
    kwargs = dict(kwargs)
    if reupload:
        for name, tree in reupload.items():
            kwargs[name] = tree
    for attempt in range(max_retries + 1):
        try:
            return step(*args, **kwargs)
        except Exception as e:  # noqa: BLE001 — filtered below
            if not is_device_loss(e) or attempt == max_retries:
                raise
            if log:
                log(f"device loss ({type(e).__name__}); recovering "
                    f"(attempt {attempt + 1}/{max_retries})")
            if not wait_for_device(log=log):
                raise
            if reupload:
                for name, tree in reupload.items():
                    kwargs[name] = jax.device_put(
                        jax.tree_util.tree_map(np.asarray, tree)
                    )
    raise AssertionError("unreachable")


class ResilientRenderLoop:
    """Progressive rendering that survives worker crashes.

    The accumulation (sum image + sample count) is held as HOST numpy;
    each sample is rendered on device and fetched.  On device loss the
    scene is re-uploaded and the in-flight sample retried — at most one
    sample of work is lost, and a multi-hour convergence run cannot be
    destroyed by a worker restart.  Pairs with ``RenderSession.save`` for
    on-disk checkpoints.
    """

    def __init__(self, scene, camera, cfg,
                 log: Callable[[str], None] | None = None):
        self.scene = scene
        self.camera = camera
        self.cfg = cfg
        self.log = log
        self.accum = np.zeros((cfg.height, cfg.width, 3), np.float32)
        self.count = 0
        self.losses_recovered = 0

    def _render_one(self, frame: int, scene):
        from pnraytracing_tpu.render.renderer import render_frame

        return np.asarray(
            render_frame(scene, self.camera, self.cfg, frame)
        )

    def render(self, spp: int) -> np.ndarray:
        for _ in range(spp):
            before = self.losses_recovered

            def step(scene=None):
                return self._render_one(self.count, scene)

            def _log(msg):
                self.losses_recovered += 1 if "device loss" in msg else 0
                if self.log:
                    self.log(msg)

            img = run_resilient(
                step, reupload={"scene": self.scene}, log=_log
            )
            del before
            self.accum += img
            self.count += 1
        return self.resolve()

    def resolve(self) -> np.ndarray:
        return self.accum / max(self.count, 1)
