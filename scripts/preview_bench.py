#!/usr/bin/env python
"""Interactive-rate demo (VERDICT r3 #8): drive RenderSession on the chip
like a user — orbit, preview step, release, converge — and report honest
frames/s from SessionStats (each step fetches a scalar through the
tunnel, so the number includes real round-trip latency, like an actual
interactive session would)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pnraytracing_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax


def log(*a):
    print(*a, flush=True)


def main():
    import dataclasses

    from pnraytracing_tpu.core.config import RenderConfig
    from pnraytracing_tpu.render.session import RenderSession
    from pnraytracing_tpu.scene.scenes import config3_teapot_night

    log("devices:", jax.devices())
    for size in (256, 512):
        cfg = RenderConfig(width=size, height=size, max_depth=4,
                           traversal="pallas")
        scene, cam = config3_teapot_night(env_height=128)
        cam.aspect = 1.0
        scene = jax.device_put(scene)
        sess = RenderSession(scene, cam, cfg, preview_depth=1)

        # warm both programs (preview + converged)
        sess.orbit(0.01, 0.0)
        sess.step()
        sess.step()

        # interactive phase: 30 orbit+preview steps
        t0 = time.perf_counter()
        n_prev = 30
        for i in range(n_prev):
            sess.orbit(0.02, 0.005)
            sess.step()
        dt = time.perf_counter() - t0
        log(f"{size}x{size} preview (depth 1, orbit each frame): "
            f"{n_prev/dt:6.1f} fps  ({dt/n_prev*1e3:.1f} ms/frame, "
            f"last {sess.stats.last_frame_ms:.1f} ms)")

        # converged phase: accumulate 20 full-depth frames
        t0 = time.perf_counter()
        n_conv = 20
        sess.converge(n_conv)
        dt = time.perf_counter() - t0
        log(f"{size}x{size} converged (depth 4, progressive): "
            f"{n_conv/dt:6.1f} fps  ({dt/n_conv*1e3:.1f} ms/frame, "
            f"{sess.stats.rays_per_s/1e6:.1f} M rays/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
