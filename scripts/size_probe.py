#!/usr/bin/env python
"""Does the flagship forward program actually execute on the chip?

Sweeps resolution with a checksummed single-frame render (device scalar
fetched to host).  If a size crashes the worker, everything above it is
suspect and every block_until_ready-based number at that size is fiction.
Run detached.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pnraytracing_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from pnraytracing_tpu.core.config import RenderConfig
from pnraytracing_tpu.render.renderer import render_frame
from pnraytracing_tpu.scene.scenes import config3_teapot_night


def log(*a):
    print(*a, flush=True)


def main():
    scene, cam_state = config3_teapot_night(env_height=256)
    scene = jax.device_put(scene)
    for size in (128, 256, 512):
        cfg = RenderConfig(width=size, height=size, max_depth=4)
        cam_state.aspect = 1.0
        cam = cam_state.basis()
        try:
            t0 = time.perf_counter()
            img = render_frame(scene, cam, cfg, 0)
            chk = float(img.sum())
            t_first = time.perf_counter() - t0
            t0 = time.perf_counter()
            reps = 8
            for i in range(1, reps + 1):
                img = render_frame(scene, cam, cfg, i)
            chk2 = float(img.sum())
            dt = (time.perf_counter() - t0) / reps
            rays = cfg.num_pixels * (1 + 3 * cfg.max_depth)
            log(f"{size}x{size}: first(+compile) {t_first:.1f}s, then "
                f"{dt * 1e3:.2f} ms/frame = {rays / dt:.3e} rays/s "
                f"(chk {chk:.2f}/{chk2:.2f})")
        except Exception as e:
            log(f"{size}x{size}: FAILED {type(e).__name__}: {e}")
            return


if __name__ == "__main__":
    main()
