#!/usr/bin/env python
"""Is block_until_ready honest on this platform?

Times the flagship render three ways:
  a) block_until_ready on the device array (what bench.py trusts),
  b) a scalar checksum fetched to the host (forces full execution),
  c) scaling check: does 4x the frames take ~4x the time?

If (b) >> (a), dispatch is fire-and-forget and every timing that trusts
block_until_ready is inflated.  Run detached.
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
import numpy as np

from pnraytracing_tpu.core.config import RenderConfig
from pnraytracing_tpu.render.renderer import render_average
from pnraytracing_tpu.scene.scenes import config3_teapot_night


def log(*a):
    print(*a, flush=True)


def main():
    cfg = RenderConfig(width=512, height=512, max_depth=4)
    scene, cam_state = config3_teapot_night(env_height=256)
    cam_state.aspect = 1.0
    camera = cam_state.basis()
    scene = jax.device_put(scene)

    def frames(k, start=0):
        return render_average(scene, camera, cfg, jnp.uint32(start), k)

    # compile both shapes
    float(frames(8).sum())
    float(frames(32).sum())

    for k in (8, 32):
        t0 = time.perf_counter()
        out = frames(k, start=100)
        out.block_until_ready()
        t_block = time.perf_counter() - t0
        t1 = time.perf_counter()
        chk = float(out.sum())
        t_fetch = time.perf_counter() - t1
        log(f"k={k}: block_until_ready {t_block*1e3:.2f} ms, "
            f"then checksum fetch {t_fetch*1e3:.2f} ms (chk={chk:.4f})")

    # honest per-frame cost from the checksum-to-checksum delta
    for k in (8, 32, 128):
        t0 = time.perf_counter()
        chk = float(frames(k, start=200).sum())
        dt = time.perf_counter() - t0
        rays = cfg.num_pixels * (1 + 3 * cfg.max_depth) * k
        log(f"k={k}: end-to-end {dt*1e3:.2f} ms -> {dt/k*1e3:.3f} ms/frame, "
            f"{rays/dt:.3e} rays/s (chk={chk:.4f})")


if __name__ == "__main__":
    main()
