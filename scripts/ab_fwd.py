#!/usr/bin/env python
"""Honest A/B of forward-path variants on the flagship scene.

Timing is checksummed (a device scalar is FETCHED after the timed calls) —
block_until_ready alone can report early through the tunneled platform.
Run detached; each variant is its own compile, failures are fenced.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pnraytracing_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

from pnraytracing_tpu.core.config import RenderConfig
from pnraytracing_tpu.render.renderer import render_average
from pnraytracing_tpu.scene.scenes import config3_teapot_night


def log(*a):
    print(*a, flush=True)


def main():
    base = RenderConfig(width=512, height=512, max_depth=4)
    scene, cam_state = config3_teapot_night(env_height=256)
    cam_state.aspect = 1.0
    camera = cam_state.basis()
    scene = jax.device_put(scene)
    K = 16

    variants = {
        "default": base,
        "fuse_shadows": dataclasses.replace(base, fuse_shadows=True),
        "sort_rays": dataclasses.replace(base, sort_rays=True),
        "fuse+sort": dataclasses.replace(base, fuse_shadows=True,
                                         sort_rays=True),
        "no_compact": dataclasses.replace(base, compact_rays=False),
        "tile_2048": dataclasses.replace(base, trav_tile=2048),
        "tile_8192": dataclasses.replace(base, trav_tile=8192),
    }

    for name, cfg in variants.items():
        try:
            def run(start):
                return render_average(
                    scene, camera, cfg, jnp.uint32(start), K
                ).sum()

            float(run(0))  # compile + warm
            t0 = time.perf_counter()
            chk = 0.0
            for rep in range(3):
                chk = float(run(100 + rep * K))
            dt = (time.perf_counter() - t0) / 3
            rays = cfg.num_pixels * (1 + 3 * cfg.max_depth) * K
            log(f"{name}: {dt / K * 1e3:.3f} ms/frame, "
                f"{rays / dt:.3e} rays/s (chk={chk:.3f})")
        except Exception:
            log(f"{name}: FAILED")
            traceback.print_exc()
            sys.stdout.flush()


if __name__ == "__main__":
    main()
