#!/usr/bin/env python
"""Stage attribution for the flagship frame on the chip.

Times render_average (K frames inside ONE compiled program, so host
dispatch amortizes) across a config sweep: depth 0..4, compaction/sort
on/off, fused vs split shadows, traversal tile.  Differences between
rows attribute the frame time to stages.  Fetch-bounded timing.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time

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
    log("devices:", jax.devices())
    base = RenderConfig(width=512, height=512, max_depth=4,
                        traversal="pallas")
    scene, cam_state = config3_teapot_night(env_height=256)
    cam_state.aspect = 1.0
    camera = cam_state.basis()
    scene = jax.device_put(scene)
    K = 4

    rows = [
        ("depth4 default", base),
        ("depth1", dataclasses.replace(base, max_depth=1)),
        ("depth2", dataclasses.replace(base, max_depth=2)),
        ("depth3", dataclasses.replace(base, max_depth=3)),
        ("no_compact", dataclasses.replace(base, compact_rays=False)),
        ("sort_rays", dataclasses.replace(base, sort_rays=True)),
        ("no_fuse", dataclasses.replace(base, fuse_shadows=False)),
        ("tile_1024", dataclasses.replace(base, trav_tile=1024)),
        ("tile_2048", dataclasses.replace(base, trav_tile=2048)),
        ("tile_8192", dataclasses.replace(base, trav_tile=8192)),
        ("env64", base),  # env_height handled below
        ("sampler_hash", dataclasses.replace(base, sampler="hash")),
    ]

    scene64 = None
    for name, cfg in rows:
        sc = scene
        if name == "env64":
            if scene64 is None:
                s64, _ = config3_teapot_night(env_height=64)
                scene64 = jax.device_put(s64)
            sc = scene64
        try:
            def run(start):
                return render_average(
                    sc, camera, cfg, jnp.uint32(start), K
                ).sum()

            t0 = time.perf_counter()
            float(run(0))
            compile_s = time.perf_counter() - t0
            n = 3
            t0 = time.perf_counter()
            for i in range(n):
                out = run(1 + i)
            float(out)
            dt = (time.perf_counter() - t0) / (n * K)
            rays = cfg.num_pixels * (1 + 3 * cfg.max_depth)
            log(f"{name:14s}: {dt*1e3:8.1f} ms/frame "
                f"({rays/dt/1e6:7.1f} M rays/s)  [compile {compile_s:.0f}s]")
        except Exception as e:  # noqa: BLE001 — report and continue sweep
            log(f"{name:14s}: FAILED {type(e).__name__}: {e}")
            return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
