#!/usr/bin/env python
"""Leaf-size A/B for the Mosaic packet kernel: bigger leaves mean fewer
tree nodes (smaller per-tile unions for incoherent rays) at the price of
more unrolled triangle tests per leaf pop.  Builds teapot_night with
max_leaf_size in {4, 8, 15} and times closest-hit coh/inc + a frame."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pnraytracing_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import dataclasses

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, flush=True)


def main():
    log("devices:", jax.devices())
    from pnraytracing_tpu.accel.traverse_pallas import closest_hit_pallas
    from pnraytracing_tpu.core.camera import camera_rays
    from pnraytracing_tpu.core.config import RenderConfig
    from pnraytracing_tpu.render.renderer import render_average
    from pnraytracing_tpu.scene.scenes import config3_teapot_night

    n = 10
    for leaf in (4, 8, 15):
        scene, cam_state = config3_teapot_night(env_height=256,
                                                max_leaf_size=leaf)
        cam_state.aspect = 1.0
        camera = cam_state.basis()
        scene = jax.device_put(scene)
        trav = scene.trav
        if trav is None:
            log(f"leaf {leaf}: no packed layout (skipped)")
            continue
        nn = int(trav.nodes8.shape[0])
        o, d, _ = camera_rays(camera, 512, 512)
        r = o.shape[0]
        t_max = jnp.full((r,), 1e7, jnp.float32)
        rng = np.random.default_rng(0)
        perm = jnp.asarray(rng.permutation(r))

        f = jax.jit(lambda o_, d_, t_, ml=leaf: closest_hit_pallas(
            trav, o_, d_, t_, tile_size=4096, max_leaf_size=ml,
            with_stats=True))
        for name, oo, dd in (("coh", o, d), ("inc", o[perm], d[perm])):
            hit, iters = f(oo, dd, t_max)
            tot = int(iters.sum())
            t0 = time.perf_counter()
            for _ in range(n):
                out, _ = f(oo, dd, t_max)
            float(out.t.sum())
            dt = (time.perf_counter() - t0) / n
            log(f"leaf {leaf:2d} ({nn:5d} nodes) {name}: {dt*1e3:7.2f} ms "
                f"{tot:8d} iters  {r/dt/1e6:7.1f} M rays/s")

        cfg = RenderConfig(width=512, height=512, max_depth=4,
                           traversal="pallas", max_leaf_size=leaf)
        f2 = jax.jit(lambda fr, c=cfg: render_average(scene, camera, c,
                                                      fr, 1))
        out = f2(jnp.uint32(0))
        float(out.sum())
        t0 = time.perf_counter()
        for _ in range(n):
            out = f2(jnp.uint32(1))
        float(out.sum())
        dt = (time.perf_counter() - t0) / n
        log(f"leaf {leaf:2d} frame: {dt*1e3:7.2f} ms "
            f"({512*512*13/dt/1e6:.1f} M rays/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
