#!/usr/bin/env python
"""Traversal microbenchmarks: where does the time go on a real chip?

Measures
  1. gather throughput (table[idx]) — the traversal's dominant primitive;
  2. closest-hit pass time on the flagship scene;
  3. per-ray node visits vs lockstep iterations (tail-divergence waste);
  4. full-frame breakdown.

Run on TPU: python scripts/bench_traversal.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timed(fn, *args, n=10, **kw):
    import jax

    out = fn(*args, **kw)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args, **kw)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    from pnraytracing_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from pnraytracing_tpu.accel.traverse import any_hit, closest_hit, traversal_stats
    from pnraytracing_tpu.core.camera import camera_rays
    from pnraytracing_tpu.core.config import RenderConfig
    from pnraytracing_tpu.render.renderer import pixel_coords
    from pnraytracing_tpu.scene.scenes import config3_teapot_night

    print(f"devices: {jax.devices()}")

    # --- 1. gather microbench -------------------------------------------
    rng = np.random.default_rng(0)
    for n_rows, r in ((4096, 1 << 20), (65536, 1 << 20)):
        table = jnp.asarray(rng.normal(size=(n_rows, 8)).astype(np.float32))
        idx = jnp.asarray(rng.integers(0, n_rows, size=r).astype(np.int32))
        f = jax.jit(lambda t, i: t[i].sum(axis=-1))
        dt = timed(f, table, idx)
        print(f"gather [{r}] from [{n_rows},8]: {dt*1e3:.3f} ms "
              f"({r/dt/1e9:.2f} G rows/s)")

    # --- 2-4. flagship scene --------------------------------------------
    cfg = RenderConfig(width=512, height=512, max_depth=4)
    scene, cam_state = config3_teapot_night(env_height=256)
    camera = cam_state.basis()
    px, py = pixel_coords(cfg)
    o, d, _ = camera_rays(camera, cfg.width, cfg.height)
    scene = jax.device_put(scene)
    t_max = jnp.full((o.shape[0],), 1e7, jnp.float32)

    kw = dict(stack_depth=cfg.stack_depth, max_leaf_size=cfg.max_leaf_size)
    dt = timed(closest_hit, scene.bvh, scene.mesh, o, d, t_max, n=5, **kw)
    print(f"closest_hit 262k primary rays: {dt*1e3:.2f} ms "
          f"({o.shape[0]/dt/1e6:.1f} M rays/s)")
    dt = timed(any_hit, scene.bvh, scene.mesh, o, d, t_max, n=5, **kw)
    print(f"any_hit     262k primary rays: {dt*1e3:.2f} ms")

    visits, iters = traversal_stats(scene.bvh, scene.mesh, o, d, t_max, **kw)
    visits = np.asarray(visits)
    print(f"node visits: mean {visits.mean():.1f}, p50 "
          f"{np.percentile(visits, 50):.0f}, p99 {np.percentile(visits, 99):.0f}, "
          f"max {visits.max()}; lockstep iterations {int(iters)} "
          f"(waste {int(iters)/max(visits.mean(),1):.1f}x)")

    from pnraytracing_tpu.render.integrator import render_rays

    dt = timed(render_rays, scene, o, d, px, py, jnp.uint32(1), cfg, n=5)
    rays = cfg.num_pixels * (1 + 3 * cfg.max_depth)
    print(f"full frame (4 bounces): {dt*1e3:.2f} ms "
          f"({rays/dt/1e6:.0f} M rays/s)")


if __name__ == "__main__":
    main()
