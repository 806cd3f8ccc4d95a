#!/usr/bin/env python
"""Traversal tile-size sweep on the chip: the shared-stack packet kernel
pays the UNION of its tile's ray paths per iteration, so tile size
trades per-iteration cost against union divergence.  Sweeps closest-hit
(coherent + shuffled) and the fused 2R any-hit, then full no-compaction
frames over the best candidates.  Fetch-bounded (scalar fetches only)."""

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
    from pnraytracing_tpu.accel.traverse_pallas import (
        any_hit_pallas,
        closest_hit_pallas,
    )
    from pnraytracing_tpu.core.camera import camera_rays
    from pnraytracing_tpu.core.config import RenderConfig
    from pnraytracing_tpu.render.renderer import render_average
    from pnraytracing_tpu.scene.scenes import config3_teapot_night

    scene, cam_state = config3_teapot_night(env_height=256)
    cam_state.aspect = 1.0
    camera = cam_state.basis()
    scene = jax.device_put(scene)
    trav = scene.trav
    o, d, _ = camera_rays(camera, 512, 512)
    r = o.shape[0]
    t_max = jnp.full((r,), 1e7, jnp.float32)
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(r))
    o_inc, d_inc = o[perm], d[perm]

    n = 10
    for tile in (1024, 2048, 4096, 8192):
        f = jax.jit(lambda o_, d_, t_, ts=tile: closest_hit_pallas(
            trav, o_, d_, t_, tile_size=ts, with_stats=True))
        for name, oo, dd in (("coh", o, d), ("inc", o_inc, d_inc)):
            hit, iters = f(oo, dd, t_max)
            tot = int(iters.sum())
            t0 = time.perf_counter()
            for _ in range(n):
                out, _ = f(oo, dd, t_max)
            float(out.t.sum())
            dt = (time.perf_counter() - t0) / n
            log(f"closest tile {tile:5d} {name}: {dt*1e3:7.2f} ms "
                f"{tot:8d} iters  {r/dt/1e6:7.1f} M rays/s")

        # fused-2R any-hit shape: light segment + env ray from the
        # primary hit points (the integrator's real mix)
        fa = jax.jit(lambda oo, dd, tt, mm, ts=tile: any_hit_pallas(
            trav, oo, dd, tt, mm, tile_size=ts))
        hit = jax.jit(lambda: closest_hit_pallas(
            trav, o, d, t_max, tile_size=4096))()
        pos = o + d * hit.t[:, None] * 0.999
        o2 = jnp.concatenate([pos, pos])
        d2 = jnp.concatenate([jnp.broadcast_to(
            jnp.asarray([0.2, 1.0, 0.1]), (r, 3)) - pos * 0.1, d_inc])
        t2 = jnp.concatenate([jnp.ones((r,), jnp.float32), t_max])
        m2 = jnp.concatenate([hit.valid, hit.valid])
        try:
            occ = fa(o2, d2, t2, m2)
            t0 = time.perf_counter()
            for _ in range(n):
                occ = fa(o2, d2, t2, m2)
            float(occ.sum())
            dt = (time.perf_counter() - t0) / n
            log(f"anyhit  tile {tile:5d} 2R : {dt*1e3:7.2f} ms")
        except Exception as e:  # small tiles can exceed SMEM at 2R
            log(f"anyhit  tile {tile:5d} 2R : FAILED "
                f"{type(e).__name__}: {str(e)[:160]}")

    # ---- frame-level: no-compact x trav_tile, plus sort+compact -------
    for label, over in [
        ("frame tile=1024", dict(trav_tile=1024)),
        ("frame tile=2048", dict(trav_tile=2048)),
        ("frame tile=4096", dict(trav_tile=4096)),
        ("frame tile=2048 sort-pos", dict(trav_tile=2048, compact_rays=True,
                                          sort_rays=True, sort_key="pos")),
    ]:
        cfg = RenderConfig(width=512, height=512, max_depth=4,
                           traversal="pallas", **over)
        f2 = jax.jit(lambda fr, c=cfg: render_average(scene, camera, c,
                                                      fr, 1))
        out = f2(jnp.uint32(0))
        float(out.sum())
        t0 = time.perf_counter()
        for _ in range(n):
            out = f2(jnp.uint32(1))
        float(out.sum())
        dt = (time.perf_counter() - t0) / n
        rays = 512 * 512 * 13
        log(f"{label}: {dt*1e3:7.2f} ms  ({rays/dt/1e6:.1f} M rays/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
