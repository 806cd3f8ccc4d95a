#!/usr/bin/env python
"""Hardware validation + timing of the Mosaic packet-traversal kernel.

Correctness: closest/any-hit on teapot primary rays at 128x128 vs the
CPU-interpreted kernel (same arithmetic; Mosaic-vs-interpreter FMA drift
is bounded ~1 ulp) and hit-count sanity.  Timing: 512x512 primary rays,
fetch-bounded (a device scalar is pulled after the timed calls — tunnel
rule, BASELINE.md round-2 integrity notes).
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

from pnraytracing_tpu.accel.traverse_pallas import (
    any_hit_pallas,
    closest_hit_pallas,
)
from pnraytracing_tpu.core.camera import camera_rays
from pnraytracing_tpu.scene.scenes import config3_teapot_night


def log(*a):
    print(*a, flush=True)


def rays_for(scene, cam_state, w, h):
    cam_state.aspect = w / h
    camera = cam_state.basis()
    o, d, _ = camera_rays(camera, w, h)
    return o, d


def main():
    log("devices:", jax.devices())
    on_tpu = jax.default_backend() == "tpu"
    scene, cam_state = config3_teapot_night(env_height=32)
    trav = scene.trav
    log(f"scene: {trav.nodes8.shape[0]} nodes, {trav.tri9.shape[0]} tris, "
        f"smem bytes {(trav.nodes8.size + trav.tri9.size) * 4}")

    # ---- correctness at 128x128 ----------------------------------------
    o, d, = rays_for(scene, cam_state, 128, 128)
    t_max = jnp.full((o.shape[0],), 1e7, jnp.float32)
    hit_hw = closest_hit_pallas(trav, o, d, t_max, tile_size=4096)
    tri_hw = np.asarray(hit_hw.tri)
    t_hw = np.asarray(hit_hw.t)
    log(f"hw closest 128^2: {int((tri_hw >= 0).sum())} hits, "
        f"t mean {t_hw[tri_hw >= 0].mean():.4f}")

    with jax.default_device(jax.local_devices(backend="cpu")[0]):
        pass  # no cpu backend registered alongside axon; compare offline

    np.save("/tmp/pallas_hw_tri.npy", tri_hw)
    np.save("/tmp/pallas_hw_t.npy", t_hw)

    occ = any_hit_pallas(trav, o, d, jnp.full_like(t_max, 10.0),
                         tile_size=4096)
    log(f"hw any 128^2: {int(np.asarray(occ).sum())} occluded")

    # ---- timing at 512x512 ---------------------------------------------
    o, d = rays_for(scene, cam_state, 512, 512)
    r = o.shape[0]
    t_max = jnp.full((r,), 1e7, jnp.float32)
    for tile in (1024, 4096, 16384):
        f = jax.jit(lambda o_, d_, t_: closest_hit_pallas(
            trav, o_, d_, t_, tile_size=tile))
        t0 = time.perf_counter()
        float(f(o, d, t_max).t.sum())
        log(f"tile {tile:6d}: compile+first {time.perf_counter()-t0:.1f}s")
        n = 20
        t0 = time.perf_counter()
        for _ in range(n):
            out = f(o, d, t_max)
        float(out.t.sum())
        dt = (time.perf_counter() - t0) / n
        log(f"tile {tile:6d}: closest 512^2 {dt*1e3:8.2f} ms/call "
            f"({r/dt/1e6:8.1f} M rays/s)")
    # any-hit timing (shadow-ray shape): short rays, one tile size
    f = jax.jit(lambda o_, d_, t_: any_hit_pallas(
        trav, o_, d_, t_, tile_size=4096))
    float(f(o, d, jnp.full((r,), 10.0, jnp.float32)).sum())
    n = 20
    t0 = time.perf_counter()
    for _ in range(n):
        out = f(o, d, jnp.full((r,), 10.0, jnp.float32))
    float(out.sum())
    dt = (time.perf_counter() - t0) / n
    log(f"any-hit 512^2 tile 4096: {dt*1e3:8.2f} ms/call "
        f"({r/dt/1e6:8.1f} M rays/s)")


if __name__ == "__main__":
    main()
