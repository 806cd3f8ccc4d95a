#!/usr/bin/env python
"""Sequential TPU measurement queue — run detached (nohup) so no tool
timeout ever kills a client mid-RPC (that wedges the axon tunnel for
hours).  Appends results to out/tpu_queue.log via print flushes."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pnraytracing_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import numpy as np
import jax
import jax.numpy as jnp

from pnraytracing_tpu.core.camera import camera_rays
from pnraytracing_tpu.core.config import RenderConfig
from pnraytracing_tpu.render.integrator import render_rays
from pnraytracing_tpu.render.renderer import pixel_coords
from pnraytracing_tpu.scene.scenes import config3_teapot_night
from pnraytracing_tpu.utils.image import save_png


def log(*a):
    print(*a, flush=True)


def main():
    log("devices:", jax.devices())

    # ---- 1. honest per-frame timing with checksums (128x128) -------------
    cfg = RenderConfig(width=128, height=128, max_depth=4, sampler="hash")
    scene, cam = config3_teapot_night(env_height=32)
    px, py = pixel_coords(cfg)
    o, d, _ = camera_rays(cam.basis(), 128, 128)
    scene_d = jax.device_put(scene)
    t0 = time.perf_counter()
    img0 = render_rays(scene_d, o, d, px, py, jnp.uint32(0), cfg)
    jax.block_until_ready(img0)
    log(f"128 compile+first: {time.perf_counter()-t0:.1f}s")
    for i in range(4):
        t0 = time.perf_counter()
        out = render_rays(scene_d, o, d, px, py, jnp.uint32(i + 1), cfg)
        s = float(jnp.sum(out))  # host readback forces completion
        log(f"128 frame {i+1}: {(time.perf_counter()-t0)*1e3:.2f} ms "
            f"checksum {s:.4f}")
    np.save("out/tpu_frame0_128.npy", np.asarray(img0))
    log("saved out/tpu_frame0_128.npy")

    # ---- 2. flagship 512x512 with checksum timing ------------------------
    cfg5 = RenderConfig(width=512, height=512, max_depth=4)
    scene5, cam5 = config3_teapot_night(env_height=256)
    px5, py5 = pixel_coords(cfg5)
    o5, d5, _ = camera_rays(cam5.basis(), 512, 512)
    t0 = time.perf_counter()
    out = render_rays(scene_d := jax.device_put(scene5), o5, d5, px5, py5,
                      jnp.uint32(0), cfg5)
    jax.block_until_ready(out)
    log(f"512 compile+first: {time.perf_counter()-t0:.1f}s")
    rays = cfg5.num_pixels * (1 + 3 * cfg5.max_depth)
    for i in range(4):
        t0 = time.perf_counter()
        out = render_rays(scene_d, o5, d5, px5, py5, jnp.uint32(i + 1), cfg5)
        s = float(jnp.sum(out))
        dt = time.perf_counter() - t0
        log(f"512 frame {i+1}: {dt*1e3:.2f} ms  checksum {s:.2f}  "
            f"{rays/dt/1e9:.2f} G rays/s")
    # accumulate a quality render + save
    acc = np.asarray(out).reshape(512, 512, 3).copy()
    n_acc = 16
    for f in range(2, 2 + n_acc - 1):
        acc += np.asarray(
            render_rays(scene_d, o5, d5, px5, py5, jnp.uint32(f), cfg5)
        ).reshape(512, 512, 3)
    acc /= n_acc
    os.makedirs("out", exist_ok=True)
    save_png("out/teapot_night_tpu_512.png", acc)
    log("saved out/teapot_night_tpu_512.png  stats mean",
        float(acc.mean()), "std", float(acc.std()))

    # ---- 3. traversal tile sweep on 512 config ---------------------------
    import dataclasses

    for tile in (None, 2048, 4096, 8192, 16384, 32768):
        cfg_t = dataclasses.replace(cfg5, trav_tile=tile)
        out = render_rays(scene_d, o5, d5, px5, py5, jnp.uint32(0), cfg_t)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(4):
            out = render_rays(scene_d, o5, d5, px5, py5, jnp.uint32(i + 1), cfg_t)
        float(jnp.sum(out))
        jax.block_until_ready(out)
        dt = (time.perf_counter() - t0) / 4
        log(f"tile {tile}: {dt*1e3:.2f} ms/frame ({rays/dt/1e9:.2f} G rays/s)")

    # ---- 4. compaction on/off at 512 ------------------------------------
    for comp in (True, False):
        cfg_c = dataclasses.replace(cfg5, compact_rays=comp)
        out = render_rays(scene_d, o5, d5, px5, py5, jnp.uint32(0), cfg_c)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for i in range(4):
            out = render_rays(scene_d, o5, d5, px5, py5, jnp.uint32(i + 1), cfg_c)
        float(jnp.sum(out))
        dt = (time.perf_counter() - t0) / 4
        log(f"compact {comp}: {dt*1e3:.2f} ms/frame")

    log("QUEUE DONE")


if __name__ == "__main__":
    main()
