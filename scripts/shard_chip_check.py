#!/usr/bin/env python
"""shard_map x Mosaic-kernel composition on the real chip (VERDICT r3 #5):
a 1-device mesh on the TPU runs the tile-sharded render with
traversal='pallas' and must match the unsharded render bitwise."""

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


def log(*a):
    print(*a, flush=True)


def main():
    log("devices:", jax.devices())
    assert jax.default_backend() == "tpu", "run on the chip"

    from pnraytracing_tpu.core.camera import camera_rays
    from pnraytracing_tpu.core.config import RenderConfig
    from pnraytracing_tpu.parallel.mesh import (
        make_device_mesh,
        shard_render_rays,
    )
    from pnraytracing_tpu.render.integrator import render_rays
    from pnraytracing_tpu.render.renderer import pixel_coords
    from pnraytracing_tpu.scene.scenes import config3_teapot_night

    size = 256
    cfg = RenderConfig(width=size, height=size, max_depth=4,
                       traversal="pallas")
    scene, cam_state = config3_teapot_night(env_height=64)
    cam_state.aspect = 1.0
    camera = cam_state.basis()
    scene = jax.device_put(scene)
    px, py = pixel_coords(cfg)
    o, d, _ = camera_rays(camera, size, size)
    frame = jnp.uint32(3)

    log("unsharded render (pallas)...")
    t0 = time.perf_counter()
    ref = render_rays(scene, o, d, px, py, frame, cfg)
    ref_np = np.asarray(ref)
    log(f"  done in {time.perf_counter()-t0:.1f}s")

    mesh = make_device_mesh(1)
    log("sharded render (shard_map over 1-device TPU mesh, pallas)...")
    t0 = time.perf_counter()
    got = shard_render_rays(scene, o, d, px, py, frame, cfg, mesh)
    got_np = np.asarray(got)
    log(f"  done in {time.perf_counter()-t0:.1f}s")

    if np.array_equal(ref_np, got_np):
        log("MATCH: sharded == unsharded bitwise")
        return 0
    close = np.allclose(ref_np, got_np, rtol=1e-5, atol=1e-6)
    frac = float((ref_np != got_np).mean())
    log(f"differ: {frac:.4%} of values (allclose={close})")
    return 0 if close else 1


if __name__ == "__main__":
    sys.exit(main())
