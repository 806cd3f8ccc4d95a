#!/usr/bin/env python
"""Benchmark harness: rays/s/chip on the flagship configuration.

Scene: BASELINE.json config 3 (teapot + area light + night HDR env, full
Disney BRDF with light/env/BRDF MIS) at 512x512, 1 spp, 4 bounces — the
reference's converged-mode render configuration (PnRT.hpp:41-42,
main.cpp:572).

Metric: traced rays per second per chip, counting every traversal query a
pixel's path issues (primary + per-bounce: light shadow + env shadow +
continuation), i.e. rays/pixel = 1 + 3 * depth.  ``--bwd`` measures the
forward+backward step (gradients to materials + env texels) instead.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "rays/s/chip", "vs_baseline": N}
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import jax
import jax.numpy as jnp

# Round-1 reference point for vs_baseline: the first measured number of this
# framework on one TPU v5e chip (recorded in BASELINE.md).  Later rounds
# report their speedup against it.
BASELINE_RAYS_PER_S = 1.52e9


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--frames", type=int, default=8, help="timed frames")
    ap.add_argument("--warmup", type=int, default=2)
    ap.add_argument("--bwd", action="store_true",
                    help="benchmark forward+backward instead of forward")
    ap.add_argument("--env-height", type=int, default=256)
    args = ap.parse_args()

    from pnraytracing_tpu.core.camera import camera_rays
    from pnraytracing_tpu.core.config import RenderConfig
    from pnraytracing_tpu.render.integrator import render_rays
    from pnraytracing_tpu.render.renderer import pixel_coords
    from pnraytracing_tpu.scene.scenes import config3_teapot_night
    from pnraytracing_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    cfg = RenderConfig(width=args.width, height=args.height, max_depth=args.depth)
    scene, cam_state = config3_teapot_night(env_height=args.env_height)
    cam_state.aspect = args.width / args.height
    camera = cam_state.basis()
    px, py = pixel_coords(cfg)
    o, d, _ = camera_rays(camera, cfg.width, cfg.height)
    scene = jax.device_put(scene)

    if args.bwd:
        from pnraytracing_tpu.diff.grad import extract_params, loss_and_grad

        params = extract_params(scene, ("materials", "env_image"))
        target = jnp.zeros((cfg.num_pixels, 3), jnp.float32)

        def step(frame):
            loss, grads = loss_and_grad(
                params, scene, o, d, px, py, frame, target, cfg
            )
            return loss

    else:

        def step(frame):
            return render_rays(scene, o, d, px, py, frame, cfg)

    # warmup / compile
    for i in range(args.warmup):
        jax.block_until_ready(step(jnp.uint32(i)))

    t0 = time.perf_counter()
    for i in range(args.frames):
        out = step(jnp.uint32(args.warmup + i))
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0

    rays_per_frame = cfg.num_pixels * (1 + 3 * cfg.max_depth)
    rays_per_s = rays_per_frame * args.frames / dt
    metric = (
        "rays/s/chip fwd+bwd (512x512, 1spp, 4 bounces, teapot_night)"
        if args.bwd
        else "rays/s/chip fwd (512x512, 1spp, 4 bounces, teapot_night)"
    )
    print(json.dumps({
        "metric": metric,
        "value": round(rays_per_s, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 4),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
