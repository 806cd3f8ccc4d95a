#!/usr/bin/env python
"""Scaling-efficiency benchmark: per-sample wall time on 1..N-device meshes
(the >=85% 1->N metric of BASELINE.json).

On real multi-chip hardware this measures ICI-scaled throughput; on a single
host it can still run against the fake CPU mesh (--cpu --devices 8) to
validate the sharding path, though CPU "devices" share cores so the
efficiency numbers are not meaningful there.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=256)
    ap.add_argument("--height", type=int, default=256)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--frames", type=int, default=4)
    ap.add_argument("--devices", type=int, default=0, help="0 = all")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        if args.devices:
            jax.config.update("jax_num_cpu_devices", args.devices)
    from pnraytracing_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp

    from pnraytracing_tpu.core.camera import camera_rays
    from pnraytracing_tpu.core.config import RenderConfig
    from pnraytracing_tpu.parallel.distributed import scaling_efficiency
    from pnraytracing_tpu.parallel.mesh import make_device_mesh, shard_render_rays
    from pnraytracing_tpu.render.renderer import pixel_coords
    from pnraytracing_tpu.scene.scenes import config3_teapot_night

    n_avail = len(jax.devices())
    cfg = RenderConfig(width=args.width, height=args.height, max_depth=args.depth)
    scene, cam_state = config3_teapot_night(env_height=128)
    cam_state.aspect = args.width / args.height
    camera = cam_state.basis()
    px, py = pixel_coords(cfg)
    o, d, _ = camera_rays(camera, cfg.width, cfg.height)
    scene = jax.device_put(scene)

    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_avail]
    times: dict[int, float] = {}
    for n in sizes:
        mesh = make_device_mesh(n)
        out = shard_render_rays(scene, o, d, px, py, 0, cfg, mesh)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for f in range(args.frames):
            out = shard_render_rays(scene, o, d, px, py, f + 1, cfg, mesh)
        jax.block_until_ready(out)
        times[n] = (time.perf_counter() - t0) / args.frames
        print(f"{n} devices: {times[n]*1e3:.2f} ms/sample", flush=True)

    eff = scaling_efficiency(times)
    print(json.dumps({
        "metric": "scaling efficiency 1->N devices (teapot_night)",
        "times_ms": {str(k): round(v * 1e3, 3) for k, v in times.items()},
        "efficiency": {str(k): round(v, 4) for k, v in eff.items()},
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
