#!/usr/bin/env python
"""Render the gallery — the reference's ``photos/`` equivalent (README.md
screenshots): all catalog scenes at presentation quality.  Intended for the
TPU chip; pass --cpu --small for a quick CPU smoke gallery."""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="out/gallery")
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--spp", type=int, default=64)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--small", action="store_true", help="128px, 8 spp")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--scenes", default="cornell,flat,teapot_night,marry")
    args = ap.parse_args()
    if args.small:
        args.size, args.spp = 128, 8

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from pnraytracing_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import numpy as np

    from pnraytracing_tpu.core.config import RenderConfig
    from pnraytracing_tpu.render.renderer import render_frame
    from pnraytracing_tpu.utils.image import save_png
    from scripts.render import build_scene

    os.makedirs(args.out, exist_ok=True)
    trav = "pallas" if jax.default_backend() == "tpu" else "packed"
    cfg = RenderConfig(width=args.size, height=args.size,
                       max_depth=args.depth, traversal=trav)
    for name in args.scenes.split(","):
        t0 = time.perf_counter()
        scene, cam_state = build_scene(name, 1.0)
        cam_state.aspect = 1.0
        camera = cam_state.basis()
        scene = jax.device_put(scene)
        acc = None
        for f in range(args.spp):
            img = np.asarray(render_frame(scene, camera, cfg, f))
            acc = img if acc is None else acc + img
        acc /= args.spp
        path = f"{args.out}/{name}_{args.size}_{args.spp}spp.png"
        save_png(path, acc)
        print(f"{name}: {time.perf_counter()-t0:.1f}s -> {path}", flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
