#!/usr/bin/env python
"""Render CLI — the app-orchestration layer (the reference's ``main()``
without a window: scene selection, progressive accumulation, PNG output).

Usage:
  python scripts/render.py --scene cornell --spp 64 --out out/cornell.png
  python scripts/render.py --scene teapot_night --width 512 --height 512
  python scripts/render.py --list
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build_scene(name: str, aspect: float):
    from pnraytracing_tpu.scene import scenes

    if name == "cornell":
        builder, cam = scenes.cornell_box(aspect)
        return builder.build(env_constant=(0.0, 0.0, 0.0)), cam
    if name == "flat":
        builder, cam = scenes.scene_flat(aspect)
        return builder.build(env_constant=(0.03, 0.03, 0.05)), cam
    if name == "teapot":
        builder, cam = scenes.teapot_scene(aspect)
        return builder.build(env_image=scenes.night_hdr()), cam
    if name == "config1":
        return scenes.config1_triangle()
    if name == "config2":
        return scenes.config2_teapot()
    if name == "teapot_night" or name == "config3":
        return scenes.config3_teapot_night()
    if name == "marry" or name == "config4":
        return scenes.config4_marry(aspect)
    if name == "config5":
        return scenes.config5_large()
    raise SystemExit(f"unknown scene {name!r} (use --list)")


SCENES = ["cornell", "flat", "teapot", "teapot_night", "marry",
          "config1", "config2", "config3", "config4", "config5"]


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="cornell", choices=SCENES)
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--out", default=None)
    ap.add_argument("--sampler", default="sobol", choices=["sobol", "hash"])
    ap.add_argument("--compat", action="store_true",
                    help="reproduce the reference's quirks exactly")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--sharded", action="store_true",
                    help="shard over all local devices")
    ap.add_argument("--list", action="store_true")
    args = ap.parse_args()
    if args.list:
        print("\n".join(SCENES))
        return 0

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from pnraytracing_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    from pnraytracing_tpu.core.config import RenderConfig
    from pnraytracing_tpu.render.renderer import render_frame
    from pnraytracing_tpu.utils.image import save_png

    cfg = RenderConfig(
        width=args.width, height=args.height, max_depth=args.depth,
        sampler=args.sampler, compat_pnrt=args.compat,
    )
    scene, cam_state = build_scene(args.scene, args.width / args.height)
    cam_state.aspect = args.width / args.height
    camera = cam_state.basis()
    scene = jax.device_put(scene)

    num_tris = int(scene.mesh.indices.shape[0])
    print(f"scene {args.scene}: {num_tris} tris, "
          f"{int(scene.lights.count)} light tris, "
          f"env={'hdr' if scene.env is not None else 'const'}", flush=True)

    if args.sharded:
        from pnraytracing_tpu.parallel.mesh import (
            make_device_mesh, render_frame_sharded)

        mesh = make_device_mesh()
        frame_fn = lambda f: render_frame_sharded(scene, camera, cfg, f, mesh)
        print(f"mesh: {mesh}", flush=True)
    else:
        frame_fn = lambda f: render_frame(scene, camera, cfg, f)

    import numpy as np

    acc = None
    t0 = time.perf_counter()
    for f in range(args.spp):
        img = np.asarray(frame_fn(f))
        acc = img if acc is None else acc + img
        if f == 0:
            print(f"first frame (incl. compile): "
                  f"{time.perf_counter() - t0:.1f}s", flush=True)
            t0 = time.perf_counter()
    if args.spp > 1:
        dt = time.perf_counter() - t0
        rps = cfg.num_pixels * (1 + 3 * cfg.max_depth) * (args.spp - 1) / dt
        print(f"{args.spp - 1} frames in {dt:.2f}s -> {rps:,.0f} rays/s")
    acc = acc / args.spp

    out = args.out or f"out/{args.scene}_{args.width}x{args.height}_{args.spp}spp.png"
    os.makedirs(os.path.dirname(out) or ".", exist_ok=True)
    save_png(out, acc)
    print(f"saved {out}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
