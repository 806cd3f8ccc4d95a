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


def scene_from_file(path: str, aspect: float):
    """Studio setup around an arbitrary model file (OBJ/PLY/glTF/GLB):
    the asset auto-framed on a floor under an area light + sky — the
    CLI counterpart of the reference's `Model(path, modelMatrix, ...)`
    scene functions (main.cpp:198-347)."""
    import numpy as np

    from pnraytracing_tpu.core.camera import CameraState
    from pnraytracing_tpu.io import load_model
    from pnraytracing_tpu.scene import shapes
    from pnraytracing_tpu.scene.build import SceneBuilder
    from pnraytracing_tpu.scene.transform import compose, rotate, translate

    b = SceneBuilder()
    groups = load_model(path)
    if isinstance(groups, dict):  # PLY: bare mesh
        b.add(groups, dict(base_color=(0.75, 0.71, 0.68), roughness=0.5),
              name=os.path.basename(path))
    else:
        for g in groups:
            if len(g) == 4:  # OBJ: (mesh, material, texture, name)
                mesh, mat, tex, name = g
                b.add(mesh, mat, name=name, texture=tex)
            elif len(g) == 5:  # FBX: (mesh, material, None, name, transform)
                mesh, mat, tex, name, m = g
                b.add(mesh, mat, name=name, transform=m, texture=tex)
            else:  # glTF: (mesh, material, texture, name, transform, key)
                mesh, mat, tex, name, m, tex_key = g
                b.add(mesh, mat, name=name, transform=m, texture=tex,
                      texture_key=tex_key)

    # auto-frame: bounding box of everything added so far
    lo = np.full(3, np.inf)
    hi = np.full(3, -np.inf)
    for e in b.entries:
        p = np.asarray(e.mesh["positions"], np.float64)
        if e.transform is not None:
            p = p @ e.transform[:3, :3].T + e.transform[:3, 3]
        lo = np.minimum(lo, p.min(axis=0))
        hi = np.maximum(hi, p.max(axis=0))
    center = (lo + hi) / 2
    extent = float(max(hi - lo))

    b.add(shapes.quad(extent * 4), dict(base_color=(0.6, 0.6, 0.6),
                                        roughness=0.8),
          name="floor", transform=translate(center[0], lo[1], center[2]))
    b.add(shapes.quad(extent * 0.6), dict(emissive=(10.0, 10.0, 10.0)),
          name="key_light",
          transform=compose(translate(center[0], hi[1] + extent * 1.2,
                                      center[2]),
                            rotate(180, (0, 0, 1))))
    scene = b.build(env_constant=(0.25, 0.28, 0.32))
    eye = center + np.array([0.0, extent * 0.45, extent * 1.6])
    cam = CameraState(eye=np.asarray(eye, np.float64),
                      center=np.asarray(center, np.float64),
                      up=np.array([0.0, 1.0, 0.0]), fov_deg=45.0,
                      aspect=aspect)
    return scene, cam


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="cornell", choices=SCENES)
    ap.add_argument("--model", default=None, metavar="PATH",
                    help="render an OBJ/PLY/glTF/GLB/FBX (binary) file in "
                    "a studio setup instead of a named scene")
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--spp", type=int, default=16)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--out", default=None)
    ap.add_argument("--sampler", default="sobol", choices=["sobol", "hash"])
    ap.add_argument("--loop", default="unroll", choices=["unroll", "scan"],
                    help="bounce-loop construction; 'scan' compiles O(1) "
                    "in depth (use for deep bounces)")
    ap.add_argument("--compat", action="store_true",
                    help="reproduce the reference's quirks exactly")
    ap.add_argument("--traversal", default=None,
                    choices=["packed", "pop", "wide", "packet", "wide4",
                             "pallas"],
                    help="traversal backend (default: RenderConfig default;"
                    " 'pallas' is the Mosaic kernel, TPU hot path)")
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

    overrides = {}
    if args.traversal:
        overrides["traversal"] = args.traversal
    cfg = RenderConfig(
        width=args.width, height=args.height, max_depth=args.depth,
        sampler=args.sampler, compat_pnrt=args.compat, loop=args.loop,
        **overrides,
    )
    if args.model:
        scene, cam_state = scene_from_file(args.model, args.width / args.height)
    else:
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

    from pnraytracing_tpu.utils.resilience import run_resilient

    acc = None
    t0 = time.perf_counter()
    for f in range(args.spp):
        # survive tunnel worker crashes: host-side accumulation + per-frame
        # retry with scene re-upload (utils/resilience.py)
        def one(frame=f, scene_dev=None):
            nonlocal scene
            if scene_dev is not None:
                scene = scene_dev
            return np.asarray(frame_fn(frame))

        img = run_resilient(
            one, reupload={"scene_dev": scene},
            log=lambda m: print(f"[resilience] {m}", flush=True),
        )
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
