#!/usr/bin/env python
"""Inverse-rendering demo: recover material parameters (and optionally
environment texels) from a target image by gradient descent through the
renderer — the differentiable-optimization capability of BASELINE.json
config 5.

Example:
  python scripts/optimize.py --steps 48 --cpu
renders a target with known materials, perturbs them, and optimizes back.
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=32)
    ap.add_argument("--lr", type=float, default=5e-2)
    ap.add_argument("--spp-per-step", type=int, default=2)
    ap.add_argument("--size", type=int, default=32)
    ap.add_argument("--depth", type=int, default=2)
    ap.add_argument("--keys", default="materials",
                    help="comma list of materials,env_image,positions")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--out", default="out/optimize")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from pnraytracing_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import jax.numpy as jnp
    import numpy as np

    from pnraytracing_tpu.core.config import RenderConfig
    from pnraytracing_tpu.diff.grad import adam_optimize
    from pnraytracing_tpu.render.renderer import render
    from pnraytracing_tpu.scene import shapes
    from pnraytracing_tpu.scene.build import SceneBuilder
    from pnraytracing_tpu.scene.scenes import _camera
    from pnraytracing_tpu.scene.transform import compose, rotate, translate
    from pnraytracing_tpu.utils.image import save_png

    # env-lit, no hard area light: low-variance renders so the MSE gradient
    # is signal, not sampling noise
    cfg = RenderConfig(width=args.size, height=args.size, max_depth=args.depth,
                       sampler="hash", clamp_radiance=True)

    def build(base_color):
        b = SceneBuilder()
        b.add(shapes.icosphere(3), dict(base_color=base_color, roughness=0.6),
              name="ball", transform=translate(0, 1.0, 0))
        b.add(shapes.quad(6.0), dict(base_color=(0.6, 0.6, 0.6), roughness=0.9),
              name="floor")
        return b.build(env_constant=(0.85, 0.85, 0.85))

    cam = _camera((3.2, 2.6, 3.2), (0, 0.9, 0), 45.0)
    camera = cam.basis()

    true_color = (0.15, 0.55, 0.8)
    target = render(build(true_color), camera, cfg, spp=8)
    scene0 = build((0.8, 0.3, 0.2))  # wrong initial guess

    keys = tuple(args.keys.split(","))
    scene_opt, losses = adam_optimize(
        scene0, camera, cfg, target, keys=keys, steps=args.steps, lr=args.lr,
        spp_per_step=args.spp_per_step, log_every=1,
    )
    print(f"loss: {losses[0]:.5f} -> {losses[-1]:.5f} "
          f"({losses[0] / max(losses[-1], 1e-12):.1f}x reduction)")
    got = np.asarray(scene_opt.materials.base_color[0])
    print(f"recovered base_color: {np.round(got, 3)} (true {true_color})")

    os.makedirs(args.out, exist_ok=True)
    save_png(f"{args.out}/target.png", np.asarray(target))
    save_png(f"{args.out}/initial.png",
             np.asarray(render(scene0, camera, cfg, spp=8)))
    save_png(f"{args.out}/optimized.png",
             np.asarray(render(scene_opt, camera, cfg, spp=8)))
    print(f"saved {args.out}/{{target,initial,optimized}}.png")
    return 0


if __name__ == "__main__":
    sys.exit(main())
