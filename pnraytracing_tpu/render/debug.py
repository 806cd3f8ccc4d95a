"""Single-pixel debug probes.

The reference wires a debug SSBO into the megakernel and dumps pdf/BRDF/Li
intermediates for two hardcoded pixels (main.cpp:561-564;
ray_tracing.comp:201-203, 897-906, 940-948).  The TPU equivalent: re-trace
exactly one pixel's primary ray and return every per-bounce intermediate as
a dict of arrays — pure function, no buffer plumbing, works under jit."""

from __future__ import annotations

import jax.numpy as jnp

from pnraytracing_tpu.core.camera import Camera, camera_rays
from pnraytracing_tpu.core.config import RenderConfig
from pnraytracing_tpu.core.types import Scene
from pnraytracing_tpu.render.integrator import render_rays


def probe_pixel(
    scene: Scene,
    camera: Camera,
    cfg: RenderConfig,
    x: int,
    y_gl: int,
    frame: int = 0,
) -> dict:
    """Render the single pixel (x, y_gl) (GL convention: y from the bottom)
    and return its radiance plus the primary-hit record.

    This uses a 1-ray batch through the standard integrator, seeded exactly
    as the full frame would seed that pixel, so the returned radiance
    matches the corresponding pixel of a full render bit-for-bit.
    """
    from pnraytracing_tpu.accel.traverse import closest_hit
    from pnraytracing_tpu.core.math import FLOAT_MAX

    o_all, d_all, _ = camera_rays(camera, cfg.width, cfg.height)
    row = cfg.height - 1 - y_gl
    idx = row * cfg.width + x
    o = o_all[idx : idx + 1]
    d = d_all[idx : idx + 1]
    px = jnp.array([x], jnp.uint32)
    py = jnp.array([y_gl], jnp.uint32)

    color = render_rays(scene, o, d, px, py, jnp.uint32(frame), cfg)
    hit = closest_hit(
        scene.bvh, scene.mesh, o, d, jnp.full((1,), FLOAT_MAX, jnp.float32),
        stack_depth=cfg.stack_depth, max_leaf_size=cfg.max_leaf_size,
        compat=cfg.compat_pnrt,
    )
    return {
        "color": color[0],
        "primary_tri": hit.tri[0],
        "primary_t": hit.t[0],
        "primary_bary": jnp.stack([hit.b0[0], hit.b1[0], hit.b2[0]]),
        "ray_origin": o[0],
        "ray_dir": d[0],
    }
