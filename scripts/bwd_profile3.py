#!/usr/bin/env python
"""Round-5 backward knockouts: which parameter family costs the
grad(replay) pass — materials or env texels?  Plus standalone VJP
timings of the env-gradient scatter structure.  Fetch-bounded."""

from __future__ import annotations

import functools
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


def timed(name, fn, *args, n=6, fetch=None):
    def scalar_of(out):
        leaf = (jax.tree_util.tree_leaves(out)[0] if fetch is None
                else fetch(out))
        if getattr(leaf, "ndim", 0):
            leaf = jnp.sum(leaf.astype(jnp.float32))
        return leaf

    out = fn(*args)
    np.asarray(scalar_of(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(scalar_of(out))
    log(f"{name:32s}: {(time.perf_counter()-t0)/n*1e3:8.2f} ms")
    return out


def main():
    log("devices:", jax.devices())
    from pnraytracing_tpu.core.camera import camera_rays
    from pnraytracing_tpu.core.config import RenderConfig
    from pnraytracing_tpu.diff.grad import apply_params, extract_params
    from pnraytracing_tpu.render.integrator import (
        render_rays_replay,
        trace_paths,
    )
    from pnraytracing_tpu.render.renderer import pixel_coords
    from pnraytracing_tpu.scene.scenes import config3_teapot_night

    cfg = RenderConfig(width=512, height=512, max_depth=4,
                       traversal="pallas")
    scene, cam_state = config3_teapot_night(env_height=256)
    cam_state.aspect = 1.0
    camera = cam_state.basis()
    scene = jax.device_put(scene)
    px, py = pixel_coords(cfg)
    o, d, _ = camera_rays(camera, cfg.width, cfg.height)
    frame = jnp.uint32(0)
    target = jnp.zeros((cfg.num_pixels, 3), jnp.float32)

    recs = trace_paths(scene, o, d, px, py, frame, cfg)
    jax.block_until_ready(recs.primary.t)
    log("trace done")

    for label, keys in [
        ("grad mats+env (bench step)", ("materials", "env_image")),
        ("grad materials only", ("materials",)),
        ("grad env only", ("env_image",)),
    ]:
        p_k = extract_params(scene, keys)

        @jax.jit
        def grad_k(p, rec):
            def f(pp):
                img = render_rays_replay(
                    apply_params(scene, pp), o, d, px, py, frame, cfg, rec)
                return jnp.mean((img - target) ** 2)

            return jax.value_and_grad(f)(p)

        timed(label, grad_k, p_k, recs, fetch=lambda t: t[0])

    # standalone env VJP structure costs
    from pnraytracing_tpu.core.vec import V3
    from pnraytracing_tpu.ops.envmap import envmap_lookup_v

    r = cfg.num_pixels
    rng = np.random.default_rng(0)
    dirs = rng.normal(size=(3, r)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=0, keepdims=True)
    d_v = V3(*(jnp.asarray(c) for c in dirs))

    @jax.jit
    def env_vjp(img):
        def f(e):
            env2 = scene.env.replace(image=e)
            li = envmap_lookup_v(env2, d_v)
            return jnp.sum(li.x + li.y + li.z)

        return jax.grad(f)(img)

    timed("envmap_lookup VJP (1 pass)", env_vjp, scene.env.image)
    return 0


if __name__ == "__main__":
    sys.exit(main())
