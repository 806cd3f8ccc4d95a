#!/usr/bin/env python
"""Decompose the fwd+bwd bench step (trace/replay gradients) on the
chip: trace phase, replay forward, and grad-of-replay — fetch-bounded.
The bench step = trace_paths + value_and_grad(replay-MSE)."""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pnraytracing_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import functools

import jax
import jax.numpy as jnp
import numpy as np


def log(*a):
    print(*a, flush=True)


def timed(name, fn, *args, n=6, fetch=None):
    import jax.numpy as _jnp

    def scalar_of(out):
        leaf = (jax.tree_util.tree_leaves(out)[0] if fetch is None
                else fetch(out))
        if getattr(leaf, "ndim", 0):
            leaf = _jnp.sum(leaf.astype(_jnp.float32))
        return leaf

    out = fn(*args)
    np.asarray(scalar_of(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(scalar_of(out))
    dt = (time.perf_counter() - t0) / n
    log(f"{name:32s}: {dt*1e3:8.2f} ms")
    return out


def main():
    log("devices:", jax.devices())
    from pnraytracing_tpu.core.camera import camera_rays
    from pnraytracing_tpu.core.config import RenderConfig
    from pnraytracing_tpu.diff.grad import (
        apply_params,
        extract_params,
    )
    from pnraytracing_tpu.render.integrator import (
        render_rays,
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
    params = extract_params(scene, ("materials", "env_image"))

    timed("live fwd frame", functools.partial(
        render_rays, scene, o, d, px, py, frame, cfg),
        fetch=lambda x: x)

    recs = timed("trace_paths", functools.partial(
        trace_paths, scene, o, d, px, py, frame, cfg),
        fetch=lambda r: r.primary.t)

    timed("replay fwd", functools.partial(
        render_rays_replay, scene, o, d, px, py, frame, cfg, recs),
        fetch=lambda x: x)

    @jax.jit
    def grad_step(p, rec):
        def f(pp):
            img = render_rays_replay(
                apply_params(scene, pp), o, d, px, py, frame, cfg, rec)
            return jnp.mean((img - target) ** 2)

        return jax.value_and_grad(f)(p)

    timed("grad(replay) no-ckpt", grad_step, params, recs,
          fetch=lambda t: t[0])

    @jax.jit
    def grad_step_ck(p, rec):
        @jax.checkpoint
        def f(pp):
            img = render_rays_replay(
                apply_params(scene, pp), o, d, px, py, frame, cfg, rec)
            return jnp.mean((img - target) ** 2)

        return jax.value_and_grad(f)(p)

    timed("grad(replay) ckpt", grad_step_ck, params, recs,
          fetch=lambda t: t[0])
    return 0


if __name__ == "__main__":
    sys.exit(main())
