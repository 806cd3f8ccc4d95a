#!/usr/bin/env python
"""Localize the env-gradient backward cost: stop-gradient each env path
(miss-radiance lookups vs NEE env sampling) and re-time grad(replay)."""

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
    import pnraytracing_tpu.render.integrator as integ
    from pnraytracing_tpu.core.camera import camera_rays
    from pnraytracing_tpu.core.config import RenderConfig
    from pnraytracing_tpu.diff.grad import apply_params, extract_params
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

    recs = integ.trace_paths(scene, o, d, px, py, frame, cfg)
    jax.block_until_ready(recs.primary.t)
    log("trace done")

    orig_lookup = integ.envmap_lookup_v
    orig_sample = integ.sample_envmap_v

    def run(label):
        p_k = extract_params(scene, ("env_image",))

        @jax.jit
        def grad_k(p, rec):
            def f(pp):
                img = integ.render_rays_replay.__wrapped__(
                    apply_params(scene, pp), o, d, px, py, frame, cfg, rec)
                return jnp.mean((img - target) ** 2)

            return jax.value_and_grad(f)(p)

        timed(label, grad_k, p_k, recs, fetch=lambda t: t[0])

    run("grad env: baseline")

    sg = jax.lax.stop_gradient
    integ.envmap_lookup_v = (
        lambda env, dirs: sg(orig_lookup(env, dirs)))
    run("grad env: lookup detached")
    integ.envmap_lookup_v = orig_lookup

    integ.sample_envmap_v = (
        lambda env, r1, r2, compat=False:
        jax.tree_util.tree_map(sg, orig_sample(env, r1, r2, compat=compat)))
    run("grad env: NEE sample detached")
    integ.sample_envmap_v = orig_sample

    integ.envmap_lookup_v = (
        lambda env, dirs: sg(orig_lookup(env, dirs)))
    integ.sample_envmap_v = (
        lambda env, r1, r2, compat=False:
        jax.tree_util.tree_map(sg, orig_sample(env, r1, r2, compat=compat)))
    run("grad env: both detached")
    integ.envmap_lookup_v = orig_lookup
    integ.sample_envmap_v = orig_sample
    return 0


if __name__ == "__main__":
    sys.exit(main())
