#!/usr/bin/env python
"""Where does the forward+backward step's time go?

The round-1 numbers: fwd 1.6e10 rays/s vs fwd+bwd 2.3e9 — a 7x step cost.
A remat backward should cost ~3 forwards, so something else dominates.
This script times the flagship fwd+bwd step with each parameter set in
isolation (materials / env_image / positions), with and without
``jax.checkpoint``, to locate the expensive VJPs.

Run detached: nohup python scripts/bwd_profile.py > out/bwd_profile.log 2>&1
"""

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

from pnraytracing_tpu.core.camera import camera_rays
from pnraytracing_tpu.core.config import RenderConfig
from pnraytracing_tpu.diff.grad import extract_params, render_image_from_params
from pnraytracing_tpu.render.renderer import pixel_coords, render_average
from pnraytracing_tpu.scene.scenes import config3_teapot_night


def log(*a):
    print(*a, flush=True)


def timeit(fn, reps=8, warmup=1):
    for _ in range(warmup):
        out = fn()
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out
    )
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn()
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out
    )
    return (time.perf_counter() - t0) / reps * 1e3


def main():
    cfg = RenderConfig(width=512, height=512, max_depth=4)
    scene, cam_state = config3_teapot_night(env_height=256)
    cam_state.aspect = 1.0
    camera = cam_state.basis()
    scene = jax.device_put(scene)
    px, py = pixel_coords(cfg)
    o, d, _ = camera_rays(camera, cfg.width, cfg.height)
    target = jnp.zeros((cfg.num_pixels, 3), jnp.float32)
    K = 8

    t_fwd = timeit(
        lambda: render_average(scene, camera, cfg, jnp.uint32(0), K)
    ) / K
    log(f"fwd frame: {t_fwd:.3f} ms")

    def make_step(keys, use_ckpt):
        params = extract_params(scene, keys)

        @jax.jit
        def step(p):
            def f(pp):
                def body(acc, i):
                    img = render_image_from_params(pp, scene, o, d, px, py, i, cfg)
                    return acc + jnp.mean((img - target) ** 2), None

                body_fn = jax.checkpoint(body) if use_ckpt else body
                loss, _ = jax.lax.scan(
                    body_fn, jnp.float32(0.0), jnp.arange(K, dtype=jnp.uint32)
                )
                return loss / K

            return jax.value_and_grad(f)(p)

        return lambda: step(params)

    for keys in (("materials",), ("env_image",), ("positions",),
                 ("materials", "env_image")):
        for ck in (True, False):
            name = "+".join(keys) + (" ckpt" if ck else " nockpt")
            try:
                t = timeit(make_step(keys, ck), reps=4) / K
                log(f"fwd+bwd [{name}]: {t:.3f} ms/frame  ({t / t_fwd:.1f}x fwd)")
            except Exception as e:
                log(f"fwd+bwd [{name}]: FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
