#!/usr/bin/env python
"""A/B the Mosaic kernel variants on the chip: binary pop-test vs wide
push-test, tile sizes, + iteration census per query class.

Fetch-bounded timing (tunnel rule)."""

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

from pnraytracing_tpu.accel.traverse_pallas import closest_hit_pallas
from pnraytracing_tpu.core.camera import camera_rays
from pnraytracing_tpu.scene.scenes import config3_teapot_night


def log(*a):
    print(*a, flush=True)


def main():
    log("devices:", jax.devices())
    scene, cam_state = config3_teapot_night(env_height=32)
    trav = scene.trav
    cam_state.aspect = 1.0
    o, d, _ = camera_rays(cam_state.basis(), 512, 512)
    r = o.shape[0]
    t_max = jnp.full((r,), 1e7, jnp.float32)

    # incoherent rays: shuffled pixel order primary rays (same set, no
    # screen-tile coherence) approximates bounce-ray behaviour
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(r))
    o_inc, d_inc = o[perm], d[perm]

    for variant in ("binary", "wide"):
        for tile in (2048, 4096):
            f = jax.jit(lambda o_, d_, t_, v=variant, ts=tile: (
                closest_hit_pallas(trav, o_, d_, t_, tile_size=ts,
                                   variant=v, with_stats=True)))
            for name, oo, dd in (("coh", o, d), ("inc", o_inc, d_inc)):
                try:
                    hit, iters = f(oo, dd, t_max)
                    tot = int(iters.sum())
                    n = 10
                    t0 = time.perf_counter()
                    for _ in range(n):
                        out, _ = f(oo, dd, t_max)
                    float(out.t.sum())
                    dt = (time.perf_counter() - t0) / n
                    log(f"{variant:6s} tile {tile:5d} {name}: "
                        f"{dt*1e3:7.2f} ms  {tot:8d} iters "
                        f"({dt/max(tot,1)*1e9:6.0f} ns/iter)  "
                        f"{r/dt/1e6:7.1f} M rays/s")
                except Exception as e:  # noqa: BLE001
                    log(f"{variant:6s} tile {tile:5d} {name}: FAILED "
                        f"{type(e).__name__}: {e}")
                    return 1
    return 0


if __name__ == "__main__":
    sys.exit(main())
