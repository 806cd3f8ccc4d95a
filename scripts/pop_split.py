#!/usr/bin/env python
"""Leaf-vs-internal pop split of the wide Mosaic kernel.

Sizes the 4-ary-collapse lever for a future round: collapsing two tree
levels halves INTERNAL pops only, so its ceiling is
1 / (leaf_frac + internal_frac/2) at ~1.6x the per-internal cost."""

import functools
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pnraytracing_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np

from pnraytracing_tpu.accel.traverse_pallas import (
    _call_kernel,
    _closest_kernel_wide,
    pick_variant,
)
from pnraytracing_tpu.core.camera import camera_rays
from pnraytracing_tpu.scene.scenes import config3_teapot_night


def main():
    print("devices:", jax.devices(), flush=True)
    scene, cam = config3_teapot_night(env_height=32)
    cam.aspect = 1.0
    scene = jax.device_put(scene)
    o, d, _ = camera_rays(cam.basis(), 512, 512)
    r = o.shape[0]
    t_max = jnp.full((r,), 1e7, jnp.float32)
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(r))

    trav = scene.trav
    assert pick_variant(trav, "wide") == "wide"
    kernel = functools.partial(
        _closest_kernel_wide, int(trav.nodes8.shape[0]),
        int(trav.tri9.shape[0]), 4, False,
    )

    @jax.jit
    def raw(oo, dd):
        (t, tri, b1, b2, iters), _ = _call_kernel(
            kernel, 4, trav, oo, dd, t_max, None,
            stack_depth=64, tile_size=4096, interpret=False,
            variant="wide",
        )
        return iters

    for name, oo, dd in (("coh", o, d), ("inc", o[perm], d[perm])):
        it = np.asarray(raw(oo, dd))  # [n_tiles, 8, 128]
        total = int(it[:, 0, 0].sum())
        leaf = int(it[:, 4, 0].sum())
        print(f"{name}: total pops {total}, leaf pops {leaf} "
              f"({leaf/max(total,1):.1%}), internal {total-leaf}",
              flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
