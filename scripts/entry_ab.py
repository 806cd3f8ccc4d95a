#!/usr/bin/env python
"""Round-5 A/B: pre-traversal sort placement + key variants, on chip.

Times (a) the treelet entry key standalone, (b) full flagship frames
under sort_key in {pos, entry, dir} with the NEW pre-hit2 placement,
and (c) compact-only / no-compact frames.  Fetch-bounded.
"""

from __future__ import annotations

import dataclasses
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
from pnraytracing_tpu.ops.compaction import (
    sort_live_first,
    treelet_entry_key,
    treelet_entry_key_pallas,
)
from pnraytracing_tpu.render.renderer import render_average
from pnraytracing_tpu.scene.scenes import config3_teapot_night


def log(*a):
    print(*a, flush=True)


def timed(name, fn, *args, n=8):
    out = fn(*args)
    jax.block_until_ready(out)
    s = jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32))
    float(s)  # warm the reduce
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    float(jnp.sum(jax.tree_util.tree_leaves(out)[0].astype(jnp.float32)))
    dt = (time.perf_counter() - t0) / n
    log(f"{name:34s}: {dt*1e3:8.2f} ms")


def main():
    log("devices:", jax.devices())
    scene, cam_state = config3_teapot_night(env_height=256)
    cam_state.aspect = 1.0
    camera = cam_state.basis()
    scene = jax.device_put(scene)
    o, d, _ = camera_rays(camera, 512, 512)
    r = o.shape[0]
    log("treelets:", scene.trav.treelets.shape)

    # (a) key standalone + key+sort
    f_key = jax.jit(lambda oo, dd: treelet_entry_key(
        oo, dd, scene.trav.treelets))
    timed("treelet_entry_key standalone", f_key, o, d)
    f_keyp = jax.jit(lambda oo, dd: treelet_entry_key_pallas(
        oo, dd, scene.trav.treelets))
    timed("treelet_entry_key_pallas", f_keyp, o, d)

    mask = jnp.ones((r,), bool)
    f_ks = jax.jit(lambda oo, dd: sort_live_first(
        mask, treelet_entry_key(oo, dd, scene.trav.treelets))[0])
    timed("key + sort_live_first", f_ks, o, d)

    # (b) frames
    base = RenderConfig(width=512, height=512, max_depth=4,
                        traversal="pallas")
    for label, over in [
        ("frame entry smb=4", dict()),
        ("frame entry smb=3", dict(sort_max_bounce=3)),
        ("frame entry smb=2", dict(sort_max_bounce=2)),
        ("frame entry smb=1", dict(sort_max_bounce=1)),
        ("frame pos   smb=2", dict(sort_key="pos", sort_max_bounce=2)),
        ("frame pos   smb=3", dict(sort_key="pos", sort_max_bounce=3)),
        ("frame no compact", dict(compact_rays=False)),
    ]:
        cfg = dataclasses.replace(base, **over)
        f = jax.jit(lambda fr, c=cfg: render_average(scene, camera, c,
                                                     fr, 1))
        timed(label, f, jnp.uint32(0))
    return 0


if __name__ == "__main__":
    sys.exit(main())
