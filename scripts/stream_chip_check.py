#!/usr/bin/env python
"""On-chip validation + timing of the brick-paged streaming traversal
(config5-class scene, > SMEM).  Fetch-bounded timing.

Usage: python scripts/stream_chip_check.py [--subdiv 6] [--size 512]
       [--render] [--big]
"""

from __future__ import annotations

import argparse
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--subdiv", type=int, default=6)
    ap.add_argument("--size", type=int, default=512)
    ap.add_argument("--render", action="store_true",
                    help="also render a full frame through the integrator")
    ap.add_argument("--big", action="store_true",
                    help="also time a 2048^2 closest-hit query + frame")
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--smb", type=int, default=None,
                    help="sort_max_bounce override for the --render frame "
                    "(streaming scenes: brick re-paging dwarfs the "
                    "permute, so sorting MORE bounces can pay here)")
    args = ap.parse_args()

    log("devices:", jax.devices())
    from pnraytracing_tpu.accel.traverse_stream import (
        any_hit_stream,
        closest_hit_stream,
    )
    from pnraytracing_tpu.core.camera import camera_rays
    from pnraytracing_tpu.core.config import RenderConfig
    from pnraytracing_tpu.scene.scenes import config5_large

    t0 = time.perf_counter()
    scene, cam_state = config5_large(subdiv=args.subdiv)
    log(f"scene built in {time.perf_counter()-t0:.1f}s: "
        f"{scene.mesh.indices.shape[0]} tris")
    sd = scene.trav.stream
    if sd is None:
        log("scene FITS smem — nothing to stream; use a larger --subdiv")
        return 1
    log(f"stream: {sd.n_bricks} bricks x {sd.brick_words*4//1024} KB, "
        f"top rows {sd.n_top_rows}, brick_stack {sd.brick_stack}")
    scene = jax.device_put(scene)
    trav = scene.trav

    cam_state.aspect = 1.0
    o, d, _ = camera_rays(cam_state.basis(), args.size, args.size)
    r = o.shape[0]
    t_max = jnp.full((r,), 1e7, jnp.float32)

    f_closest = jax.jit(lambda oo, dd, tt: closest_hit_stream(
        trav, oo, dd, tt, tile_size=4096))
    log("compiling closest stream kernel...")
    t0 = time.perf_counter()
    hit = f_closest(o, d, t_max)
    valid_n = int(hit.valid.sum())
    log(f"first call (incl. compile): {time.perf_counter()-t0:.1f}s; "
        f"{valid_n}/{r} rays hit")
    if valid_n == 0:
        log("NO HITS — kernel broken on chip")
        return 1

    n = 10
    t0 = time.perf_counter()
    for _ in range(n):
        hh = f_closest(o, d, t_max)
    float(hh.t.sum())
    dt = (time.perf_counter() - t0) / n
    log(f"closest coh {args.size}^2: {dt*1e3:8.2f} ms "
        f"({r/dt/1e6:.1f} M rays/s)")

    # correctness vs the XLA packed walk on a subsample of rays
    from pnraytracing_tpu.accel.traverse_packed import closest_hit_packed

    sub = 4096
    ref = jax.jit(lambda oo, dd, tt: closest_hit_packed(
        scene.trav, oo, dd, tt, None))(o[:sub], d[:sub], t_max[:sub])
    agree = float(jnp.mean((ref.tri == hit.tri[:sub]).astype(jnp.float32)))
    t_close = float(jnp.mean(
        (jnp.abs(ref.t - hit.t[:sub]) < 1e-3).astype(jnp.float32)))
    log(f"vs packed oracle on {sub} rays: tri agree {agree:.4%}, "
        f"t close {t_close:.4%}")

    # incoherent
    rng = np.random.default_rng(0)
    perm = jnp.asarray(rng.permutation(r))
    t0 = time.perf_counter()
    for _ in range(n):
        hh = f_closest(o[perm], d[perm], t_max)
    float(hh.t.sum())
    dt = (time.perf_counter() - t0) / n
    log(f"closest inc {args.size}^2: {dt*1e3:8.2f} ms")

    if args.render:
        from pnraytracing_tpu.render.renderer import render_average

        cfg = RenderConfig(width=args.size, height=args.size,
                           max_depth=args.depth, traversal="pallas",
                           loop="scan",
                           **({} if args.smb is None
                              else {"sort_max_bounce": args.smb}))
        camera = cam_state.basis()
        f_frame = jax.jit(lambda fr: render_average(scene, camera, cfg,
                                                    fr, 1))
        log("compiling full config5 frame...")
        t0 = time.perf_counter()
        img = f_frame(jnp.uint32(0))
        s = float(img.sum())
        log(f"first frame (incl. compile): {time.perf_counter()-t0:.1f}s, "
            f"sum {s:.1f}")
        t0 = time.perf_counter()
        for _ in range(4):
            img = f_frame(jnp.uint32(1))
        float(img.sum())
        dt = (time.perf_counter() - t0) / 4
        rays = cfg.num_pixels * (1 + 3 * cfg.max_depth)
        log(f"config5 frame {args.size}^2 depth {args.depth}: "
            f"{dt*1e3:8.1f} ms ({rays/dt/1e6:.2f} M rays/s)")
        from pnraytracing_tpu.utils.image import save_png

        os.makedirs("out", exist_ok=True)
        save_png(f"out/config5_{args.size}.png",
                 np.asarray(img).reshape(args.size, args.size, 3))
        log(f"saved out/config5_{args.size}.png")

    if args.big:
        big = 2048
        ob, db, _ = camera_rays(cam_state.basis(), big, big)
        rb = ob.shape[0]
        tb = jnp.full((rb,), 1e7, jnp.float32)
        t0 = time.perf_counter()
        hb = f_closest(ob, db, tb)
        log(f"2048^2 first call: {time.perf_counter()-t0:.1f}s, "
            f"{int(hb.valid.sum())}/{rb} hit")
        t0 = time.perf_counter()
        for _ in range(4):
            hb = f_closest(ob, db, tb)
        float(hb.t.sum())
        dt = (time.perf_counter() - t0) / 4
        log(f"closest coh 2048^2: {dt*1e3:8.2f} ms "
            f"({rb/dt/1e6:.1f} M rays/s)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
