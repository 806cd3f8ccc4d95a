#!/usr/bin/env python
"""Stage-level TPU timing of the flagship frame (512x512 teapot_night,
4 bounces): where does the frame time actually go?

Times, on the real chip:
  * dispatch overhead (tiny op round-trip) — at ~0.1 ms/frame this bounds
    what per-call timing can resolve
  * the full forward frame, the whole-spp fused render_average, and the
    forward+backward step
  * each traversal query class in isolation (primary closest-hit, light
    shadow any-hit, env shadow any-hit, incoherent bounce closest-hit)
  * a direction-octant-sorted variant of the incoherent bounce rays —
    measures the headroom of sorting rays for tile coherence before
    wiring sorting into the integrator.

Run detached (nohup python scripts/tpu_profile.py > out/tpu_profile.log)
so no tool timeout can kill a client mid-RPC.  Every section is fenced:
one transient device error doesn't lose the rest of the run.
"""

from __future__ import annotations

import dataclasses
import os
import sys
import time
import traceback

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pnraytracing_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import numpy as np
import jax
import jax.numpy as jnp

from pnraytracing_tpu.accel.traverse_packed import any_hit_packed, closest_hit_packed
from pnraytracing_tpu.core.camera import camera_rays
from pnraytracing_tpu.core.config import RenderConfig
from pnraytracing_tpu.core.math import FLOAT_MAX
from pnraytracing_tpu.render.integrator import render_rays
from pnraytracing_tpu.render.renderer import pixel_coords, render_average
from pnraytracing_tpu.scene.scenes import config3_teapot_night


def log(*a):
    print(*a, flush=True)


def section(name):
    def deco(fn):
        def run(*args, **kw):
            try:
                return fn(*args, **kw)
            except Exception:
                log(f"[{name}] FAILED:")
                traceback.print_exc()
                sys.stdout.flush()
                return None
        return run
    return deco


def timeit(fn, *args, reps=20, warmup=2, **kw):
    for _ in range(warmup):
        out = fn(*args, **kw)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out
    )
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args, **kw)
    jax.tree_util.tree_map(
        lambda x: x.block_until_ready() if hasattr(x, "block_until_ready") else x, out
    )
    return (time.perf_counter() - t0) / reps * 1e3  # ms


def main():
    log("devices:", jax.devices())
    cfg = RenderConfig(width=512, height=512, max_depth=4)
    scene, cam = config3_teapot_night(env_height=256)
    px, py = pixel_coords(cfg)
    o, d, _ = camera_rays(cam.basis(), cfg.width, cfg.height)
    scene = jax.device_put(scene)
    r = o.shape[0]
    t_inf = jnp.full((r,), FLOAT_MAX, jnp.float32)
    kw = dict(stack_depth=cfg.stack_depth, max_leaf_size=cfg.max_leaf_size,
              compat=False, tile_size=cfg.trav_tile)
    log(f"scene: {scene.mesh.indices.shape[0]} tris, "
        f"{scene.trav.nodes8.shape[0]} nodes, {r} rays")

    @section("overhead")
    def s0():
        f = jax.jit(lambda x: x + 1.0)
        ms = timeit(f, jnp.float32(0), reps=50)
        log(f"dispatch overhead (tiny jit op): {ms:.3f} ms")
    s0()

    @section("frame")
    def s1():
        ms = timeit(render_rays, scene, o, d, px, py, jnp.uint32(1), cfg)
        log(f"full fwd frame: {ms:.3f} ms "
            f"({r * (1 + 3 * cfg.max_depth) / ms / 1e6:.2f} G rays/s @13q/px)")
    s1()

    @section("spp-fused")
    def s2():
        for spp in (4, 16):
            # checksum readback inside the timed region forces the device
            # to actually produce every frame (guards against bogus timings)
            def run(f0):
                img = render_average(scene, cam.basis(), cfg, f0, spp)
                return float(jnp.sum(img))
            for _ in range(2):
                run(jnp.uint32(0))
            t0 = time.perf_counter()
            reps = 5
            ss = [run(jnp.uint32(7 * i)) for i in range(reps)]
            ms = (time.perf_counter() - t0) / reps * 1e3
            log(f"render_average spp={spp}: {ms:.3f} ms total, "
                f"{ms/spp:.4f} ms/frame "
                f"({r * (1 + 3 * cfg.max_depth) * spp / ms / 1e6:.2f} G rays/s) "
                f"checksums {[round(s, 1) for s in ss]}")
    s2()

    @section("primary")
    def s3():
        ms = timeit(closest_hit_packed, scene.trav, o, d, t_inf, None, **kw)
        log(f"closest primary (coherent): {ms:.3f} ms")
    s3()

    # realistic secondary state: hit points of the primaries + random dirs.
    # One jitted program (eager op-by-op is an RPC per op over the axon
    # tunnel) and no bool readbacks (two prior runs faulted the device on
    # exactly that transfer).
    rng = np.random.default_rng(0)
    rnd = rng.standard_normal((r, 3)).astype(np.float32)
    d2 = jnp.asarray(rnd / np.linalg.norm(rnd, axis=-1, keepdims=True))

    @jax.jit
    def secondary_state(o, d, t_inf):
        hit = closest_hit_packed(scene.trav, o, d, t_inf, None, **kw)
        tri = jnp.maximum(hit.tri, 0)
        idx = scene.mesh.indices[tri]
        p = scene.mesh.positions[idx]
        b0 = (1.0 - hit.b1 - hit.b2)[:, None]
        pos = b0 * p[:, 0] + hit.b1[:, None] * p[:, 1] + hit.b2[:, None] * p[:, 2]
        pos = jnp.where(hit.valid[:, None], pos, 0.0)
        return pos, hit.valid, jnp.sum(hit.valid.astype(jnp.int32))

    pos, mask, n_live_dev = jax.block_until_ready(secondary_state(o, d, t_inf))
    n_live = int(np.asarray(n_live_dev))

    @section("bounce")
    def s4():
        ms = timeit(closest_hit_packed, scene.trav, pos, d2, t_inf, mask, **kw)
        log(f"closest bounce (incoherent dirs): {ms:.3f} ms  ({n_live} live)")
        ms = timeit(any_hit_packed, scene.trav, pos, d2, t_inf, mask, **kw)
        log(f"any_hit env-style (incoherent dirs): {ms:.3f} ms")
        lp = jnp.asarray([-2.5, 5.0, 0.0], jnp.float32)
        sdir = lp - pos
        ms = timeit(any_hit_packed, scene.trav, pos, sdir,
                    jnp.full((r,), 1.0 - 1e-4, jnp.float32), mask, **kw)
        log(f"any_hit light-style (coherent segment): {ms:.3f} ms")
    s4()

    @section("sorted")
    def s5():
        oct_ = (
            (rnd[:, 0] > 0).astype(np.int32) * 4
            + (rnd[:, 1] > 0).astype(np.int32) * 2
            + (rnd[:, 2] > 0).astype(np.int32)
        )
        q = np.clip((np.abs(np.asarray(d2)) * 4).astype(np.int32), 0, 3)
        keys = oct_ * 16 + q[:, 0] * 4 + q[:, 1]
        order = np.argsort(keys, kind="stable")
        pos_s, d2_s, mask_s = jax.block_until_ready(jax.device_put(
            (pos[order], d2[order], mask[order])))
        ms = timeit(closest_hit_packed, scene.trav, pos_s, d2_s, t_inf,
                    mask_s, **kw)
        log(f"closest bounce SORTED by dir octant: {ms:.3f} ms")

        def do_sort(pos, d2, mask):
            k = (
                (d2[:, 0] > 0).astype(jnp.int32) * 4
                + (d2[:, 1] > 0).astype(jnp.int32) * 2
                + (d2[:, 2] > 0).astype(jnp.int32)
            )
            o_ = jnp.argsort(k)
            return pos[o_], d2[o_], mask[o_]

        ms = timeit(jax.jit(do_sort), pos, d2, mask)
        log(f"argsort+permute cost: {ms:.3f} ms")
    s5()

    @section("tiles")
    def s6():
        for tile in (1024, 2048, 4096, 8192, None):
            kw_t = dict(kw, tile_size=tile)
            ms = timeit(closest_hit_packed, scene.trav, pos, d2, t_inf, mask,
                        **kw_t)
            log(f"bounce closest tile={tile}: {ms:.3f} ms")
        for tile in (2048, 4096, 8192):
            cfg_t = dataclasses.replace(cfg, trav_tile=tile)
            ms = timeit(render_rays, scene, o, d, px, py, jnp.uint32(1), cfg_t)
            log(f"full frame tile={tile}: {ms:.3f} ms")
    s6()

    @section("bwd")
    def s7():
        from pnraytracing_tpu.diff.grad import extract_params, loss_and_grad

        params = extract_params(scene, ("materials", "env_image"))
        target = jnp.zeros((r, 3), jnp.float32)
        ms = timeit(loss_and_grad, params, scene, o, d, px, py,
                    jnp.uint32(1), target, cfg, reps=10)
        log(f"fwd+bwd step: {ms:.3f} ms "
            f"({r * (1 + 3 * cfg.max_depth) / ms / 1e6:.2f} G rays/s)")
    s7()

    log("PROFILE DONE")


if __name__ == "__main__":
    main()
