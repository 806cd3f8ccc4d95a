#!/usr/bin/env python
"""Time each bounce stage standalone on the chip with realistic inputs.

The frame profile attributes ~80-150 ms to each bounce while the
traversal queries alone cost ~40-60 ms — this isolates the rest.
Fetch-bounded timing."""

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

from pnraytracing_tpu.core.camera import camera_rays
from pnraytracing_tpu.core.config import RenderConfig
from pnraytracing_tpu.scene.scenes import config3_teapot_night


def log(*a):
    print(*a, flush=True)


def timed(name, fn, *args, n=10, fetch=lambda o: o.sum()):
    out = fn(*args)
    jax.tree_util.tree_map(lambda x: x.block_until_ready(), out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    np.asarray(fetch(out))
    dt = (time.perf_counter() - t0) / n
    log(f"{name:28s}: {dt*1e3:8.2f} ms")
    return out


def main():
    log("devices:", jax.devices())
    from pnraytracing_tpu.accel.traverse_pallas import (
        any_hit_pallas,
        closest_hit_pallas,
    )
    from pnraytracing_tpu.ops.brdf import disney_eval, disney_sample
    from pnraytracing_tpu.ops.compaction import (
        coherence_key,
        sort_live_first,
    )
    from pnraytracing_tpu.core.math import build_tangent_space
    from pnraytracing_tpu.ops.envmap import envmap_lookup, sample_envmap
    from pnraytracing_tpu.ops.sampling import pick_light, pixel_seed, rand01
    from pnraytracing_tpu.render.integrator import (
        make_interaction,
        pack_interaction_rows,
    )
    from pnraytracing_tpu.render.renderer import pixel_coords

    cfg = RenderConfig(width=512, height=512, max_depth=4,
                       traversal="pallas")
    scene, cam_state = config3_teapot_night(env_height=256)
    cam_state.aspect = 1.0
    camera = cam_state.basis()
    scene = jax.device_put(scene)
    trav = scene.trav
    mesh = scene.materials, scene.mesh
    mesh = scene.mesh
    o, d, _ = camera_rays(camera, 512, 512)
    r = o.shape[0]
    px, py = pixel_coords(cfg)
    t_max = jnp.full((r,), 1e7, jnp.float32)
    kw = dict(tile_size=4096)

    f_closest = jax.jit(lambda o_, d_, t_: closest_hit_pallas(
        trav, o_, d_, t_, **kw))
    hit = timed("closest primary", f_closest, o, d, t_max,
                fetch=lambda h: h.t)

    irows = pack_interaction_rows(mesh)
    f_rows = jax.jit(pack_interaction_rows)
    timed("pack_interaction_rows", f_rows, mesh, fetch=lambda x: x[0])

    f_inter = jax.jit(lambda h: make_interaction(mesh, h, d, o, rows=irows))
    pos, nrm, uv, mat_id, tex_id = timed(
        "make_interaction", f_inter, hit, fetch=lambda t: t[0]
    )

    f_mat = jax.jit(lambda mid: scene.materials.gather(mid))
    mats = timed("materials one-hot fetch", f_mat, mat_id,
                 fetch=lambda m: m.base_color)

    seed = pixel_seed(px, py, jnp.uint32(1))

    def _light(seed_):
        s, u1 = rand01(seed_)
        li = pick_light(scene.lights.prefix_area, scene.lights.total_area,
                        u1)
        return li

    timed("pick_light", jax.jit(_light), seed, fetch=lambda t: t)

    # shadow batch: 2R rays (light + env NEE), realistic targets
    light_target = pos + nrm * 2.0 + 0.5
    sd = light_target - pos
    o2 = jnp.concatenate([pos, pos])
    d2 = jnp.concatenate([sd, nrm + 0.3])
    t2 = jnp.concatenate([jnp.ones((r,), jnp.float32),
                          jnp.full((r,), 1e7, jnp.float32)])
    m2 = jnp.concatenate([hit.valid, hit.valid])
    f_any = jax.jit(lambda oo, dd, tt, mm: any_hit_pallas(
        trav, oo, dd, tt, mm, **kw))
    timed("fused shadow any-hit (2R)", f_any, o2, d2, t2, m2,
          fetch=lambda x: x)

    if scene.env is not None:
        f_env = jax.jit(lambda s_: sample_envmap(
            scene.env, rand01(s_)[1], rand01(rand01(s_)[0])[1]))
        timed("env importance sample", f_env, seed, fetch=lambda t: t[0])
        f_look = jax.jit(lambda dd: envmap_lookup(scene.env, dd))
        timed("env radiance lookup", f_look, d, fetch=lambda x: x)

    v = -d
    tx, bx = build_tangent_space(nrm)
    f_brdf = jax.jit(lambda v_, n_, l_, t_, b_, m_: disney_eval(
        v_, n_, l_, t_, b_, m_))
    l_dir = nrm
    timed("disney eval", f_brdf, v, nrm, l_dir, tx, bx, mats,
          fetch=lambda t: t[0] if isinstance(t, tuple) else t)

    def _samp(s_):
        s2, u1 = rand01(s_)
        s2, u2 = rand01(s2)
        s2, u3 = rand01(s2)
        s2, u4 = rand01(s2)
        s2, u5 = rand01(s2)
        return disney_sample(v, nrm, tx, bx, mats, u1, u2, u3, u4, u5)

    sampled = timed("disney sample", jax.jit(_samp), seed,
                    fetch=lambda t: t[0])
    new_d = sampled[0]

    # continuation closest with realistic (incoherent) bounce dirs
    f_cont = jax.jit(lambda oo, dd, mm: closest_hit_pallas(
        trav, oo, dd, t_max, mm, **kw))
    timed("closest continuation", f_cont, pos, new_d, hit.valid,
          fetch=lambda h: h.t)

    # sorted continuation
    root = trav.nodes8[0]
    lo_b, hi_b = root[0:3], root[3:6]
    inv_ext = 1.0 / jnp.maximum(hi_b - lo_b, 1e-6)

    def _sorted_cont(oo, dd, mm):
        perm, _ = sort_live_first(mm, coherence_key(nrm, oo, lo_b, inv_ext))
        return closest_hit_pallas(
            trav, oo[perm], dd[perm], t_max, mm[perm], **kw)

    timed("sort + closest continuation", jax.jit(_sorted_cont),
          pos, new_d, hit.valid, fetch=lambda h: h.t)

    def _sort_only(oo, mm):
        perm, _ = sort_live_first(mm, coherence_key(nrm, oo, lo_b, inv_ext))
        return perm

    timed("sort_live_first alone", jax.jit(_sort_only), pos, hit.valid,
          fetch=lambda x: x)

    # radiance scatter back to pixel order
    lo = jnp.abs(new_d)
    orig = jnp.argsort(seed).astype(jnp.int32)  # a realistic permutation

    def _scatter(lo_, orig_):
        img = jnp.zeros((r, 3), jnp.float32)
        return img.at[orig_].add(lo_)

    timed("radiance scatter", jax.jit(_scatter), lo, orig,
          fetch=lambda x: x)
    return 0


if __name__ == "__main__":
    sys.exit(main())
