#!/usr/bin/env python
"""Stage attribution of the flagship frame, post-V3 (component layout).

Times each bounce stage standalone on the chip with realistic inputs,
using EXACTLY the calls the integrator makes (V3 component layout,
Mosaic traversal), plus a whole-frame reference and A/B probes of the
candidate optimizations.  Fetch-bounded timing throughout.

Usage: python scripts/stage_profile.py [--frame-only] [--n 10]
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


def timed(name, fn, *args, n=10, fetch=None):
    import jax.numpy as _jnp

    def scalar_of(out):
        # the fetched value must be a SCALAR — pulling a full array
        # through the tunnel adds ~10 ms per call
        leaf = (jax.tree_util.tree_leaves(out)[0] if fetch is None
                else fetch(out))
        if getattr(leaf, "ndim", 0):
            leaf = _jnp.sum(leaf.astype(_jnp.float32))
        return leaf

    out = fn(*args)
    # warm BOTH programs (fn and the reduce) — compiling the reduce
    # inside the timed region poisoned a profile pass once already
    np.asarray(scalar_of(out))
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    # fetching the scalar bounds every timed dispatch (BASELINE.md)
    np.asarray(scalar_of(out))
    dt = (time.perf_counter() - t0) / n
    log(f"{name:34s}: {dt*1e3:8.2f} ms")
    return out


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=10)
    ap.add_argument("--frame-only", action="store_true")
    ap.add_argument("--env-height", type=int, default=256)
    args = ap.parse_args()
    n = args.n

    log("devices:", jax.devices())
    from pnraytracing_tpu.accel.traverse_pallas import (
        any_hit_pallas,
        closest_hit_pallas,
    )
    from pnraytracing_tpu.core.camera import camera_rays
    from pnraytracing_tpu.core.config import RenderConfig
    from pnraytracing_tpu.core.vec import V3, build_tangent_space_v, vdot
    from pnraytracing_tpu.ops.brdf import disney_eval_v, disney_sample_v
    from pnraytracing_tpu.ops.compaction import (
        coherence_key,
        compact_indices,
        sort_live_first,
    )
    from pnraytracing_tpu.ops.envmap import (
        envmap_lookup_v,
        sample_envmap_v,
    )
    from pnraytracing_tpu.ops.sampling import pick_light, pixel_seed, rand01
    from pnraytracing_tpu.render.integrator import (
        make_interaction,
        pack_interaction_rows,
        sample_light_point,
    )
    from pnraytracing_tpu.render.renderer import pixel_coords, render_average
    from pnraytracing_tpu.scene.scenes import config3_teapot_night

    cfg = RenderConfig(width=512, height=512, max_depth=4,
                       traversal="pallas")
    scene, cam_state = config3_teapot_night(env_height=args.env_height)
    cam_state.aspect = 1.0
    camera = cam_state.basis()
    scene = jax.device_put(scene)
    trav = scene.trav
    mesh = scene.mesh
    o, d, _ = camera_rays(camera, 512, 512)
    r = o.shape[0]
    px, py = pixel_coords(cfg)
    t_max = jnp.full((r,), 1e7, jnp.float32)
    kw = dict(tile_size=4096)

    # ---- whole frame reference -----------------------------------------
    f_frame = jax.jit(lambda fr: render_average(scene, camera, cfg, fr, 1))
    timed("FULL FRAME (1 spp)", f_frame, jnp.uint32(0), n=n,
          fetch=lambda x: x.sum())
    import dataclasses
    for label, over in [
        ("frame compact", dict(compact_rays=True)),
        ("frame compact+sort dir", dict(compact_rays=True, sort_rays=True,
                                        sort_key="dir")),
        ("frame compact+sort pos", dict(compact_rays=True, sort_rays=True,
                                        sort_key="pos")),
        ("frame no-fuse", dict(fuse_shadows=False)),
        ("frame depth=1", dict(max_depth=1)),
        ("frame depth=2", dict(max_depth=2)),
        ("frame depth=3", dict(max_depth=3)),
    ]:
        c2 = dataclasses.replace(cfg, **over)
        f2 = jax.jit(lambda fr, c2=c2: render_average(scene, camera, c2,
                                                      fr, 1))
        timed(label, f2, jnp.uint32(0), n=n, fetch=lambda x: x.sum())
    if args.frame_only:
        return 0

    # ---- stage-by-stage (component layout, integrator-identical) -------
    o_v = V3.of(o)
    d_v = V3.of(d)

    f_closest = jax.jit(lambda ov, dv, t_: closest_hit_pallas(
        trav, ov, dv, t_, **kw))
    hit = timed("closest primary", f_closest, o_v, d_v, t_max, n=n,
                fetch=lambda h: h.t)

    irows = pack_interaction_rows(mesh)
    f_inter = jax.jit(
        lambda h: make_interaction(mesh, h, d_v, o_v, rows=irows))
    pos, nrm, (u_uv, v_uv), mat_id, tex_id = timed(
        "make_interaction", f_inter, hit, n=n, fetch=lambda t: t[0].x
    )

    f_inter_nd = jax.jit(
        lambda h: make_interaction(mesh, h, d_v, None, rows=irows))
    timed("make_interaction (no rederive)", f_inter_nd, hit, n=n,
          fetch=lambda t: t[0].x)

    # raw [T,26] row gather vs a 128-padded table (layout A/B)
    tri = jnp.maximum(hit.tri, 0)
    f_g26 = jax.jit(lambda t_: irows[t_])
    timed("[T,26] row gather", f_g26, tri, n=n)
    irows128 = jnp.pad(irows, ((0, 0), (0, 128 - irows.shape[1])))
    f_g128 = jax.jit(lambda t_: irows128[t_])
    timed("[T,128] row gather", f_g128, tri, n=n)
    # component-planes variant: 26 separate [T] 1-element gathers
    planes = [irows[:, k] for k in range(26)]
    f_gpl = jax.jit(lambda t_: [p[t_] for p in planes])
    timed("26x [T] plane gathers", f_gpl, tri, n=n, fetch=lambda x: x[0])

    f_mat = jax.jit(
        lambda mid: scene.materials.sanitized().gather_components(mid))
    mat, cdlin, _ = timed("materials gather_components", f_mat, mat_id,
                          n=n, fetch=lambda m: m[0].metallic)

    f_tan = jax.jit(build_tangent_space_v)
    t_tan, b_tan = timed("build_tangent_space_v", f_tan, nrm, n=n,
                         fetch=lambda t: t[0].x)

    seed = pixel_seed(px, py, jnp.uint32(1))

    def _light(seed_):
        s, u1 = rand01(seed_)
        slot = pick_light(scene.lights.prefix_area,
                          scene.lights.total_area, u1)
        s, u2 = rand01(s)
        s, u3 = rand01(s)
        lt = scene.lights.tri_index[slot]
        lp, ln = sample_light_point(mesh, lt, u2, u3, rows=irows)
        return lp.x

    timed("light pick+sample_point", jax.jit(_light), seed, n=n)

    if scene.env is not None:
        def _env(seed_):
            s, r1 = rand01(seed_)
            s, r2 = rand01(s)
            en_l, en_li, pdf = sample_envmap_v(scene.env, r1, r2)
            return en_l.x + en_li.x + pdf

        timed("sample_envmap_v", jax.jit(_env), seed, n=n)
        f_look = jax.jit(lambda dv: envmap_lookup_v(scene.env, dv).x)
        timed("envmap_lookup_v", f_look, d_v, n=n)

    v_dir = -d_v
    f_eval = jax.jit(lambda: disney_eval_v(
        v_dir, nrm, nrm, t_tan, b_tan, mat, cdlin).x)
    timed("disney_eval_v (x1)", f_eval, n=n)

    def _samp(seed_):
        s, r1 = rand01(seed_)
        s, r2 = rand01(s)
        s, r3 = rand01(s)
        s, r4 = rand01(s)
        s, r5 = rand01(s)
        l_out, d_pdf, lobe = disney_sample_v(
            v_dir, nrm, t_tan, b_tan, mat, r1, r2, r3, r4, r5)
        return l_out.x + d_pdf

    timed("disney_sample_v", jax.jit(_samp), seed, n=n)

    # fused shadow any-hit (2R rays, light + env targets)
    def _vcat(a, b):
        return V3(jnp.concatenate([a.x, b.x]), jnp.concatenate([a.y, b.y]),
                  jnp.concatenate([a.z, b.z]))

    lp = pos + nrm * 2.0 + 0.5
    sd = lp - pos
    o2 = _vcat(pos, pos)
    d2 = _vcat(sd, nrm + 0.3)
    t2 = jnp.concatenate([jnp.ones((r,), jnp.float32), t_max])
    m2 = jnp.concatenate([hit.valid, hit.valid])
    f_any = jax.jit(lambda oo, dd, tt, mm: any_hit_pallas(
        trav, oo, dd, tt, mm, **kw))
    timed("fused shadow any-hit (2R)", f_any, o2, d2, t2, m2, n=n)

    # continuation closest with realistic (incoherent) bounce dirs
    def _cont(seed_):
        s, r1 = rand01(seed_)
        s, r2 = rand01(s)
        s, r3 = rand01(s)
        s, r4 = rand01(s)
        s, r5 = rand01(s)
        l_out, _, _ = disney_sample_v(
            v_dir, nrm, t_tan, b_tan, mat, r1, r2, r3, r4, r5)
        return l_out

    new_d = jax.jit(_cont)(seed)
    f_cont = jax.jit(lambda oo, dd, mm: closest_hit_pallas(
        trav, oo, dd, t_max, mm, **kw))
    timed("closest continuation (inc)", f_cont, pos, new_d, hit.valid,
          n=n, fetch=lambda h: h.t)

    # the integrator's REAL bounce workload: same rays, Morton-sorted
    root_ = trav.nodes8[0]
    lo_b_, hi_b_ = root_[0:3], root_[3:6]
    inv_ext_ = 1.0 / jnp.maximum(hi_b_ - lo_b_, 1e-6)
    from pnraytracing_tpu.ops.compaction import coherence_key_pos

    def _cont_sorted(mm):
        perm, _ = sort_live_first(
            mm, coherence_key_pos(nrm, pos, lo_b_, inv_ext_))
        return closest_hit_pallas(trav, pos[perm], new_d[perm], t_max,
                                  mm[perm], **kw)

    timed("closest continuation (sorted)", jax.jit(_cont_sorted),
          hit.valid, n=n, fetch=lambda h: h.t)

    # compaction permutation — the integrator's packed-carry form: 25
    # columns through ONE [R, 32]-row gather
    def _pack_carry(mm, seed_, perm):
        f32 = lambda a: a.astype(jnp.float32)
        cols = [
            f32(mm), pos.x, pos.y, pos.z, nrm.x, nrm.y, nrm.z,
            u_uv, v_uv, f32(mat_id), f32(tex_id),
            v_dir.x, v_dir.y, v_dir.z, pos.x, pos.y, pos.z,
            nrm.x, nrm.y, nrm.z,
            f32(seed_ & jnp.uint32(0xFFFF)), f32(seed_ >> jnp.uint32(16)),
            f32(mat_id), f32(px), f32(py),
        ]
        return jnp.stack(cols, axis=1)[perm]

    def _compact(mm, seed_):
        perm, _ = compact_indices(mm)
        return _pack_carry(mm, seed_, perm)

    timed("compact packed-carry permute", jax.jit(_compact), hit.valid,
          seed, n=n, fetch=lambda t: t)

    # sorted variant
    root = trav.nodes8[0]
    lo_b, hi_b = root[0:3], root[3:6]
    inv_ext = 1.0 / jnp.maximum(hi_b - lo_b, 1e-6)

    def _sorted(mm, seed_):
        perm, _ = sort_live_first(mm, coherence_key(nrm, pos, lo_b, inv_ext))
        return _pack_carry(mm, seed_, perm)

    timed("sort packed-carry permute", jax.jit(_sorted), hit.valid, seed,
          n=n, fetch=lambda t: t)

    # final radiance scatter to pixel order
    lo3 = (new_d.x, new_d.y, new_d.z)
    orig = jnp.argsort(seed).astype(jnp.int32)

    def _scatter(orig_):
        return tuple(jnp.zeros((r,), jnp.float32).at[orig_].set(c)
                     for c in lo3)

    timed("radiance unscramble x3", jax.jit(_scatter), orig, n=n,
          fetch=lambda x: x[0])
    return 0


if __name__ == "__main__":
    sys.exit(main())
