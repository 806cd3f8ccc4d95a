"""The wavefront path integrator.

Rebuilds the GLSL megakernel's estimator (``PathTracing`` + ``main``,
ray_tracing.comp:861-992) as a batched pure function: *all* rays advance one
bounce per step of a Python-static loop, every stage (material fetch, NEE
light sample, NEE env sample, BRDF sample, traversal) is a masked vectorized
op over the whole ray batch.  Terminated rays are masked out of traversal
(their stacks start empty) and their contributions are zeroed.

Estimator structure per bounce (comp:865-970):
  1. NEE area light: prefix-area light pick, uniform point on the triangle,
     shadow segment test; LDirect = f * Li * |N.L| / p_light.
  2. NEE environment: CDF-inverted env sample, occlusion test;
     LEnvironment = f * Li * (N.L) / p_env.
  3. BRDF sample (Sobol + Cranley-Patterson for the lobe uniforms).
  4. One-sample-style combine (comp:937-938):
       Lo += c * (LEnvironment*p_env + LDirect*p_light) / (p_env + p_light
             + p_brdf)
     — the reference's balance-heuristic variant, reproduced as-is; note the
     BRDF-sampled env/emissive contributions (comp:960, 966) are *not*
     weighted against the NEE pdfs (also reproduced).
  5. Continue ray: miss adds env radiance (comp:956-963), hit adds emissive
     (comp:966), throughput *= f * |N.L| / p_brdf.

RNG: per-pixel wang-hash streams seeded exactly like the reference
(comp:977-979), with the stream position threaded explicitly (including the
lobe-conditional draws of SampleCosineHemisphere, so compat mode consumes
the stream in the reference's order).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from pnraytracing_tpu.accel.traverse import any_hit, closest_hit
from pnraytracing_tpu.accel.traverse_packed import (
    any_hit_packed,
    any_hit_pop,
    closest_hit_packed,
    closest_hit_pop,
)
from pnraytracing_tpu.accel.traverse_packet import (
    any_hit_packet,
    closest_hit_packet,
)
from pnraytracing_tpu.accel.traverse_wide import any_hit_wide, closest_hit_wide
from pnraytracing_tpu.core.config import RenderConfig
from pnraytracing_tpu.core.math import FLOAT_MAX, SHADOW_EPS
from pnraytracing_tpu.core.types import Scene, TriangleMesh
from pnraytracing_tpu.core.vec import (
    V3,
    build_tangent_space_v,
    select_small,
    vdot,
    vcross,
    vnormalize,
    vwhere,
)
from pnraytracing_tpu.ops.brdf import (
    apply_compat_material_decode,
    disney_eval_v,
    disney_pdf_v,
    disney_sample_v,
)
from pnraytracing_tpu.ops.envmap import (
    envmap_lookup_v,
    envmap_pdf_v,
    sample_envmap_v,
)
from pnraytracing_tpu.ops.intersect import Hit, intersect_triangle_c
from pnraytracing_tpu.ops.sampling import (
    SOBOL_DIMS,
    cranley_patterson_rotation_c,
    pick_light,
    pixel_seed,
    rand01,
    sample_uniform_triangle,
    sobol_vec2,
    wang_hash,
)
from pnraytracing_tpu.ops.compaction import (
    coherence_key,
    coherence_key_pos,
    compact_indices,
    sort_live_first,
    treelet_entry_key,
    treelet_entry_key_pallas,
)
from pnraytracing_tpu.ops.texture import fetch_base_color

_EPS = 1e-10


@struct.dataclass
class TraceRecords:
    """Every traversal result of one frame, captured in ORIGINAL ray order.

    The traversal queries (``lax.while_loop`` BVH walks) are the expensive,
    non-differentiable part of a frame; everything else is pure shading math.
    Recording their outputs lets a replay pass reproduce the frame
    exactly (up to XLA fusion rounding) with ZERO traversals — so a gradient step can trace once
    (forward only) and differentiate the cheap shading-only replay, instead
    of rematerializing the full traversal inside the backward pass.

    Validity: a replay is only exact for the same scene parameters the trace
    ran with (path-replay — the discrete quantities recorded here are
    piecewise-constant in the parameters, exactly the set ``stop_gradient``
    already detaches in the live integrator, so gradients are unchanged).

    Shapes: ``primary`` is a [R] Hit; the per-bounce arrays are stacked
    [max_depth, R]; ``light_occ``/``env_occ`` are None when the scene has no
    area lights / no environment map.
    """

    primary: Hit
    light_occ: jnp.ndarray | None
    env_occ: jnp.ndarray | None
    bounce: Hit


def _stop_gradient_trace(fn, *args, **kw):
    """Run a traversal with all inputs detached.  ``lax.while_loop`` is not
    reverse-mode differentiable; hit ids/barycentrics are re-derived
    differentiably afterwards (path-replay), so the traversal itself must be
    gradient-free."""
    return fn(*jax.lax.stop_gradient(args), **kw)


def pack_interaction_rows(mesh: TriangleMesh) -> jnp.ndarray:
    """[T, 26] per-triangle interaction table: corner positions (9),
    corner normals (9), corner uvs (6), material_id, texture_id.

    One row-gather then replaces the ~10 separate dynamic gathers a
    shading-point fill would issue (indices + 3x positions/normals/uvs +
    ids) — the same bytes, one gather pass.  Built in-graph from the mesh
    so gradients to positions/normals/uvs flow through it unchanged; ids
    are small ints, exact in f32."""
    t = mesh.indices.shape[0]
    p = mesh.positions[mesh.indices].reshape(t, 9)
    n = mesh.normals[mesh.indices].reshape(t, 9)
    uv = mesh.uvs[mesh.indices].reshape(t, 6)
    ids = jnp.stack(
        [mesh.material_id.astype(jnp.float32),
         mesh.texture_id.astype(jnp.float32)], axis=1
    )
    return jnp.concatenate([p, n, uv, ids], axis=1)


def make_interaction(
    mesh: TriangleMesh,
    hit: Hit,
    ray_d: "V3",
    ray_o: "V3 | None" = None,
    rows: jnp.ndarray | None = None,
):
    """Differentiable surface attributes from (tri, barycentrics) — the
    analogue of the Interaction fill in TriangleIntersect
    (ray_tracing.comp:327-355), recomputed outside traversal so gradients
    flow to vertex data (path-replay style).

    When ``ray_o`` is given, the barycentrics are *re-derived* by
    intersecting the hit triangle differentiably (the traversal's values are
    detached constants); forward values are bit-identical, but gradients
    w.r.t. ``mesh.positions`` and the ray become exact.

    ``rows`` (from :func:`pack_interaction_rows`) collapses the per-ray
    fetch into one row-gather.  Component layout throughout (core/vec.py):
    returns (pos V3, nrm V3, (u, v), mat_id, tex_id).
    """
    tri = jnp.maximum(hit.tri, 0)
    if rows is not None:
        rr = rows[tri]  # [R, 26] — single gather
        col = lambda k: rr[:, k]
    else:
        idx = mesh.indices[tri]  # [R, 3]
        p9 = mesh.positions[idx].reshape(-1, 9)
        n9 = mesh.normals[idx].reshape(-1, 9)
        uv6 = mesh.uvs[idx].reshape(-1, 6)

        def col(k):
            if k < 9:
                return p9[:, k]
            if k < 18:
                return n9[:, k - 9]
            if k < 24:
                return uv6[:, k - 18]
            if k == 24:
                return mesh.material_id[tri].astype(jnp.float32)
            return mesh.texture_id[tri].astype(jnp.float32)

    p0 = V3(col(0), col(1), col(2))
    p1 = V3(col(3), col(4), col(5))
    p2 = V3(col(6), col(7), col(8))
    n0 = V3(col(9), col(10), col(11))
    n1 = V3(col(12), col(13), col(14))
    n2 = V3(col(15), col(16), col(17))
    mat_id = col(24).astype(jnp.int32)
    tex_id = col(25).astype(jnp.int32)

    if ray_o is not None:
        ok, _, rb1, rb2 = intersect_triangle_c(
            (p0.x, p0.y, p0.z), (p1.x, p1.y, p1.z), (p2.x, p2.y, p2.z),
            ray_o.x, ray_o.y, ray_o.z, ray_d.x, ray_d.y, ray_d.z,
            jnp.full(tri.shape, FLOAT_MAX, jnp.float32),
        )
        b1 = jnp.where(ok, rb1, hit.b1)
        b2 = jnp.where(ok, rb2, hit.b2)
        b0 = 1.0 - b1 - b2
    else:
        b0 = hit.b0
        b1 = hit.b1
        b2 = hit.b2
    pos = p0 * b0 + p1 * b1 + p2 * b2
    geom_n = vnormalize(vcross(p1 - p0, p2 - p0))
    zero3 = lambda a: (a.x == 0) & (a.y == 0) & (a.z == 0)
    any_zero = zero3(n0) | zero3(n1) | zero3(n2)
    n_interp = n0 * b0 + n1 * b1 + n2 * b2
    nrm = vwhere(any_zero, geom_n, n_interp)
    # backface flip toward the incoming ray (comp:345-348)
    nrm = vwhere(vdot(nrm, ray_d) > 0, -nrm, nrm)
    nrm = vnormalize(nrm)
    u_hit = col(18) * b0 + col(20) * b1 + col(22) * b2
    v_hit = col(19) * b0 + col(21) * b1 + col(23) * b2
    return pos, nrm, (u_hit, v_hit), mat_id, tex_id


def sample_light_point(mesh: TriangleMesh, tri: jnp.ndarray, u1, u2,
                       rows: jnp.ndarray | None = None):
    """Uniform point + normal on light triangles (TriangleSample,
    comp:604-624), component layout.  ``rows`` (pack_interaction_rows)
    turns the corner fetch into one row-gather.  Returns (pos V3, nrm
    V3)."""
    b0, b1 = sample_uniform_triangle(u1, u2)
    if rows is not None:
        rr = rows[tri]  # [R, 26]
        col = lambda k: rr[:, k]
    else:
        idx = mesh.indices[tri]
        p9 = mesh.positions[idx].reshape(-1, 9)
        n9 = mesh.normals[idx].reshape(-1, 9)
        col = lambda k: p9[:, k] if k < 9 else n9[:, k - 9]
    p0 = V3(col(0), col(1), col(2))
    p1 = V3(col(3), col(4), col(5))
    p2 = V3(col(6), col(7), col(8))
    n0 = V3(col(9), col(10), col(11))
    n1 = V3(col(12), col(13), col(14))
    n2 = V3(col(15), col(16), col(17))
    b2 = 1.0 - b0 - b1
    pos = p0 * b0 + p1 * b1 + p2 * b2
    geom_n = vnormalize(vcross(p1 - p0, p2 - p0))
    zero3 = lambda a: (a.x == 0) & (a.y == 0) & (a.z == 0)
    any_zero = zero3(n0) | zero3(n1) | zero3(n2)
    n_interp = n0 * b0 + n1 * b1 + n2 * b2
    nrm = vnormalize(vwhere(any_zero, geom_n, n_interp))
    return pos, nrm


def _emissive_of(materials, mat_id: jnp.ndarray) -> "V3":
    """Emissive V3 for per-ray material ids — compare-select chain for
    small palettes (zero gathers), row gather otherwise."""
    m = materials.emissive.shape[0]
    if m <= 32:
        e = materials.emissive
        return V3(
            select_small(e[:, 0], mat_id),
            select_small(e[:, 1], mat_id),
            select_small(e[:, 2], mat_id),
        )
    return V3.of(materials.emissive[mat_id])


def _safe_inv(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.where(jnp.abs(x) > _EPS, 1.0 / jnp.where(x == 0, 1.0, x), 0.0)


def _render_rays(
    scene: Scene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    frame: jnp.ndarray,
    cfg: RenderConfig,
    records: TraceRecords | None,
    record: bool,
):
    """Trace one sample for a batch of primary rays.

    o, d: [R, 3] primary rays; px, py: [R] pixel coordinates in the
    reference's GL convention (x = column, y = row counted from the bottom)
    — used for the RNG stream seed (comp:977-979) and Cranley-Patterson
    rotation; frame: scalar frame counter.  Returns ([R, 3] radiance,
    TraceRecords | None).

    ``records`` switches the pass into replay mode: every traversal is
    replaced by its recorded result (compaction is skipped — records are in
    original ray order), making the pass while-loop-free and cheap to
    differentiate.  ``record=True`` captures the records during a live pass.
    """
    replay = records is not None
    if scene.bvh_depth is not None and cfg.stack_depth < scene.bvh_depth:
        raise ValueError(
            f"RenderConfig.stack_depth={cfg.stack_depth} is too shallow for "
            f"this scene's BVH (depth {scene.bvh_depth}); the traversal "
            "stack would silently drop nodes.  Raise stack_depth to at "
            f"least {scene.bvh_depth}."
        )
    compat = cfg.compat_pnrt
    has_env = scene.env is not None
    has_lights = scene.lights.count > 0
    has_tex = scene.textures is not None
    trace_kw = dict(
        stack_depth=cfg.stack_depth,
        max_leaf_size=cfg.max_leaf_size,
        compat=compat,
        chunk=cfg.trav_chunk,
    )
    mesh, materials, bvh, lights = (
        scene.mesh,
        scene.materials,
        scene.bvh,
        scene.lights,
    )
    env_const = (
        scene.env_constant
        if scene.env_constant is not None
        else jnp.zeros(3, jnp.float32)
    )

    r = o.shape[0]
    seed = pixel_seed(px, py, frame)
    t_max0 = jnp.full((r,), FLOAT_MAX, jnp.float32)

    # Traversal dispatch: the packed layout (one row-gather per node visit /
    # triangle test) when the scene carries it, generic otherwise.
    component_native = False  # backend consumes V3 components directly
    kattr_ok = False  # closest-hit kernel can emit the interaction fill
    if scene.trav is not None:
        packed_kw = dict(trace_kw, tile_size=cfg.trav_tile)
        use_wide = cfg.traversal == "wide" and scene.trav.nodes16 is not None
        if use_wide:
            _closest_fn, _occluded_fn = closest_hit_wide, any_hit_wide
        elif cfg.traversal == "pop":
            _closest_fn, _occluded_fn = closest_hit_pop, any_hit_pop
        elif cfg.traversal == "packet":
            _closest_fn, _occluded_fn = closest_hit_packet, any_hit_packet
        elif cfg.traversal == "pallas":
            from pnraytracing_tpu.accel.traverse_pallas import (
                any_hit_pallas,
                closest_hit_pallas,
                scene_fits_smem,
            )

            if scene_fits_smem(scene.trav, "binary"):
                # Mosaic compiles on TPU only; elsewhere (CPU test meshes)
                # the same kernel runs under the Pallas interpreter.
                packed_kw["interpret"] = jax.default_backend() != "tpu"
                _closest_fn, _occluded_fn = closest_hit_pallas, any_hit_pallas
                component_native = True
                kattr_ok = (
                    cfg.kernel_interaction
                    and not replay
                    and scene.trav.tri_attr16 is not None
                    and scene_fits_smem(scene.trav, "wide_attr")
                )
            elif scene.trav.stream is not None:
                # scene exceeds SMEM: brick-paged streaming Mosaic kernel
                from pnraytracing_tpu.accel.traverse_stream import (
                    any_hit_stream,
                    closest_hit_stream,
                )

                packed_kw["interpret"] = jax.default_backend() != "tpu"
                _closest_fn, _occluded_fn = (closest_hit_stream,
                                             any_hit_stream)
                component_native = True
            else:
                # no streaming layout (e.g. in-graph refit): XLA packet
                # walk instead of raising (pick_variant's contract)
                _closest_fn, _occluded_fn = closest_hit_packet, any_hit_packet
        elif cfg.traversal == "wide4" and scene.trav.w4 is not None:
            _closest_fn = _occluded_fn = None
        else:
            _closest_fn, _occluded_fn = closest_hit_packed, any_hit_packed

        if cfg.traversal == "wide4" and scene.trav.w4 is not None:
            from pnraytracing_tpu.accel.traverse_wide4 import (
                any_hit_wide4,
                closest_hit_wide4,
            )

            w4 = scene.trav.w4
            w4_kw = dict(
                stack_depth=max(16, (w4.width - 1) * w4.depth4 + 4),
                max_leaf_size=cfg.max_leaf_size,
                compat=compat,
                leaf_buffer=cfg.trav_leaf_buffer,
                chunk=cfg.trav_chunk,
            )

            def _closest(o_, d_, tm_, mask_=None):
                def fb(o2, d2, t2, m2):
                    return closest_hit_pop(
                        scene.trav, o2, d2, t2, m2, **packed_kw
                    )

                def run(w4_, o2, d2, t2, m2):
                    hit, _ = closest_hit_wide4(
                        w4_, o2, d2, t2, m2, fallback=fb, **w4_kw
                    )
                    return hit

                return _stop_gradient_trace(run, w4, o_, d_, tm_, mask_)

            def _occluded(o_, d_, tm_, mask_=None):
                def fb(o2, d2, t2, m2):
                    return any_hit_pop(
                        scene.trav, o2, d2, t2, m2, **packed_kw
                    )

                def run(w4_, o2, d2, t2, m2):
                    occ, _ = any_hit_wide4(
                        w4_, o2, d2, t2, m2, fallback=fb, **w4_kw
                    )
                    return occ

                return _stop_gradient_trace(run, w4, o_, d_, tm_, mask_)

        else:
            def _closest(o_, d_, tm_, mask_=None):
                return _stop_gradient_trace(
                    _closest_fn, scene.trav, o_, d_, tm_, mask_, **packed_kw
                )

            def _occluded(o_, d_, tm_, mask_=None):
                return _stop_gradient_trace(
                    _occluded_fn, scene.trav, o_, d_, tm_, mask_, **packed_kw
                )
    else:
        def _closest(o_, d_, tm_, mask_=None):
            return _stop_gradient_trace(
                closest_hit, bvh, mesh, o_, d_, tm_, mask_, **trace_kw
            )

        def _occluded(o_, d_, tm_, mask_=None):
            return _stop_gradient_trace(
                any_hit, bvh, mesh, o_, d_, tm_, mask_, **trace_kw
            )

    # The shading path works in the component layout (core/vec.py) —
    # materialized [R, 3] arrays lane-pad to [R, 128] on TPU (BASELINE.md
    # round 3).  The Mosaic traversal consumes components natively; the
    # XLA backends take [R, 3] rows at their boundary.
    if component_native:
        _closest_v, _occluded_v = _closest, _occluded
    else:
        def _closest_v(o_, d_, tm_, mask_=None):
            return _closest(o_.rows(), d_.rows(), tm_, mask_)

        def _occluded_v(o_, d_, tm_, mask_=None):
            return _occluded(o_.rows(), d_.rows(), tm_, mask_)

    def _vcat(a: V3, b: V3) -> V3:
        return V3(
            jnp.concatenate([a.x, b.x]),
            jnp.concatenate([a.y, b.y]),
            jnp.concatenate([a.z, b.z]),
        )

    irows = pack_interaction_rows(mesh)
    o_v = V3.of(o)
    d_v = V3.of(d)

    def _closest_inter(o_, d_, tm_, mask_=None):
        """Closest hit + interaction fill in one step.

        With the attribute-emitting Mosaic kernel (kattr_ok), the fill
        arrives from the kernel itself — triangle attributes are SMEM
        scalars at test time, so the per-ray [T, 26] row gather and its
        interpolation disappear; only the backface flip, normalize and
        hit-position reconstruction remain here.  Otherwise: the plain
        closest kernel + make_interaction (the replay path always takes
        that branch — it re-derives attributes differentiably)."""
        if kattr_ok:
            from pnraytracing_tpu.accel.layout import ATTR_TEX_BASE
            from pnraytracing_tpu.accel.traverse_pallas import (
                closest_hit_pallas_attr,
            )

            kw2 = {k: v for k, v in packed_kw.items() if k != "variant"}
            hit_, attrs = _stop_gradient_trace(
                closest_hit_pallas_attr, scene.trav, o_, d_, tm_, mask_,
                **kw2,
            )
            nx, ny, nz, u_, v_, mt = attrs
            nrm_raw = V3(nx, ny, nz)
            nrm_ = vnormalize(
                vwhere(vdot(nrm_raw, d_) > 0, -nrm_raw, nrm_raw)
            )
            pos_ = o_ + d_ * hit_.t
            return (hit_, pos_, nrm_, (u_, v_), mt // ATTR_TEX_BASE,
                    mt % ATTR_TEX_BASE - 1)
        hit_ = _closest_v(o_, d_, tm_, mask_)
        return (hit_,) + make_interaction(mesh, hit_, d_, o_, rows=irows)

    # ---- primary hit (comp:983) -----------------------------------------
    if replay:
        hit = records.primary
        p_pos, p_nrm, p_uv, p_mat, p_tex = make_interaction(
            mesh, hit, d_v, o_v, rows=irows)
    else:
        hit, p_pos, p_nrm, p_uv, p_mat, p_tex = _closest_inter(
            o_v, d_v, t_max0)
    primary_hit = hit.valid
    rec_primary = hit  # original order: no compaction has happened yet

    def env_radiance(dirs: V3) -> V3:
        if has_env:
            return envmap_lookup_v(scene.env, dirs)
        ones = jnp.ones_like(dirs.x)
        ec = env_const * cfg.env_scale
        return V3(ec[0] * ones, ec[1] * ones, ec[2] * ones)

    miss_color = env_radiance(d_v)

    # ---- path loop (comp:861-972) ---------------------------------------
    # One bounce is a pure function of the carried path state.  It is
    # either unrolled (``cfg.loop == "unroll"``: XLA sees max_depth copies,
    # best steady-state codegen) or driven by ``lax.scan``
    # (``cfg.loop == "scan"``: the body compiles ONCE, so program size and
    # compile time are O(1) in depth — required for deep-bounce configs).
    arange_r = jnp.arange(r, dtype=jnp.int32)

    def bounce_body(carry, bounce, brec, allow_sort=True):
        (seed, active, pos, nrm, u_uv, v_uv, mat_id, tex_id, v_dir, c, lo,
         orig, px_l, py_l, path_t) = carry
        static_bounce = isinstance(bounce, int)

        mat_tbl = materials.sanitized()  # clamp per-material ([M] tables)
        if compat:
            mat_tbl = apply_compat_material_decode(mat_tbl)
        mat, cdlin, _mat_emis = mat_tbl.gather_components(mat_id)
        if has_tex:
            uv2 = jnp.stack([u_uv, v_uv], axis=-1)
            if (cfg.texture_lod_scale is not None
                    and scene.textures.mips is not None):
                # ray-cone LOD: footprint ~ path distance x pixel angle
                from pnraytracing_tpu.ops.texture import (
                    fetch_base_color_trilinear,
                )

                whs = scene.textures.sizes[
                    jnp.maximum(tex_id, 0)
                ].astype(jnp.float32)
                texdim = jnp.maximum(whs[:, 0], whs[:, 1])
                lod = jnp.log2(jnp.maximum(
                    path_t * cfg.texture_lod_scale * texdim, 1.0
                ))
                cdlin = V3.of(fetch_base_color_trilinear(
                    scene.textures, tex_id, uv2, cdlin.rows(), lod
                ))
            else:
                cdlin = V3.of(fetch_base_color(
                    scene.textures, tex_id, uv2, cdlin.rows()
                ))
        t_tan, b_tan = build_tangent_space_v(nrm)

        zero_r = jnp.zeros((r,), jnp.float32)
        zero_v = V3(zero_r, zero_r, zero_r)

        # The bounce body runs in three phases (round 5):
        #   1. DRAWS + WEIGHTS: every RNG draw and every pdf/BRDF weight
        #      of the bounce, in the reference's stream order — pure math,
        #      no traversal;
        #   2. SORT: one live-first coherence permutation of the whole
        #      path state (the continuation segment is known by now, so
        #      the 'entry' key can use the ACTUAL ray);
        #   3. QUERIES + CONTRIBUTIONS: the NEE any-hits and the
        #      continuation closest-hit, ALL on the freshly compacted,
        #      coherence-sorted order.
        # Phase order changes nothing semantically (queries consume no
        # RNG; contributions only need the occlusion masks late), but it
        # lets every traversal of the bounce run fresh — the earlier
        # end-of-bounce sort left the NEE queries of the NEXT bounce
        # running with the previous deaths interleaved.

        # --- phase 1a: NEE area-light draws (comp:878-909) -----------------
        seed, u_light = rand01(seed)
        l_direct = zero_v
        light_pdf = zero_r
        if has_lights:
            slot = pick_light(lights.prefix_area, lights.total_area, u_light)
            light_tri = lights.tri_index[slot]
            seed, u1 = rand01(seed)
            seed, u2 = rand01(seed)
            lp, ln = sample_light_point(mesh, light_tri, u1, u2,
                                        rows=irows)
            sdir = lp - pos  # unnormalized segment (comp:887)
            s_tmax = jnp.full((r,), 1.0 - SHADOW_EPS, jnp.float32)
            dis2 = vdot(sdir, sdir)
            lnorm = vnormalize(sdir)
            cos_l = jnp.abs(vdot(ln, -lnorm))
            raw_pdf = dis2 / jnp.maximum(cos_l * lights.total_area, 1e-12)
            # material id per LIGHT SLOT: an L-way select per ray when the
            # light list is small (zero gathers), one [R] gather otherwise
            lmat_tbl = irows[lights.tri_index, 24].astype(jnp.int32)
            lmat = (select_small(lmat_tbl, slot) if lights.count <= 32
                    else lmat_tbl[slot])
            li = _emissive_of(materials, lmat)
            light_f = disney_eval_v(v_dir, nrm, lnorm, t_tan, b_tan, mat,
                                    cdlin)
            nl = jnp.abs(vdot(nrm, lnorm))
            # contribution folded up to the occlusion mask (applied
            # post-query)
            l_direct_pre = light_f * li * (nl * _safe_inv(raw_pdf))

        # --- phase 1b: NEE environment draws (comp:911-926) ----------------
        l_env = zero_v
        env_pdf = zero_r
        if has_env:
            seed, r1e = rand01(seed)
            seed, r2e = rand01(seed)
            en_l, en_li, env_pdf_raw = sample_envmap_v(
                scene.env, r1e, r2e, compat=compat
            )
            env_f = disney_eval_v(v_dir, nrm, en_l, t_tan, b_tan, mat, cdlin)
            l_env_pre = env_f * en_li * (
                vdot(en_l, nrm) * _safe_inv(env_pdf_raw))

        # --- phase 1c: BRDF sample (comp:928-934) --------------------------
        if cfg.sampler == "sobol":
            su, sv = sobol_vec2(frame + 1, bounce)
            # salt decorrelates the 8-dim Sobol table's wrap at depth > 4
            # (zero for bounces 0-3 — reference-exact); see
            # cranley_patterson_rotation_c
            r1, r2 = cranley_patterson_rotation_c(
                su, sv, px_l, py_l, cfg.width, cfg.height,
                salt=(2 * bounce) // SOBOL_DIMS,
            )
        else:
            seed, r1 = rand01(seed)
            seed, r2 = rand01(seed)
        seed, r_lobe = rand01(seed)
        # diffuse-lobe hemisphere draws: consumed from the stream only when
        # the diffuse lobe is taken (SampleCosineHemisphere, comp:643)
        s1 = wang_hash(seed)
        u_d1 = s1.astype(jnp.float32) * jnp.float32(1.0 / 4294967296.0)
        s2 = wang_hash(s1)
        u_d2 = s2.astype(jnp.float32) * jnp.float32(1.0 / 4294967296.0)
        l_out, d_pdf, lobe = disney_sample_v(
            v_dir, nrm, t_tan, b_tan, mat, r_lobe, r1, r2, u_d1, u_d2, compat=compat
        )
        seed = jnp.where(lobe == 0, s2, seed)

        d_f = disney_eval_v(v_dir, nrm, l_out, t_tan, b_tan, mat, cdlin)
        n_dot_l = jnp.abs(vdot(nrm, l_out))
        weight = d_f * (n_dot_l * _safe_inv(d_pdf))
        if cfg.mis == "balanced":
            if has_lights:
                p_b_light = jnp.maximum(
                    disney_pdf_v(v_dir, nrm, lnorm, mat), 0.0
                )
            if has_env:
                p_b_env = jnp.maximum(disney_pdf_v(v_dir, nrm, en_l, mat), 0.0)

        # --- phase 2: coherence sort ---------------------------------------
        # The whole path state (carry + the bounce's pre-folded weights)
        # moves through ONE packed row gather; radiance is unscrambled at
        # the end via ``orig``.  Pure permutation — value-exact; only
        # whole-program FMA contraction differs between on/off variants.
        # The permute's own cost is real (~10-14 ms/bounce at 512^2 —
        # gather-wall bound, scripts/pack_width2.py), so (a) the pack is
        # kept as narrow as possible (v_dir is NOT packed — the roll
        # rewrites it as -l_out; texture columns only when the scene has
        # textures), and (b) ``sort_max_bounce`` bounds how many bounces
        # pay it: after a good sort, deaths cluster by tile, so later
        # bounces keep most of the coherence for free (static gating —
        # applies in the unrolled loop; scan mode sorts every bounce).
        do_sort = cfg.compact_rays and not replay and allow_sort
        if do_sort and static_bounce:
            do_sort = bounce < cfg.sort_max_bounce
        if do_sort:
            if cfg.sort_rays and scene.trav is not None:
                if (cfg.sort_key == "entry"
                        and scene.trav.treelets is not None):
                    # Mosaic key kernel on TPU; XLA broadcast elsewhere
                    # (the interpreter would crawl through K iterations)
                    key_f = (treelet_entry_key_pallas
                             if jax.default_backend() == "tpu"
                             else treelet_entry_key)
                    key = key_f(pos + nrm * 1e-4, l_out,
                                scene.trav.treelets)
                else:
                    root = scene.trav.nodes8[0]
                    lo_b, hi_b = root[0:3], root[3:6]
                    inv_ext = 1.0 / jnp.maximum(hi_b - lo_b, 1e-6)
                    key_fn = (coherence_key_pos if cfg.sort_key != "dir"
                              else coherence_key)
                    key = key_fn(nrm, pos, lo_b, inv_ext)
                perm, _ = sort_live_first(active, key)
            else:
                perm, _ = compact_indices(active)
            f32 = lambda a: a.astype(jnp.float32)
            cols = []
            idx = {}

            def _app(name, *arrs):
                idx[name] = len(cols)
                cols.extend(arrs)

            _app("active", f32(active))
            _app("pos", pos.x, pos.y, pos.z)
            _app("nrm", nrm.x, nrm.y, nrm.z)
            _app("mat", f32(mat_id))
            if has_tex:
                _app("uvtex", u_uv, v_uv, f32(tex_id))
                if cfg.texture_lod_scale is not None:
                    _app("path_t", path_t)
            _app("c", c.x, c.y, c.z)
            _app("lo", lo.x, lo.y, lo.z)
            _app("seed", f32(seed & jnp.uint32(0xFFFF)),
                 f32(seed >> jnp.uint32(16)))
            _app("ids", f32(orig), f32(px_l), f32(py_l))
            _app("l_out", l_out.x, l_out.y, l_out.z)
            _app("weight", weight.x, weight.y, weight.z)
            _app("d_pdf", d_pdf)
            if has_lights:
                _app("sdir", sdir.x, sdir.y, sdir.z)
                _app("raw_pdf", raw_pdf)
                _app("l_direct_pre",
                     l_direct_pre.x, l_direct_pre.y, l_direct_pre.z)
            if has_env:
                _app("en_l", en_l.x, en_l.y, en_l.z)
                _app("env_pdf_raw", env_pdf_raw)
                _app("l_env_pre", l_env_pre.x, l_env_pre.y, l_env_pre.z)
            if cfg.mis == "balanced":
                if has_lights:
                    _app("p_b_light", p_b_light)
                if has_env:
                    _app("p_b_env", p_b_env)
            packed = jnp.stack(cols, axis=1)[perm]  # ONE row gather
            col = lambda name, o=0: packed[:, idx[name] + o]
            v3c = lambda name: V3(col(name), col(name, 1), col(name, 2))
            active = col("active") > 0.5
            pos = v3c("pos")
            nrm = v3c("nrm")
            mat_id = col("mat").astype(jnp.int32)
            if has_tex:
                u_uv, v_uv = col("uvtex"), col("uvtex", 1)
                tex_id = col("uvtex", 2).astype(jnp.int32)
                path_t = (col("path_t")
                          if cfg.texture_lod_scale is not None else zero_r)
            else:
                # not packed: reset to order-independent constants so the
                # carry stays lane-consistent (values are never read)
                u_uv = v_uv = path_t = zero_r
                tex_id = jnp.zeros((r,), jnp.int32)
            c = v3c("c")
            lo = v3c("lo")
            seed = (
                col("seed").astype(jnp.uint32)
                | (col("seed", 1).astype(jnp.uint32) << jnp.uint32(16))
            )
            orig = col("ids").astype(jnp.int32)
            # pixel coords are u32 < 2^24 (exact in f32)
            px_l = col("ids", 1).astype(jnp.uint32)
            py_l = col("ids", 2).astype(jnp.uint32)
            l_out = v3c("l_out")
            weight = v3c("weight")
            d_pdf = col("d_pdf")
            if has_lights:
                sdir = v3c("sdir")
                raw_pdf = col("raw_pdf")
                l_direct_pre = v3c("l_direct_pre")
            if has_env:
                en_l = v3c("en_l")
                env_pdf_raw = col("env_pdf_raw")
                l_env_pre = v3c("l_env_pre")
            if cfg.mis == "balanced":
                if has_lights:
                    p_b_light = col("p_b_light")
                if has_env:
                    p_b_env = col("p_b_env")

        # --- phase 3: occlusion queries — replayed, fused (both NEE
        # classes in ONE any-hit batch), or separate -------------------------
        if has_lights:
            s_origin = pos + nrm * 1e-4
        if has_env:
            # reference offsets the env shadow ray origin by nothing
            # (comp:918); default adds the same normal epsilon as elsewhere.
            e_origin = pos if compat else pos + nrm * 1e-4
            facing = vdot(en_l, nrm) > 0
        fuse = cfg.fuse_shadows and has_lights and has_env and not replay
        rec_occ = jnp.zeros((r,), bool)  # placeholders keep the record
        rec_eocc = jnp.zeros((r,), bool)  # pytree static across modes
        if replay:
            if has_lights:
                occluded = brec[0]
            if has_env:
                e_occ = brec[1]
        elif fuse:
            occ2 = _occluded_v(
                _vcat(s_origin, e_origin),
                _vcat(sdir, en_l),
                jnp.concatenate([s_tmax, t_max0]),
                jnp.concatenate([active, active & facing]),
            )
            occluded, e_occ = occ2[:r], occ2[r:]
            if record:
                rec_occ = rec_occ.at[orig].set(occluded)
                rec_eocc = rec_eocc.at[orig].set(e_occ)
        else:
            if has_lights:
                occluded = _occluded_v(s_origin, sdir, s_tmax, active)
                if record:
                    rec_occ = rec_occ.at[orig].set(occluded)
            if has_env:
                e_occ = _occluded_v(e_origin, en_l, t_max0, active & facing)
                if record:
                    rec_eocc = rec_eocc.at[orig].set(e_occ)

        # --- NEE contributions (masks applied to the pre-folded terms) -----
        if has_lights:
            light_pdf = jnp.where(active & ~occluded, raw_pdf, 0.0)
            l_direct = vwhere(active & ~occluded, l_direct_pre, zero_v)
        if has_env:
            env_pdf = jnp.where(active, env_pdf_raw, 0.0)  # pdf always counted
            take = active & facing & ~e_occ
            l_env = vwhere(take, l_env_pre, zero_v)

        # --- MIS combine of the NEE estimators -----------------------------
        if cfg.mis == "reference":
            # the GLSL one-sample combine (comp:937-938); BRDF-sampled
            # contributions below stay unweighted (comp:960, 966)
            pdf_sum = env_pdf + light_pdf + d_pdf
            inv_sum = jnp.where(
                pdf_sum > _EPS, 1.0 / jnp.where(pdf_sum == 0, 1.0, pdf_sum), 0.0
            )
            nee = (l_env * env_pdf + l_direct * light_pdf) * inv_sum
        else:
            # per-strategy balance heuristic: each NEE sample weighted
            # against the BRDF strategy's pdf for the same direction
            nee = zero_v
            if has_lights:
                w_l = light_pdf / jnp.maximum(light_pdf + p_b_light, _EPS)
                nee = nee + l_direct * w_l
            if has_env:
                w_e = env_pdf / jnp.maximum(env_pdf + p_b_env, _EPS)
                nee = nee + l_env * w_e

        def clamp_contrib(x: V3) -> V3:
            if cfg.max_radiance is not None:
                return x.map(lambda a: jnp.minimum(a, cfg.max_radiance))
            return x

        lo = lo + clamp_contrib(vwhere(active, c * nee, zero_v))

        # --- continue the path (comp:950-969) -----------------------------
        b_origin = pos + nrm * 1e-4
        if replay:
            hit2 = brec[2]
            rec_hit2 = hit2
            pos2, nrm2, (u_uv2, v_uv2), mat_id2, tex_id2 = make_interaction(
                mesh, hit2, l_out, b_origin, rows=irows)
        else:
            (hit2, pos2, nrm2, (u_uv2, v_uv2), mat_id2, tex_id2) = (
                _closest_inter(b_origin, l_out, t_max0, active))
            rec_hit2 = hit2
            if record:
                rec_hit2 = jax.tree_util.tree_map(
                    lambda a: jnp.zeros_like(a).at[orig].set(a), hit2
                )

        # miss: environment radiance through the BRDF sample (comp:956-963)
        miss_now = active & ~hit2.valid
        if cfg.mis == "balanced" and has_env:
            p_e_out = envmap_pdf_v(scene.env, l_out)
            w_b_env = d_pdf / jnp.maximum(d_pdf + p_e_out, _EPS)
        else:
            w_b_env = 1.0
        env_out = jnp.int32(0)
        if replay and has_env:
            # Replay (the gradient graph): DEFER the env radiance lookup.
            # Each in-loop lookup's VJP is a full scatter-add pass into
            # the texel grid (~78 ms of the env backward was these,
            # scripts/bwd_profile4.py); emitting (direction, coefficient)
            # per bounce and looking ALL of them up in ONE batched pass
            # after the loop keeps the same rows but 1 scatter pass.
            # Radiance sums in a different (per-term) order — within the
            # replay ulp-equivalence budget; replay skips permutes, so
            # lane order is original and the post-loop add is aligned.
            mcoef = vwhere(miss_now, c * weight * w_b_env, zero_v)
            env_out = (l_out.x, l_out.y, l_out.z,
                       mcoef.x, mcoef.y, mcoef.z)
        else:
            env_li_out = env_radiance(l_out)
            lo = lo + clamp_contrib(
                vwhere(miss_now, c * env_li_out * weight * w_b_env, zero_v)
            )

        # hit: emissive pickup (comp:966)
        hit_now = active & hit2.valid
        emissive2 = _emissive_of(materials, mat_id2)
        if cfg.mis == "balanced" and has_lights:
            # solid-angle pdf of the area-light NEE strategy at this hit
            cos_h = jnp.abs(vdot(nrm2, l_out))
            p_l_hit = (hit2.t * hit2.t) / jnp.maximum(
                cos_h * lights.total_area, 1e-12
            )
            is_emissive = (
                (emissive2.x != 0.0) | (emissive2.y != 0.0)
                | (emissive2.z != 0.0)
            )
            w_b_emis = jnp.where(
                is_emissive, d_pdf / jnp.maximum(d_pdf + p_l_hit, _EPS), 1.0
            )
        else:
            w_b_emis = 1.0
        lo = lo + clamp_contrib(
            vwhere(hit_now, c * emissive2 * weight * w_b_emis, zero_v)
        )

        # throughput update and state roll (comp:968-969)
        c = vwhere(hit_now, c * weight, c)
        path_t = jnp.where(hit_now, path_t + hit2.t, path_t)
        # unconditional: only lanes with hit_now stay active, and v_dir is
        # not packed through the coherence permute (dead lanes' view
        # vector is never read) — -l_out is correct for every live lane
        v_dir = -l_out
        pos = vwhere(hit_now, pos2, pos)
        nrm = vwhere(hit_now, nrm2, nrm)
        u_uv = jnp.where(hit_now, u_uv2, u_uv)
        v_uv = jnp.where(hit_now, v_uv2, v_uv)
        mat_id = jnp.where(hit_now, mat_id2, mat_id)
        tex_id = jnp.where(hit_now, tex_id2, tex_id)
        active = hit_now

        # Russian roulette (not in the reference): unbiased stochastic
        # termination of low-throughput paths.  Masked formulation: the
        # stream only advances from rr_start on (folds to a no-op for
        # earlier static bounces, stays one program under scan).
        if cfg.rr_start is not None:
            rr_on = bounce >= cfg.rr_start  # py bool (unroll) / traced (scan)
            if not (static_bounce and not rr_on):
                gate = jnp.asarray(rr_on, bool)  # folds when static
                seed2, u_rr = rand01(seed)
                p_survive = jnp.clip(c.max_component(), 0.05, 0.95)
                survive = u_rr < p_survive
                c = vwhere(gate & active & survive, c / p_survive, c)
                active = active & (survive | ~gate)
                seed = jnp.where(gate, seed2, seed)

        carry = (seed, active, pos, nrm, u_uv, v_uv, mat_id, tex_id, v_dir,
                 c, lo, orig, px_l, py_l, path_t)
        out_rec = ((rec_occ, rec_eocc, rec_hit2) if record
                   else env_out)  # replay: deferred env terms (or int 0)
        return carry, out_rec

    active = primary_hit
    pos, nrm, (u_uv, v_uv), mat_id, tex_id = (
        p_pos, p_nrm, p_uv, p_mat, p_tex)
    # primary emissive pickup (comp:986) from the mat ids just fetched —
    # the compose step below would otherwise re-gather the [T, 26] table
    primary_emissive = _emissive_of(materials, mat_id)
    ones_r = jnp.ones((r,), jnp.float32)
    zeros_r = jnp.zeros((r,), jnp.float32)
    carry = (
        seed, active, pos, nrm, u_uv, v_uv, mat_id, tex_id, -d_v,
        V3(ones_r, ones_r, ones_r), V3(zeros_r, zeros_r, zeros_r),
        arange_r, px, py,
        jnp.where(primary_hit, hit.t, zeros_r),  # path distance (LOD cone)
    )

    if cfg.loop == "scan":
        # The coherence-sorted bounces (bounce < sort_max_bounce) run as
        # an UNROLLED prologue — the per-bounce permute is static, so
        # deep-bounce scan configs (config 5: depth 8) pay the ~10-14 ms
        # permute only sort_max_bounce times, not depth times — then ONE
        # scanned body covers the remaining depth (compile stays O(1) in
        # depth beyond the small prologue).
        n_pro = (min(cfg.sort_max_bounce, cfg.max_depth)
                 if (cfg.compact_rays and not replay) else 0)
        ys_pro = []
        for b in range(n_pro):
            brec = None
            if replay:
                brec = (
                    records.light_occ[b] if has_lights else None,
                    records.env_occ[b] if has_env else None,
                    jax.tree_util.tree_map(lambda a: a[b], records.bounce),
                )
            carry, y = bounce_body(carry, b, brec)
            ys_pro.append(y)
        n_rest = cfg.max_depth - n_pro
        ys = None
        if n_rest > 0:
            bidx = jnp.arange(n_pro, cfg.max_depth, dtype=jnp.int32)
            if replay:
                dummy = jnp.zeros((cfg.max_depth, r), bool)
                brec_xs = jax.tree_util.tree_map(
                    lambda a: a[n_pro:],
                    (records.light_occ if has_lights else dummy,
                     records.env_occ if has_env else dummy,
                     records.bounce),
                )
                carry, ys = jax.lax.scan(
                    lambda cy, x: bounce_body(cy, x[0], x[1],
                                              allow_sort=False),
                    carry, (bidx, brec_xs),
                )
            else:
                carry, ys = jax.lax.scan(
                    lambda cy, b: bounce_body(cy, b, None,
                                              allow_sort=False),
                    carry, bidx,
                )
        if record:
            if ys_pro and ys is not None:
                pro = jax.tree_util.tree_map(lambda *x: jnp.stack(x),
                                             *ys_pro)
                ys = jax.tree_util.tree_map(
                    lambda a, b: jnp.concatenate([a, b]), pro, ys)
            elif ys_pro:
                ys = jax.tree_util.tree_map(lambda *x: jnp.stack(x),
                                            *ys_pro)
    else:
        ys_list = []
        for b in range(cfg.max_depth):
            brec = None
            if replay:
                brec = (
                    records.light_occ[b] if has_lights else None,
                    records.env_occ[b] if has_env else None,
                    jax.tree_util.tree_map(lambda a: a[b], records.bounce),
                )
            carry, y = bounce_body(carry, b, brec)
            ys_list.append(y)
        ys = (
            jax.tree_util.tree_map(lambda *x: jnp.stack(x), *ys_list)
            if (record or (replay and has_env)) else None
        )

    (seed, active, pos, nrm, u_uv, v_uv, mat_id, tex_id, v_dir, c, lo,
     orig, px_l, py_l, path_t) = carry

    if replay and has_env:
        # the deferred per-bounce miss-env terms: ONE batched radiance
        # lookup over all [max_depth * R] directions (one scatter pass
        # in the backward instead of max_depth) — see bounce_body
        dx_, dy_, dz_, mx_, my_, mz_ = ys
        li = env_radiance(V3(dx_.reshape(-1), dy_.reshape(-1),
                             dz_.reshape(-1)))
        b_ = cfg.max_depth
        cx = li.x.reshape(b_, -1) * mx_
        cy = li.y.reshape(b_, -1) * my_
        cz = li.z.reshape(b_, -1) * mz_
        if cfg.max_radiance is not None:
            cx = jnp.minimum(cx, cfg.max_radiance)
            cy = jnp.minimum(cy, cfg.max_radiance)
            cz = jnp.minimum(cz, cfg.max_radiance)
        lo = lo + V3(cx.sum(0), cy.sum(0), cz.sum(0))

    # restore original ray order after compaction permutations
    lo = lo.map(lambda a: jnp.zeros_like(a).at[orig].set(a))

    # ---- compose (comp:983-988): primary emissive + path radiance on hit,
    # environment on miss (primary_emissive computed at the primary
    # interaction fill above)
    color_v = vwhere(primary_hit, primary_emissive + lo, miss_color)
    if cfg.clamp_radiance:
        color_v = color_v.map(lambda a: jnp.clip(a, 0.0, 1.0))
    color = color_v.rows()

    recs_out = None
    if record:
        locc, eocc, bounce_hits = ys
        recs_out = TraceRecords(
            primary=rec_primary,
            light_occ=locc if has_lights else None,
            env_occ=eocc if has_env else None,
            bounce=bounce_hits,
        )
    return color, recs_out


@functools.partial(jax.jit, static_argnames=("cfg",))
def render_rays(
    scene: Scene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    frame: jnp.ndarray,
    cfg: RenderConfig,
) -> jnp.ndarray:
    """[R, 3] radiance for one sample of a batch of primary rays (live
    traversal).  See :func:`_render_rays` for argument conventions."""
    color, _ = _render_rays(scene, o, d, px, py, frame, cfg, None, False)
    return color


@functools.partial(jax.jit, static_argnames=("cfg",))
def trace_paths(
    scene: Scene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    frame: jnp.ndarray,
    cfg: RenderConfig,
) -> TraceRecords:
    """Run the frame forward and capture every traversal result (the
    trace phase of a trace/replay gradient step).  Not differentiable —
    call with parameter *values* only."""
    _, recs = _render_rays(
        jax.lax.stop_gradient(scene), o, d, px, py, frame, cfg, None, True
    )
    return recs


@functools.partial(jax.jit, static_argnames=("cfg",))
def render_rays_replay(
    scene: Scene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    frame: jnp.ndarray,
    cfg: RenderConfig,
    records: TraceRecords,
) -> jnp.ndarray:
    """Reproduce a frame from its trace records WITHOUT any traversal:
    identical radiance (up to XLA fusion/FMA rounding) when ``scene`` carries the same parameter values
    the trace ran with, and a while-loop-free graph that is cheap to
    differentiate (the backward pass never re-walks the BVH)."""
    color, _ = _render_rays(scene, o, d, px, py, frame, cfg, records, False)
    return color
