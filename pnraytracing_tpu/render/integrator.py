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
from pnraytracing_tpu.core.math import (
    FLOAT_MAX,
    SHADOW_EPS,
    build_tangent_space,
    cross,
    dot,
    normalize,
)
from pnraytracing_tpu.core.types import Scene, TriangleMesh
from pnraytracing_tpu.ops.brdf import (
    apply_compat_material_decode,
    disney_eval,
    disney_pdf,
    disney_sample,
)
from pnraytracing_tpu.ops.envmap import envmap_lookup, envmap_pdf, sample_envmap
from pnraytracing_tpu.ops.intersect import Hit, intersect_triangle
from pnraytracing_tpu.ops.sampling import (
    cranley_patterson_rotation,
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
    ray_d: jnp.ndarray,
    ray_o: jnp.ndarray | None = None,
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
    fetch into one row-gather.
    """
    tri = jnp.maximum(hit.tri, 0)
    if rows is not None:
        r = rows[tri]  # [R, 26] — single gather
        p = r[:, 0:9].reshape(-1, 3, 3)
        n = r[:, 9:18].reshape(-1, 3, 3)
        uv = r[:, 18:24].reshape(-1, 3, 2)
        mat_id = r[:, 24].astype(jnp.int32)
        tex_id = r[:, 25].astype(jnp.int32)
    else:
        idx = mesh.indices[tri]  # [R, 3]
        p = mesh.positions[idx]  # [R, 3, 3]
        n = mesh.normals[idx]
        uv = mesh.uvs[idx]
        mat_id = mesh.material_id[tri]
        tex_id = mesh.texture_id[tri]
    if ray_o is not None:
        ok, _, rb1, rb2 = intersect_triangle(
            p[:, 0], p[:, 1], p[:, 2], ray_o, ray_d,
            jnp.full(tri.shape, FLOAT_MAX, jnp.float32),
        )
        b1v = jnp.where(ok, rb1, hit.b1)
        b2v = jnp.where(ok, rb2, hit.b2)
        b0 = (1.0 - b1v - b2v)[..., None]
        b1 = b1v[..., None]
        b2 = b2v[..., None]
    else:
        b0 = hit.b0[..., None]
        b1 = hit.b1[..., None]
        b2 = hit.b2[..., None]
    pos = b0 * p[:, 0] + b1 * p[:, 1] + b2 * p[:, 2]
    geom_n = normalize(cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]))
    any_zero = (
        jnp.all(n[:, 0] == 0, axis=-1)
        | jnp.all(n[:, 1] == 0, axis=-1)
        | jnp.all(n[:, 2] == 0, axis=-1)
    )
    n_interp = b0 * n[:, 0] + b1 * n[:, 1] + b2 * n[:, 2]
    nrm = jnp.where(any_zero[..., None], geom_n, n_interp)
    # backface flip toward the incoming ray (comp:345-348)
    nrm = jnp.where(dot(nrm, ray_d)[..., None] > 0, -nrm, nrm)
    nrm = normalize(nrm)
    uv_hit = b0 * uv[:, 0] + b1 * uv[:, 1] + b2 * uv[:, 2]
    return pos, nrm, uv_hit, mat_id, tex_id


def sample_light_point(mesh: TriangleMesh, tri: jnp.ndarray, u1, u2,
                       rows: jnp.ndarray | None = None):
    """Uniform point + normal on light triangles (TriangleSample,
    comp:604-624).  ``rows`` (pack_interaction_rows) turns the corner
    fetch into one row-gather."""
    b0, b1 = sample_uniform_triangle(u1, u2)
    if rows is not None:
        r = rows[tri]  # [R, 26]
        p = r[:, 0:9].reshape(-1, 3, 3)
        n = r[:, 9:18].reshape(-1, 3, 3)
    else:
        idx = mesh.indices[tri]
        p = mesh.positions[idx]
        n = mesh.normals[idx]
    b2 = 1.0 - b0 - b1
    pos = b0[..., None] * p[:, 0] + b1[..., None] * p[:, 1] + b2[..., None] * p[:, 2]
    geom_n = normalize(cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0]))
    any_zero = (
        jnp.all(n[:, 0] == 0, axis=-1)
        | jnp.all(n[:, 1] == 0, axis=-1)
        | jnp.all(n[:, 2] == 0, axis=-1)
    )
    n_interp = (
        b0[..., None] * n[:, 0] + b1[..., None] * n[:, 1] + b2[..., None] * n[:, 2]
    )
    nrm = normalize(jnp.where(any_zero[..., None], geom_n, n_interp))
    return pos, nrm


def _emissive_of(materials, mat_id: jnp.ndarray) -> jnp.ndarray:
    """[R, 3] emissive for per-ray material ids — one-hot MXU select for
    small palettes (0 gathers), row gather otherwise."""
    m = materials.emissive.shape[0]
    if m <= 32:
        oh = jax.nn.one_hot(mat_id, m, dtype=jnp.float32)
        return oh @ materials.emissive
    return materials.emissive[mat_id]


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
            )

            # Mosaic compiles on TPU only; elsewhere (CPU test meshes)
            # the same kernel runs under the Pallas interpreter.
            packed_kw["interpret"] = jax.default_backend() != "tpu"
            _closest_fn, _occluded_fn = closest_hit_pallas, any_hit_pallas
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

    irows = pack_interaction_rows(mesh)

    # ---- primary hit (comp:983) -----------------------------------------
    hit = records.primary if replay else _closest(o, d, t_max0)
    primary_hit = hit.valid
    rec_primary = hit  # original order: no compaction has happened yet

    def env_radiance(dirs):
        if has_env:
            return envmap_lookup(scene.env, dirs)
        return jnp.broadcast_to(env_const * cfg.env_scale, dirs.shape)

    miss_color = env_radiance(d)

    # ---- path loop (comp:861-972) ---------------------------------------
    # One bounce is a pure function of the carried path state.  It is
    # either unrolled (``cfg.loop == "unroll"``: XLA sees max_depth copies,
    # best steady-state codegen) or driven by ``lax.scan``
    # (``cfg.loop == "scan"``: the body compiles ONCE, so program size and
    # compile time are O(1) in depth — required for deep-bounce configs).
    arange_r = jnp.arange(r, dtype=jnp.int32)

    def bounce_body(carry, bounce, brec):
        (seed, active, pos, nrm, uv, mat_id, tex_id, v_dir, c, lo,
         orig, px_l, py_l) = carry
        static_bounce = isinstance(bounce, int)

        mat = materials.gather(mat_id).sanitized()
        if compat:
            mat = apply_compat_material_decode(mat)
        if has_tex:
            mat = mat.replace(
                base_color=fetch_base_color(scene.textures, tex_id, uv, mat.base_color)
            )
        t_tan, b_tan = build_tangent_space(nrm)

        # --- NEE: area-light sample (comp:878-909) ------------------------
        seed, u_light = rand01(seed)
        l_direct = jnp.zeros((r, 3), jnp.float32)
        light_pdf = jnp.zeros((r,), jnp.float32)
        if has_lights:
            slot = pick_light(lights.prefix_area, lights.total_area, u_light)
            light_tri = lights.tri_index[slot]
            seed, u1 = rand01(seed)
            seed, u2 = rand01(seed)
            lp, ln = sample_light_point(mesh, light_tri, u1, u2,
                                        rows=irows)
            sdir = lp - pos  # unnormalized segment (comp:887)
            s_origin = pos + nrm * 1e-4
            s_tmax = jnp.full((r,), 1.0 - SHADOW_EPS, jnp.float32)

        # --- NEE: environment sample (comp:911-926) ------------------------
        l_env = jnp.zeros((r, 3), jnp.float32)
        env_pdf = jnp.zeros((r,), jnp.float32)
        if has_env:
            seed, r1e = rand01(seed)
            seed, r2e = rand01(seed)
            en_l, en_li, env_pdf_raw = sample_envmap(scene.env, r1e, r2e, compat=compat)
            # reference offsets the env shadow ray origin by nothing
            # (comp:918); default adds the same normal epsilon as elsewhere.
            e_origin = pos if compat else pos + nrm * 1e-4
            facing = dot(en_l, nrm) > 0

        # --- occlusion queries: replayed, fused (both NEE classes in ONE
        # any-hit batch — identical results, half the traversal dispatches
        # per bounce), or separate -------------------------------------------
        fuse = cfg.fuse_shadows and has_lights and has_env and not replay
        rec_occ = jnp.zeros((r,), bool)  # placeholders keep the record
        rec_eocc = jnp.zeros((r,), bool)  # pytree static across modes
        if replay:
            if has_lights:
                occluded = brec[0]
            if has_env:
                e_occ = brec[1]
        elif fuse:
            occ2 = _occluded(
                jnp.concatenate([s_origin, e_origin]),
                jnp.concatenate([sdir, en_l]),
                jnp.concatenate([s_tmax, t_max0]),
                jnp.concatenate([active, active & facing]),
            )
            occluded, e_occ = occ2[:r], occ2[r:]
            if record:
                rec_occ = rec_occ.at[orig].set(occluded)
                rec_eocc = rec_eocc.at[orig].set(e_occ)
        else:
            if has_lights:
                occluded = _occluded(s_origin, sdir, s_tmax, active)
                if record:
                    rec_occ = rec_occ.at[orig].set(occluded)
            if has_env:
                e_occ = _occluded(e_origin, en_l, t_max0, active & facing)
                if record:
                    rec_eocc = rec_eocc.at[orig].set(e_occ)

        # --- area-light contribution ---------------------------------------
        if has_lights:
            dis2 = dot(sdir, sdir)
            lnorm = normalize(sdir)
            cos_l = jnp.abs(dot(ln, -lnorm))
            raw_pdf = dis2 / jnp.maximum(cos_l * lights.total_area, 1e-12)
            light_pdf = jnp.where(active & ~occluded, raw_pdf, 0.0)
            li = _emissive_of(
                materials, irows[light_tri, 24].astype(jnp.int32)
            )
            light_f = disney_eval(v_dir, nrm, lnorm, t_tan, b_tan, mat)
            nl = jnp.abs(dot(nrm, lnorm))
            l_direct = jnp.where(
                (active & ~occluded)[..., None],
                light_f * li * nl[..., None] * _safe_inv(raw_pdf)[..., None],
                0.0,
            )

        # --- environment contribution ---------------------------------------
        if has_env:
            env_pdf = jnp.where(active, env_pdf_raw, 0.0)  # pdf always counted
            take = active & facing & ~e_occ
            env_f = disney_eval(v_dir, nrm, en_l, t_tan, b_tan, mat)
            l_env = jnp.where(
                take[..., None],
                env_f * en_li * dot(en_l, nrm)[..., None]
                * _safe_inv(env_pdf_raw)[..., None],
                0.0,
            )

        # --- BRDF sample (comp:928-934) -----------------------------------
        if cfg.sampler == "sobol":
            su, sv = sobol_vec2(frame + 1, bounce)
            p2 = jnp.broadcast_to(jnp.stack([su, sv]), (r, 2))
            p2 = cranley_patterson_rotation(p2, px_l, py_l, cfg.width, cfg.height)
            r1, r2 = p2[..., 0], p2[..., 1]
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
        l_out, d_pdf, lobe = disney_sample(
            v_dir, nrm, t_tan, b_tan, mat, r_lobe, r1, r2, u_d1, u_d2, compat=compat
        )
        seed = jnp.where(lobe == 0, s2, seed)

        d_f = disney_eval(v_dir, nrm, l_out, t_tan, b_tan, mat)
        n_dot_l = jnp.abs(dot(nrm, l_out))

        # --- MIS combine of the NEE estimators -----------------------------
        if cfg.mis == "reference":
            # the GLSL one-sample combine (comp:937-938); BRDF-sampled
            # contributions below stay unweighted (comp:960, 966)
            pdf_sum = env_pdf + light_pdf + d_pdf
            inv_sum = jnp.where(
                pdf_sum > _EPS, 1.0 / jnp.where(pdf_sum == 0, 1.0, pdf_sum), 0.0
            )
            nee = (
                l_env * env_pdf[..., None] + l_direct * light_pdf[..., None]
            ) * inv_sum[..., None]
        else:
            # per-strategy balance heuristic: each NEE sample weighted
            # against the BRDF strategy's pdf for the same direction
            nee = jnp.zeros((r, 3), jnp.float32)
            if has_lights:
                p_b_light = jnp.maximum(disney_pdf(v_dir, nrm, lnorm, mat), 0.0)
                w_l = light_pdf / jnp.maximum(light_pdf + p_b_light, _EPS)
                nee = nee + l_direct * w_l[..., None]
            if has_env:
                p_b_env = jnp.maximum(disney_pdf(v_dir, nrm, en_l, mat), 0.0)
                w_e = env_pdf / jnp.maximum(env_pdf + p_b_env, _EPS)
                nee = nee + l_env * w_e[..., None]

        def clamp_contrib(x):
            if cfg.max_radiance is not None:
                return jnp.minimum(x, cfg.max_radiance)
            return x

        lo = lo + clamp_contrib(jnp.where(active[..., None], c * nee, 0.0))

        # --- continue the path (comp:950-969) -----------------------------
        b_origin = pos + nrm * 1e-4
        if replay:
            hit2 = brec[2]
            rec_hit2 = hit2
        else:
            hit2 = _closest(b_origin, l_out, t_max0, active)
            rec_hit2 = hit2
            if record:
                rec_hit2 = jax.tree_util.tree_map(
                    lambda a: jnp.zeros_like(a).at[orig].set(a), hit2
                )
        weight = d_f * (n_dot_l * _safe_inv(d_pdf))[..., None]

        # miss: environment radiance through the BRDF sample (comp:956-963)
        miss_now = active & ~hit2.valid
        env_li_out = env_radiance(l_out)
        if cfg.mis == "balanced" and has_env:
            p_e_out = envmap_pdf(scene.env, l_out)
            w_b_env = (d_pdf / jnp.maximum(d_pdf + p_e_out, _EPS))[..., None]
        else:
            w_b_env = 1.0
        lo = lo + clamp_contrib(
            jnp.where(miss_now[..., None], c * env_li_out * weight * w_b_env, 0.0)
        )

        # hit: emissive pickup (comp:966)
        pos2, nrm2, uv2, mat_id2, tex_id2 = make_interaction(
            mesh, hit2, l_out, b_origin, rows=irows)
        hit_now = active & hit2.valid
        emissive2 = _emissive_of(materials, mat_id2)
        if cfg.mis == "balanced" and has_lights:
            # solid-angle pdf of the area-light NEE strategy at this hit
            cos_h = jnp.abs(dot(nrm2, l_out))
            p_l_hit = (hit2.t * hit2.t) / jnp.maximum(
                cos_h * lights.total_area, 1e-12
            )
            is_emissive = jnp.any(emissive2 != 0.0, axis=-1)
            w_b_emis = jnp.where(
                is_emissive, d_pdf / jnp.maximum(d_pdf + p_l_hit, _EPS), 1.0
            )[..., None]
        else:
            w_b_emis = 1.0
        lo = lo + clamp_contrib(
            jnp.where(hit_now[..., None], c * emissive2 * weight * w_b_emis, 0.0)
        )

        # throughput update and state roll (comp:968-969)
        c = jnp.where(hit_now[..., None], c * weight, c)
        v_dir = jnp.where(hit_now[..., None], -l_out, v_dir)
        pos = jnp.where(hit_now[..., None], pos2, pos)
        nrm = jnp.where(hit_now[..., None], nrm2, nrm)
        uv = jnp.where(hit_now[..., None], uv2, uv)
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
                p_survive = jnp.clip(jnp.max(c, axis=-1), 0.05, 0.95)
                survive = u_rr < p_survive
                c = jnp.where(
                    (gate & active & survive)[..., None],
                    c / p_survive[..., None], c,
                )
                active = active & (survive | ~gate)
                seed = jnp.where(gate, seed2, seed)

        # pack live rays to the front so dead tiles drain instantly in the
        # tiled traversal of the next bounce (pure permutation — RNG seed
        # and pixel ids travel with the ray, radiance is unscrambled at
        # the end); skipped after the last bounce
        if cfg.compact_rays and not replay:
            is_last = bounce >= cfg.max_depth - 1
            if not (static_bounce and is_last):
                if cfg.sort_rays and scene.trav is not None:
                    # group live rays by (normal octant, position cell) so
                    # each traversal tile of the next bounce sees coherent
                    # rays
                    root = scene.trav.nodes8[0]
                    lo_b, hi_b = root[0:3], root[3:6]
                    inv_ext = 1.0 / jnp.maximum(hi_b - lo_b, 1e-6)
                    key_fn = (coherence_key_pos if cfg.sort_key == "pos"
                              else coherence_key)
                    perm, _ = sort_live_first(
                        active, key_fn(nrm, pos, lo_b, inv_ext)
                    )
                else:
                    perm, _ = compact_indices(active)
                if not static_bounce:
                    perm = jnp.where(is_last, arange_r, perm)
                (active, pos, nrm, uv, mat_id, tex_id, v_dir, c, lo, seed,
                 orig, px_l, py_l) = jax.tree_util.tree_map(
                    lambda a: a[perm],
                    (active, pos, nrm, uv, mat_id, tex_id, v_dir, c, lo, seed,
                     orig, px_l, py_l),
                )

        carry = (seed, active, pos, nrm, uv, mat_id, tex_id, v_dir, c, lo,
                 orig, px_l, py_l)
        out_rec = (rec_occ, rec_eocc, rec_hit2) if record else jnp.int32(0)
        return carry, out_rec

    active = primary_hit
    pos, nrm, uv, mat_id, tex_id = make_interaction(mesh, hit, d, o,
                                                    rows=irows)
    carry = (
        seed, active, pos, nrm, uv, mat_id, tex_id, -d,
        jnp.ones((r, 3), jnp.float32), jnp.zeros((r, 3), jnp.float32),
        arange_r, px, py,
    )

    if cfg.loop == "scan":
        bidx = jnp.arange(cfg.max_depth, dtype=jnp.int32)
        if replay:
            dummy = jnp.zeros((cfg.max_depth, r), bool)
            brec_xs = (
                records.light_occ if has_lights else dummy,
                records.env_occ if has_env else dummy,
                records.bounce,
            )
            carry, ys = jax.lax.scan(
                lambda cy, x: bounce_body(cy, x[0], x[1]), carry,
                (bidx, brec_xs),
            )
        else:
            carry, ys = jax.lax.scan(
                lambda cy, b: bounce_body(cy, b, None), carry, bidx
            )
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
            if record else None
        )

    (seed, active, pos, nrm, uv, mat_id, tex_id, v_dir, c, lo,
     orig, px_l, py_l) = carry

    # restore original ray order after compaction permutations
    lo = jnp.zeros_like(lo).at[orig].set(lo)

    # ---- compose (comp:983-988): primary emissive + path radiance on hit,
    # environment on miss
    primary_emissive = _emissive_of(
        materials, irows[jnp.maximum(hit.tri, 0), 24].astype(jnp.int32)
    )
    color = jnp.where(primary_hit[..., None], primary_emissive + lo, miss_color)
    if cfg.clamp_radiance:
        color = jnp.clip(color, 0.0, 1.0)

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
