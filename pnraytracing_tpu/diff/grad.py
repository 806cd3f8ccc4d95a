"""Differentiable rendering: parameter plumbing, losses, optimization steps.

The reference has no gradients (SURVEY.md §2.3); this module is the TPU
build's headline extension: pixel gradients flow to **material parameters**,
**environment texels** and **vertex positions** through the path-replay
construction in the integrator (traversal detached, shading re-derived
differentiably — see ``render_rays``/``make_interaction``).

Design: optimization targets live in a plain dict pytree (``params``) that
is grafted onto a scene template per evaluation, so ``jax.grad`` sees only
the tensors being optimized:

* ``"materials"``  -> full Materials pytree
* ``"env_image"``  -> [H, W, 3] env radiance (CDF tables rebuilt in-graph,
  so importance sampling stays consistent with the optimized texels)
* ``"positions"``  -> [V, 3] vertex positions.  NOTE: the BVH is built for
  the template's geometry; gradients are exact for infinitesimal motion but
  after an optimizer step call :func:`refit_scene` to keep traversal
  correct.
"""

from __future__ import annotations

import functools
from typing import Iterable

import jax
import jax.numpy as jnp

from pnraytracing_tpu.core.config import RenderConfig
from pnraytracing_tpu.core.types import Camera, Scene
from pnraytracing_tpu.ops.envmap import build_envmap
from pnraytracing_tpu.render.integrator import (
    render_rays,
    render_rays_replay,
    trace_paths,
)

PARAM_KEYS = ("materials", "env_image", "positions")


def extract_params(scene: Scene, keys: Iterable[str]) -> dict:
    """Pull the requested optimization targets out of a scene."""
    params = {}
    for k in keys:
        if k == "materials":
            params[k] = scene.materials
        elif k == "env_image":
            assert scene.env is not None, "scene has no environment map"
            params[k] = scene.env.image
        elif k == "positions":
            params[k] = scene.mesh.positions
        else:
            raise KeyError(f"unknown param key {k!r}; choose from {PARAM_KEYS}")
    return params


def apply_params(scene: Scene, params: dict) -> Scene:
    """Graft an optimization-parameter pytree back onto a scene template.

    Environment grafting keeps the template's host-baked alias tables
    when it has them: sampling cells from the (stale) tables with the
    matching (stale) pdf stays an unbiased estimator — the pdf reported
    is exactly the density actually sampled — while the RADIANCE fetched
    at those cells is the new, differentiable image.  This keeps the
    2-gather alias path in gradient graphs instead of falling back to
    the ~log(H)-gather CDF bisection (measured: the bisection dominated
    the replay backward pass), and it makes finite-difference checks
    exact (the sampling distribution is frozen across evaluations).
    Only the pdf/CDF arrays are rebuilt when the template has no baked
    tables (in-graph refits)."""
    if "materials" in params:
        scene = scene.replace(materials=params["materials"])
    if "env_image" in params:
        img = jnp.asarray(params["env_image"], jnp.float32)
        env0 = scene.env
        if env0 is not None and env0.alias_x is not None:
            from pnraytracing_tpu.ops.envmap import _pack_quads

            scene = scene.replace(env=env0.replace(
                image=img,
                quad12=_pack_quads(img),
                # fat rows bake radiance -> stale AND detached; disable
                # so sample_envmap_v takes the differentiable alias path
                alias_fat=None,
            ))
        else:
            scene = scene.replace(env=build_envmap(img))
    if "positions" in params:
        scene = scene.replace(mesh=scene.mesh.replace(positions=params["positions"]))
    return scene


def refit_scene(scene: Scene, max_leaf_size: int = 4) -> Scene:
    """Rebuild the BVH for the scene's current vertex positions (host-side;
    call after optimizer steps that move geometry).  Leaf order is preserved
    when possible by rebuilding from the already-reordered triangles."""
    import numpy as np

    from pnraytracing_tpu.accel.bvh import build_bvh
    from pnraytracing_tpu.core.types import BVH

    try:
        from pnraytracing_tpu.accel.native import build_bvh_native, native_available

        builder = build_bvh_native if native_available() else build_bvh
    except ImportError:
        builder = build_bvh
    positions = np.asarray(scene.mesh.positions)
    indices = np.asarray(scene.mesh.indices)
    built = builder(positions, indices, max_leaf_size=max_leaf_size)
    order = built.order
    mesh = scene.mesh.replace(
        indices=jnp.asarray(indices[order]),
        material_id=scene.mesh.material_id[jnp.asarray(order)],
        texture_id=scene.mesh.texture_id[jnp.asarray(order)],
        area=scene.mesh.area[jnp.asarray(order)],
    )
    # remap light triangle indices through the new order
    inv = np.empty_like(order)
    inv[order] = np.arange(len(order), dtype=order.dtype)
    lights = scene.lights.replace(
        tri_index=jnp.asarray(inv[np.asarray(scene.lights.tri_index)])
    )
    bvh = BVH(
        node_min=jnp.asarray(built.node_min),
        node_max=jnp.asarray(built.node_max),
        axis=jnp.asarray(built.axis),
        right_child=jnp.asarray(built.right_child),
        start=jnp.asarray(built.start),
        end=jnp.asarray(built.end),
    )
    trav = scene.trav
    if trav is not None:
        from pnraytracing_tpu.accel.layout import pack_traversal_data

        had_w4 = trav.w4 is not None
        trav = pack_traversal_data(bvh, mesh)
        if had_w4:
            from pnraytracing_tpu.accel.wide4 import pack_wide4

            tri9_np = positions[indices[order]].reshape(len(order), 9)
            trav = trav.replace(w4=pack_wide4(built, tri9_np))
    return scene.replace(mesh=mesh, bvh=bvh, lights=lights, trav=trav)


def render_image_from_params(
    params: dict,
    scene: Scene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    frame,
    cfg: RenderConfig,
) -> jnp.ndarray:
    """[R, 3] radiance with ``params`` grafted in — the differentiable
    forward pass.

    Forces ``kernel_interaction`` OFF: the attribute-emitting Mosaic
    kernel returns stop-gradient'd interaction values, which would
    silently zero the vertex/normal/uv gradients this path exists to
    provide; make_interaction's differentiable re-derivation is required
    here (the trace/replay path gets the fast kernel in its trace phase
    instead)."""
    import dataclasses

    cfg = dataclasses.replace(cfg, kernel_interaction=False)
    return render_rays(apply_params(scene, params), o, d, px, py, frame, cfg)


@functools.partial(jax.jit, static_argnames=("cfg", "spp", "dual"))
def loss_and_grad(
    params: dict,
    scene: Scene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    frame,
    target: jnp.ndarray,
    cfg: RenderConfig,
    spp: int = 1,
    dual: bool = True,
):
    """Squared-error loss against a target ray-color batch and its gradient.

    With ``spp >= 2`` the samples are split into two independent halves A, B
    and the loss is the *dual-buffer* estimator ``mean((A-t)*(B-t))``:
    ``E[(A-t)(B-t)] = (E[render]-t)^2`` exactly, with no ``Var/n`` term —
    plain MSE of a noisy render is biased toward low-variance (dark)
    parameters, which wrecks inverse rendering.  ``spp == 1`` (or
    ``dual=False``) falls back to plain MSE — the right choice under a
    common-random-numbers protocol, where the dual-buffer halves are
    anti-correlated at the optimum."""

    def renders(p, f0, k):
        img = jnp.zeros_like(target)
        for j in range(k):
            img = img + render_image_from_params(
                p, scene, o, d, px, py, f0 + jnp.uint32(j), cfg
            )
        return img / k

    def f(p):
        if spp >= 2 and dual:
            ka = spp // 2
            kb = spp - ka
            a = renders(p, jnp.uint32(frame), ka)
            b = renders(p, jnp.uint32(frame) + jnp.uint32(ka), kb)
            return jnp.mean((a - target) * (b - target))
        img = renders(p, jnp.uint32(frame), spp)
        return jnp.mean((img - target) ** 2)

    return jax.value_and_grad(f)(params)


@functools.partial(jax.jit, static_argnames=("cfg", "spp", "dual"))
def loss_and_grad_replay(
    params: dict,
    scene: Scene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    frame,
    target: jnp.ndarray,
    cfg: RenderConfig,
    spp: int = 1,
    dual: bool = True,
):
    """Same estimator and gradients as :func:`loss_and_grad`, via the
    trace/replay split: each sample's BVH traversals run ONCE (forward only,
    with the current parameter values) and the differentiated function is
    the while-loop-free replay — the backward pass never re-walks the BVH.
    Identical loss values bit-for-bit; gradients match because every
    recorded quantity (hit ids, occlusion bits) is exactly the set the live
    integrator already detaches with ``stop_gradient``."""
    scene_now = apply_params(scene, jax.lax.stop_gradient(params))
    recs = [
        trace_paths(scene_now, o, d, px, py, jnp.uint32(frame) + jnp.uint32(j), cfg)
        for j in range(spp)
    ]

    def renders(p, j0, k):
        img = jnp.zeros_like(target)
        for j in range(j0, j0 + k):
            img = img + render_rays_replay(
                apply_params(scene, p), o, d, px, py,
                jnp.uint32(frame) + jnp.uint32(j), cfg, recs[j],
            )
        return img / k

    def f(p):
        if spp >= 2 and dual:
            ka = spp // 2
            a = renders(p, 0, ka)
            b = renders(p, ka, spp - ka)
            return jnp.mean((a - target) * (b - target))
        return jnp.mean((renders(p, 0, spp) - target) ** 2)

    return jax.value_and_grad(f)(params)


def adam_optimize(
    scene: Scene,
    camera: Camera,
    cfg: RenderConfig,
    target_image: jnp.ndarray,
    keys: Iterable[str] = ("materials",),
    steps: int = 32,
    lr: float = 2e-2,
    frame_offset: int = 0,
    spp_per_step: int = 4,
    use_replay: bool = True,
    resample: bool = True,
    grad_mask: dict | None = None,
    log_every: int | None = None,
    log_fn=None,
):
    """Small self-contained inverse-rendering loop (BASELINE config 5's
    "differentiable material/env optimization").  Returns (optimized scene,
    loss history).  ``use_replay`` picks the trace/replay gradient step
    (traversal excluded from the backward pass, same gradients).

    ``resample=False`` renders the SAME frame window every step
    (common random numbers): pair it with a target rendered from
    ``frame_offset`` at the same spp and the sampling noise cancels
    exactly at the optimum — the right protocol when the signal (e.g.
    small geometry motion) is weaker than the per-step sample variance.

    ``grad_mask`` (same structure as the params dict, broadcastable
    leaves) freezes coordinates where the mask is 0 — e.g. optimize one
    object's vertices while pinning the light geometry.  Without it,
    adam's per-coordinate normalization moves near-zero-gradient
    coordinates at full ``lr`` speed (they just follow noise).

    ``log_every=N`` emits one structured metrics line per N steps via
    ``log_fn`` (default: print) — JSON with step, loss, global grad
    norm, per-key grad norms, rays/s and step wall time (the per-step
    observability the reference's stdout counters lack, SURVEY.md §5)."""
    import json
    import time as _time

    import optax

    from pnraytracing_tpu.core.camera import camera_rays
    from pnraytracing_tpu.render.renderer import pixel_coords

    params = extract_params(scene, keys)
    opt = optax.adam(lr)
    opt_state = opt.init(params)
    px, py = pixel_coords(cfg)
    o, d, _ = camera_rays(camera, cfg.width, cfg.height)
    target = jnp.asarray(target_image, jnp.float32).reshape(-1, 3)

    grad_fn = loss_and_grad_replay if use_replay else loss_and_grad
    losses = []
    emit = log_fn or (lambda line: print(line, flush=True))
    rays_per_sample = cfg.num_pixels * (1 + 3 * cfg.max_depth)
    t_prev = _time.perf_counter()

    # One jitted, DONATING update step: optimizer state and parameters
    # are updated in place (no per-step reallocation of the [H, W, 3]
    # env texel grid + adam moments at config-5 scale), and the whole
    # update chain (mask, adam, projections) is one dispatch.  XLA
    # verifies the aliasing contract at compile time — the
    # donation/aliasing assert SURVEY §5's race-detection row asks for.
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def _update(opt_state_, params_, grads_):
        if grad_mask is not None:
            grads_ = jax.tree_util.tree_map(
                lambda g, m: g * m, grads_, grad_mask
            )
        updates, opt_state_ = opt.update(grads_, opt_state_, params_)
        params_ = optax.apply_updates(params_, updates)
        # project back into the physical domain (clips also stop the
        # forward-side sanitization from zeroing gradients forever)
        if "materials" in params_:
            params_["materials"] = params_["materials"].sanitized()
        if "env_image" in params_:
            params_["env_image"] = jnp.maximum(params_["env_image"], 0.0)
        return opt_state_, params_

    for step in range(steps):
        loss, grads = grad_fn(
            params, scene, o, d, px, py,
            jnp.uint32(frame_offset + (step * spp_per_step if resample else 0)),
            target, cfg,
            spp=spp_per_step, dual=resample,
        )
        opt_state, params = _update(opt_state, params, grads)
        if "positions" in params:
            # finite motion invalidates the template's BVH/trav: keep
            # traversal consistent with the optimized geometry (array
            # shapes are unchanged, so no recompilation)
            scene = refit_scene(
                apply_params(scene, {"positions": params["positions"]})
            )
        losses.append(float(loss))
        if log_every and (step % log_every == 0 or step == steps - 1):
            # the float(loss) above already synchronized the step
            now = _time.perf_counter()
            dt = now - t_prev
            t_prev = now
            gnorms = {
                k: float(optax.global_norm(v)) for k, v in grads.items()
            }
            emit(json.dumps({
                "step": step,
                "loss": losses[-1],
                "grad_norm": float(optax.global_norm(grads)),
                "grad_norms": gnorms,
                "rays_per_s": round(rays_per_sample * spp_per_step / dt, 1),
                "step_s": round(dt, 4),
            }))
        else:
            t_prev = _time.perf_counter()
    return apply_params(scene, params), losses
