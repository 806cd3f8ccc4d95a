"""Differentiability tests: finite-difference checks of pixel-loss gradients
w.r.t. material parameters, environment texels and vertex positions
(SURVEY.md §4 gradient plan / BASELINE config 4-5 gates)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from pnraytracing_tpu.core.camera import camera_rays, make_camera
from pnraytracing_tpu.core.config import RenderConfig
from pnraytracing_tpu.diff.grad import (
    apply_params,
    extract_params,
    loss_and_grad,
    refit_scene,
)
from pnraytracing_tpu.io.hdr import procedural_sky
from pnraytracing_tpu.render.renderer import pixel_coords
from pnraytracing_tpu.scene import shapes
from pnraytracing_tpu.scene.build import SceneBuilder
from pnraytracing_tpu.scene.transform import compose, rotate, translate

CFG = RenderConfig(width=8, height=8, max_depth=1, sampler="hash",
                   clamp_radiance=False)


def tiny_scene(with_env=False):
    b = SceneBuilder()
    b.add(shapes.triangle((-2, -2, 0), (2, -2, 0), (0, 2, 0)),
          dict(base_color=(0.6, 0.4, 0.3), roughness=0.7), name="tri")
    b.add(shapes.quad(half=0.7), dict(emissive=(8.0, 8.0, 8.0)), name="light",
          transform=compose(translate(0, 3, 2), rotate(180, (0, 0, 1))))
    scene = b.build(
        env_image=procedural_sky(16, 32) if with_env else None,
        env_constant=None if with_env else (0.3, 0.3, 0.35),
    )
    cam = make_camera((0, 0, 4), (0, 0, 0), (0, 1, 0), 50.0, 1.0)
    return scene, cam


def setup(scene, cam, cfg=CFG):
    px, py = pixel_coords(cfg)
    o, d, _ = camera_rays(cam, cfg.width, cfg.height)
    target = jnp.zeros((cfg.num_pixels, 3), jnp.float32)
    return o, d, px, py, target


def loss_value(params, scene, o, d, px, py, target, cfg=CFG):
    from pnraytracing_tpu.diff.grad import render_image_from_params

    img = render_image_from_params(params, scene, o, d, px, py, jnp.uint32(0), cfg)
    return float(jnp.mean((img - target) ** 2))


@pytest.mark.slow
def test_material_gradient_finite_difference():
    scene, cam = tiny_scene()
    o, d, px, py, target = setup(scene, cam)
    params = extract_params(scene, ("materials",))
    loss, grads = loss_and_grad(params, scene, o, d, px, py, jnp.uint32(0), target, CFG)
    g = np.asarray(grads["materials"].base_color)
    assert np.isfinite(g).all()
    assert np.abs(g[0]).max() > 0  # triangle base color affects the image

    eps = 1e-3
    for ch in range(3):
        p_plus = jax.tree_util.tree_map(lambda x: x, params)
        bc = params["materials"].base_color
        p_plus["materials"] = params["materials"].replace(
            base_color=bc.at[0, ch].add(eps)
        )
        p_minus = dict(params)
        p_minus["materials"] = params["materials"].replace(
            base_color=bc.at[0, ch].add(-eps)
        )
        fd = (
            loss_value(p_plus, scene, o, d, px, py, target)
            - loss_value(p_minus, scene, o, d, px, py, target)
        ) / (2 * eps)
        np.testing.assert_allclose(g[0, ch], fd, rtol=0.05, atol=1e-5)


def test_emissive_gradient_finite_difference():
    scene, cam = tiny_scene()
    o, d, px, py, target = setup(scene, cam)
    params = extract_params(scene, ("materials",))
    _, grads = loss_and_grad(params, scene, o, d, px, py, jnp.uint32(0), target, CFG)
    g = np.asarray(grads["materials"].emissive)
    assert np.isfinite(g).all()
    # light material (index 1) emissive has nonzero gradient
    assert np.abs(g[1]).max() > 0

    eps = 1e-2
    em = params["materials"].emissive
    p_plus = dict(params)
    p_plus["materials"] = params["materials"].replace(emissive=em.at[1, 0].add(eps))
    p_minus = dict(params)
    p_minus["materials"] = params["materials"].replace(emissive=em.at[1, 0].add(-eps))
    fd = (
        loss_value(p_plus, scene, o, d, px, py, target)
        - loss_value(p_minus, scene, o, d, px, py, target)
    ) / (2 * eps)
    np.testing.assert_allclose(g[1, 0], fd, rtol=0.05, atol=1e-6)


def test_env_texel_gradients_flow():
    scene, cam = tiny_scene(with_env=True)
    o, d, px, py, target = setup(scene, cam)
    params = extract_params(scene, ("env_image",))
    loss, grads = loss_and_grad(params, scene, o, d, px, py, jnp.uint32(0), target, CFG)
    g = np.asarray(grads["env_image"])
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0
    # spot-check one bright texel against finite differences
    idx = np.unravel_index(np.argmax(np.abs(g)), g.shape)
    eps = 1e-2
    img = params["env_image"]
    fd = (
        loss_value({"env_image": img.at[idx].add(eps)}, scene, o, d, px, py, target)
        - loss_value({"env_image": img.at[idx].add(-eps)}, scene, o, d, px, py, target)
    ) / (2 * eps)
    np.testing.assert_allclose(g[idx], fd, rtol=0.1, atol=1e-6)


def test_vertex_position_gradients_flow():
    scene, cam = tiny_scene()
    o, d, px, py, target = setup(scene, cam)
    params = extract_params(scene, ("positions",))
    loss, grads = loss_and_grad(params, scene, o, d, px, py, jnp.uint32(0), target, CFG)
    g = np.asarray(grads["positions"])
    assert np.isfinite(g).all()
    assert np.abs(g).max() > 0


def test_refit_after_moving_geometry():
    scene, cam = tiny_scene()
    moved = scene.replace(
        mesh=scene.mesh.replace(positions=scene.mesh.positions + 0.25)
    )
    refit = refit_scene(moved)
    # bounds must cover the moved triangles again
    p = np.asarray(refit.mesh.positions)[np.asarray(refit.mesh.indices)]
    assert (np.asarray(refit.bvh.node_min[0]) <= p.min(axis=(0, 1)) + 1e-5).all()
    assert (np.asarray(refit.bvh.node_max[0]) >= p.max(axis=(0, 1)) - 1e-5).all()
    # lights still reference emissive triangles
    mat = np.asarray(refit.mesh.material_id)[np.asarray(refit.lights.tri_index)]
    em = np.asarray(refit.materials.emissive)[mat]
    assert (em != 0).any(axis=1).all()


def _loss_refit(positions, scene, o, d, px, py, target, cfg=CFG):
    """Loss after grafting perturbed positions AND refitting acceleration
    data.  Finite motion must refit: rendering perturbed vertices against
    the template BVH/trav self-shadows the surface on one side (shadow-ray
    origins land behind the stale geometry), which poisons FD quotients.
    The AD gradient assumes traversal consistent with geometry
    (infinitesimal motion), so this is the matching FD protocol."""
    from pnraytracing_tpu.render.integrator import render_rays

    s = refit_scene(apply_params(scene, {"positions": positions}))
    img = render_rays(s, o, d, px, py, jnp.uint32(0), cfg)
    return float(jnp.mean((img - target) ** 2))


def test_vertex_position_gradient_finite_difference():
    """FD check of d(loss)/d(vertex position): the autodiff gradient
    captures the smooth shading terms (hit distance, light geometry,
    normals); pixel rays here sit well inside the triangle so no visibility
    edge flips within eps.  Geometry terms: include/triangle.hpp:15-115."""
    scene, _ = tiny_scene()
    # zoom into the triangle interior: every pixel ray hits ~1 unit from
    # any edge, so a +-eps vertex move cannot flip a hit (the AD gradient
    # has no silhouette term — an edge flip would poison the FD quotient)
    cam = make_camera((0, -0.6, 4), (0, -0.6, 0), (0, 1, 0), 12.0, 1.0)
    o, d, px, py, target = setup(scene, cam)
    params = extract_params(scene, ("positions",))
    _, grads = loss_and_grad(params, scene, o, d, px, py, jnp.uint32(0),
                             target, CFG)
    g = np.asarray(grads["positions"])

    eps = 2e-3
    pos = params["positions"]
    checked = 0
    for v, ch in ((0, 2), (1, 2), (2, 0)):  # two z's and one x
        fd = (
            _loss_refit(pos.at[v, ch].add(eps), scene, o, d, px, py, target)
            - _loss_refit(pos.at[v, ch].add(-eps), scene, o, d, px, py,
                          target)
        ) / (2 * eps)
        if abs(fd) < 1e-7 and abs(g[v, ch]) < 1e-7:
            continue  # both zero: nothing to compare
        np.testing.assert_allclose(g[v, ch], fd, rtol=0.08, atol=1e-6)
        checked += 1
    assert checked >= 2, "FD signal too weak to validate anything"
