"""End-to-end inverse rendering: recover a material color by gradient
descent through the renderer (BASELINE config 5's differentiable
optimization gate, shrunk to CPU scale)."""

import pytest

import numpy as np

from pnraytracing_tpu.core.config import RenderConfig
from pnraytracing_tpu.diff.grad import adam_optimize
from pnraytracing_tpu.render.renderer import render
from pnraytracing_tpu.scene import shapes
from pnraytracing_tpu.scene.build import SceneBuilder
from pnraytracing_tpu.scene.scenes import _camera
from pnraytracing_tpu.scene.transform import translate

CFG = RenderConfig(width=16, height=16, max_depth=2, sampler="hash",
                   clamp_radiance=True)


def build(color):
    b = SceneBuilder()
    b.add(shapes.icosphere(2), dict(base_color=color, roughness=0.6),
          name="ball", transform=translate(0, 1.0, 0))
    b.add(shapes.quad(6.0), dict(base_color=(0.6, 0.6, 0.6), roughness=0.9),
          name="floor")
    return b.build(env_constant=(0.85, 0.85, 0.85))


@pytest.mark.slow
def test_material_recovery():
    cam = _camera((3.2, 2.6, 3.2), (0, 0.9, 0), 45.0).basis()
    true_c = np.array([0.2, 0.5, 0.75])
    target = render(build(tuple(true_c)), cam, CFG, spp=8)
    scene, losses = adam_optimize(
        build((0.75, 0.3, 0.2)), cam, CFG, target,
        steps=60, lr=0.06, spp_per_step=4,
    )
    assert not any(np.isnan(l) for l in losses), "NaN in optimization"
    # the dual-buffer loss sits on a floor set by the (noisy) target —
    # (mean - target)^2 includes Var(target)/spp — so at this tiny size only
    # the trend is checkable; the recovered color below is the real gate
    assert np.mean(losses[-10:]) < np.mean(losses[:5])
    got = np.asarray(scene.materials.base_color[0])
    # channel ordering must be recovered; values within a loose band
    assert got[2] > got[1] > got[0]
    np.testing.assert_allclose(got, true_c, atol=0.2)
    # untouched floor material must not drift
    floor = np.asarray(scene.materials.base_color[1])
    np.testing.assert_allclose(floor, 0.6, atol=0.1)


def test_unconstrained_params_cannot_nan_forward():
    """Out-of-domain material values (e.g. anisotropic > 1.11 where
    sqrt(1 - 0.9a) would be NaN) are sanitized at fetch time."""
    import jax.numpy as jnp

    cam = _camera((3.2, 2.6, 3.2), (0, 0.9, 0), 45.0).basis()
    scene = build((0.5, 0.5, 0.5))
    mats = scene.materials
    scene = scene.replace(materials=mats.replace(
        anisotropic=jnp.full_like(mats.anisotropic, 5.0),
        metallic=jnp.full_like(mats.metallic, -2.0),
        roughness=jnp.full_like(mats.roughness, 7.0),
    ))
    img = np.asarray(render(scene, cam, CFG, spp=1))
    assert np.isfinite(img).all()


@pytest.mark.slow
def test_geometry_recovery_translation():
    """Recover an in-plane triangle translation by gradient descent with
    refit_scene in the loop (SURVEY §4 / VERDICT r2 item 5).

    Protocol notes (each choice is load-bearing):
    * in-plane motion — hit points stay on the triangle's plane, so no
      shadow/visibility state flips; the loss is the smooth
      texture-registration signal AD actually models (path-replay has no
      silhouette term, like the estimator it differentiates);
    * resample=False (common random numbers) — target and steps share
      frame seeds, so sampling noise cancels exactly at the optimum
      instead of burying the ~1e-4 signal;
    * grad_mask — pins the light geometry: adam's per-coordinate
      normalization would otherwise walk near-zero-gradient vertices at
      full lr.
    """
    import jax.numpy as jnp

    from pnraytracing_tpu.core.camera import make_camera
    from pnraytracing_tpu.diff.grad import adam_optimize, refit_scene
    from pnraytracing_tpu.scene.transform import compose, rotate

    def build_tri():
        h = w = 16
        u = np.linspace(0.1, 0.9, w)[None, :, None]
        v = np.linspace(0.1, 0.9, h)[:, None, None]
        tex = np.concatenate([
            np.broadcast_to(u, (h, w, 1)),
            np.broadcast_to(v, (h, w, 1)),
            np.full((h, w, 1), 0.5),
        ], -1).astype(np.float32)
        b = SceneBuilder()
        b.add(shapes.triangle((-2, -2, 0), (2, -2, 0), (0, 2, 0)),
              dict(base_color=(1, 1, 1), roughness=0.9), name="tri",
              texture=tex)
        b.add(shapes.quad(half=0.7), dict(emissive=(8.0, 8.0, 8.0)),
              name="light",
              transform=compose(translate(0, 3, 2), rotate(180, (0, 0, 1))))
        return b.build(env_constant=(0.3, 0.3, 0.35))

    cfg = RenderConfig(width=12, height=12, max_depth=1, sampler="hash",
                       clamp_radiance=False)
    cam = make_camera((0, -0.6, 4), (0, -0.6, 0), (0, 1, 0), 16.0, 1.0)
    target = render(build_tri(), cam, cfg, spp=4, start_frame=0)

    scene0 = build_tri()
    pos = np.asarray(scene0.mesh.positions).copy()
    true_pos = pos[:3].copy()
    pos[:3, 0] += 0.08
    pos[:3, 1] -= 0.06
    scene0 = refit_scene(
        scene0.replace(mesh=scene0.mesh.replace(positions=jnp.asarray(pos)))
    )
    mask = jnp.zeros((len(pos), 3)).at[:3, :2].set(1.0)
    out, losses = adam_optimize(
        scene0, cam, cfg, target, keys=("positions",), steps=80, lr=0.004,
        spp_per_step=4, resample=False, grad_mask={"positions": mask},
    )
    assert not any(np.isnan(l) for l in losses)
    assert losses[-1] < losses[0] * 0.01, f"loss did not collapse: {losses[::20]}"
    err0 = np.abs(pos[:3] - true_pos).max()
    err1 = np.abs(np.asarray(out.mesh.positions)[:3] - true_pos).max()
    assert err1 < err0 * 0.1, f"translation not recovered: {err0} -> {err1}"
