"""Trace/replay split: the recorded-traversal replay must reproduce the live
integrator exactly up to compiler rounding, and the replay-based gradient step must match the
live gradient step (it is the same estimator with traversal hoisted out of
the differentiated graph)."""

import pytest

import jax
import jax.numpy as jnp
import numpy as np

from pnraytracing_tpu.core.camera import camera_rays, make_camera
from pnraytracing_tpu.core.config import RenderConfig
from pnraytracing_tpu.diff.grad import (
    extract_params,
    loss_and_grad,
    loss_and_grad_replay,
)
from pnraytracing_tpu.io.hdr import procedural_sky
from pnraytracing_tpu.render.integrator import (
    render_rays,
    render_rays_replay,
    trace_paths,
)
from pnraytracing_tpu.render.renderer import pixel_coords
from pnraytracing_tpu.scene import shapes
from pnraytracing_tpu.scene.build import SceneBuilder
from pnraytracing_tpu.scene.transform import compose, rotate, translate


def assert_ulp_close(a, b):
    """Replay reproduces the frame exactly up to compiler rounding: the
    live and replay graphs fuse differently in XLA, so FMA contraction can
    shift a handful of lanes by an ulp.  Require near-total exact equality
    and <=1e-6 absolute error everywhere."""
    a = np.asarray(a)
    b = np.asarray(b)
    np.testing.assert_allclose(a, b, rtol=2e-6, atol=2e-6)
    # the component-layout port widened where XLA contracts FMAs, so more
    # lanes sit an ulp apart between the two graphs; the tight allclose
    # above is the correctness bound.  Observed differing fraction: a few
    # percent post-V3, ~17% after round 5 moved the coherence sort into
    # the middle of the live bounce body (live fuses around the permute,
    # replay has none — more ops sit at different fusion boundaries).
    # Bound it just above the observed level so a future SYSTEMATIC
    # replay divergence (which the allclose alone could mask at small
    # magnitudes) still trips.
    frac_differing = float((a != b).mean())
    assert frac_differing < 0.25, f"{frac_differing:.4%} of values differ"


def small_scene(with_env=True):
    b = SceneBuilder()
    b.add(shapes.icosphere(2, radius=1.0),
          dict(base_color=(0.7, 0.3, 0.2), roughness=0.4, metallic=0.3),
          name="ball")
    b.add(shapes.quad(half=4.0), dict(base_color=(0.6, 0.6, 0.6)),
          name="floor", transform=translate(0, -1.0, 0))
    b.add(shapes.quad(half=0.7), dict(emissive=(6.0, 6.0, 6.0)), name="light",
          transform=compose(translate(0, 3, 1), rotate(180, (0, 0, 1))))
    scene = b.build(
        env_image=procedural_sky(16, 32) if with_env else None,
        env_constant=None if with_env else (0.25, 0.25, 0.3),
    )
    cam = make_camera((0, 1, 4), (0, 0, 0), (0, 1, 0), 50.0, 1.0)
    return scene, cam


def rays(cfg, cam):
    px, py = pixel_coords(cfg)
    o, d, _ = camera_rays(cam, cfg.width, cfg.height)
    return o, d, px, py


@pytest.mark.slow
def test_replay_forward_bit_identical():
    # compaction ON in the live/trace pass; replay skips it — still exact
    cfg = RenderConfig(width=16, height=16, max_depth=3, compact_rays=True,
                       clamp_radiance=False)
    scene, cam = small_scene(with_env=True)
    o, d, px, py = rays(cfg, cam)
    frame = jnp.uint32(5)
    live = render_rays(scene, o, d, px, py, frame, cfg)
    recs = trace_paths(scene, o, d, px, py, frame, cfg)
    replay = render_rays_replay(scene, o, d, px, py, frame, cfg, recs)
    assert_ulp_close(live, replay)


@pytest.mark.slow
def test_replay_forward_bit_identical_no_env_rr():
    cfg = RenderConfig(width=16, height=16, max_depth=4, rr_start=1,
                       sampler="hash", clamp_radiance=False)
    scene, cam = small_scene(with_env=False)
    o, d, px, py = rays(cfg, cam)
    frame = jnp.uint32(0)
    live = render_rays(scene, o, d, px, py, frame, cfg)
    recs = trace_paths(scene, o, d, px, py, frame, cfg)
    assert recs.env_occ is None
    replay = render_rays_replay(scene, o, d, px, py, frame, cfg, recs)
    assert_ulp_close(live, replay)


@pytest.mark.slow
def test_replay_graph_drops_traversal_loops():
    # the replay graph may keep searchsorted's log-sized bisection loops,
    # but every BVH-traversal while loop (2 per bounce + 1 primary in the
    # live graph) must be gone
    cfg = RenderConfig(width=8, height=8, max_depth=2, clamp_radiance=False)
    scene, cam = small_scene(with_env=True)
    o, d, px, py = rays(cfg, cam)
    frame = jnp.uint32(0)
    recs = trace_paths(scene, o, d, px, py, frame, cfg)

    def n_whiles(text):
        return text.count("stablehlo.while")

    live = jax.jit(
        lambda s: render_rays(s, o, d, px, py, frame, cfg)
    ).lower(scene).as_text()
    replay = jax.jit(
        lambda s, r: render_rays_replay(s, o, d, px, py, frame, cfg, r)
    ).lower(scene, recs).as_text()
    # live: traversal loops + searchsorted loops; replay: searchsorted only
    assert n_whiles(replay) < n_whiles(live)


@pytest.mark.slow
def test_replay_gradients_match_live():
    cfg = RenderConfig(width=12, height=12, max_depth=2, sampler="hash",
                       clamp_radiance=False)
    scene, cam = small_scene(with_env=True)
    o, d, px, py = rays(cfg, cam)
    params = extract_params(scene, ("materials", "env_image"))
    target = jnp.full((cfg.num_pixels, 3), 0.2, jnp.float32)
    for spp in (1, 2):
        l0, g0 = loss_and_grad(
            params, scene, o, d, px, py, jnp.uint32(3), target, cfg, spp=spp
        )
        l1, g1 = loss_and_grad_replay(
            params, scene, o, d, px, py, jnp.uint32(3), target, cfg, spp=spp
        )
        np.testing.assert_allclose(float(l0), float(l1), rtol=1e-6)
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-7
            ),
            g0, g1,
        )
