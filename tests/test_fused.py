"""Fused NEE shadow rays (one any-hit batch per bounce) must match
separate light/env occlusion calls exactly up to compiler rounding, in both live and
record/replay modes."""

import dataclasses

import pytest

import jax.numpy as jnp
import numpy as np

from pnraytracing_tpu.core.config import RenderConfig
from pnraytracing_tpu.render.integrator import (
    render_rays,
    render_rays_replay,
    trace_paths,
)
from tests.test_replay import assert_ulp_close, rays, small_scene

CFG = RenderConfig(width=16, height=16, max_depth=3, clamp_radiance=False)


def test_fused_shadows_bit_identical():
    scene, cam = small_scene(with_env=True)
    o, d, px, py = rays(CFG, cam)
    frame = jnp.uint32(2)
    sep = render_rays(scene, o, d, px, py, frame, CFG)
    fused = render_rays(
        scene, o, d, px, py, frame, dataclasses.replace(CFG, fuse_shadows=True)
    )
    assert_ulp_close(sep, fused)


@pytest.mark.slow
def test_fused_record_replay():
    scene, cam = small_scene(with_env=True)
    o, d, px, py = rays(CFG, cam)
    frame = jnp.uint32(7)
    cfg = dataclasses.replace(CFG, fuse_shadows=True)
    live = render_rays(scene, o, d, px, py, frame, cfg)
    recs = trace_paths(scene, o, d, px, py, frame, cfg)
    replay = render_rays_replay(scene, o, d, px, py, frame, cfg, recs)
    assert_ulp_close(live, replay)
