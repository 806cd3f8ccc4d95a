"""The scan-driven bounce loop (cfg.loop='scan', O(1) program size in
depth) must match the unrolled loop across feature combinations, in live,
record and replay modes."""

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

BASE = RenderConfig(width=16, height=16, max_depth=3, clamp_radiance=False)


def _pair(cfg, with_env=True, frame=3):
    scene, cam = small_scene(with_env=with_env)
    o, d, px, py = rays(cfg, cam)
    unroll = render_rays(scene, o, d, px, py, jnp.uint32(frame), cfg)
    scan = render_rays(
        scene, o, d, px, py, jnp.uint32(frame),
        dataclasses.replace(cfg, loop="scan"),
    )
    return scene, (o, d, px, py), unroll, scan


@pytest.mark.slow
def test_scan_matches_unroll_default():
    _, _, unroll, scan = _pair(BASE)
    assert_ulp_close(unroll, scan)


@pytest.mark.slow
def test_scan_matches_unroll_rr_sort_fuse():
    cfg = dataclasses.replace(
        BASE, max_depth=4, rr_start=1, compact_rays=True, sort_rays=True,
        fuse_shadows=True
    )
    _, _, unroll, scan = _pair(cfg)
    assert_ulp_close(unroll, scan)


@pytest.mark.slow
def test_scan_matches_unroll_hash_no_env():
    cfg = dataclasses.replace(BASE, sampler="hash", compact_rays=False)
    _, _, unroll, scan = _pair(cfg, with_env=False)
    assert_ulp_close(unroll, scan)


@pytest.mark.slow
def test_scan_record_replay_roundtrip():
    cfg = dataclasses.replace(BASE, loop="scan")
    scene, cam = small_scene(with_env=True)
    o, d, px, py = rays(cfg, cam)
    frame = jnp.uint32(9)
    live = render_rays(scene, o, d, px, py, frame, cfg)
    recs = trace_paths(scene, o, d, px, py, frame, cfg)
    replay = render_rays_replay(scene, o, d, px, py, frame, cfg, recs)
    assert_ulp_close(live, replay)
    # scan-mode records interchange with unroll-mode replay
    replay_unroll = render_rays_replay(
        scene, o, d, px, py, frame, dataclasses.replace(cfg, loop="unroll"),
        recs,
    )
    assert_ulp_close(live, replay_unroll)
