"""Russian roulette and firefly-clamp options."""

import pytest

import dataclasses

import numpy as np

from pnraytracing_tpu.core.config import RenderConfig
from pnraytracing_tpu.render.renderer import render, render_frame
from tests.test_furnace import ENV_L, furnace_scene
from tests.test_render import CFG, small_scene


@pytest.mark.slow
def test_rr_unbiased_in_furnace():
    scene, cam = furnace_scene()
    base = RenderConfig(width=12, height=12, max_depth=6, sampler="hash",
                        clamp_radiance=False, mis="balanced")
    rr = dataclasses.replace(base, rr_start=2)
    img_rr = np.asarray(render(scene, cam.basis(), rr, spp=64))
    got = float(img_rr[3:9, 3:9].mean())
    np.testing.assert_allclose(got, ENV_L, rtol=0.06)


def test_rr_runs_on_small_scene():
    scene, cam = small_scene()
    cfg = dataclasses.replace(CFG, rr_start=1)
    img = np.asarray(render_frame(scene, cam, cfg, 0))
    assert np.isfinite(img).all()


def test_max_radiance_clamps_fireflies():
    scene, cam = small_scene()
    hot = dataclasses.replace(CFG, clamp_radiance=False)
    cold = dataclasses.replace(CFG, clamp_radiance=False, max_radiance=0.6)
    a = np.asarray(render_frame(scene, cam, hot, 3))
    b = np.asarray(render_frame(scene, cam, cold, 3))
    assert b.max() <= a.max() + 1e-6
    assert b.mean() <= a.mean() + 1e-6
    # emissive-view pixels (direct light) unaffected below the clamp
    assert np.isfinite(b).all()
