"""Full-frame integration: traversal='pallas' must render the same image
as the XLA backends (up to Mosaic/interpreter FMA drift in hit t values,
which perturbs shading inputs at the ~1e-6 level)."""

import numpy as np
import dataclasses

import pytest

import jax

from pnraytracing_tpu.core.config import RenderConfig
from pnraytracing_tpu.render.renderer import render_frame
from pnraytracing_tpu.scene.scenes import config2_teapot


@pytest.mark.slow
def test_render_pallas_matches_packed():
    cfg = RenderConfig(width=48, height=48, max_depth=2, traversal="packed")
    scene, cam_state = config2_teapot()
    cam_state.aspect = 1.0
    camera = cam_state.basis()
    scene = jax.device_put(scene)
    a = np.asarray(render_frame(scene, camera, cfg, 0))
    b = np.asarray(render_frame(
        scene, camera, dataclasses.replace(cfg, traversal="pallas"), 0))
    # identical hit ids -> identical sampling decisions; only t-derived
    # shading inputs can drift by FMA rounding
    np.testing.assert_allclose(a, b, atol=2e-4)
    assert np.mean(np.abs(a - b)) < 1e-5
