"""Golden-image regression: freezes the estimator's output on a small scene
so refactors (Pallas kernels, layout changes) are caught if they drift.

The golden is generated on first run (and should be committed); subsequent
runs compare against it.  Tolerance covers backend fastmath reassociation,
not estimator changes."""

import os

import numpy as np

from pnraytracing_tpu.core.config import RenderConfig
from pnraytracing_tpu.render.renderer import render_frame

GOLDEN_DIR = os.path.join(os.path.dirname(os.path.abspath(__file__)), "golden")


def checkpointed(name: str, img: np.ndarray, atol=3e-5) -> None:
    os.makedirs(GOLDEN_DIR, exist_ok=True)
    path = os.path.join(GOLDEN_DIR, name + ".npz")
    if not os.path.exists(path):
        np.savez_compressed(path, img=img)
        return
    want = np.load(path)["img"]
    np.testing.assert_allclose(img, want, atol=atol,
                               err_msg=f"golden drift in {name}")


def test_golden_small_scene_hash():
    from test_render import CFG, small_scene

    scene, cam = small_scene()
    img = np.asarray(render_frame(scene, cam, CFG, 0))
    checkpointed("small_scene_f0", img)
    img5 = np.asarray(render_frame(scene, cam, CFG, 5))
    checkpointed("small_scene_f5", img5)


def test_golden_sobol_env():
    from pnraytracing_tpu.io.hdr import procedural_sky
    from pnraytracing_tpu.scene import shapes
    from pnraytracing_tpu.scene.build import SceneBuilder
    from pnraytracing_tpu.scene.scenes import _camera

    b = SceneBuilder()
    b.add(shapes.icosphere(2), dict(base_color=(0.7, 0.6, 0.2), metallic=0.5,
                                    roughness=0.3), name="ball")
    b.add(shapes.quad(4.0), dict(base_color=(0.6, 0.6, 0.6), roughness=0.9),
          name="floor")
    scene = b.build(env_image=procedural_sky(32, 64))
    cam = _camera((0, 2, 4), (0, 0.5, 0), 45.0)
    cfg = RenderConfig(width=24, height=24, max_depth=3, sampler="sobol")
    img = np.asarray(render_frame(scene, cam.basis(), cfg, 0))
    checkpointed("sobol_env_f0", img)
