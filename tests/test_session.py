"""Interactive session semantics (main.cpp:589-601) and checkpointing."""

import numpy as np
import pytest

from pnraytracing_tpu.core.config import RenderConfig
from pnraytracing_tpu.render.session import RenderSession
from pnraytracing_tpu.scene import shapes
from pnraytracing_tpu.scene.build import SceneBuilder
from pnraytracing_tpu.scene.scenes import _camera
from pnraytracing_tpu.scene.transform import compose, rotate, translate

CFG = RenderConfig(width=16, height=16, max_depth=2, sampler="hash")


def make_session():
    b = SceneBuilder()
    b.add(shapes.cube(0.8), dict(base_color=(0.7, 0.3, 0.3), roughness=0.5),
          name="cube", transform=translate(0, 0.8, 0))
    b.add(shapes.quad(half=1.0), dict(emissive=(10.0, 10.0, 10.0)), name="light",
          transform=compose(translate(0, 4, 0), rotate(180, (0, 0, 1))))
    scene = b.build(env_constant=(0.2, 0.2, 0.25))
    cam = _camera((3, 3, 3), (0, 0.8, 0), 45.0)
    return RenderSession(scene, cam, CFG)


@pytest.mark.slow
def test_progressive_accumulation_advances():
    s = make_session()
    s.step()
    s.step()
    assert int(s.accum.count) == 2


def test_interaction_resets_and_previews():
    s = make_session()
    s.step()
    s.step()
    s.orbit(10, 5)
    assert int(s.accum.count) == 0  # reset (main.cpp:596)
    s.step()  # preview frame: does not accumulate
    assert int(s.accum.count) == 0
    s.step()  # converged mode resumes
    assert int(s.accum.count) == 1


def test_material_edit_patches_scene():
    s = make_session()
    s.step()
    s.edit_material(0, base_color=(0.1, 0.9, 0.1), roughness=0.2)
    assert int(s.accum.count) == 0
    np.testing.assert_allclose(
        np.asarray(s.scene.materials.base_color[0]), [0.1, 0.9, 0.1]
    )
    np.testing.assert_allclose(float(s.scene.materials.roughness[0]), 0.2)
    s.step()


def test_checkpoint_roundtrip(tmp_path):
    s = make_session()
    s.step()
    s.step()
    img_before = np.asarray(s.accum.resolve())
    path = str(tmp_path / "ckpt.npz")
    s.save(path)

    s2 = make_session()
    s2.load(path)
    assert int(s2.accum.count) == 2
    np.testing.assert_allclose(np.asarray(s2.accum.resolve()), img_before)
    # stepping after restore continues the same stream
    s.step()
    s2.step()
    np.testing.assert_allclose(
        np.asarray(s.accum.resolve()), np.asarray(s2.accum.resolve()), atol=1e-6
    )


def test_stats_populated():
    s = make_session()
    s.step()
    assert s.stats.frames == 1
    assert s.stats.last_frame_ms > 0
    assert s.stats.rays_per_s > 0
