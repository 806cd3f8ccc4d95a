"""Failure-detection/recovery subsystem (SURVEY §5; VERDICT r2 'partial').

Device loss is simulated by raising exceptions with the observed worker
signatures; the loop must classify, recover, re-upload and resume without
losing accumulated samples.
"""

import numpy as np
import pytest

from pnraytracing_tpu.core.camera import make_camera
from pnraytracing_tpu.core.config import RenderConfig
from pnraytracing_tpu.utils import resilience
from pnraytracing_tpu.utils.resilience import (
    ResilientRenderLoop,
    is_device_loss,
    run_resilient,
)


class FakeLoss(Exception):
    pass


FakeLoss.__name__ = "JaxRuntimeError"


def test_classification():
    assert is_device_loss(FakeLoss("UNAVAILABLE: TPU worker process "
                                   "crashed or restarted"))
    assert is_device_loss(FakeLoss("FAILED_PRECONDITION: TPU backend"))
    assert not is_device_loss(FakeLoss("INVALID_ARGUMENT: shapes"))
    assert not is_device_loss(ValueError("UNAVAILABLE"))  # wrong type


def test_run_resilient_retries_and_reuploads(monkeypatch):
    monkeypatch.setattr(resilience, "wait_for_device", lambda **kw: True)
    calls = {"n": 0, "scenes": []}

    def step(scene=None):
        calls["n"] += 1
        calls["scenes"].append(scene)
        if calls["n"] == 1:
            raise FakeLoss("UNAVAILABLE: TPU worker process crashed")
        return 42

    tree = {"a": np.arange(3, dtype=np.float32)}
    out = run_resilient(step, reupload={"scene": tree})
    assert out == 42
    assert calls["n"] == 2
    # second call received a re-uploaded (fresh) pytree with equal values
    np.testing.assert_array_equal(np.asarray(calls["scenes"][1]["a"]),
                                  tree["a"])


def test_run_resilient_propagates_programming_errors():
    def step():
        raise ValueError("bad shapes")

    with pytest.raises(ValueError):
        run_resilient(step)


def test_render_loop_survives_mid_run_loss(monkeypatch):
    import sys

    sys.path.insert(0, "tests")
    from test_render import small_scene

    monkeypatch.setattr(resilience, "wait_for_device", lambda **kw: True)
    scene, cam = small_scene()
    cfg = RenderConfig(width=16, height=16, max_depth=1, sampler="hash")
    loop = ResilientRenderLoop(scene, cam, cfg)

    # fail exactly once, on the 3rd sample's first attempt
    real = loop._render_one
    state = {"armed": True}

    def flaky(frame, scn):
        if frame == 2 and state["armed"]:
            state["armed"] = False
            raise FakeLoss("UNAVAILABLE: TPU worker process crashed")
        return real(frame, scn)

    loop._render_one = flaky
    img = loop.render(4)
    assert loop.count == 4
    assert np.isfinite(img).all()

    # reference: uninterrupted loop, same frames -> identical average
    ref = ResilientRenderLoop(scene, cam, cfg)
    ref_img = ref.render(4)
    np.testing.assert_allclose(img, ref_img, atol=1e-6)
