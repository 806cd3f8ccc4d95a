"""Real multi-process test of the multi-host path (VERDICT r2 item 7):
two OS processes x 4 CPU devices each form one 8-device mesh through
``jax.distributed``; the sharded render must match the single-process
render bit-for-bit (rays are independent; sharding must not change
anything)."""

import pytest

import os
import socket
import subprocess
import sys

import numpy as np

from pnraytracing_tpu.core.camera import make_camera
from pnraytracing_tpu.core.config import RenderConfig
from pnraytracing_tpu.scene import shapes
from pnraytracing_tpu.scene.build import SceneBuilder
from pnraytracing_tpu.scene.transform import compose, rotate, translate

CFG = RenderConfig(width=32, height=32, max_depth=2, sampler="hash")


def scene_and_camera():
    """Deterministic scene every process rebuilds identically."""
    b = SceneBuilder()
    b.add(shapes.cube(0.8), dict(base_color=(0.7, 0.3, 0.3), roughness=0.5),
          name="cube", transform=translate(0, 0.8, 0))
    b.add(shapes.quad(6.0), dict(base_color=(0.7, 0.7, 0.7), roughness=0.9),
          name="floor")
    b.add(shapes.quad(1.0), dict(emissive=(15.0, 15.0, 15.0)), name="light",
          transform=compose(translate(0, 5.0, 0), rotate(180, (0, 0, 1))))
    scene = b.build(env_constant=(0.2, 0.25, 0.3))
    cam = make_camera((3.47, 3.02, 3.55), (0.013, 0.8, 0.017), (0, 1, 0),
                      45.0, 1.0)
    return scene, cam


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_render_matches_single_process(tmp_path):
    port = _free_port()
    out = tmp_path / "mh_img.npy"
    root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ, PYTHONPATH=root)
    worker = os.path.join(root, "tests", "multihost_worker.py")
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(port), str(pid), str(out)],
            env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT,
        )
        for pid in range(2)
    ]
    logs = []
    for p in procs:
        stdout, _ = p.communicate(timeout=600)
        logs.append(stdout.decode(errors="replace"))
    for p, log in zip(procs, logs):
        assert p.returncode == 0, f"worker failed:\n{log[-4000:]}"
    multi = np.load(out)

    # single-process reference on the in-process 8-device CPU mesh
    import jax

    from pnraytracing_tpu.parallel.mesh import (
        make_device_mesh,
        render_frame_sharded,
    )
    from pnraytracing_tpu.render.renderer import render_frame

    scene, cam = scene_and_camera()
    ref = np.asarray(render_frame(scene, cam, CFG, 0))
    assert multi.shape == ref.shape
    np.testing.assert_array_equal(multi, ref)

    # and the in-process sharded path agrees too (same code, local mesh)
    mesh = make_device_mesh()
    local = np.asarray(render_frame_sharded(scene, cam, CFG, 0, mesh))
    np.testing.assert_array_equal(local, ref)
