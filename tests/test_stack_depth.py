"""Traversal-stack capacity contract.

The reference hard-codes a 128-entry per-thread stack and trusts the builder
to never exceed it (ray_tracing.comp:431); here the scene builder records
the real tree depth (accel/bvh.py::flat_bvh_depth) and the integrator
refuses a RenderConfig whose ``stack_depth`` is too shallow — silent hit
corruption becomes a build/trace-time error.
"""

import numpy as np
import pytest

from pnraytracing_tpu.accel.bvh import build_bvh, flat_bvh_depth
from pnraytracing_tpu.core.camera import make_camera
from pnraytracing_tpu.core.config import RenderConfig
from pnraytracing_tpu.render.renderer import render_frame
from pnraytracing_tpu.scene.build import SceneBuilder


def _chain(k: int):
    """Hand-built flat pre-order BVH: a right-leaning chain of depth k
    (every internal node's left child is a leaf)."""
    right = []
    for i in range(k - 1):
        right.extend([len(right) + 2, -1])  # internal, then its left leaf
    right.append(-1)  # deepest leaf
    return np.asarray(right, np.int32)


def test_flat_depth_single_leaf():
    assert flat_bvh_depth(np.asarray([-1], np.int32)) == 1


def test_flat_depth_balanced():
    # root + two leaves
    assert flat_bvh_depth(np.asarray([2, -1, -1], np.int32)) == 2


def test_flat_depth_chain():
    for k in (2, 5, 17):
        rc = _chain(k)
        assert flat_bvh_depth(rc) == k


def _spiky_mesh(n: int):
    """Exponentially spaced slivers along x: SAH keeps peeling off the far
    outlier, producing a strongly unbalanced (deep) tree."""
    pos, idx = [], []
    for i in range(n):
        x = float(2.0**i)
        v = len(pos)
        pos += [(x, 0, 0), (x + 0.1, 0, 0.1), (x, 0.1, 0)]
        idx.append((v, v + 1, v + 2))
    return {
        "positions": np.asarray(pos, np.float32),
        "indices": np.asarray(idx, np.int32),
        "normals": np.tile(np.asarray([[0, 0, 1]], np.float32), (3 * n, 1)),
        "uvs": np.zeros((3 * n, 2), np.float32),
    }


def _deep_scene(n=24):
    b = SceneBuilder()
    b.add(_spiky_mesh(n), dict(base_color=(0.5, 0.5, 0.5)))
    return b.build(max_leaf_size=2, env_constant=(1.0, 1.0, 1.0))


def test_builder_records_depth():
    mesh = _spiky_mesh(24)
    built = build_bvh(mesh["positions"], mesh["indices"], max_leaf_size=2)
    d = built.max_depth
    # unbalanced by construction: much deeper than a perfect tree over
    # ceil(24/2) leaves (depth 5), bounded by one level per triangle
    assert d > 5
    assert d <= 25
    assert flat_bvh_depth(built.right_child) == d


def test_scene_carries_depth():
    scene = _deep_scene()
    assert scene.bvh_depth is not None and scene.bvh_depth > 5


def test_too_shallow_stack_raises():
    scene = _deep_scene()
    cam = make_camera((3, 3, 3), (0, 0, 0), (0, 1, 0), 45.0, 1.0)
    cfg = RenderConfig(width=4, height=4, max_depth=1,
                       stack_depth=max(2, scene.bvh_depth - 1))
    with pytest.raises(ValueError, match="stack_depth"):
        render_frame(scene, cam, cfg, 0)


def test_adequate_stack_renders():
    scene = _deep_scene()
    cam = make_camera((3, 3, 3), (0, 0, 0), (0, 1, 0), 45.0, 1.0)
    cfg = RenderConfig(width=4, height=4, max_depth=1,
                       stack_depth=scene.bvh_depth)
    img = render_frame(scene, cam, cfg, 0)
    assert np.all(np.isfinite(np.asarray(img)))
