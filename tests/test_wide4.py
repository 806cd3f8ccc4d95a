"""4-wide collect-then-test traversal vs the generic oracle."""

import dataclasses

import pytest

import jax.numpy as jnp
import numpy as np

from pnraytracing_tpu.accel.layout import pack_traversal_data
from pnraytracing_tpu.accel.traverse import any_hit, closest_hit
from pnraytracing_tpu.accel.traverse_packed import (
    any_hit_pop,
    closest_hit_pop,
)
from pnraytracing_tpu.accel.traverse_wide4 import (
    any_hit_wide4,
    closest_hit_wide4,
)
from pnraytracing_tpu.accel.wide4 import collapse_binary, pack_wide4
from tests.test_bvh import make_mesh_and_bvh, random_soup


def setup(num_tris=400, num_rays=512, seed=3):
    rng = np.random.default_rng(seed)
    positions, indices = random_soup(rng, num_tris)
    mesh, bvh, built = make_mesh_and_bvh(positions, indices)
    trav = pack_traversal_data(bvh, mesh)
    tri9 = np.asarray(mesh.positions)[np.asarray(mesh.indices)].reshape(-1, 9)
    w4 = pack_wide4(built, tri9)
    o = rng.uniform(-6, 6, size=(num_rays, 3)).astype(np.float32)
    d = rng.normal(size=(num_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_max = np.full((num_rays,), 1e7, np.float32)
    return (mesh, bvh, trav, w4, jnp.asarray(o), jnp.asarray(d),
            jnp.asarray(t_max), built)


def test_collapse_structure():
    *_, built = setup(120)
    nodes32, ls, lc, depth4 = collapse_binary(
        built.node_min, built.node_max, built.right_child, built.start,
        built.end,
    )
    # every leaf range appears exactly once and covers all triangles
    import numpy as np

    spans = sorted(zip(ls.tolist(), (ls + lc).tolist()))
    cover = []
    for s, e in spans:
        cover.extend(range(s, e))
    assert sorted(cover) == list(range(int(built.end.max())))
    assert depth4 >= 1
    # 4-wide depth should be about half the binary depth
    assert depth4 <= built.max_depth


def test_closest_hit_wide4_matches_oracle():
    mesh, bvh, trav, w4, o, d, t_max, _ = setup()
    a = closest_hit(bvh, mesh, o, d, t_max)
    b, overflow = closest_hit_wide4(w4, o, d, t_max,
                                    stack_depth=3 * w4.depth4 + 4)
    assert not bool(jnp.any(overflow)), "buffer too small for test scene"
    np.testing.assert_array_equal(np.asarray(a.tri), np.asarray(b.tri))
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    np.testing.assert_array_equal(np.asarray(a.b1), np.asarray(b.b1))
    np.testing.assert_array_equal(np.asarray(a.b2), np.asarray(b.b2))


def test_any_hit_wide4_matches_oracle():
    mesh, bvh, trav, w4, o, d, t_max, _ = setup(seed=9)
    short = jnp.asarray(np.full((o.shape[0],), 4.0, np.float32))
    a = any_hit(bvh, mesh, o, d, short)
    b, overflow = any_hit_wide4(w4, o, d, short,
                                stack_depth=3 * w4.depth4 + 4)
    assert not bool(jnp.any(overflow))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


@pytest.mark.slow
def test_overflow_fallback_exact():
    """A 2-slot buffer overflows constantly; the pop fallback must restore
    exact results."""
    mesh, bvh, trav, w4, o, d, t_max, _ = setup(seed=5)

    def fb(o2, d2, t2, m2):
        return closest_hit_pop(trav, o2, d2, t2, m2)

    a = closest_hit(bvh, mesh, o, d, t_max)
    b, overflow = closest_hit_wide4(
        w4, o, d, t_max, leaf_buffer=2, fallback=fb,
        stack_depth=3 * w4.depth4 + 4,
    )
    assert bool(jnp.any(overflow)), "expected overflow with 2-slot buffer"
    np.testing.assert_array_equal(np.asarray(a.tri), np.asarray(b.tri))
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))


@pytest.mark.slow
def test_wide4_full_render_matches_packed():
    import sys

    sys.path.insert(0, "tests")
    from test_render import CFG, small_scene

    from pnraytracing_tpu.render.renderer import render_frame

    scene, cam = small_scene()
    assert scene.trav is not None and scene.trav.w4 is not None
    cfg_a = dataclasses.replace(CFG, traversal="packed")
    cfg_b = dataclasses.replace(CFG, traversal="wide4")
    ia = np.asarray(render_frame(scene, cam, cfg_a, 0))
    ib = np.asarray(render_frame(scene, cam, cfg_b, 0))
    np.testing.assert_array_equal(ia, ib)


@pytest.mark.slow
def test_width8_matches_oracle():
    from pnraytracing_tpu.accel.wide4 import pack_wide4 as _pw

    mesh, bvh, trav, _, o, d, t_max, built = setup(seed=7)
    tri9 = np.asarray(mesh.positions)[np.asarray(mesh.indices)].reshape(-1, 9)
    w8 = _pw(built, tri9, width=8)
    assert w8.nodes32.shape[1] == 56
    a = closest_hit(bvh, mesh, o, d, t_max)
    b, overflow = closest_hit_wide4(
        w8, o, d, t_max, stack_depth=7 * w8.depth4 + 4)
    assert not bool(jnp.any(overflow))
    np.testing.assert_array_equal(np.asarray(a.tri), np.asarray(b.tri))
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    # 8-wide should be shallower than 4-wide
    _, _, _, d4 = __import__(
        "pnraytracing_tpu.accel.wide4", fromlist=["collapse_binary"]
    ).collapse_binary(built.node_min, built.node_max, built.right_child,
                      built.start, built.end)
    assert w8.depth4 <= d4
