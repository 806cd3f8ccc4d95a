"""Packed traversal layout must be bit-equivalent to the generic one."""

import pytest

import jax.numpy as jnp
import numpy as np

from pnraytracing_tpu.accel.layout import pack_traversal_data, unpack_node_rows
from pnraytracing_tpu.accel.traverse import any_hit, closest_hit
from pnraytracing_tpu.accel.traverse_packed import any_hit_packed, closest_hit_packed
from tests.test_bvh import make_mesh_and_bvh, random_soup


def setup(num_tris=400, num_rays=512, seed=3):
    rng = np.random.default_rng(seed)
    positions, indices = random_soup(rng, num_tris)
    mesh, bvh, built = make_mesh_and_bvh(positions, indices)
    trav = pack_traversal_data(bvh, mesh)
    o = rng.uniform(-6, 6, size=(num_rays, 3)).astype(np.float32)
    d = rng.normal(size=(num_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_max = np.full((num_rays,), 1e7, np.float32)
    return mesh, bvh, trav, jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max)


def test_pack_roundtrip():
    mesh, bvh, trav, *_ = setup(50)
    nmin, nmax, right, start, count, axis = unpack_node_rows(trav.nodes8)
    np.testing.assert_array_equal(np.asarray(nmin), np.asarray(bvh.node_min))
    np.testing.assert_array_equal(np.asarray(nmax), np.asarray(bvh.node_max))
    np.testing.assert_array_equal(np.asarray(right), np.asarray(bvh.right_child))
    np.testing.assert_array_equal(np.asarray(start), np.asarray(bvh.start))
    # the count field is only meaningful (and only used) for leaves;
    # internal ranges are clamped into the 4-bit field
    leaves = np.asarray(bvh.right_child) == -1
    np.testing.assert_array_equal(
        np.asarray(count)[leaves], np.asarray(bvh.end - bvh.start)[leaves]
    )
    internal = np.asarray(bvh.right_child) >= 0
    np.testing.assert_array_equal(
        np.asarray(axis)[internal], np.asarray(bvh.axis)[internal]
    )
    # tri9 rows are the gathered corner positions
    p = np.asarray(mesh.positions)[np.asarray(mesh.indices)]
    np.testing.assert_array_equal(np.asarray(trav.tri9), p.reshape(len(p), 9))


def test_closest_hit_packed_identical():
    mesh, bvh, trav, o, d, t_max = setup()
    a = closest_hit(bvh, mesh, o, d, t_max)
    b = closest_hit_packed(trav, o, d, t_max)
    np.testing.assert_array_equal(np.asarray(a.tri), np.asarray(b.tri))
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    np.testing.assert_array_equal(np.asarray(a.b1), np.asarray(b.b1))
    np.testing.assert_array_equal(np.asarray(a.b2), np.asarray(b.b2))


def test_any_hit_packed_identical():
    mesh, bvh, trav, o, d, t_max = setup(seed=9)
    short = jnp.asarray(np.full((o.shape[0],), 4.0, np.float32))
    a = any_hit(bvh, mesh, o, d, short)
    b = any_hit_packed(trav, o, d, short)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_mask_respected():
    mesh, bvh, trav, o, d, t_max = setup()
    mask = jnp.asarray(np.arange(o.shape[0]) % 2 == 0)
    b = closest_hit_packed(trav, o, d, t_max, mask)
    assert (np.asarray(b.tri)[~np.asarray(mask)] == -1).all()


def test_scene_carries_packed_layout():
    from pnraytracing_tpu.scene import shapes
    from pnraytracing_tpu.scene.build import SceneBuilder

    b = SceneBuilder()
    b.add(shapes.cube(), dict(), name="c")
    scene = b.build()
    assert scene.trav is not None
    # a flat BVH whose single leaf exceeds the 4-bit count field must fall
    # back to the generic traversal
    scene_flat = SceneBuilder().add(shapes.icosphere(2), dict(), name="s").build(
        flat_bvh=True
    )
    assert scene_flat.trav is None


def test_layout_topology_roundtrip_extremes():
    """The arithmetic float encoding must round-trip topology exactly at
    its documented bounds (no bitcasts: values must survive any
    NaN-canonicalizing data movement by construction)."""
    import jax.numpy as jnp
    import numpy as np

    from pnraytracing_tpu.accel import layout as L
    from pnraytracing_tpu.core.types import BVH

    n = 7
    rc = jnp.asarray([1, -1, L.MAX_PACKED_NODES - 1, 5, -1, 2, 3], jnp.int32)
    axis = jnp.asarray([0, -1, 2, 1, -1, 0, 2], jnp.int32)
    start = jnp.asarray(
        [0, L.MAX_PACKED_TRIS - 1, 7, 9, 2, 4, 6], jnp.int32
    )
    count = jnp.asarray([0, L.MAX_PACKED_LEAF, 3, 1, 15, 0, 2], jnp.int32)
    bvh = BVH(
        node_min=jnp.zeros((n, 3), jnp.float32),
        node_max=jnp.ones((n, 3), jnp.float32),
        axis=axis,
        right_child=rc,
        start=start,
        end=start + count,
    )
    from pnraytracing_tpu.core.types import TriangleMesh

    mesh = TriangleMesh(
        positions=jnp.zeros((3, 3), jnp.float32),
        normals=jnp.zeros((3, 3), jnp.float32),
        tangents=jnp.zeros((3, 3), jnp.float32),
        bitangents=jnp.zeros((3, 3), jnp.float32),
        uvs=jnp.zeros((3, 2), jnp.float32),
        indices=jnp.zeros((1, 3), jnp.int32),
        material_id=jnp.zeros((1,), jnp.int32),
        texture_id=jnp.zeros((1,), jnp.int32),
        area=jnp.ones((1,), jnp.float32),
    )
    trav = L.pack_traversal_data(bvh, mesh)
    _, _, right_d, start_d, count_d, axis_d = L.unpack_node_rows(trav.nodes8)
    np.testing.assert_array_equal(np.asarray(right_d), np.asarray(rc))
    np.testing.assert_array_equal(np.asarray(start_d), np.asarray(start))
    np.testing.assert_array_equal(np.asarray(count_d), np.asarray(count))
    internal = np.asarray(rc) >= 0
    np.testing.assert_array_equal(
        np.asarray(axis_d)[internal], np.maximum(np.asarray(axis), 0)[internal]
    )
    # every f32 the encoding can emit is a normal finite number
    assert np.isfinite(np.asarray(trav.nodes8)).all()


def test_wide_leaf_info_roundtrip():
    import numpy as np
    import jax.numpy as jnp

    from pnraytracing_tpu.accel import layout as L

    start = jnp.asarray([0, 5, L.MAX_PACKED_TRIS - 1], jnp.int32)
    count = jnp.asarray([1, L.MAX_PACKED_LEAF, 3], jnp.int32)
    info = -(start * 16 + count) - 1
    f = info.astype(jnp.int32).astype(jnp.float32)
    assert np.isfinite(np.asarray(f)).all()
    s2, c2 = L.decode_leaf_info(f.astype(jnp.int32))
    np.testing.assert_array_equal(np.asarray(s2), np.asarray(start))
    np.testing.assert_array_equal(np.asarray(c2), np.asarray(count))


@pytest.mark.slow
def test_pop_traversal_matches_packed():
    """The pop-test loop must produce identical hits to the push-test
    loop (same tests, different order; strict t < t_best keeps winners
    deterministic for distinct t)."""
    import dataclasses

    import jax.numpy as jnp
    import numpy as np

    from pnraytracing_tpu.core.config import RenderConfig
    from pnraytracing_tpu.render.integrator import render_rays
    from tests.test_replay import rays, small_scene

    cfg = RenderConfig(width=16, height=16, max_depth=3, clamp_radiance=False)
    scene, cam = small_scene(with_env=True)
    o, d, px, py = rays(cfg, cam)
    a = render_rays(scene, o, d, px, py, jnp.uint32(1), cfg)
    b = render_rays(
        scene, o, d, px, py, jnp.uint32(1),
        dataclasses.replace(cfg, traversal="pop"),
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
