"""Wide-node traversal must agree with the generic/packed traversals.

The wide backend resolves leaves inline at the parent and reduces each
iteration's candidate set with an argmin, so traversal ORDER differs from
the packed loop — but closest hits (tri, t, barycentrics) and occlusion
results must be identical on non-degenerate geometry.
"""

import pytest

import jax.numpy as jnp
import numpy as np

from pnraytracing_tpu.accel.layout import (
    decode_leaf_info,
    pack_traversal_data,
    unpack_wide_rows,
)
from pnraytracing_tpu.accel.traverse import any_hit, closest_hit
from pnraytracing_tpu.accel.traverse_wide import any_hit_wide, closest_hit_wide
from tests.test_packed import setup


def test_wide_pack_structure():
    mesh, bvh, trav, *_ = setup(60)
    assert trav.nodes16 is not None
    n = int(trav.nodes16.shape[0])
    assert trav.nodes16.shape == (n, 16)
    lmin, lmax, rmin, rmax, li, ri, axis = unpack_wide_rows(trav.nodes16)
    right = np.asarray(bvh.right_child)
    internal = right >= 0
    start = np.asarray(bvh.start)
    count = np.asarray(bvh.end - bvh.start)
    li, ri = np.asarray(li), np.asarray(ri)
    for i in np.nonzero(internal)[0]:
        l, r = i + 1, right[i]
        # child bounds inlined
        np.testing.assert_array_equal(np.asarray(lmin)[i], np.asarray(bvh.node_min)[l])
        np.testing.assert_array_equal(np.asarray(rmax)[i], np.asarray(bvh.node_max)[r])
        for info, ch in ((li[i], l), (ri[i], r)):
            if right[ch] < 0:  # leaf child: encoded range
                s, c = decode_leaf_info(jnp.int32(info))
                assert int(s) == start[ch] and int(c) == count[ch]
            else:  # internal child: node id
                assert info == ch


def test_closest_hit_wide_identical():
    # same hits; t/barycentrics to float tolerance — the [R, 2L] batch shape
    # lets XLA fuse/reassociate the FMA chain differently (ULP-level)
    mesh, bvh, trav, o, d, t_max = setup()
    a = closest_hit(bvh, mesh, o, d, t_max)
    b = closest_hit_wide(trav, o, d, t_max)
    np.testing.assert_array_equal(np.asarray(a.tri), np.asarray(b.tri))
    np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t), rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(a.b1), np.asarray(b.b1), rtol=1e-4, atol=1e-6
    )
    np.testing.assert_allclose(
        np.asarray(a.b2), np.asarray(b.b2), rtol=1e-4, atol=1e-6
    )


@pytest.mark.slow
def test_closest_hit_wide_tiled_identical():
    mesh, bvh, trav, o, d, t_max = setup(seed=11)
    a = closest_hit(bvh, mesh, o, d, t_max)
    b = closest_hit_wide(trav, o, d, t_max, tile_size=128)
    np.testing.assert_array_equal(np.asarray(a.tri), np.asarray(b.tri))
    np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t), rtol=1e-5)


def test_any_hit_wide_identical():
    mesh, bvh, trav, o, d, t_max = setup(seed=9)
    short = jnp.asarray(np.full((o.shape[0],), 4.0, np.float32))
    a = any_hit(bvh, mesh, o, d, short)
    b = any_hit_wide(trav, o, d, short)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_wide_mask_respected():
    mesh, bvh, trav, o, d, t_max = setup()
    mask = jnp.asarray(np.arange(o.shape[0]) % 2 == 0)
    b = closest_hit_wide(trav, o, d, t_max, mask)
    assert (np.asarray(b.tri)[~np.asarray(mask)] == -1).all()


def test_wide_leaf_root():
    """Scenes of <= 2 triangles have a leaf root — the synthetic row 0 must
    still resolve hits."""
    import jax

    from pnraytracing_tpu.accel.bvh import build_bvh
    from pnraytracing_tpu.core.types import BVH, TriangleMesh

    positions = np.array(
        [[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32
    )
    indices = np.array([[0, 1, 2]], np.int32)
    built = build_bvh(positions, indices)
    mesh = TriangleMesh(
        positions=jnp.asarray(positions),
        normals=jnp.zeros((3, 3), jnp.float32),
        tangents=jnp.zeros((3, 3), jnp.float32),
        bitangents=jnp.zeros((3, 3), jnp.float32),
        uvs=jnp.zeros((3, 2), jnp.float32),
        indices=jnp.asarray(indices[built.order]),
        material_id=jnp.zeros((1,), jnp.int32),
        texture_id=jnp.full((1,), -1, jnp.int32),
        area=jnp.ones((1,), jnp.float32),
    )
    bvh = BVH(
        node_min=jnp.asarray(built.node_min),
        node_max=jnp.asarray(built.node_max),
        axis=jnp.asarray(built.axis),
        right_child=jnp.asarray(built.right_child),
        start=jnp.asarray(built.start),
        end=jnp.asarray(built.end),
    )
    trav = pack_traversal_data(bvh, mesh)
    o = jnp.asarray([[0.2, 0.2, 1.0], [5.0, 5.0, 1.0]], jnp.float32)
    d = jnp.asarray([[0.0, 0.0, -1.0], [0.0, 0.0, -1.0]], jnp.float32)
    t_max = jnp.full((2,), 1e7, jnp.float32)
    hit = closest_hit_wide(trav, o, d, t_max)
    assert int(hit.tri[0]) == 0 and int(hit.tri[1]) == -1
    assert np.isclose(float(hit.t[0]), 1.0)
    occ = any_hit_wide(trav, o, d, t_max)
    assert bool(occ[0]) and not bool(occ[1])
