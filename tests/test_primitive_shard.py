"""Primitive-sharded scene placement (SURVEY §2.3 "large scene" branch):
the triangle set partitioned across the 8-device mesh, per-device
sub-BVH walks combined with pmin/psum — must reproduce the single-BVH
closest hit / occlusion over the full scene."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnraytracing_tpu.accel.traverse import any_hit, closest_hit
from pnraytracing_tpu.accel.bvh import build_bvh
from pnraytracing_tpu.core.types import BVH, TriangleMesh
from pnraytracing_tpu.parallel.mesh import make_device_mesh
from pnraytracing_tpu.parallel.primitive import (
    build_primitive_shards,
    primitive_sharded_any_hit,
    primitive_sharded_closest_hit,
    put_shards,
)


def _soup(n_tris=900, seed=7):
    rng = np.random.default_rng(seed)
    centers = rng.uniform(-3, 3, size=(n_tris, 3)).astype(np.float32)
    corners = (centers[:, None, :]
               + rng.normal(scale=0.25, size=(n_tris, 3, 3))
               ).astype(np.float32)
    positions = corners.reshape(-1, 3)
    indices = np.arange(n_tris * 3, dtype=np.int32).reshape(n_tris, 3)
    return positions, indices


def _rays(n=2048, seed=3):
    rng = np.random.default_rng(seed)
    o = rng.uniform(-6, 6, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def _full_reference(positions, indices, o, d, t_max):
    built = build_bvh(positions, indices, max_leaf_size=4)
    order = np.asarray(built.order)
    bvh = BVH(
        node_min=jnp.asarray(built.node_min),
        node_max=jnp.asarray(built.node_max),
        axis=jnp.asarray(built.axis),
        right_child=jnp.asarray(built.right_child),
        start=jnp.asarray(built.start),
        end=jnp.asarray(built.end),
    )
    idx_r = indices[order]
    mesh_obj = TriangleMesh(
        positions=jnp.asarray(positions),
        normals=jnp.zeros((len(positions), 3), jnp.float32),
        tangents=jnp.zeros((len(positions), 3), jnp.float32),
        bitangents=jnp.zeros((len(positions), 3), jnp.float32),
        uvs=jnp.zeros((len(positions), 2), jnp.float32),
        indices=jnp.asarray(idx_r),
        material_id=jnp.zeros((len(indices),), jnp.int32),
        texture_id=jnp.full((len(indices),), -1, jnp.int32),
        area=jnp.ones((len(indices),), jnp.float32),
    )
    hit = closest_hit(bvh, mesh_obj, o, d, t_max,
                      stack_depth=built.max_depth + 2)
    occ = any_hit(bvh, mesh_obj, o, d, t_max,
                  stack_depth=built.max_depth + 2)
    # map reordered local ids back to ORIGINAL triangle ids
    tri_ref = np.where(np.asarray(hit.tri) >= 0,
                       order[np.maximum(np.asarray(hit.tri), 0)], -1)
    return hit, tri_ref, np.asarray(occ)


@pytest.mark.slow
def test_primitive_sharded_matches_full_bvh():
    assert len(jax.devices()) >= 8
    positions, indices = _soup()
    o, d = _rays()
    t_max = jnp.full((o.shape[0],), 1e6, jnp.float32)

    mesh = make_device_mesh(8)
    shards = build_primitive_shards(positions, indices, 8)
    shards = put_shards(shards, mesh)

    got = primitive_sharded_closest_hit(shards, o, d, t_max, mesh)
    hit_ref, tri_ref, occ_ref = _full_reference(
        positions, indices, o, d, t_max)

    t_ref = np.asarray(hit_ref.t)
    t_got = np.asarray(got.t)
    np.testing.assert_allclose(t_got, t_ref, rtol=1e-5, atol=1e-5)
    # triangle ids equal except where two triangles tie in t exactly
    same = np.asarray(got.tri) == tri_ref
    assert same.mean() > 0.999, f"tri mismatch on {(~same).sum()} rays"
    valid_match = (np.asarray(got.tri) >= 0) == (tri_ref >= 0)
    assert valid_match.all()

    occ = np.asarray(primitive_sharded_any_hit(shards, o, d, t_max, mesh))
    np.testing.assert_array_equal(occ, occ_ref)


@pytest.mark.slow
def test_primitive_shards_memory_split():
    """Each shard holds ~1/D of the triangles (the point of the
    placement) and padding triangles cannot be hit."""
    positions, indices = _soup(n_tris=800)
    shards = build_primitive_shards(positions, indices, 8)
    per = (np.asarray(shards.tri_map) >= 0).sum(axis=1)
    assert per.sum() == 800
    assert per.max() <= int(np.ceil(800 / 8)) + 1
    # every global id appears exactly once across shards
    ids = np.asarray(shards.tri_map)
    ids = ids[ids >= 0]
    assert len(np.unique(ids)) == 800
