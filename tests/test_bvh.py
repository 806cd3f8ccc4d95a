"""BVH builder invariants and traversal equivalence against the brute-force
oracle (the strategy of SURVEY.md §4: BVH path must be hit-for-hit identical
to all-pairs intersection)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pnraytracing_tpu.accel.bvh import build_bvh, triangle_bounds, validate_bvh
from pnraytracing_tpu.accel.traverse import any_hit, closest_hit
from pnraytracing_tpu.core.types import BVH, TriangleMesh
from pnraytracing_tpu.ops.intersect import brute_force_any_hit, brute_force_closest_hit


def random_soup(rng, num_tris, spread=3.0, size=0.6):
    base = rng.uniform(-spread, spread, size=(num_tris, 1, 3))
    offs = rng.normal(size=(num_tris, 2, 3)) * size
    v0 = base[:, 0]
    v1 = v0 + offs[:, 0]
    v2 = v0 + offs[:, 1]
    positions = np.concatenate([v0, v1, v2], axis=0).astype(np.float32)
    t = np.arange(num_tris)
    indices = np.stack([t, t + num_tris, t + 2 * num_tris], axis=1).astype(np.int32)
    return positions, indices


def make_mesh_and_bvh(positions, indices, max_leaf_size=4):
    built = build_bvh(positions, indices, max_leaf_size=max_leaf_size)
    indices_r = indices[built.order]
    mesh = TriangleMesh(
        positions=jnp.asarray(positions),
        normals=jnp.zeros_like(jnp.asarray(positions)),
        tangents=jnp.zeros_like(jnp.asarray(positions)),
        bitangents=jnp.zeros_like(jnp.asarray(positions)),
        uvs=jnp.zeros((len(positions), 2), jnp.float32),
        indices=jnp.asarray(indices_r),
        material_id=jnp.zeros((len(indices),), jnp.int32),
        texture_id=jnp.full((len(indices),), -1, jnp.int32),
        area=jnp.ones((len(indices),), jnp.float32),
    )
    bvh = BVH(
        node_min=jnp.asarray(built.node_min),
        node_max=jnp.asarray(built.node_max),
        axis=jnp.asarray(built.axis),
        right_child=jnp.asarray(built.right_child),
        start=jnp.asarray(built.start),
        end=jnp.asarray(built.end),
    )
    return mesh, bvh, built


@pytest.mark.parametrize("num_tris", [1, 2, 5, 64, 500])
def test_builder_invariants(num_tris):
    rng = np.random.default_rng(42 + num_tris)
    positions, indices = random_soup(rng, num_tris)
    built = build_bvh(positions, indices, max_leaf_size=4)
    tri_min, tri_max, _ = triangle_bounds(positions, indices)
    validate_bvh(built, tri_min, tri_max)
    # leaf size bound (the property the device traversal depends on)
    leaves = built.right_child == -1
    assert (built.end[leaves] - built.start[leaves] <= 4).all()
    # permutation property
    assert sorted(built.order.tolist()) == list(range(num_tris))


def test_flat_layout_contract():
    """Left child implicit at id+1, right_child index stored — the layout
    the GLSL traversal assumes (ray_tracing.comp:449-456, BVH.hpp:167-172)."""
    rng = np.random.default_rng(7)
    positions, indices = random_soup(rng, 200)
    built = build_bvh(positions, indices)
    n = built.num_nodes
    internal = np.nonzero(built.right_child >= 0)[0]
    for i in internal:
        rc = built.right_child[i]
        assert i + 1 < rc < n
        # children partition the parent's triangle range
        assert built.start[i + 1] == built.start[i]
        assert built.end[rc] == built.end[i]
        assert built.end[i + 1] == built.start[rc]


@pytest.mark.parametrize("num_tris", [3, 50, 700])
@pytest.mark.parametrize("compat", [False, True])
def test_closest_hit_matches_brute_force(num_tris, compat):
    rng = np.random.default_rng(num_tris)
    positions, indices = random_soup(rng, num_tris)
    mesh, bvh, _ = make_mesh_and_bvh(positions, indices)

    num_rays = 512
    o = rng.uniform(-6, 6, size=(num_rays, 3)).astype(np.float32)
    d = rng.normal(size=(num_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_max = np.full((num_rays,), 1e7, np.float32)

    got = closest_hit(bvh, mesh, jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max),
                      compat=compat)
    want = brute_force_closest_hit(
        mesh.positions, mesh.indices, jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(t_max), compat=compat,
    )
    # compat mode skips the dominant-axis permutation (triangle.hpp:34-47),
    # so near-degenerate shears lose precision and the two computation
    # orders can disagree at ~1e-4 relative; default mode is watertight.
    np.testing.assert_allclose(
        np.asarray(got.t), np.asarray(want.t), rtol=1e-3 if compat else 1e-5
    )
    hit_agree = (np.asarray(got.tri) >= 0) == (np.asarray(want.tri) >= 0)
    assert hit_agree.all()
    both = (np.asarray(got.tri) >= 0) & (np.asarray(want.tri) >= 0)
    # same triangle except exact-tie duplicates; t already matched above
    same = np.asarray(got.tri)[both] == np.asarray(want.tri)[both]
    assert same.mean() > 0.99


@pytest.mark.parametrize("compat", [False, True])
def test_any_hit_matches_brute_force(compat):
    rng = np.random.default_rng(5)
    positions, indices = random_soup(rng, 300)
    mesh, bvh, _ = make_mesh_and_bvh(positions, indices)

    num_rays = 512
    o = rng.uniform(-6, 6, size=(num_rays, 3)).astype(np.float32)
    d = rng.normal(size=(num_rays, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t_max = rng.uniform(0.5, 20.0, size=(num_rays,)).astype(np.float32)

    got = any_hit(bvh, mesh, jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max),
                  compat=compat)
    want = brute_force_any_hit(
        mesh.positions, mesh.indices, jnp.asarray(o), jnp.asarray(d),
        jnp.asarray(t_max), compat=compat,
    )
    np.testing.assert_array_equal(np.asarray(got), np.asarray(want))


def test_closest_hit_respects_tmax():
    rng = np.random.default_rng(11)
    positions, indices = random_soup(rng, 100)
    mesh, bvh, _ = make_mesh_and_bvh(positions, indices)
    o = np.zeros((64, 3), np.float32)
    d = rng.normal(size=(64, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    short = closest_hit(bvh, mesh, jnp.asarray(o), jnp.asarray(d),
                        jnp.full((64,), 0.1, jnp.float32))
    longr = closest_hit(bvh, mesh, jnp.asarray(o), jnp.asarray(d),
                        jnp.full((64,), 1e7, jnp.float32))
    t_long = np.asarray(longr.t)
    assert (np.asarray(short.tri)[(t_long > 0.1)] == -1).all()
