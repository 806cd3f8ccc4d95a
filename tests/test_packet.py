"""Packet (shared-stack) traversal must agree with the per-ray backends.

t/b1/b2 are compared exactly; tri ids may legitimately differ only where
two triangles tie at the same t (visit order breaks ties), which the
random soup here does not produce.
"""

import jax.numpy as jnp
import numpy as np

from pnraytracing_tpu.accel.layout import pack_traversal_data
from pnraytracing_tpu.accel.traverse import any_hit, closest_hit
from pnraytracing_tpu.accel.traverse_packet import (
    any_hit_packet,
    closest_hit_packet,
)
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


def test_closest_hit_packet_matches_generic():
    mesh, bvh, trav, o, d, t_max = setup()
    a = closest_hit(bvh, mesh, o, d, t_max)
    b = closest_hit_packet(trav, o, d, t_max)
    np.testing.assert_array_equal(np.asarray(a.tri), np.asarray(b.tri))
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))
    np.testing.assert_array_equal(np.asarray(a.b1), np.asarray(b.b1))
    np.testing.assert_array_equal(np.asarray(a.b2), np.asarray(b.b2))


def test_closest_hit_packet_tiled_and_masked():
    mesh, bvh, trav, o, d, t_max = setup(seed=11, num_rays=768)
    mask = jnp.asarray(np.arange(768) % 3 != 0)
    a = closest_hit(bvh, mesh, o, d, t_max, mask)
    b = closest_hit_packet(trav, o, d, t_max, mask, tile_size=256)
    np.testing.assert_array_equal(np.asarray(a.tri), np.asarray(b.tri))
    np.testing.assert_array_equal(np.asarray(a.t), np.asarray(b.t))


def test_any_hit_packet_matches_generic():
    mesh, bvh, trav, o, d, t_max = setup(seed=9)
    short = jnp.asarray(np.full((o.shape[0],), 4.0, np.float32))
    a = any_hit(bvh, mesh, o, d, short)
    b = any_hit_packet(trav, o, d, short)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    c = any_hit_packet(trav, o, d, short, tile_size=128)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


def test_packet_respects_t_max_and_misses():
    mesh, bvh, trav, o, d, t_max = setup(seed=5, num_rays=256)
    # very short rays: most should miss
    short = jnp.full((256,), 1e-3, jnp.float32)
    b = closest_hit_packet(trav, o, d, short)
    assert (np.asarray(b.tri) == -1).mean() > 0.9
