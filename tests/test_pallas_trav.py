"""Pallas (Mosaic) packet traversal must agree with the per-ray backends.

On CPU the kernel runs under the Pallas interpreter (interpret=True);
the arithmetic is identical component-form math (intersect_*_c twins),
so t/b1/b2 compare exactly against the generic traversal — a unit test
also pins the componentwise cores to the array forms bit-for-bit.
"""

import jax.numpy as jnp
import numpy as np

from pnraytracing_tpu.accel.traverse import any_hit, closest_hit
from pnraytracing_tpu.accel.traverse_pallas import (
    any_hit_pallas,
    closest_hit_pallas,
)
from pnraytracing_tpu.ops.intersect import (
    intersect_aabb,
    intersect_aabb_c,
    intersect_triangle,
    intersect_triangle_c,
    safe_inv_dir,
)
from tests.test_packet import setup


def test_componentwise_triangle_matches_array_form():
    rng = np.random.default_rng(5)
    n = 4096
    p = rng.normal(size=(3, 3)).astype(np.float32)
    o = rng.uniform(-2, 2, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    # include axis-degenerate directions (permutation corner cases)
    d[:64, 2] = 0.0
    d[64:96, 1:] = 0.0
    t_max = np.full((n,), 1e6, np.float32)
    for compat in (False, True):
        hit_a, t_a, b1_a, b2_a = intersect_triangle(
            p[0], p[1], p[2], o, d, t_max, compat=compat
        )
        hit_c, t_c, b1_c, b2_c = intersect_triangle_c(
            tuple(p[0]), tuple(p[1]), tuple(p[2]),
            o[:, 0], o[:, 1], o[:, 2], d[:, 0], d[:, 1], d[:, 2],
            t_max, compat=compat,
        )
        np.testing.assert_array_equal(np.asarray(hit_a), np.asarray(hit_c))
        np.testing.assert_array_equal(np.asarray(t_a), np.asarray(t_c))
        np.testing.assert_array_equal(np.asarray(b1_a), np.asarray(b1_c))
        np.testing.assert_array_equal(np.asarray(b2_a), np.asarray(b2_c))


def test_componentwise_aabb_matches_array_form():
    rng = np.random.default_rng(6)
    n = 2048
    bmin = rng.uniform(-3, 0, size=3).astype(np.float32)
    bmax = bmin + rng.uniform(0.5, 3, size=3).astype(np.float32)
    o = rng.uniform(-6, 6, size=(n, 3)).astype(np.float32)
    d = rng.normal(size=(n, 3)).astype(np.float32)
    d[:32, 0] = 0.0
    inv_d = safe_inv_dir(jnp.asarray(d))
    t_max = jnp.asarray(rng.uniform(0.1, 20, size=n).astype(np.float32))
    for compat in (False, True):
        a = intersect_aabb(bmin, bmax, o, inv_d, t_max, compat=compat)
        c = intersect_aabb_c(
            tuple(bmin), tuple(bmax), o[:, 0], o[:, 1], o[:, 2],
            inv_d[:, 0], inv_d[:, 1], inv_d[:, 2], t_max, compat=compat,
        )
        np.testing.assert_array_equal(np.asarray(a), np.asarray(c))


# The kernel's closest hit is mathematically order-independent, but the
# Pallas pipeline (interpreter on CPU, Mosaic on TPU) contracts a*b+c
# into FMAs differently than the XLA-compiled reference traversal, so t
# values can drift by ~1 ulp; marginal hits at exactly t_max*det can
# flip with them.  Compare with tight tolerances, not bit equality.


def _assert_hits_close(a, b, n):
    tri_a, tri_b = np.asarray(a.tri), np.asarray(b.tri)
    t_a, t_b = np.asarray(a.t), np.asarray(b.t)
    same = tri_a == tri_b
    assert same.sum() >= n - 2, f"{(~same).sum()} tri mismatches"
    np.testing.assert_allclose(t_a[same], t_b[same], rtol=1e-6)
    np.testing.assert_allclose(
        np.asarray(a.b1)[same], np.asarray(b.b1)[same],
        rtol=1e-5, atol=1e-6,
    )
    np.testing.assert_allclose(
        np.asarray(a.b2)[same], np.asarray(b.b2)[same],
        rtol=1e-5, atol=1e-6,
    )


def test_closest_hit_pallas_matches_generic():
    mesh, bvh, trav, o, d, t_max = setup(num_tris=120, num_rays=256)
    a = closest_hit(bvh, mesh, o, d, t_max)
    b = closest_hit_pallas(trav, o, d, t_max, tile_size=128, interpret=True)
    _assert_hits_close(a, b, 256)


def test_closest_hit_pallas_masked_and_padded():
    mesh, bvh, trav, o, d, t_max = setup(
        num_tris=120, num_rays=300, seed=11
    )  # 300 pads to 384 at tile 128
    mask = jnp.asarray(np.arange(300) % 3 != 0)
    a = closest_hit(bvh, mesh, o, d, t_max, mask)
    b = closest_hit_pallas(
        trav, o, d, t_max, mask, tile_size=128, interpret=True
    )
    _assert_hits_close(a, b, 300)
    # masked-out rays must report miss
    assert (np.asarray(b.tri)[~np.asarray(mask)] == -1).all()


def test_any_hit_pallas_matches_generic():
    mesh, bvh, trav, o, d, t_max = setup(num_tris=120, num_rays=256, seed=9)
    short = jnp.asarray(np.full((o.shape[0],), 4.0, np.float32))
    a = any_hit(bvh, mesh, o, d, short)
    b = any_hit_pallas(trav, o, d, short, tile_size=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_closest_hit_pallas_wide_variant():
    mesh, bvh, trav, o, d, t_max = setup(num_tris=120, num_rays=256, seed=7)
    a = closest_hit(bvh, mesh, o, d, t_max)
    b, iters = closest_hit_pallas(
        trav, o, d, t_max, tile_size=128, interpret=True,
        variant="wide", with_stats=True,
    )
    _assert_hits_close(a, b, 256)
    it = np.asarray(iters)
    assert it.shape == (2, 1) and (it > 0).all()
    # push-test wide walk must do fewer iterations than pop-test binary
    _, it_bin = closest_hit_pallas(
        trav, o, d, t_max, tile_size=128, interpret=True,
        variant="binary", with_stats=True,
    )
    assert it.sum() < np.asarray(it_bin).sum()


def test_any_hit_pallas_wide_variant():
    mesh, bvh, trav, o, d, t_max = setup(num_tris=120, num_rays=256, seed=13)
    short = jnp.asarray(np.full((o.shape[0],), 4.0, np.float32))
    a = any_hit(bvh, mesh, o, d, short)
    b = any_hit_pallas(
        trav, o, d, short, tile_size=128, interpret=True, variant="wide"
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_attr_kernel_matches_make_interaction():
    """closest_hit_pallas_attr: hits bit-match the plain wide kernel and
    the emitted interaction equals make_interaction (normal to 1 ulp of
    interp order, uv/material/texture exact)."""
    from pnraytracing_tpu.accel.layout import ATTR_TEX_BASE
    from pnraytracing_tpu.accel.traverse_pallas import (
        closest_hit_pallas_attr,
        pick_variant,
    )
    from pnraytracing_tpu.core.camera import camera_rays, make_camera
    from pnraytracing_tpu.core.vec import V3
    from pnraytracing_tpu.render.integrator import (
        make_interaction,
        pack_interaction_rows,
    )
    from pnraytracing_tpu.scene import shapes
    from pnraytracing_tpu.scene.build import SceneBuilder

    b = SceneBuilder()
    b.add(shapes.icosphere(2, radius=1.0),
          dict(base_color=(0.7, 0.3, 0.2), roughness=0.4), name="ball")
    b.add(shapes.quad(half=4.0), dict(base_color=(0.6, 0.6, 0.6)),
          name="floor")
    scene = b.build(env_constant=(0.2, 0.2, 0.2))
    trav = scene.trav
    assert pick_variant(trav, "wide_attr") == "wide_attr"
    cam = make_camera((0, 1.5, 4), (0, 0, 0), (0, 1, 0), 50.0, 1.0)
    o, d, _ = camera_rays(cam, 32, 32)
    t_max = jnp.full((o.shape[0],), 1e7, jnp.float32)

    hit0 = closest_hit_pallas(trav, o, d, t_max, tile_size=128,
                              interpret=True)
    hit1, attrs = closest_hit_pallas_attr(trav, o, d, t_max,
                                          tile_size=128, interpret=True)
    np.testing.assert_array_equal(np.asarray(hit0.tri), np.asarray(hit1.tri))
    np.testing.assert_array_equal(np.asarray(hit0.t), np.asarray(hit1.t))

    irows = pack_interaction_rows(scene.mesh)
    _, nrm, (uu, vv), mat_id, tex_id = make_interaction(
        scene.mesh, hit1, V3.of(d), V3.of(o), rows=irows)
    nx, ny, nz, u, v, mt = attrs
    m = np.asarray(hit1.tri) >= 0
    assert m.any()
    np.testing.assert_array_equal(
        (np.asarray(mt) // ATTR_TEX_BASE)[m], np.asarray(mat_id)[m])
    np.testing.assert_array_equal(
        (np.asarray(mt) % ATTR_TEX_BASE - 1)[m], np.asarray(tex_id)[m])
    np.testing.assert_allclose(np.asarray(u)[m], np.asarray(uu)[m],
                               atol=1e-6)
    np.testing.assert_allclose(np.asarray(v)[m], np.asarray(vv)[m],
                               atol=1e-6)
    dn = np.asarray(d)
    raw = np.stack([np.asarray(nx), np.asarray(ny), np.asarray(nz)], 1)
    flip = (raw * dn).sum(1) > 0
    nn = np.where(flip[:, None], -raw, raw)
    nn /= np.maximum(np.linalg.norm(nn, axis=1, keepdims=True), 1e-20)
    want = np.stack([np.asarray(nrm.x), np.asarray(nrm.y),
                     np.asarray(nrm.z)], 1)
    np.testing.assert_allclose(nn[m], want[m], atol=1e-5)
