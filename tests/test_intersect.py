"""Unit tests for the watertight triangle test and AABB slab test against
hand-built cases and an independent Möller–Trumbore oracle (numpy)."""

import jax.numpy as jnp
import numpy as np
import pytest

from pnraytracing_tpu.ops.intersect import (
    brute_force_any_hit,
    brute_force_closest_hit,
    intersect_aabb,
    intersect_triangle,
    safe_inv_dir,
)


def moller_trumbore(p0, p1, p2, o, d, t_max, eps=1e-9):
    """Independent reference implementation (classic, not watertight)."""
    e1 = p1 - p0
    e2 = p2 - p0
    pvec = np.cross(d, e2)
    det = np.einsum("...i,...i->...", e1, pvec)
    mask = np.abs(det) > eps
    inv = np.where(mask, 1.0 / np.where(det == 0, 1, det), 0.0)
    tvec = o - p0
    u = np.einsum("...i,...i->...", tvec, pvec) * inv
    qvec = np.cross(tvec, e1)
    v = np.einsum("...i,...i->...", d, qvec) * inv
    t = np.einsum("...i,...i->...", e2, qvec) * inv
    hit = mask & (u >= 0) & (v >= 0) & (u + v <= 1) & (t > 0) & (t <= t_max)
    return hit, t, u, v


class TestTriangle:
    def test_head_on_hit(self):
        p0 = jnp.array([-1.0, -1.0, 0.0])
        p1 = jnp.array([1.0, -1.0, 0.0])
        p2 = jnp.array([0.0, 1.0, 0.0])
        o = jnp.array([0.0, 0.0, -3.0])
        d = jnp.array([0.0, 0.0, 1.0])
        hit, t, b1, b2 = intersect_triangle(p0, p1, p2, o, d, jnp.float32(1e7))
        assert bool(hit)
        assert np.isclose(float(t), 3.0, atol=1e-5)
        b0 = 1.0 - float(b1) - float(b2)
        # barycentric reconstruction of the hit point
        x = b0 * np.asarray(p0) + float(b1) * np.asarray(p1) + float(b2) * np.asarray(p2)
        assert np.allclose(x, [0, 0, 0], atol=1e-5)

    def test_backface_still_hits(self):
        # det < 0 branch (ray_tracing.comp:318): both winding signs accepted
        p0 = jnp.array([-1.0, -1.0, 0.0])
        p1 = jnp.array([0.0, 1.0, 0.0])
        p2 = jnp.array([1.0, -1.0, 0.0])
        o = jnp.array([0.0, 0.0, -3.0])
        d = jnp.array([0.0, 0.0, 1.0])
        hit, t, _, _ = intersect_triangle(p0, p1, p2, o, d, jnp.float32(1e7))
        assert bool(hit) and np.isclose(float(t), 3.0, atol=1e-5)

    def test_miss_outside(self):
        p0 = jnp.array([-1.0, -1.0, 0.0])
        p1 = jnp.array([1.0, -1.0, 0.0])
        p2 = jnp.array([0.0, 1.0, 0.0])
        o = jnp.array([5.0, 5.0, -3.0])
        d = jnp.array([0.0, 0.0, 1.0])
        hit, *_ = intersect_triangle(p0, p1, p2, o, d, jnp.float32(1e7))
        assert not bool(hit)

    def test_behind_origin_rejected(self):
        p0 = jnp.array([-1.0, -1.0, 0.0])
        p1 = jnp.array([1.0, -1.0, 0.0])
        p2 = jnp.array([0.0, 1.0, 0.0])
        o = jnp.array([0.0, 0.0, 3.0])
        d = jnp.array([0.0, 0.0, 1.0])  # triangle is behind
        hit, *_ = intersect_triangle(p0, p1, p2, o, d, jnp.float32(1e7))
        assert not bool(hit)

    def test_tmax_clipping(self):
        p0 = jnp.array([-1.0, -1.0, 0.0])
        p1 = jnp.array([1.0, -1.0, 0.0])
        p2 = jnp.array([0.0, 1.0, 0.0])
        o = jnp.array([0.0, 0.0, -3.0])
        d = jnp.array([0.0, 0.0, 1.0])
        hit, *_ = intersect_triangle(p0, p1, p2, o, d, jnp.float32(2.0))
        assert not bool(hit)

    @pytest.mark.parametrize("compat", [False, True])
    def test_random_vs_moller_trumbore(self, compat):
        rng = np.random.default_rng(0)
        n = 2000
        p0 = rng.normal(size=(n, 3)).astype(np.float32)
        p1 = p0 + rng.normal(size=(n, 3)).astype(np.float32)
        p2 = p0 + rng.normal(size=(n, 3)).astype(np.float32)
        o = rng.normal(size=(n, 3)).astype(np.float32) * 3
        d = rng.normal(size=(n, 3)).astype(np.float32)
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        t_max = np.full((n,), 100.0, np.float32)

        hit, t, b1, b2 = intersect_triangle(
            jnp.asarray(p0), jnp.asarray(p1), jnp.asarray(p2),
            jnp.asarray(o), jnp.asarray(d), jnp.asarray(t_max), compat=compat,
        )
        mt_hit, mt_t, mt_u, mt_v = moller_trumbore(
            p0.astype(np.float64), p1.astype(np.float64), p2.astype(np.float64),
            o.astype(np.float64), d.astype(np.float64), t_max,
        )
        # Allow disagreement only on near-degenerate edge grazings.
        agree = np.asarray(hit) == mt_hit
        edge_dist = np.minimum.reduce([mt_u, mt_v, 1 - mt_u - mt_v])
        robust = np.abs(edge_dist) > 1e-4
        assert (agree | ~robust).mean() > 0.999
        both = np.asarray(hit) & mt_hit
        assert np.allclose(np.asarray(t)[both], mt_t[both], rtol=1e-3, atol=1e-4)
        # barycentric convention: b1 ~ u (weight of p1), b2 ~ v (weight of p2)
        assert np.allclose(np.asarray(b1)[both], mt_u[both], rtol=1e-3, atol=1e-3)
        assert np.allclose(np.asarray(b2)[both], mt_v[both], rtol=1e-3, atol=1e-3)

    def test_axis_aligned_directions(self):
        # rays exactly along each axis (exercises the permutation logic)
        p0 = jnp.array([2.0, -1.0, -1.0])
        p1 = jnp.array([2.0, 1.0, -1.0])
        p2 = jnp.array([2.0, 0.0, 1.0])
        o = jnp.array([0.0, 0.0, 0.0])
        for compat in (False, True):
            hit, t, _, _ = intersect_triangle(
                p0, p1, p2, o, jnp.array([1.0, 0.0, 0.0]), jnp.float32(1e7),
                compat=compat,
            )
            assert bool(hit), f"compat={compat}"
            assert np.isclose(float(t), 2.0, atol=1e-5)


class TestAABB:
    def test_basic(self):
        o = jnp.array([[0.0, 0.0, -5.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        inv = safe_inv_dir(d)
        pmin = jnp.array([[-1.0, -1.0, -1.0]])
        pmax = jnp.array([[1.0, 1.0, 1.0]])
        assert bool(intersect_aabb(pmin, pmax, o, inv, jnp.array([100.0]))[0])
        assert not bool(
            intersect_aabb(pmin + 10, pmax + 10, o, inv, jnp.array([100.0]))[0]
        )

    def test_behind_box_default_vs_compat(self):
        # box entirely behind the ray: reference compat mode reports hit
        # (slab-only test, ray_tracing.comp:227), default rejects.
        o = jnp.array([[0.0, 0.0, 5.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        inv = safe_inv_dir(d)
        pmin = jnp.array([[-1.0, -1.0, -1.0]])
        pmax = jnp.array([[1.0, 1.0, 1.0]])
        assert not bool(intersect_aabb(pmin, pmax, o, inv, jnp.array([100.0]))[0])
        assert bool(
            intersect_aabb(pmin, pmax, o, inv, jnp.array([100.0]), compat=True)[0]
        )

    def test_ray_parallel_to_slab(self):
        # direction has a zero component; origin inside the slab range
        o = jnp.array([[0.0, 0.0, -5.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        inv = safe_inv_dir(d)
        pmin = jnp.array([[-1.0, -1.0, -1.0]])
        pmax = jnp.array([[1.0, 1.0, 1.0]])
        assert bool(intersect_aabb(pmin, pmax, o, inv, jnp.array([100.0]))[0])
        # origin outside the x-slab, direction parallel to it -> miss
        o2 = jnp.array([[5.0, 0.0, -5.0]])
        assert not bool(intersect_aabb(pmin, pmax, o2, inv, jnp.array([100.0]))[0])


class TestBruteForce:
    def test_closest_picks_nearest(self):
        # two parallel triangles; nearest must win regardless of order
        positions = jnp.array(
            [
                [-1, -1, 2], [1, -1, 2], [0, 1, 2],  # far
                [-1, -1, 1], [1, -1, 1], [0, 1, 1],  # near
            ],
            jnp.float32,
        )
        indices = jnp.array([[0, 1, 2], [3, 4, 5]], jnp.int32)
        o = jnp.array([[0.0, 0.0, 0.0]])
        d = jnp.array([[0.0, 0.0, 1.0]])
        hit = brute_force_closest_hit(positions, indices, o, d, jnp.array([1e7]))
        assert int(hit.tri[0]) == 1
        assert np.isclose(float(hit.t[0]), 1.0, atol=1e-5)

    def test_any_hit(self):
        positions = jnp.array([[-1, -1, 1], [1, -1, 1], [0, 1, 1]], jnp.float32)
        indices = jnp.array([[0, 1, 2]], jnp.int32)
        o = jnp.array([[0.0, 0.0, 0.0], [0.0, 0.0, 0.0]])
        d = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, -1.0]])
        occ = brute_force_any_hit(positions, indices, o, d, jnp.array([1e7, 1e7]))
        assert bool(occ[0]) and not bool(occ[1])
