"""V3 component-array ops must match the trailing-axis math bit-for-bit
(same op order on the same backend)."""

import numpy as np

from pnraytracing_tpu.core import math as m3
from pnraytracing_tpu.core.vec import (
    V3,
    build_tangent_space_v,
    spherical_uv_v,
    tangent_to_world_v,
    vcross,
    vdot,
    vlength,
    vluminance,
    vmix,
    vnormalize,
    vreflect,
    vwhere,
)


def arrs(seed=0, n=1024):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(n, 3)).astype(np.float32)
    b = rng.normal(size=(n, 3)).astype(np.float32)
    return a, b


def test_basic_ops_match():
    a, b = arrs()
    va, vb = V3.of(a), V3.of(b)
    np.testing.assert_array_equal(np.asarray(vdot(va, vb)), m3.dot(a, b))
    # jnp.cross is jitted, so XLA contracts its products into FMAs; the
    # eager component form rounds each product -- ~1 ulp apart
    np.testing.assert_allclose(vcross(va, vb).rows(), m3.cross(a, b),
                               atol=2e-6, rtol=2e-6)
    np.testing.assert_array_equal(np.asarray(vlength(va)), m3.length(a))
    np.testing.assert_array_equal(vnormalize(va).rows(), m3.normalize(a))
    np.testing.assert_array_equal((va + vb).rows(), a + b)
    np.testing.assert_array_equal((va * 2.0 - vb).rows(), a * 2.0 - b)
    np.testing.assert_array_equal(vluminance(va).shape, (1024,))
    np.testing.assert_array_equal(
        np.asarray(vluminance(va)), m3.luminance(a)
    )
    np.testing.assert_array_equal(
        vmix(va, vb, 0.25).rows(), m3.mix(a, b, 0.25)
    )


def test_reflect_where_tangent_match():
    a, b = arrs(1)
    va, vb = V3.of(a), V3.of(b)
    h = vnormalize(vb)
    np.testing.assert_array_equal(
        vreflect(va, h).rows(),
        np.asarray(m3.reflect(a, m3.normalize(b))),
    )
    mask = a[:, 0] > 0
    np.testing.assert_array_equal(
        vwhere(mask, va, vb).rows(),
        np.where(mask[:, None], a, b),
    )
    n = vnormalize(va)
    t_v, b_v = build_tangent_space_v(n)
    t_a, b_a = m3.build_tangent_space(np.asarray(n.rows()))
    np.testing.assert_allclose(t_v.rows(), t_a, atol=2e-6, rtol=2e-6)
    np.testing.assert_allclose(b_v.rows(), b_a, atol=2e-6, rtol=2e-6)
    local = V3.of(b)
    np.testing.assert_allclose(
        tangent_to_world_v(t_v, b_v, n, local).rows(),
        m3.tangent_to_world(np.asarray(t_v.rows()),
                            np.asarray(b_v.rows()),
                            np.asarray(n.rows()), b),
        atol=2e-6, rtol=2e-6,
    )


def test_spherical_uv_match():
    a, _ = arrs(2)
    va = vnormalize(V3.of(a))
    u, v = spherical_uv_v(va)
    uv = m3.spherical_uv(np.asarray(va.rows()))
    np.testing.assert_array_equal(np.asarray(u), uv[:, 0])
    np.testing.assert_array_equal(np.asarray(v), uv[:, 1])
