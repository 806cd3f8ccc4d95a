"""Vector math on ``[..., 3]`` arrays.

The reference host code uses glm (``include/glm``) and the device code GLSL
built-ins; here everything is plain jnp on trailing-axis-3 arrays so the same
functions serve host precompute, the jnp oracle renderer, and Pallas kernels.
"""

from __future__ import annotations

import jax.numpy as jnp

PI = 3.14159265358979323846
INV_PI = 0.31830988618379067154
TWO_PI = 2.0 * PI
FLOAT_MAX = 1.0e7  # matches the shader's FLOAT_MAX (ray_tracing.comp:5)
SHADOW_EPS = 1.0e-4  # ShadowEpsilon (ray_tracing.comp:9)


def dot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dot product over the trailing axis, keepdims dropped."""
    return jnp.sum(a * b, axis=-1)


def vdot(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """Dot product over the trailing axis, keepdims kept (for broadcasting)."""
    return jnp.sum(a * b, axis=-1, keepdims=True)


def cross(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    return jnp.cross(a, b)


def safe_sqrt(x: jnp.ndarray, eps: float = 1e-12) -> jnp.ndarray:
    """sqrt with a NaN-free gradient at 0: ``sqrt(max(0, x))`` has backward
    ``inf * 0 = NaN`` whenever x <= 0 (d sqrt at 0 is inf, d max is 0);
    clamping to eps keeps the chain finite with <= 1e-6 forward error."""
    return jnp.sqrt(jnp.maximum(x, eps))


def length(a: jnp.ndarray) -> jnp.ndarray:
    return safe_sqrt(dot(a, a))


def normalize(a: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """Safe normalize: returns a / |a| with a tiny clamp to avoid 0/0."""
    return a * jax_rsqrt(jnp.maximum(vdot(a, a), eps))


def jax_rsqrt(x: jnp.ndarray) -> jnp.ndarray:
    import jax.lax as lax

    return lax.rsqrt(x)


def reflect(v: jnp.ndarray, h: jnp.ndarray) -> jnp.ndarray:
    """Mirror v about h: ``2 (v.h) h - v`` (ray_tracing.comp:694)."""
    return 2.0 * vdot(v, h) * h - v


def luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    """Disney-BRDF luminance weights 0.3/0.6/0.1 (ray_tracing.comp:799)."""
    return 0.3 * rgb[..., 0] + 0.6 * rgb[..., 1] + 0.1 * rgb[..., 2]


def hdr_luminance(rgb: jnp.ndarray) -> jnp.ndarray:
    """Env-CDF luminance weights 0.2/0.7/0.1 (shader.hpp:153)."""
    return 0.2 * rgb[..., 0] + 0.7 * rgb[..., 1] + 0.1 * rgb[..., 2]


def sqr(x: jnp.ndarray) -> jnp.ndarray:
    return x * x


def mix(a, b, t):
    """GLSL mix(): a*(1-t) + b*t."""
    return a + (b - a) * t


def build_tangent_space(n: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Shading tangent frame from a normal.

    Mirrors ``BuildTangentSpace`` (ray_tracing.comp:629-634): t = n x +z
    (or +x when n is (anti)parallel to +z), b = n x t.
    """
    up = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0], n.dtype), n.shape)
    x = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0], n.dtype), n.shape)
    near_z = jnp.abs(n[..., 2:3]) > 0.9999995
    t = jnp.where(near_z, x, normalize(cross(n, up)))
    b = cross(n, t)
    return t, b


def tangent_to_world(
    t: jnp.ndarray, b: jnp.ndarray, n: jnp.ndarray, v: jnp.ndarray
) -> jnp.ndarray:
    """Local (x,y,z) -> world via frame columns (ray_tracing.comp:637-639)."""
    return v[..., 0:1] * t + v[..., 1:2] * b + v[..., 2:3] * n


def spherical_uv(v: jnp.ndarray) -> jnp.ndarray:
    """Direction -> equirect uv, matching ``toSphericalCoord``
    (ray_tracing.comp:181-188): u = atan2(z,x)/2pi + .5,
    v = 1 - (asin(y)/pi + .5).
    """
    u = jnp.arctan2(v[..., 2], v[..., 0]) * (0.5 * INV_PI) + 0.5
    w = jnp.arcsin(jnp.clip(v[..., 1], -1.0, 1.0)) * INV_PI + 0.5
    return jnp.stack([u, 1.0 - w], axis=-1)


def mon2lin(x: jnp.ndarray) -> jnp.ndarray:
    """sRGB-ish decode pow(x, 2.2) (ray_tracing.comp:682-684)."""
    return jnp.power(jnp.maximum(x, 0.0), 2.2)
