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


def fast_atan(t: jnp.ndarray) -> jnp.ndarray:
    """Minimax odd polynomial atan on [-1, 1], max error < ~2e-6 rad —
    ~12 VPU ops instead of libm's ~50+.  The reference's GLSL ``atan``
    is itself a hardware approximation of comparable accuracy, so this
    is parity-faithful, not a shortcut (used only for equirect uv
    mapping, where 2e-6 rad is ~1e-7 of a texel coordinate)."""
    s = t * t
    p = jnp.float32(-0.0117212)
    p = p * s + jnp.float32(0.05265332)
    p = p * s + jnp.float32(-0.11643287)
    p = p * s + jnp.float32(0.19354346)
    p = p * s + jnp.float32(-0.33262347)
    p = p * s + jnp.float32(0.99997726)
    return t * p


def fast_atan2(y: jnp.ndarray, x: jnp.ndarray) -> jnp.ndarray:
    """Polynomial atan2 (same quadrant semantics as jnp.arctan2 away
    from the undefined origin)."""
    ax = jnp.abs(x)
    ay = jnp.abs(y)
    big = jnp.maximum(ax, ay)
    t = jnp.minimum(ax, ay) / jnp.maximum(big, jnp.float32(1e-30))
    r = fast_atan(t)
    r = jnp.where(ay > ax, jnp.float32(0.5 * PI) - r, r)
    r = jnp.where(x < 0, jnp.float32(PI) - r, r)
    return jnp.where(y < 0, -r, r)


def fast_asin(v: jnp.ndarray) -> jnp.ndarray:
    """asin via atan2(v, sqrt(1 - v^2)); input clipped to [-1, 1]."""
    v = jnp.clip(v, -1.0, 1.0)
    return fast_atan2(v, jnp.sqrt(jnp.maximum(1.0 - v * v, 0.0)))


def spherical_uv(v: jnp.ndarray) -> jnp.ndarray:
    """Direction -> equirect uv, matching ``toSphericalCoord``
    (ray_tracing.comp:181-188): u = atan2(z,x)/2pi + .5,
    v = 1 - (asin(y)/pi + .5).

    Uses the fast polynomial atan2/asin above — the libm
    transcendentals dominated the environment lookup stage on-chip
    (11.3 ms/call at 512^2, stage profile round 4)."""
    u = fast_atan2(v[..., 2], v[..., 0]) * (0.5 * INV_PI) + 0.5
    w = fast_asin(v[..., 1]) * INV_PI + 0.5
    return jnp.stack([u, 1.0 - w], axis=-1)


def mon2lin(x: jnp.ndarray) -> jnp.ndarray:
    """sRGB-ish decode pow(x, 2.2) (ray_tracing.comp:682-684)."""
    return jnp.power(jnp.maximum(x, 0.0), 2.2)
