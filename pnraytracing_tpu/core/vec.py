"""Struct-of-component-arrays vectors — the TPU-native per-ray layout.

Measured on v5e (BASELINE.md round 3): XLA lane-pads an ``[R, 3]`` f32
array to ``[R, 128]`` (tile shape (8, 128)), so every materialized
per-ray vector pays ~42x its true bytes — a 50-op elementwise chain ran
29x slower in ``[R, 3]`` than in ``[3, R]`` layout.  ``V3`` keeps each
component a flat ``[R]`` array (tiled (8, 128) densely), which is also
exactly the form the Mosaic packet kernel consumes and emits, so
traversal <-> shading hand-offs are free.

``V3`` is a pytree (flax struct), so it passes through ``jit``,
``lax.scan`` carries, ``shard_map`` and ``grad`` unchanged.  The
arithmetic helpers mirror ``core/math.py``'s trailing-axis forms
op-for-op (same order: dot = x*x + y*y + z*z left-to-right), so ported
code produces bit-identical results on the same backend.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from pnraytracing_tpu.core.math import safe_sqrt


@struct.dataclass
class V3:
    """A 3-vector field over a ray batch: three ``[R]`` component arrays
    (or scalars — everything broadcasts like jnp)."""

    x: jnp.ndarray
    y: jnp.ndarray
    z: jnp.ndarray

    # ---- constructors ---------------------------------------------------
    @classmethod
    def of(cls, a: jnp.ndarray) -> "V3":
        """From a trailing-axis-3 array [..., 3]."""
        return cls(a[..., 0], a[..., 1], a[..., 2])

    @classmethod
    def fill(cls, v, shape=()) -> "V3":
        """From a python/np 3-sequence, broadcast to ``shape``."""
        return cls(
            jnp.broadcast_to(jnp.float32(v[0]), shape),
            jnp.broadcast_to(jnp.float32(v[1]), shape),
            jnp.broadcast_to(jnp.float32(v[2]), shape),
        )

    @classmethod
    def zeros(cls, shape=()) -> "V3":
        z = jnp.zeros(shape, jnp.float32)
        return cls(z, z, z)

    def rows(self) -> jnp.ndarray:
        """To a trailing-axis-3 array (boundary use only — materializing
        this shape is the slow layout)."""
        return jnp.stack([self.x, self.y, self.z], axis=-1)

    # ---- arithmetic (elementwise; scalar operands broadcast) ------------
    def __add__(self, o):
        if isinstance(o, V3):
            return V3(self.x + o.x, self.y + o.y, self.z + o.z)
        return V3(self.x + o, self.y + o, self.z + o)

    __radd__ = __add__

    def __sub__(self, o):
        if isinstance(o, V3):
            return V3(self.x - o.x, self.y - o.y, self.z - o.z)
        return V3(self.x - o, self.y - o, self.z - o)

    def __rsub__(self, o):
        return V3(o - self.x, o - self.y, o - self.z)

    def __mul__(self, o):
        if isinstance(o, V3):
            return V3(self.x * o.x, self.y * o.y, self.z * o.z)
        return V3(self.x * o, self.y * o, self.z * o)

    __rmul__ = __mul__

    def __truediv__(self, o):
        if isinstance(o, V3):
            return V3(self.x / o.x, self.y / o.y, self.z / o.z)
        return V3(self.x / o, self.y / o, self.z / o)

    def __neg__(self):
        return V3(-self.x, -self.y, -self.z)

    # ---- indexing / masking --------------------------------------------
    def __getitem__(self, idx):
        return V3(self.x[idx], self.y[idx], self.z[idx])

    def max_component(self) -> jnp.ndarray:
        return jnp.maximum(jnp.maximum(self.x, self.y), self.z)

    def map(self, fn) -> "V3":
        return V3(fn(self.x), fn(self.y), fn(self.z))


def select_small(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """[M] table fetch by [R] ids via an M-way compare-select chain —
    zero gathers, zero one-hot materialization (M is a handful)."""
    out = jnp.broadcast_to(table[0], idx.shape)
    for k in range(1, int(table.shape[0])):
        out = jnp.where(idx == k, table[k], out)
    return out


# ---- free functions (mirror core/math.py) -------------------------------

def vdot(a: V3, b: V3) -> jnp.ndarray:
    """Same reduction order as jnp.sum over the trailing axis: x + y + z."""
    return a.x * b.x + a.y * b.y + a.z * b.z


def vcross(a: V3, b: V3) -> V3:
    return V3(
        a.y * b.z - a.z * b.y,
        a.z * b.x - a.x * b.z,
        a.x * b.y - a.y * b.x,
    )


def vlength(a: V3) -> jnp.ndarray:
    return safe_sqrt(vdot(a, a))


def vnormalize(a: V3, eps: float = 1e-20) -> V3:
    import jax.lax as lax

    s = lax.rsqrt(jnp.maximum(vdot(a, a), eps))
    return a * s


def vwhere(m: jnp.ndarray, a: V3, b: V3) -> V3:
    ax, ay, az = (a.x, a.y, a.z)
    bx, by, bz = (b.x, b.y, b.z)
    return V3(jnp.where(m, ax, bx), jnp.where(m, ay, by),
              jnp.where(m, az, bz))


def vreflect(v: V3, h: V3) -> V3:
    """2 (v.h) h - v (ray_tracing.comp:694)."""
    return h * (2.0 * vdot(v, h)) - v


def vmix(a: V3, b: V3, t) -> V3:
    return a + (b - a) * t


def vluminance(rgb: V3) -> jnp.ndarray:
    """Disney luminance weights 0.3/0.6/0.1 (ray_tracing.comp:799)."""
    return 0.3 * rgb.x + 0.6 * rgb.y + 0.1 * rgb.z


def build_tangent_space_v(n: V3) -> tuple[V3, V3]:
    """BuildTangentSpace (ray_tracing.comp:629-634), componentwise twin of
    core/math.py::build_tangent_space."""
    near_z = jnp.abs(n.z) > 0.9999995
    t_general = vnormalize(vcross(n, V3.fill((0.0, 0.0, 1.0))))
    x_axis = V3.fill((1.0, 0.0, 0.0))
    one = jnp.ones_like(n.x)
    t = vwhere(near_z, x_axis * one, t_general)
    b = vcross(n, t)
    return t, b


def tangent_to_world_v(t: V3, b: V3, n: V3, v: V3) -> V3:
    """Local (x,y,z) -> world via frame columns (ray_tracing.comp:637-639)."""
    return t * v.x + b * v.y + n * v.z


def spherical_uv_v(v: V3) -> tuple[jnp.ndarray, jnp.ndarray]:
    """Direction -> equirect (u, v) scalars (toSphericalCoord,
    ray_tracing.comp:181-188).  Fast polynomial atan2/asin — see
    core/math.py::fast_atan."""
    from pnraytracing_tpu.core.math import INV_PI, fast_asin, fast_atan2

    u = fast_atan2(v.z, v.x) * (0.5 * INV_PI) + 0.5
    w = fast_asin(v.y) * INV_PI + 0.5
    return u, 1.0 - w
