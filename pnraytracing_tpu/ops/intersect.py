"""Ray-triangle and ray-AABB intersection, vectorized.

The watertight test is the PBRT-3 style algorithm the reference implements
twice (CPU: ``include/triangle.hpp:15-181``, GLSL:
``shaders/ray_tracing.comp:254-427``): translate to ray origin, permute axes
so the dominant direction component is z, shear to +z, signed 2-D edge
functions, mixed-sign rejection, scaled-t range test.  Here it is one
branch-free jnp function over arbitrary batch shapes — the same code is the
test oracle, the ``lax.while_loop`` traversal inner loop, and (inlined) the
Pallas kernel body.

Differences from the reference, controlled by ``compat``:
  * default permutes to the dominant axis (true watertight behaviour); the
    reference only swaps when ``dir.z == 0`` (triangle.hpp:34-47).
  * default AABB test clips to ``[0, t_max]``; the reference's
    ``BoundIntersect`` returns pure slab overlap ``t1 >= t0`` ignoring both
    the ray interval and sign (bound.hpp:31-47, ray_tracing.comp:213-228) —
    correct but visits extra nodes.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct


@struct.dataclass
class Hit:
    """Closest-hit record; attributes are recomputed differentiably from
    (tri, bary) by the shading stage (path-replay style)."""

    tri: jnp.ndarray  # [...] i32 triangle index, -1 = miss
    t: jnp.ndarray  # [...] f32 ray parameter
    b1: jnp.ndarray  # [...] f32 barycentric weight of vertex 1
    b2: jnp.ndarray  # [...] f32 barycentric weight of vertex 2

    @property
    def valid(self) -> jnp.ndarray:
        return self.tri >= 0

    @property
    def b0(self) -> jnp.ndarray:
        return 1.0 - self.b1 - self.b2


def _axis_permutation(d: jnp.ndarray, compat: bool):
    """Choose (kx, ky, kz) per ray.  Default: kz = argmax |d| (watertight).
    Compat: identity unless d.z == 0, then the reference's x/z or y/z swap
    (triangle.hpp:34-47)."""
    if compat:
        ad = jnp.abs(d)
        zx = ad[..., 0] > ad[..., 1]  # swap x<->z, order (z, y, x)
        z_zero = d[..., 2] == 0.0
        kx = jnp.where(z_zero, jnp.where(zx, 2, 0), 0)
        ky = jnp.where(z_zero, jnp.where(zx, 1, 2), 1)
        kz = jnp.where(z_zero, jnp.where(zx, 0, 1), 2)
    else:
        kz = jnp.argmax(jnp.abs(d), axis=-1)
        kx = (kz + 1) % 3
        ky = (kx + 1) % 3
    return kx, ky, kz


def _take3(v: jnp.ndarray, k: jnp.ndarray) -> jnp.ndarray:
    """v[..., k] with per-element k."""
    return jnp.take_along_axis(v, k[..., None], axis=-1)[..., 0]


def intersect_triangle(
    p0: jnp.ndarray,
    p1: jnp.ndarray,
    p2: jnp.ndarray,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_max: jnp.ndarray,
    compat: bool = False,
):
    """Watertight ray-triangle intersection.

    All array arguments broadcast; returns (hit [...] bool, t, b1, b2).
    Barycentrics satisfy x = b0*p0 + b1*p1 + b2*p2 with b0 = 1-b1-b2,
    matching the edge-function association of the reference
    (ray_tracing.comp:296-325).
    """
    kx, ky, kz = _axis_permutation(d, compat)

    def perm(v):
        return jnp.stack([_take3(v, kx), _take3(v, ky), _take3(v, kz)], axis=-1)

    dp = perm(d)
    a = perm(p0 - o)
    b = perm(p1 - o)
    c = perm(p2 - o)

    inv_dz = 1.0 / dp[..., 2]
    sx = dp[..., 0] * inv_dz
    sy = dp[..., 1] * inv_dz
    ax = a[..., 0] - a[..., 2] * sx
    ay = a[..., 1] - a[..., 2] * sy
    az = a[..., 2] * inv_dz
    bx = b[..., 0] - b[..., 2] * sx
    by = b[..., 1] - b[..., 2] * sy
    bz = b[..., 2] * inv_dz
    cx = c[..., 0] - c[..., 2] * sx
    cy = c[..., 1] - c[..., 2] * sy
    cz = c[..., 2] * inv_dz

    e0 = bx * cy - by * cx
    e1 = cx * ay - cy * ax
    e2 = ax * by - ay * bx

    any_neg = (e0 < 0) | (e1 < 0) | (e2 < 0)
    any_pos = (e0 > 0) | (e1 > 0) | (e2 > 0)
    mixed = any_neg & any_pos

    det = e0 + e1 + e2
    t_scaled = e0 * az + e1 * bz + e2 * cz
    ok_pos = (det > 0) & (t_scaled > 0) & (t_scaled <= t_max * det)
    ok_neg = (det < 0) & (t_scaled < 0) & (t_scaled >= t_max * det)
    hit = (~mixed) & (det != 0) & (ok_pos | ok_neg)

    inv_det = 1.0 / jnp.where(det == 0, 1.0, det)
    t = t_scaled * inv_det
    b1_ = e1 * inv_det
    b2_ = e2 * inv_det
    return hit, t, b1_, b2_


def triangle_setup_c(dx, dy, dz, compat: bool = False):
    """Ray-constant part of the watertight test (axis permutation +
    shear constants, incl. the divide) — hoist out of per-triangle loops
    (the Mosaic leaf loop runs it up to 4x per pop otherwise).  Returns
    the tuple :func:`intersect_triangle_c` accepts as ``setup``."""
    adx, ady, adz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
    if compat:
        # identity unless d.z == 0, then x/z or y/z swap (triangle.hpp:34-47)
        zx = adx > ady
        z_zero = dz == 0.0
        kx = jnp.where(z_zero, jnp.where(zx, 2, 0), 0)
        ky = jnp.where(z_zero, jnp.where(zx, 1, 2), 1)
        kz = jnp.where(z_zero, jnp.where(zx, 0, 1), 2)
    else:
        # jnp.argmax tie-breaking: first index among maxima
        kz = jnp.where(
            adx >= ady,
            jnp.where(adx >= adz, 0, 2),
            jnp.where(ady >= adz, 1, 2),
        )
        kx = (kz + 1) % 3
        ky = (kx + 1) % 3

    def sel(k, x, y, z):
        return jnp.where(k == 0, x, jnp.where(k == 1, y, z))

    dpx = sel(kx, dx, dy, dz)
    dpy = sel(ky, dx, dy, dz)
    dpz = sel(kz, dx, dy, dz)
    inv_dz = 1.0 / dpz
    return kx, ky, kz, dpx * inv_dz, dpy * inv_dz, inv_dz


def triangle_setup_static(ax: int, dx, dy, dz):
    """Setup for a tile whose rays ALL have dominant axis ``ax`` (a
    Python int): the permutation indices are compile-time constants, so
    :func:`intersect_triangle_c`'s per-component selects fold away —
    ~18 vector selects per triangle test become free rewiring.  Only
    valid when every ray's argmax |d| (with the default tie-breaking)
    is ``ax``; the Mosaic kernels verify that per tile host-side and
    switch to the general setup otherwise."""
    comps = (dx, dy, dz)
    kz = ax
    kx = (kz + 1) % 3
    ky = (kx + 1) % 3
    inv_dz = 1.0 / comps[kz]
    return kx, ky, kz, comps[kx] * inv_dz, comps[ky] * inv_dz, inv_dz


def intersect_triangle_c(
    v0,
    v1,
    v2,
    ox,
    oy,
    oz,
    dx,
    dy,
    dz,
    t_max,
    compat: bool = False,
    setup=None,
):
    """Component-form twin of :func:`intersect_triangle`.

    ``v0/v1/v2`` are 3-tuples of (scalar or broadcastable) vertex
    components; rays arrive as separate component arrays.  This is the
    shape the Pallas packet kernel works in — triangle corners are SMEM
    scalars broadcast against (sublane, lane) ray tiles, where a [R, 3]
    layout would put xyz on the 128-wide lane axis.  The arithmetic is
    op-for-op identical to :func:`intersect_triangle` (the axis
    permutation is pure selection), so results match bit-for-bit; a unit
    test asserts that equivalence.  Reference: triangle.hpp:15-115,
    ray_tracing.comp:254-357.
    """
    if setup is None:
        setup = triangle_setup_c(dx, dy, dz, compat=compat)
    kx, ky, kz, sx, sy, inv_dz = setup

    def sel(k, x, y, z):
        if isinstance(k, int):  # static permutation (triangle_setup_static)
            return (x, y, z)[k]
        return jnp.where(k == 0, x, jnp.where(k == 1, y, z))

    def perm(x, y, z):
        return sel(kx, x, y, z), sel(ky, x, y, z), sel(kz, x, y, z)

    a0, a1, a2 = perm(v0[0] - ox, v0[1] - oy, v0[2] - oz)
    b0, b1, b2v = perm(v1[0] - ox, v1[1] - oy, v1[2] - oz)
    c0, c1, c2 = perm(v2[0] - ox, v2[1] - oy, v2[2] - oz)
    ax = a0 - a2 * sx
    ay = a1 - a2 * sy
    az = a2 * inv_dz
    bx = b0 - b2v * sx
    by = b1 - b2v * sy
    bz = b2v * inv_dz
    cx = c0 - c2 * sx
    cy = c1 - c2 * sy
    cz = c2 * inv_dz

    e0 = bx * cy - by * cx
    e1 = cx * ay - cy * ax
    e2 = ax * by - ay * bx

    any_neg = (e0 < 0) | (e1 < 0) | (e2 < 0)
    any_pos = (e0 > 0) | (e1 > 0) | (e2 > 0)
    mixed = any_neg & any_pos

    det = e0 + e1 + e2
    t_scaled = e0 * az + e1 * bz + e2 * cz
    ok_pos = (det > 0) & (t_scaled > 0) & (t_scaled <= t_max * det)
    ok_neg = (det < 0) & (t_scaled < 0) & (t_scaled >= t_max * det)
    hit = (~mixed) & (det != 0) & (ok_pos | ok_neg)

    inv_det = 1.0 / jnp.where(det == 0, 1.0, det)
    t = t_scaled * inv_det
    b1_ = e1 * inv_det
    b2_ = e2 * inv_det
    return hit, t, b1_, b2_


def intersect_aabb_c(
    bmin,
    bmax,
    ox,
    oy,
    oz,
    inv_dx,
    inv_dy,
    inv_dz,
    t_max,
    compat: bool = False,
):
    """Component-form twin of :func:`intersect_aabb` (slab test with
    scalar bounds broadcast over ray-component arrays); arithmetic is
    op-for-op identical.  Reference: bound.hpp:31-47."""
    fx = (bmax[0] - ox) * inv_dx
    nx = (bmin[0] - ox) * inv_dx
    fy = (bmax[1] - oy) * inv_dy
    ny = (bmin[1] - oy) * inv_dy
    fz = (bmax[2] - oz) * inv_dz
    nz = (bmin[2] - oz) * inv_dz
    t1 = jnp.minimum(
        jnp.minimum(jnp.maximum(fx, nx), jnp.maximum(fy, ny)),
        jnp.maximum(fz, nz),
    )
    t0 = jnp.maximum(
        jnp.maximum(jnp.minimum(fx, nx), jnp.minimum(fy, ny)),
        jnp.minimum(fz, nz),
    )
    if compat:
        return t1 >= t0
    return (t1 >= jnp.maximum(t0, 0.0)) & (t0 <= t_max)


def safe_inv_dir(d: jnp.ndarray, eps: float = 1e-20) -> jnp.ndarray:
    """1/d with zero components nudged to +-eps.  GLSL gets +-inf from
    ``1.0 / ray.dir`` (ray_tracing.comp:214) and relies on IEEE semantics;
    a finite clamp avoids 0*inf NaNs in the slab test on all backends."""
    mag = jnp.maximum(jnp.abs(d), eps)
    return jnp.where(d >= 0, 1.0, -1.0) / mag


def intersect_aabb(
    p_min: jnp.ndarray,
    p_max: jnp.ndarray,
    o: jnp.ndarray,
    inv_d: jnp.ndarray,
    t_max: jnp.ndarray,
    compat: bool = False,
) -> jnp.ndarray:
    """Slab test.  ``compat`` reproduces the reference's interval-free
    ``t1 >= t0`` (ray_tracing.comp:213-228); default additionally clips to
    the live ray segment [0, t_max] (a strict superset of misses, so images
    are identical while traversal touches fewer nodes)."""
    f = (p_max - o) * inv_d
    n = (p_min - o) * inv_d
    t1 = jnp.min(jnp.maximum(f, n), axis=-1)
    t0 = jnp.max(jnp.minimum(f, n), axis=-1)
    if compat:
        return t1 >= t0
    return (t1 >= jnp.maximum(t0, 0.0)) & (t0 <= t_max)


def brute_force_closest_hit(
    positions: jnp.ndarray,
    indices: jnp.ndarray,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_max: jnp.ndarray,
    compat: bool = False,
    chunk: int = 4096,
) -> Hit:
    """All-pairs closest hit — the oracle the BVH path is tested against
    (the reference author used the CPU mirror the same way, SURVEY.md §4).

    positions [V,3], indices [T,3]; o, d [R,3]; returns Hit over [R].
    Triangles are scanned in fixed chunks to bound peak memory at
    R * chunk tests.
    """
    num_tris = int(indices.shape[0])
    r = o.shape[0]
    best = Hit(
        tri=jnp.full((r,), -1, jnp.int32),
        t=jnp.asarray(t_max, jnp.float32),
        b1=jnp.zeros((r,), jnp.float32),
        b2=jnp.zeros((r,), jnp.float32),
    )
    for lo in range(0, num_tris, chunk):
        hi = min(lo + chunk, num_tris)
        idx = indices[lo:hi]  # [C, 3]
        p = positions[idx]  # [C, 3, 3]
        hit, t, b1, b2 = intersect_triangle(
            p[None, :, 0, :],
            p[None, :, 1, :],
            p[None, :, 2, :],
            o[:, None, :],
            d[:, None, :],
            best.t[:, None],
            compat=compat,
        )  # [R, C]
        t = jnp.where(hit, t, jnp.inf)
        j = jnp.argmin(t, axis=1)  # earliest hit in chunk
        rr = jnp.arange(r)
        chunk_hit = hit[rr, j]
        closer = chunk_hit & (t[rr, j] < best.t)
        best = Hit(
            tri=jnp.where(closer, jnp.int32(lo) + j.astype(jnp.int32), best.tri),
            t=jnp.where(closer, t[rr, j], best.t),
            b1=jnp.where(closer, b1[rr, j], best.b1),
            b2=jnp.where(closer, b2[rr, j], best.b2),
        )
    return best


def brute_force_any_hit(
    positions: jnp.ndarray,
    indices: jnp.ndarray,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_max: jnp.ndarray,
    compat: bool = False,
    chunk: int = 4096,
) -> jnp.ndarray:
    """Occlusion oracle: any triangle intersects the segment."""
    num_tris = int(indices.shape[0])
    occluded = jnp.zeros((o.shape[0],), bool)
    for lo in range(0, num_tris, chunk):
        hi = min(lo + chunk, num_tris)
        idx = indices[lo:hi]
        p = positions[idx]
        hit, _, _, _ = intersect_triangle(
            p[None, :, 0, :],
            p[None, :, 1, :],
            p[None, :, 2, :],
            o[:, None, :],
            d[:, None, :],
            jnp.asarray(t_max, jnp.float32)[:, None],
            compat=compat,
        )
        occluded = occluded | jnp.any(hit, axis=1)
    return occluded
