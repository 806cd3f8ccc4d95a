"""Equirectangular HDR environment light: lookup + importance sampling.

The reference builds the luminance CDFs on the CPU and *pre-inverts* them
into a lookup texture so the shader samples in O(1)
(``LoadHDRImage``, include/shader.hpp:126-225; device side
``SampleHDRImage``, ray_tracing.comp:560-576).  Here the marginal/conditional
CDFs stay as arrays and are inverted at sample time with ``searchsorted`` —
O(log W + log H), fully vectorized, and differentiable w.r.t. the environment
texels through the returned radiance and pdf values (the integer table
indices are implicitly detached).

Conventions: ``image[0]`` is the top row (+y pole).  Direction mapping
matches ``toSphericalCoord`` (comp:181-188): u = atan2(z,x)/2pi + 0.5,
v = 0.5 - asin(y)/pi.

Compat quirks (``compat=True``, SURVEY.md §3.3):
* solid-angle conversion uses ``(W*H/2) / (2 pi^2 sin(theta_elev))`` with the
  *elevation* sine clamped at 1e-10 (comp:572-574) — half the true density
  and effectively disabling lower-hemisphere NEE;
* the radiance fetched for an NEE sample comes from the vertically mirrored
  row of the one whose pdf was computed (the ``param.y`` flip at comp:563
  is applied before the HDRImage fetch at comp:575).
Default mode uses the exact pdf of the sampling procedure
(``p_xy * W * H / (2 pi^2 cos(theta_elev))``) and the matching texel.
"""

from __future__ import annotations

import math

import jax
import jax.numpy as jnp

from pnraytracing_tpu.core.math import PI, TWO_PI, hdr_luminance, spherical_uv
from pnraytracing_tpu.core.types import EnvMap

_POLE_EPS = 1e-6


def _bisect_rows(table: jnp.ndarray, x: jnp.ndarray, u: jnp.ndarray) -> jnp.ndarray:
    """Per-ray ``searchsorted(table[x], u, side='left')`` without
    materializing the gathered rows.

    ``table[x]`` for [R] rays over a [W, H] table builds an [R, H]
    intermediate — 268 MB of HBM traffic per bounce at 512^2 rays with a
    256-row environment.  An unrolled bisection needs only ceil(log2 H)
    gathers of ONE element per ray (the inverse-CDF *lookup* half of the
    reference's pre-inverted table design, shader.hpp:183-203, without
    baking the table).  Results are identical to searchsorted.
    """
    h = int(table.shape[1])
    lo = jnp.zeros_like(x)
    hi = jnp.full_like(x, h)
    # answers live in [0, h] (h+1 values) -> ceil(log2(h+1)) halvings
    for _ in range(max(1, math.ceil(math.log2(h + 1)))):
        active = lo < hi
        mid = jnp.minimum((lo + hi) // 2, h - 1)
        v = table[x, mid]
        right = active & (v < u)
        lo = jnp.where(right, mid + 1, lo)
        hi = jnp.where(active & ~right, mid, hi)
    return lo


def _alias_table(p: "np.ndarray"):
    """Walker alias table for a probability vector (host-side, O(n)).

    Returns (prob [n], alias [n]): sample j = floor(u*n); keep j if the
    fractional part < prob[j], else take alias[j].  The resulting
    distribution is EXACTLY p (Vose's stable construction)."""
    import numpy as np

    n = len(p)
    p = np.asarray(p, np.float64)
    s = p.sum()
    p = p / s if s > 0 else np.full(n, 1.0 / n)
    prob = np.zeros(n)
    alias = np.arange(n, dtype=np.int64)
    scaled = p * n
    small = [i for i in range(n) if scaled[i] < 1.0]
    large = [i for i in range(n) if scaled[i] >= 1.0]
    while small and large:
        s_i = small.pop()
        l_i = large.pop()
        prob[s_i] = scaled[s_i]
        alias[s_i] = l_i
        scaled[l_i] = (scaled[l_i] + scaled[s_i]) - 1.0
        (small if scaled[l_i] < 1.0 else large).append(l_i)
    for i in large + small:  # numerical leftovers sample themselves
        prob[i] = 1.0
    return prob.astype(np.float32), alias


def build_envmap(image: jnp.ndarray, alias: bool = False) -> EnvMap:
    """Build sampling tables from an [H, W, 3] radiance image
    (shader.hpp:145-181, minus the inversion bake).

    ``alias=True`` additionally bakes Walker alias tables host-side (the
    TPU analogue of the reference's pre-inverted texture): per-ray
    sampling then costs 2 row gathers instead of ~20 bisection gathers.
    Leave False for in-graph rebuilds (env optimization), where the
    tables cannot be constructed from traced values.

    When the image is a concrete (non-traced) array the whole bake runs
    in numpy on the host — like the reference's CPU-side LoadHDRImage —
    because on a tunneled device every eager op is a network round trip."""
    import numpy as np

    host = not isinstance(image, jax.core.Tracer)
    if host:
        img_np = np.asarray(image, np.float32)
        # same weights as core.math.hdr_luminance (shader.hpp:153)
        lum = (
            0.2 * img_np[..., 0]
            + 0.7 * img_np[..., 1]
            + 0.1 * img_np[..., 2]
        )
        pdf_xy = lum.T.copy()
        pdf_xy /= max(pdf_xy.sum(), 1e-20)
        pdf_marginal_x = pdf_xy.sum(axis=1)
        cdf_marginal_x = np.cumsum(pdf_marginal_x)
        cond = pdf_xy / np.maximum(pdf_marginal_x[:, None], 1e-20)
        cdf_y_given_x = np.cumsum(cond, axis=1)
        to_dev = jnp.asarray
    else:
        image = jnp.asarray(image, jnp.float32)
        lum = hdr_luminance(image)  # [H, W]
        pdf_xy = lum.T  # [W, H] — reference's pdf[x][y] layout
        total = jnp.maximum(jnp.sum(pdf_xy), 1e-20)
        pdf_xy = pdf_xy / total
        pdf_marginal_x = jnp.sum(pdf_xy, axis=1)  # [W]
        cdf_marginal_x = jnp.cumsum(pdf_marginal_x)
        cond = pdf_xy / jnp.maximum(pdf_marginal_x[:, None], 1e-20)
        cdf_y_given_x = jnp.cumsum(cond, axis=1)
        to_dev = lambda a: a  # already traced values

    alias_x = alias_y = alias_fat = None
    if alias:
        if not host:
            raise ValueError(
                "alias tables cannot be built from traced values; call "
                "with alias=False inside jit/grad"
            )
        w, h = int(pdf_xy.shape[0]), int(pdf_xy.shape[1])
        prob_x, al_x = _alias_table(pdf_marginal_x)
        alias_x = jnp.asarray(
            np.stack([prob_x, al_x.astype(np.float32)], axis=1)
        )
        prob_y = np.zeros((w, h), np.float32)
        al_y = np.zeros((w, h), np.float32)
        for xcol in range(w):
            pcol, acol = _alias_table(pdf_xy[xcol])
            prob_y[xcol] = pcol
            al_y[xcol] = acol.astype(np.float32)
        alias_y = jnp.asarray(np.stack([prob_y, al_y], axis=-1))
        # fat rows: bake the texel radiance + pdf of BOTH alias outcomes
        # into the row so the device resolves a sample with ONE gather
        al_int = al_y.astype(np.int64)  # [w, h] alias y-cells
        img_t = img_np.transpose(1, 0, 2)  # [w, h, 3]
        rgb_keep = img_t
        rgb_alias = np.take_along_axis(img_t, al_int[..., None], axis=1)
        pdf_keep = pdf_xy.astype(np.float32)
        pdf_alias = np.take_along_axis(
            pdf_xy, al_int, axis=1
        ).astype(np.float32)
        alias_fat = jnp.asarray(
            np.concatenate(
                [
                    prob_y[..., None], al_y[..., None],
                    rgb_keep, rgb_alias,
                    pdf_keep[..., None], pdf_alias[..., None],
                ],
                axis=-1,
            ).reshape(w * h, 10).astype(np.float32)
        )
    img_j = jnp.asarray(image, jnp.float32) if host else image
    return EnvMap(
        image=img_j,
        quad12=_pack_quads(img_j),
        pdf_xy=to_dev(pdf_xy.astype(np.float32) if host else pdf_xy),
        cdf_marginal_x=to_dev(
            cdf_marginal_x.astype(np.float32) if host else cdf_marginal_x
        ),
        cdf_y_given_x=to_dev(
            cdf_y_given_x.astype(np.float32) if host else cdf_y_given_x
        ),
        alias_x=alias_x,
        alias_y=alias_y,
        alias_fat=alias_fat,
    )


def _pack_quads(image: jnp.ndarray) -> jnp.ndarray:
    """[H, W, 3] -> [H, W, 12] of 2x2 bilinear quads (u wraps, v clamps
    — shader.hpp:140-143 semantics, with the seam wrap)."""
    xp = jnp.roll(image, -1, axis=1)  # (y, x+1) with azimuth wrap
    dn = jnp.concatenate([image[1:], image[-1:]], axis=0)  # (y+1, x) clamped
    dnxp = jnp.roll(dn, -1, axis=1)
    return jnp.concatenate([image, xp, dn, dnxp], axis=-1)


def _grid_direction(u: jnp.ndarray, v: jnp.ndarray):
    """(u, v) in [0,1]^2 -> unit direction (comp:566-568)."""
    phi = TWO_PI * (u - 0.5)
    theta = PI * (0.5 - v)  # elevation; v=0 -> +pi/2 (up)
    cos_t = jnp.cos(theta)
    return jnp.stack(
        [cos_t * jnp.cos(phi), jnp.sin(theta), cos_t * jnp.sin(phi)], axis=-1
    ), theta


def sample_envmap(env: EnvMap, u1: jnp.ndarray, u2: jnp.ndarray, compat: bool = False):
    """Importance-sample the environment (SampleHDRImage, comp:560-576).

    u1, u2: [R] uniforms.  Returns (dir [R,3], radiance [R,3], pdf [R]).
    """
    w, h = env.width, env.height
    if env.alias_x is not None and not compat:
        # Walker alias sampling: 2 row gathers total, same distribution
        # as the CDF inversion (fractional parts conditioned on the cell
        # are uniform, so reusing them is exact)
        j1 = jnp.clip((u1 * w).astype(jnp.int32), 0, w - 1)
        frac1 = u1 * w - j1.astype(jnp.float32)
        rowx = env.alias_x[j1]  # [R, 2]
        x = jnp.where(frac1 < rowx[:, 0], j1, rowx[:, 1].astype(jnp.int32))
        j2 = jnp.clip((u2 * h).astype(jnp.int32), 0, h - 1)
        frac2 = u2 * h - j2.astype(jnp.float32)
        rowy = env.alias_y[x, j2]  # [R, 2]
        y = jnp.where(frac2 < rowy[:, 0], j2, rowy[:, 1].astype(jnp.int32))
    else:
        x = jnp.clip(
            jnp.searchsorted(env.cdf_marginal_x, u1, side="left"), 0, w - 1
        ).astype(jnp.int32)
        y = jnp.clip(_bisect_rows(env.cdf_y_given_x, x, u2), 0, h - 1).astype(
            jnp.int32
        )

    p2d = env.pdf_xy[x, y]  # [R]
    if compat:
        u = x.astype(jnp.float32) / w
        v = y.astype(jnp.float32) / h
        # reference: theta = pi*(param.y - 0.5) with param.y = 1 - y/h,
        # i.e. elevation pi*(0.5 - y/h) — same as _grid_direction(u, y/h)
        d, theta = _grid_direction(u, v)
        sin_theta = jnp.maximum(1e-10, jnp.sin(theta))
        convert = jnp.float32((w * h) // 2) / (2.0 * PI * PI * sin_theta)
        pdf = p2d * convert
        # mirrored-row radiance fetch (comp:563 + 575)
        radiance = bilinear_lookup(env.image, u, 1.0 - v)
    else:
        u = (x.astype(jnp.float32) + 0.5) / w
        v = (y.astype(jnp.float32) + 0.5) / h
        d, theta = _grid_direction(u, v)
        cos_theta = jnp.maximum(jnp.cos(theta), _POLE_EPS)
        pdf = p2d * (w * h) / (2.0 * PI * PI * cos_theta)
        radiance = env.image[y, x]
    return d, radiance, pdf


def envmap_pdf(env: EnvMap, dirs: jnp.ndarray) -> jnp.ndarray:
    """Solid-angle pdf of the NEE sampler at arbitrary directions — the
    (corrected) analogue of the reference's unused ``SampleHDRImagePDF``
    (comp:578-587); needed for full MIS of BRDF-sampled env hits."""
    w, h = env.width, env.height
    uv = spherical_uv(dirs)
    x = jnp.clip((uv[..., 0] * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((uv[..., 1] * h).astype(jnp.int32), 0, h - 1)
    theta = PI * (0.5 - uv[..., 1])
    cos_theta = jnp.maximum(jnp.cos(theta), _POLE_EPS)
    return env.pdf_xy[x, y] * (w * h) / (2.0 * PI * PI * cos_theta)


def bilinear_lookup(image: jnp.ndarray, u: jnp.ndarray, v: jnp.ndarray) -> jnp.ndarray:
    """Bilinear fetch at normalized (u, v); u wraps (azimuth seam), v clamps.
    The reference uses GL_LINEAR with CLAMP_TO_EDGE on both axes
    (shader.hpp:140-143); wrapping u is strictly more correct at the seam."""
    h, w = image.shape[0], image.shape[1]
    fx = u * w - 0.5
    fy = v * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    x1i = jnp.mod(x0i + 1, w)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    y1i = jnp.clip(y0i + 1, 0, h - 1)
    c00 = image[y0i, x0i]
    c10 = image[y0i, x1i]
    c01 = image[y1i, x0i]
    c11 = image[y1i, x1i]
    top = c00 * (1 - tx) + c10 * tx
    bot = c01 * (1 - tx) + c11 * tx
    return top * (1 - ty) + bot * ty


def bilinear_lookup_quads(quad12: jnp.ndarray, u, v) -> jnp.ndarray:
    """Bilinear fetch via the pre-packed quad rows — ONE gather."""
    h, w = quad12.shape[0], quad12.shape[1]
    fx = u * w - 0.5
    fy = v * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    q = quad12.reshape(h * w, 12)[y0i * w + x0i]
    c00, c10 = q[..., 0:3], q[..., 3:6]
    c01, c11 = q[..., 6:9], q[..., 9:12]
    top = c00 * (1 - tx) + c10 * tx
    bot = c01 * (1 - tx) + c11 * tx
    return top * (1 - ty) + bot * ty


def envmap_lookup(env: EnvMap, dirs: jnp.ndarray) -> jnp.ndarray:
    """Radiance along escaped rays (GetHDRImageColor, comp:190-193)."""
    uv = spherical_uv(dirs)
    if env.quad12 is not None:
        return bilinear_lookup_quads(env.quad12, uv[..., 0], uv[..., 1])
    return bilinear_lookup(env.image, uv[..., 0], uv[..., 1])


# ---- component-layout (V3) forms ----------------------------------------
# The per-ray [R, 3] layout lane-pads to [R, 128] on TPU (BASELINE.md
# round 3); these twins keep directions/colors as component arrays.  The
# one unavoidable random access is the quad/alias row gather.

def bilinear_lookup_quads_v(quad12: jnp.ndarray, u, v) -> "V3":
    from pnraytracing_tpu.core.vec import V3

    h, w = quad12.shape[0], quad12.shape[1]
    fx = u * w - 0.5
    fy = v * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = fx - x0
    ty = fy - y0
    x0i = jnp.mod(x0.astype(jnp.int32), w)
    y0i = jnp.clip(y0.astype(jnp.int32), 0, h - 1)
    q = quad12.reshape(h * w, 12)[y0i * w + x0i]

    def lerp2(c00, c10, c01, c11):
        top = c00 * (1 - tx) + c10 * tx
        bot = c01 * (1 - tx) + c11 * tx
        return top * (1 - ty) + bot * ty

    return V3(
        lerp2(q[..., 0], q[..., 3], q[..., 6], q[..., 9]),
        lerp2(q[..., 1], q[..., 4], q[..., 7], q[..., 10]),
        lerp2(q[..., 2], q[..., 5], q[..., 8], q[..., 11]),
    )


def envmap_lookup_v(env: EnvMap, dirs: "V3") -> "V3":
    """Component twin of :func:`envmap_lookup`."""
    from pnraytracing_tpu.core.vec import V3, spherical_uv_v

    u, v = spherical_uv_v(dirs)
    if env.quad12 is not None:
        return bilinear_lookup_quads_v(env.quad12, u, v)
    out = bilinear_lookup(env.image, u, v)
    return V3.of(out)


def sample_envmap_v(env: EnvMap, u1, u2, compat: bool = False):
    """Component twin of :func:`sample_envmap`:
    returns (dir V3, radiance V3, pdf [R]).

    With host-baked fat alias rows (types.py::EnvMap.alias_fat) the whole
    sample costs TWO row gathers (alias_x + fat row) and pure elementwise
    math — no [R, 3] stack, no follow-up image/pdf gathers.  Identical
    values to :func:`sample_envmap`'s alias path (the fat row carries the
    same texels/pdf the separate gathers would fetch)."""
    from pnraytracing_tpu.core.vec import V3

    if env.alias_fat is not None and not compat:
        w, h = env.width, env.height
        j1 = jnp.clip((u1 * w).astype(jnp.int32), 0, w - 1)
        frac1 = u1 * w - j1.astype(jnp.float32)
        rowx = env.alias_x[j1]  # [R, 2]
        x = jnp.where(frac1 < rowx[:, 0], j1, rowx[:, 1].astype(jnp.int32))
        j2 = jnp.clip((u2 * h).astype(jnp.int32), 0, h - 1)
        frac2 = u2 * h - j2.astype(jnp.float32)
        fat = env.alias_fat[x * h + j2]  # [R, 10] — the ONE env gather
        take = frac2 < fat[:, 0]
        y = jnp.where(take, j2, fat[:, 1].astype(jnp.int32))
        radiance = V3(
            jnp.where(take, fat[:, 2], fat[:, 5]),
            jnp.where(take, fat[:, 3], fat[:, 6]),
            jnp.where(take, fat[:, 4], fat[:, 7]),
        )
        p2d = jnp.where(take, fat[:, 8], fat[:, 9])
        u = (x.astype(jnp.float32) + 0.5) / w
        v = (y.astype(jnp.float32) + 0.5) / h
        phi = TWO_PI * (u - 0.5)
        theta = PI * (0.5 - v)
        cos_t = jnp.cos(theta)
        dirs = V3(cos_t * jnp.cos(phi), jnp.sin(theta), cos_t * jnp.sin(phi))
        pdf = p2d * (w * h) / (
            2.0 * PI * PI * jnp.maximum(cos_t, _POLE_EPS)
        )
        return dirs, radiance, pdf

    d, radiance, pdf = sample_envmap(env, u1, u2, compat=compat)
    return V3.of(d), V3.of(radiance), pdf


def envmap_pdf_v(env: EnvMap, dirs: "V3") -> jnp.ndarray:
    from pnraytracing_tpu.core.vec import spherical_uv_v

    w, h = env.width, env.height
    u, v = spherical_uv_v(dirs)
    x = jnp.clip((u * w).astype(jnp.int32), 0, w - 1)
    y = jnp.clip((v * h).astype(jnp.int32), 0, h - 1)
    theta = PI * (0.5 - v)
    cos_theta = jnp.maximum(jnp.cos(theta), _POLE_EPS)
    return env.pdf_xy[x, y] * (w * h) / (2.0 * PI * PI * cos_theta)
