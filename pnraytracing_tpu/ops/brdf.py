"""Disney principled BRDF: evaluation, lobe sampling, pdf.

Rebuilds the GLSL implementation (ray_tracing.comp:649-849) as vectorized
jnp over per-ray material records (a :class:`Materials` pytree gathered to
[R]-shaped leaves).  Structure:

* ``disney_eval`` — full anisotropic eval (comp:788-849): diffuse +
  subsurface mix + sheen, GTR2-aniso specular with Smith-GGX, GTR1
  clearcoat.
* ``disney_sample`` — one-of-three lobe sampling with probabilities
  (1-metallic, 1, 0.25*clearcoat) (comp:748-769).
* ``disney_pdf`` — the lobe-weighted pdf the reference uses for MIS
  (comp:710-738, recomputed inline at comp:775-784).

Compat quirks reproduced when ``compat=True`` (SURVEY.md §3.3):
* ``SampleGTR2/SampleGTR1`` build the half-vector with
  ``cosPhi = 1 - sin^2(phi)`` and ``sinTheta = 1 - cos^2`` (no sqrt)
  (comp:689-691, 700-702); default uses the standard construction.
* pdf terms are left unclamped (they can go negative below the horizon);
  default clamps to >= 0.
"""

from __future__ import annotations

import jax.numpy as jnp

from pnraytracing_tpu.core.math import (
    INV_PI,
    PI,
    TWO_PI,
    mix,
    safe_sqrt,
    sqr,
)
from pnraytracing_tpu.core.types import Materials
from pnraytracing_tpu.core.vec import (
    V3,
    tangent_to_world_v,
    vdot,
    vluminance,
    vmix,
    vnormalize,
    vreflect,
    vwhere,
)

_EPS = 1e-10


def schlick_fresnel(u: jnp.ndarray) -> jnp.ndarray:
    m = jnp.clip(1.0 - u, 0.0, 1.0)
    m2 = m * m
    return m2 * m2 * m


def gtr1(ndoth: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    a2 = sqr(a)
    t = 1.0 + (a2 - 1.0) * sqr(ndoth)
    val = (a2 - 1.0) / (PI * jnp.log(jnp.maximum(a2, _EPS)) * jnp.maximum(t, _EPS))
    return jnp.where(a >= 1.0, INV_PI, val)


def gtr2(ndoth: jnp.ndarray, a: jnp.ndarray) -> jnp.ndarray:
    a2 = sqr(a)
    t = 1.0 + (a2 - 1.0) * sqr(ndoth)
    return a2 / (PI * jnp.maximum(sqr(t), _EPS))


def gtr2_aniso(ndoth, hdotx, hdoty, ax, ay):
    denom = PI * ax * ay * sqr(sqr(hdotx / ax) + sqr(hdoty / ay) + sqr(ndoth))
    return 1.0 / jnp.maximum(denom, _EPS)


def smith_g_ggx(ndotv, alpha_g):
    a = sqr(alpha_g)
    b = sqr(ndotv)
    return 1.0 / jnp.maximum(ndotv + safe_sqrt(a + b - a * b), _EPS)


def smith_g_ggx_aniso(ndotv, vdotx, vdoty, ax, ay):
    denom = ndotv + safe_sqrt(sqr(vdotx * ax) + sqr(vdoty * ay) + sqr(ndotv))
    return 1.0 / jnp.maximum(denom, _EPS)


def clearcoat_alpha(m: Materials) -> jnp.ndarray:
    return mix(0.1, 0.001, m.clearcoat_gloss)


def specular_alpha(m: Materials) -> jnp.ndarray:
    return jnp.maximum(0.001, sqr(m.roughness))


def apply_compat_material_decode(m: Materials) -> Materials:
    """The reference's buffer decode reads param row 3 where row 4 was
    intended (ray_tracing.comp:139-142), so on-device
    clearcoatGloss = sheen, IOR = sheenTint, transmission = clearcoat."""
    return m.replace(clearcoat_gloss=m.sheen, ior=m.sheen_tint, transmission=m.clearcoat)


def disney_eval_v(
    v: "V3",
    n: "V3",
    l: "V3",
    x: "V3",
    y: "V3",
    m: Materials,
    cdlin: "V3",
) -> "V3":
    """f(V, L) — DisneyBRDF (ray_tracing.comp:788-849) in the
    component-array layout (core/vec.py).  ``m`` carries [R] scalar
    parameter leaves; ``cdlin`` is the (possibly texture-overridden)
    base color.  This is the primary implementation; the [R, 3] form
    below wraps it."""
    ndotl = vdot(n, l)
    ndotv = vdot(n, v)
    valid = (ndotl >= 0) & (ndotv >= 0)

    h = vnormalize(l + v)
    ndoth = vdot(n, h)
    ldoth = vdot(l, h)

    cdlum = vluminance(cdlin)
    safe_lum = jnp.maximum(cdlum, _EPS)
    one = V3.fill((1.0, 1.0, 1.0))
    ctint = vwhere(cdlum > 0, cdlin / safe_lum, one * jnp.ones_like(cdlum))
    cspec = vmix(one * jnp.ones_like(cdlum), ctint, m.specular_tint) * m.specular
    cspec0 = vmix(cspec * 0.08, cdlin, m.metallic)
    csheen = vmix(one * jnp.ones_like(cdlum), ctint, m.sheen_tint)

    # diffuse retro-reflection
    fd90 = 0.5 + 2.0 * sqr(ldoth) * m.roughness
    fl = schlick_fresnel(ndotl)
    fv = schlick_fresnel(ndotv)
    fd = mix(1.0, fd90, fl) * mix(1.0, fd90, fv)

    # Hanrahan-Krueger subsurface approximation
    fss90 = sqr(ldoth) * m.roughness
    fss = mix(1.0, fss90, fl) * mix(1.0, fss90, fv)
    ss = 1.25 * (fss * (1.0 / jnp.maximum(ndotl + ndotv, _EPS) - 0.5) + 0.5)

    # anisotropic specular
    aspect = safe_sqrt(1.0 - m.anisotropic * 0.9)
    ax = jnp.maximum(0.001, sqr(m.roughness) / jnp.maximum(aspect, _EPS))
    ay = jnp.maximum(0.001, sqr(m.roughness) * aspect)
    ds = gtr2_aniso(ndoth, vdot(h, x), vdot(h, y), ax, ay)
    fh = schlick_fresnel(ldoth)
    fs = vmix(cspec0, one * jnp.ones_like(fh), fh)
    gs = smith_g_ggx_aniso(ndotl, vdot(l, x), vdot(l, y), ax, ay)
    gs = gs * smith_g_ggx_aniso(ndotv, vdot(v, x), vdot(v, y), ax, ay)

    # clearcoat
    dr = gtr1(ndoth, clearcoat_alpha(m))
    fr = mix(0.04, 1.0, fh)
    gr = smith_g_ggx(ndotl, 0.25) * smith_g_ggx(ndotv, 0.25)

    fsheen = csheen * (fh * m.sheen)

    diffuse = cdlin * (INV_PI * mix(fd, ss, m.subsurface)) + fsheen
    specular = fs * (gs * ds)
    clearcoat = one * (0.25 * gr * fr * dr * m.clearcoat)

    out = diffuse * (1.0 - m.metallic) + specular + clearcoat
    zero = jnp.zeros_like(ndotl)
    return vwhere(valid, out, V3(zero, zero, zero))


def disney_eval(
    v: jnp.ndarray,
    n: jnp.ndarray,
    l: jnp.ndarray,
    x: jnp.ndarray,
    y: jnp.ndarray,
    m: Materials,
) -> jnp.ndarray:
    """[R, 3] wrapper over :func:`disney_eval_v` (oracle/back-compat)."""
    out = disney_eval_v(
        V3.of(v), V3.of(n), V3.of(l), V3.of(x), V3.of(y), m,
        V3.of(m.base_color),
    )
    return out.rows()


def lobe_probs(m: Materials):
    """Lobe selection probabilities (comp:748-755)."""
    r_diffuse = 1.0 - m.metallic
    r_specular = jnp.ones_like(m.metallic)
    r_clearcoat = 0.25 * m.clearcoat
    inv = 1.0 / (r_diffuse + r_specular + r_clearcoat)
    return r_diffuse * inv, r_specular * inv, r_clearcoat * inv


def disney_pdf_v(
    v: "V3",
    n: "V3",
    l: "V3",
    m: Materials,
    compat: bool = False,
) -> jnp.ndarray:
    """Combined lobe pdf of direction l (comp:710-738), component form."""
    p_diff, p_spec, p_cc = lobe_probs(m)
    a_gtr1 = clearcoat_alpha(m)
    a_gtr2 = specular_alpha(m)

    h = vnormalize(l + v)
    ldoth = vdot(l, h)
    ndoth = vdot(n, h)
    ndotl = vdot(n, l)

    pdf_diffuse = ndotl * INV_PI
    denom = 4.0 * ldoth
    safe = jnp.where(jnp.abs(denom) < _EPS, _EPS, denom)
    pdf_spec = gtr2(ndoth, a_gtr2) * ndoth / safe
    pdf_cc = gtr1(ndoth, a_gtr1) * ndoth / safe

    pdf = p_diff * pdf_diffuse + p_spec * pdf_spec + p_cc * pdf_cc
    if not compat:
        pdf = jnp.maximum(pdf, 0.0)
    return pdf


def disney_pdf(
    v: jnp.ndarray,
    n: jnp.ndarray,
    l: jnp.ndarray,
    m: Materials,
    compat: bool = False,
) -> jnp.ndarray:
    """[R, 3] wrapper over :func:`disney_pdf_v`."""
    return disney_pdf_v(V3.of(v), V3.of(n), V3.of(l), m, compat=compat)


def _sample_h_local_v(r1, r2, cos_theta_h, compat: bool) -> "V3":
    """Shared half-vector construction for GTR lobes (comp:688-692)."""
    phi_h = TWO_PI * r1
    if compat:
        sin_theta_h = jnp.maximum(0.0, 1.0 - sqr(cos_theta_h))
        sin_phi_h = jnp.sin(phi_h)
        cos_phi_h = 1.0 - sqr(sin_phi_h)
    else:
        sin_theta_h = safe_sqrt(1.0 - sqr(cos_theta_h))
        sin_phi_h = jnp.sin(phi_h)
        cos_phi_h = jnp.cos(phi_h)
    return V3(sin_theta_h * cos_phi_h, sin_theta_h * sin_phi_h, cos_theta_h)


def sample_gtr2_dir_v(n, t, b, v, r1, r2, alpha, compat: bool = False):
    """Specular lobe direction (SampleGTR2, comp:687-695)."""
    cos_theta_h = safe_sqrt(
        (1.0 - r2) / jnp.maximum(1.0 + (sqr(alpha) - 1.0) * r2, _EPS)
    )
    h = tangent_to_world_v(t, b, n, _sample_h_local_v(r1, r2, cos_theta_h, compat))
    return vreflect(v, h)


def sample_gtr1_dir_v(n, t, b, v, r1, r2, alpha, compat: bool = False):
    """Clearcoat lobe direction (SampleGTR1, comp:698-707)."""
    a2 = sqr(alpha)
    cos_theta_h = safe_sqrt(
        (1.0 - jnp.power(a2, 1.0 - r2)) / jnp.maximum(1.0 - a2, _EPS)
    )
    h = tangent_to_world_v(t, b, n, _sample_h_local_v(r1, r2, cos_theta_h, compat))
    return vreflect(v, h)


def sample_gtr2_dir(n, t, b, v, r1, r2, alpha, compat: bool = False):
    return sample_gtr2_dir_v(
        V3.of(n), V3.of(t), V3.of(b), V3.of(v), r1, r2, alpha, compat
    ).rows()


def sample_gtr1_dir(n, t, b, v, r1, r2, alpha, compat: bool = False):
    return sample_gtr1_dir_v(
        V3.of(n), V3.of(t), V3.of(b), V3.of(v), r1, r2, alpha, compat
    ).rows()


def sample_cosine_hemisphere_local_v(u1, u2, compat: bool = False) -> "V3":
    """Component twin of ops/sampling.py::sample_cosine_hemisphere_local
    (SampleCosineHemisphere, comp:642-647)."""
    if compat:
        theta = u1
        rr = u2
        x = rr * jnp.sin(theta)
        y = rr * jnp.cos(theta)
    else:
        rr = safe_sqrt(u1)
        phi = TWO_PI * u2
        x = rr * jnp.cos(phi)
        y = rr * jnp.sin(phi)
    z = safe_sqrt(1.0 - x * x - y * y)
    return V3(x, y, z)


def disney_sample_v(
    v: "V3",
    n: "V3",
    t: "V3",
    b: "V3",
    m: Materials,
    r_lobe: jnp.ndarray,
    r1: jnp.ndarray,
    r2: jnp.ndarray,
    u_diff1: jnp.ndarray,
    u_diff2: jnp.ndarray,
    compat: bool = False,
):
    """Sample an outgoing direction and its pdf (SampleDisneyBRDF,
    comp:742-786), component form.

    r_lobe selects among {diffuse, specular, clearcoat}; (r1, r2) drive the
    GTR half-vector lobes (the reference feeds these from Sobol,
    comp:928-932); (u_diff1, u_diff2) drive the diffuse hemisphere sample
    (the reference draws fresh wang-hash randoms inside
    SampleCosineHemisphere, comp:643).
    """
    p_diff, p_spec, _ = lobe_probs(m)
    a_gtr1 = clearcoat_alpha(m)
    a_gtr2 = specular_alpha(m)

    l_diff = tangent_to_world_v(
        t, b, n, sample_cosine_hemisphere_local_v(u_diff1, u_diff2, compat=compat)
    )
    l_spec = sample_gtr2_dir_v(n, t, b, v, r1, r2, a_gtr2, compat=compat)
    l_cc = sample_gtr1_dir_v(n, t, b, v, r1, r2, a_gtr1, compat=compat)

    take_diff = r_lobe <= p_diff
    take_spec = (~take_diff) & (r_lobe <= p_diff + p_spec)
    l = vwhere(take_diff, l_diff, vwhere(take_spec, l_spec, l_cc))
    pdf = disney_pdf_v(v, n, l, m, compat=compat)
    lobe = jnp.where(take_diff, 0, jnp.where(take_spec, 1, 2)).astype(jnp.int32)
    return l, pdf, lobe


def disney_sample(
    v: jnp.ndarray,
    n: jnp.ndarray,
    t: jnp.ndarray,
    b: jnp.ndarray,
    m: Materials,
    r_lobe: jnp.ndarray,
    r1: jnp.ndarray,
    r2: jnp.ndarray,
    u_diff1: jnp.ndarray,
    u_diff2: jnp.ndarray,
    compat: bool = False,
):
    """[R, 3] wrapper over :func:`disney_sample_v`."""
    l, pdf, lobe = disney_sample_v(
        V3.of(v), V3.of(n), V3.of(t), V3.of(b), m,
        r_lobe, r1, r2, u_diff1, u_diff2, compat=compat,
    )
    return l.rows(), pdf, lobe
