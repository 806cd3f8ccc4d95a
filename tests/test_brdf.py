"""Disney BRDF correctness: reciprocity-adjacent identities, pdf
normalization, sampling/eval consistency."""

import jax.numpy as jnp
import numpy as np

from pnraytracing_tpu.core.math import build_tangent_space, dot, normalize
from pnraytracing_tpu.core.types import Materials
from pnraytracing_tpu.ops.brdf import (
    disney_eval,
    disney_pdf,
    disney_sample,
    gtr1,
    gtr2,
    lobe_probs,
    schlick_fresnel,
)


def mat(n, **kw):
    m = Materials.stack([dict(kw)] * n)
    return m


def frame(n_rays):
    n = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n_rays, 3))
    t, b = build_tangent_space(n)
    return n, t, b


def rand_dirs_upper(rng, n):
    d = rng.normal(size=(n, 3))
    d[:, 2] = np.abs(d[:, 2]) + 0.05
    return np.asarray(normalize(jnp.asarray(d, jnp.float32)))


def test_eval_nonnegative_and_zero_below_horizon():
    rng = np.random.default_rng(0)
    n_rays = 512
    n, t, b = frame(n_rays)
    v = jnp.asarray(rand_dirs_upper(rng, n_rays))
    l_up = jnp.asarray(rand_dirs_upper(rng, n_rays))
    m = mat(n_rays, base_color=(0.7, 0.5, 0.3), roughness=0.4, metallic=0.3,
            clearcoat=0.5, sheen=0.4, specular=0.5)
    f = np.asarray(disney_eval(v, n, l_up, t, b, m))
    assert np.isfinite(f).all() and (f >= 0).all()
    l_dn = l_up * jnp.array([1.0, 1.0, -1.0])
    f2 = np.asarray(disney_eval(v, n, l_dn, t, b, m))
    np.testing.assert_array_equal(f2, 0.0)


def test_diffuse_lambert_limit():
    """Pure smooth diffuse at normal incidence ~ baseColor/pi."""
    n, t, b = frame(1)
    v = jnp.array([[0.0, 0.0, 1.0]])
    l = jnp.asarray(normalize(jnp.array([[0.05, 0.0, 1.0]])))
    m = mat(1, base_color=(0.6, 0.6, 0.6), roughness=0.0, metallic=0.0, specular=0.0)
    f = np.asarray(disney_eval(v, n, l, t, b, m))[0]
    np.testing.assert_allclose(f, 0.6 / np.pi, rtol=0.05)


def test_lobe_probs_reference_weights():
    m = mat(1, metallic=0.4, clearcoat=0.8)
    pd, ps, pc = (float(x[0]) for x in lobe_probs(m))
    rd, rs, rc = 0.6, 1.0, 0.2
    s = rd + rs + rc
    np.testing.assert_allclose([pd, ps, pc], [rd / s, rs / s, rc / s], rtol=1e-6)


def test_pdf_integrates_to_one_over_sphere():
    """The mixture pdf must be a valid density: MC integral over the
    hemisphere (where it is supported) ~ lobe mass."""
    rng = np.random.default_rng(3)
    n_samp = 80000
    n, t, b = frame(1)
    v = jnp.asarray(normalize(jnp.array([[0.3, 0.1, 0.9]])))
    m1 = mat(1, roughness=0.5, metallic=0.2, clearcoat=0.6, clearcoat_gloss=0.4)
    # uniform directions over the upper hemisphere
    d = rng.normal(size=(n_samp, 3))
    d[:, 2] = np.abs(d[:, 2])
    d = np.asarray(normalize(jnp.asarray(d, jnp.float32)))
    mm = Materials.stack([{
        "roughness": 0.5, "metallic": 0.2, "clearcoat": 0.6, "clearcoat_gloss": 0.4
    }] * n_samp)
    pdf = np.asarray(
        disney_pdf(jnp.broadcast_to(v, (n_samp, 3)), jnp.broadcast_to(n, (n_samp, 3)),
                   jnp.asarray(d), mm)
    )
    # pdf over hemisphere: integral = mean(pdf) * 2pi
    integral = pdf.mean() * 2 * np.pi
    # GTR lobes leak a little below the horizon via the half-vector
    # parameterization, so allow a tolerant band around 1
    assert 0.7 < integral < 1.15


def test_sample_directions_match_pdf_support():
    rng = np.random.default_rng(4)
    n_rays = 4096
    n, t, b = frame(n_rays)
    v = jnp.asarray(rand_dirs_upper(rng, n_rays))
    m = mat(n_rays, roughness=0.3, metallic=0.5, clearcoat=0.3)
    u = rng.uniform(size=(n_rays, 5)).astype(np.float32)
    l, pdf, lobe = disney_sample(
        v, n, t, b, m,
        jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]), jnp.asarray(u[:, 2]),
        jnp.asarray(u[:, 3]), jnp.asarray(u[:, 4]),
    )
    l, pdf, lobe = np.asarray(l), np.asarray(pdf), np.asarray(lobe)
    np.testing.assert_allclose(np.linalg.norm(l, axis=1), 1.0, atol=1e-3)
    assert set(np.unique(lobe)).issubset({0, 1, 2})
    # diffuse-lobe samples always in the upper hemisphere with positive pdf
    up = l[:, 2] > 1e-3
    assert (pdf[up & (lobe == 0)] > 0).all()


def test_gtr_normalization():
    """GTR2 integrates to 1 over the hemisphere (D * cos)."""
    rng = np.random.default_rng(5)
    n_samp = 200000
    # uniform hemisphere directions
    z = rng.uniform(size=n_samp)
    phi = rng.uniform(0, 2 * np.pi, size=n_samp)
    r = np.sqrt(1 - z * z)
    for alpha in (0.2, 0.5, 0.9):
        d = np.asarray(gtr2(jnp.asarray(z, jnp.float32), jnp.float32(alpha)))
        integral = (d * z).mean() * 2 * np.pi  # ∫ D cos dω
        np.testing.assert_allclose(integral, 1.0, rtol=0.05)


def test_schlick_bounds():
    u = jnp.linspace(0, 1, 100)
    f = np.asarray(schlick_fresnel(u))
    assert (f >= 0).all() and (f <= 1).all()
    np.testing.assert_allclose(float(schlick_fresnel(jnp.float32(0.0))), 1.0)
    np.testing.assert_allclose(float(schlick_fresnel(jnp.float32(1.0))), 0.0)
