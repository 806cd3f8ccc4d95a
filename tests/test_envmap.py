"""Environment-map CDF build, importance sampling and lookup tests."""

import jax.numpy as jnp
import numpy as np

from pnraytracing_tpu.io.hdr import procedural_sky, read_hdr, write_hdr
from pnraytracing_tpu.ops.envmap import (
    bilinear_lookup,
    build_envmap,
    envmap_lookup,
    envmap_pdf,
    sample_envmap,
)


def test_cdf_tables_normalized():
    img = procedural_sky(32, 64)
    env = build_envmap(jnp.asarray(img))
    np.testing.assert_allclose(float(jnp.sum(env.pdf_xy)), 1.0, rtol=1e-4)
    np.testing.assert_allclose(float(env.cdf_marginal_x[-1]), 1.0, rtol=1e-4)
    np.testing.assert_allclose(
        np.asarray(env.cdf_y_given_x[:, -1]), 1.0, rtol=1e-3
    )


def test_sampling_concentrates_on_bright_texels():
    # single very bright texel: nearly all samples must land on it
    img = np.full((16, 32, 3), 0.01, np.float32)
    img[4, 20] = 1000.0
    env = build_envmap(jnp.asarray(img))
    rng = np.random.default_rng(0)
    u = rng.uniform(size=(512, 2)).astype(np.float32)
    d, radiance, pdf = sample_envmap(env, jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]))
    bright = np.asarray(radiance[:, 0]) > 100.0
    assert bright.mean() > 0.95
    assert (np.asarray(pdf) > 0).all()


def test_sample_direction_matches_pdf_texel():
    """The direction returned must map back (via the equirect
    parameterization) to the texel whose pdf was reported."""
    img = procedural_sky(16, 32)
    env = build_envmap(jnp.asarray(img))
    rng = np.random.default_rng(1)
    u = rng.uniform(size=(256, 2)).astype(np.float32)
    d, radiance, pdf = sample_envmap(env, jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]))
    np.testing.assert_allclose(np.linalg.norm(np.asarray(d), axis=1), 1.0, atol=1e-5)
    pdf2 = envmap_pdf(env, d)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2), rtol=1e-3)


def test_monte_carlo_integral_consistency():
    """E[L/pdf] over env samples ~ integral of L over the sphere — checks
    the solid-angle pdf conversion factor."""
    img = procedural_sky(32, 64, sun_intensity=0.0)  # smooth sky, no disc
    env = build_envmap(jnp.asarray(img))
    rng = np.random.default_rng(2)
    n = 20000
    u = rng.uniform(size=(n, 2)).astype(np.float32)
    d, radiance, pdf = sample_envmap(env, jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]))
    est = np.asarray(radiance[:, 1] / np.asarray(pdf)).mean()
    # ground truth: sum L * dOmega over texels
    h, w = img.shape[:2]
    v = (np.arange(h) + 0.5) / h
    sin_polar = np.sin(np.pi * v)  # solid angle weight per row
    d_omega = (2 * np.pi / w) * (np.pi / h) * sin_polar
    truth = (img[..., 1] * d_omega[:, None]).sum()
    np.testing.assert_allclose(est, truth, rtol=0.05)


def test_lookup_bilinear_and_poles():
    img = procedural_sky(16, 32)
    env = build_envmap(jnp.asarray(img))
    dirs = jnp.asarray(
        [[0, 1, 0], [0, -1, 0], [1, 0, 0], [0, 0, 1], [-1, 0, 0]], jnp.float32
    )
    out = np.asarray(envmap_lookup(env, dirs))
    assert np.isfinite(out).all() and (out >= 0).all()
    # up must be brighter than down for a sky
    assert out[0].sum() > out[1].sum()


def test_hdr_roundtrip(tmp_path):
    img = procedural_sky(16, 32)
    p = str(tmp_path / "t.hdr")
    write_hdr(p, img)
    back = read_hdr(p)
    assert back.shape == img.shape
    # RGBE has ~1% mantissa precision
    np.testing.assert_allclose(back, img, rtol=0.02, atol=1e-3)


def test_read_reference_hdr_if_present():
    import os

    path = "/root/reference/HDR/vignaioli_night_1k.hdr"
    if not os.path.exists(path):
        return
    img = read_hdr(path)
    assert img.ndim == 3 and img.shape[2] == 3
    assert img.shape[0] >= 256 and img.shape[1] == 2 * img.shape[0]
    assert np.isfinite(img).all() and (img >= 0).all()
    assert img.max() > 1.0  # HDR content


def test_bisect_rows_matches_searchsorted():
    """The gather-free conditional-CDF bisection must agree with
    searchsorted(side='left') everywhere, including exact boundary values
    and the u=0 / u=1 extremes."""
    import numpy as np
    import jax.numpy as jnp

    from pnraytracing_tpu.ops.envmap import _bisect_rows

    rng = np.random.default_rng(0)
    for h in (1, 2, 3, 7, 16, 100, 256):
        w = 13
        table = np.sort(rng.random((w, h)).astype(np.float32), axis=1)
        x = rng.integers(0, w, 500).astype(np.int32)
        u = np.concatenate([
            rng.random(440).astype(np.float32),
            np.zeros(20, np.float32), np.ones(20, np.float32),
            table[x[480:500], rng.integers(0, h, 20)],
        ])
        got = np.asarray(
            _bisect_rows(jnp.asarray(table), jnp.asarray(x), jnp.asarray(u))
        )
        want = np.array([
            np.searchsorted(table[xi], ui, side="left")
            for xi, ui in zip(x, u)
        ])
        np.testing.assert_array_equal(got, want)


def test_alias_sampling_matches_cdf_distribution():
    """Alias tables (scene-build path) must induce the same texel
    distribution as CDF inversion — both are exact inversions of pdf_xy."""
    import numpy as np

    from pnraytracing_tpu.io.hdr import procedural_sky
    from pnraytracing_tpu.ops.envmap import build_envmap, sample_envmap

    img = procedural_sky(16, 32)
    env_cdf = build_envmap(jnp.asarray(img), alias=False)
    env_alias = build_envmap(jnp.asarray(img), alias=True)
    assert env_alias.alias_x is not None

    rng = np.random.default_rng(0)
    n = 200_000
    u1 = jnp.asarray(rng.random(n, dtype=np.float32))
    u2 = jnp.asarray(rng.random(n, dtype=np.float32))

    def hist(env):
        d, rad, pdf = sample_envmap(env, u1, u2)
        # invert direction back to texel uv to histogram texels
        from pnraytracing_tpu.core.math import spherical_uv

        uv = np.asarray(spherical_uv(d))
        x = np.clip((uv[:, 0] * env.width).astype(int), 0, env.width - 1)
        y = np.clip((uv[:, 1] * env.height).astype(int), 0, env.height - 1)
        h2 = np.zeros((env.width, env.height))
        np.add.at(h2, (x, y), 1.0)
        return h2 / n, np.asarray(pdf)

    h_alias, pdf_alias = hist(env_alias)
    h_cdf, _ = hist(env_cdf)
    p = np.asarray(env_cdf.pdf_xy)
    # both histograms estimate pdf_xy; compare each against the truth
    for h in (h_alias, h_cdf):
        err = np.abs(h - p)[p > 1e-5] / p[p > 1e-5]
        assert np.quantile(err, 0.9) < 0.2, "sampled histogram far from pdf"
    assert np.isfinite(pdf_alias).all() and (pdf_alias > 0).all()


def test_alias_pdf_consistent_with_reported_pdf():
    """The pdf returned for alias samples must match envmap_pdf of the
    sampled direction (the MIS weights depend on this consistency)."""
    import numpy as np

    from pnraytracing_tpu.io.hdr import procedural_sky
    from pnraytracing_tpu.ops.envmap import (
        build_envmap,
        envmap_pdf,
        sample_envmap,
    )

    img = procedural_sky(16, 32)
    env = build_envmap(jnp.asarray(img), alias=True)
    rng = np.random.default_rng(4)
    u1 = jnp.asarray(rng.random(4096, dtype=np.float32))
    u2 = jnp.asarray(rng.random(4096, dtype=np.float32))
    d, rad, pdf = sample_envmap(env, u1, u2)
    pdf2 = envmap_pdf(env, d)
    np.testing.assert_allclose(np.asarray(pdf), np.asarray(pdf2),
                               rtol=1e-4, atol=1e-8)


def test_quad_lookup_matches_four_gather_bilinear():
    import numpy as np

    from pnraytracing_tpu.io.hdr import procedural_sky
    from pnraytracing_tpu.ops.envmap import (
        bilinear_lookup,
        bilinear_lookup_quads,
        build_envmap,
    )

    env = build_envmap(jnp.asarray(procedural_sky(16, 32)))
    rng = np.random.default_rng(1)
    u = jnp.asarray(rng.random(4096, dtype=np.float32))
    v = jnp.asarray(rng.random(4096, dtype=np.float32))
    a = bilinear_lookup(env.image, u, v)
    b = bilinear_lookup_quads(env.quad12, u, v)
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_fat_alias_rows_match_plain_alias_sampling():
    """sample_envmap_v's one-gather fat-row path must return exactly the
    values of the separate-gather alias path (same x/y cells, texels and
    pdf — the fat row just pre-packs them)."""
    import numpy as np

    from pnraytracing_tpu.io.hdr import procedural_sky
    from pnraytracing_tpu.ops.envmap import build_envmap, sample_envmap, sample_envmap_v

    img = procedural_sky(16, 32)
    env = build_envmap(jnp.asarray(img), alias=True)
    assert env.alias_fat is not None
    assert env.alias_fat.shape == (32 * 16, 10)
    rng = np.random.default_rng(7)
    u1 = jnp.asarray(rng.random(4096, dtype=np.float32))
    u2 = jnp.asarray(rng.random(4096, dtype=np.float32))
    d_ref, rad_ref, pdf_ref = sample_envmap(env, u1, u2)
    dv, radv, pdfv = sample_envmap_v(env, u1, u2)
    np.testing.assert_array_equal(np.asarray(rad_ref[:, 0]), np.asarray(radv.x))
    np.testing.assert_array_equal(np.asarray(rad_ref[:, 1]), np.asarray(radv.y))
    np.testing.assert_array_equal(np.asarray(rad_ref[:, 2]), np.asarray(radv.z))
    np.testing.assert_allclose(np.asarray(pdf_ref), np.asarray(pdfv),
                               rtol=1e-6, atol=0)
    np.testing.assert_allclose(np.asarray(d_ref),
                               np.asarray(jnp.stack([dv.x, dv.y, dv.z], -1)),
                               rtol=1e-6, atol=1e-7)
