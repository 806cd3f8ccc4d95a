"""Sampler unit tests, including the Sobol direction-number parity check
against the reference's literal table (ray_tracing.comp:508-510)."""

import jax.numpy as jnp
import numpy as np

from pnraytracing_tpu.ops.sampling import (
    cranley_patterson_rotation,
    gray_code,
    pick_light,
    pixel_seed,
    rand01,
    sample_cosine_hemisphere_local,
    sample_uniform_triangle,
    sobol_direction_table,
    sobol_float,
    sobol_vec2,
    wang_hash,
)

# First four direction numbers of each of the 8 Sobol dimensions, plus the
# last two of dimension 1, copied from the literal V[8*32] table at
# ray_tracing.comp:509 — our generator must reproduce them exactly.
EXPECTED_V_HEADS = [
    [2147483648, 1073741824, 536870912, 268435456],
    [2147483648, 3221225472, 2684354560, 4026531840],
    [2147483648, 3221225472, 1610612736, 2415919104],
    [2147483648, 3221225472, 536870912, 1342177280],
    [2147483648, 1073741824, 536870912, 2952790016],
    [2147483648, 1073741824, 1610612736, 805306368],
    [2147483648, 3221225472, 2684354560, 3489660928],
    [2147483648, 1073741824, 2684354560, 1342177280],
]


def test_sobol_table_matches_reference_literal():
    table = sobol_direction_table()
    assert table.shape == (8, 32)
    for d, head in enumerate(EXPECTED_V_HEADS):
        np.testing.assert_array_equal(table[d, :4], np.asarray(head, np.uint32))
    # tail of dimension 1 (indices 62, 63 of the flat literal)
    assert table[1, 30] == np.uint32(2863311530)
    assert table[1, 31] == np.uint32(4294967295)


def test_sobol_dim0_is_van_der_corput():
    # radical inverse base 2: i=1 -> 0.5, i=2 -> 0.25, i=3 -> 0.75
    vals = [float(sobol_float(0, jnp.uint32(i))) for i in (1, 2, 3)]
    np.testing.assert_allclose(vals, [0.5, 0.25, 0.75], atol=1e-6)


def test_sobol_stratification():
    # one full period (0..255) of gray-code-ordered points of (dim0, dim1)
    i = jnp.arange(0, 256, dtype=jnp.uint32)
    u = np.asarray(sobol_float(0, gray_code(i)))
    v = np.asarray(sobol_float(1, gray_code(i)))
    # each 16x16 stratum hit exactly once
    cu = np.minimum((u * 16).astype(int), 15)
    cv = np.minimum((v * 16).astype(int), 15)
    cells = set(zip(cu.tolist(), cv.tolist()))
    assert len(cells) == 256


def test_wang_hash_stream_properties():
    seeds = pixel_seed(
        jnp.arange(1000, dtype=jnp.uint32),
        jnp.arange(1000, dtype=jnp.uint32) * 7,
        jnp.uint32(3),
    )
    assert bool(jnp.all(seeds & 1 == 1))  # |1 (comp:979)
    s, u1 = rand01(seeds)
    s, u2 = rand01(s)
    u1, u2 = np.asarray(u1), np.asarray(u2)
    assert (u1 >= 0).all() and (u1 < 1).all()
    assert abs(u1.mean() - 0.5) < 0.05
    assert abs(np.corrcoef(u1, u2)[0, 1]) < 0.1
    # deterministic
    _, u1b = rand01(seeds)
    np.testing.assert_array_equal(u1, np.asarray(u1b))


def test_cranley_patterson_wraps_into_unit_square():
    px = jnp.arange(64, dtype=jnp.uint32)
    py = jnp.arange(64, dtype=jnp.uint32)[::-1]
    p = jnp.broadcast_to(jnp.array([0.7, 0.9]), (64, 2))
    q = np.asarray(cranley_patterson_rotation(p, px, py, 64, 64))
    assert (q >= 0).all() and (q <= 1).all()
    # different pixels get different shifts
    assert len(np.unique(q[:, 0].round(6))) > 32


def test_pick_light_proportional_to_area():
    prefix = jnp.asarray(np.cumsum([1.0, 3.0, 6.0]).astype(np.float32))
    total = prefix[-1]
    u = jnp.asarray(np.linspace(0, 0.9999, 10000, dtype=np.float32))
    slots = np.asarray(pick_light(prefix, total, u))
    counts = np.bincount(slots, minlength=3) / len(slots)
    np.testing.assert_allclose(counts, [0.1, 0.3, 0.6], atol=0.01)


def test_uniform_triangle_sampling_uniform():
    rng = np.random.default_rng(0)
    u = rng.uniform(size=(20000, 2)).astype(np.float32)
    b0, b1 = sample_uniform_triangle(jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]))
    b0, b1 = np.asarray(b0), np.asarray(b1)
    assert (b0 >= 0).all() and (b1 >= 0).all() and (b0 + b1 <= 1 + 1e-6).all()
    # mean of uniform barycentrics is (1/3, 1/3)
    np.testing.assert_allclose([b0.mean(), b1.mean()], [1 / 3, 1 / 3], atol=0.01)


def test_cosine_hemisphere_default_distribution():
    rng = np.random.default_rng(1)
    u = rng.uniform(size=(40000, 2)).astype(np.float32)
    d = np.asarray(
        sample_cosine_hemisphere_local(jnp.asarray(u[:, 0]), jnp.asarray(u[:, 1]))
    )
    assert (d[:, 2] >= 0).all()
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-4)
    # E[cos(theta)] for pdf cos/pi is 2/3
    np.testing.assert_allclose(d[:, 2].mean(), 2 / 3, atol=0.01)


def test_fast_trig_accuracy():
    """fast_atan2/fast_asin must stay within ~2e-6 rad of libm over the
    full circle (the equirect mapping's accuracy budget)."""
    import numpy as np

    from pnraytracing_tpu.core.math import fast_asin, fast_atan2

    rng = np.random.default_rng(3)
    d = rng.normal(size=(200000, 3)).astype(np.float32)
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    got = np.asarray(fast_atan2(jnp.asarray(d[:, 2]), jnp.asarray(d[:, 0])))
    want = np.arctan2(d[:, 2], d[:, 0])
    err = np.abs(got - want)
    err = np.minimum(err, 2 * np.pi - err)  # seam wrap
    assert err.max() < 3e-6, err.max()
    got = np.asarray(fast_asin(jnp.asarray(d[:, 1])))
    want = np.arcsin(np.clip(d[:, 1], -1, 1))
    assert np.abs(got - want).max() < 3e-6


def test_sobol_wrap_decorrelated_by_salt():
    """Bounces b and b+4 reuse the same Sobol (dim, index) pair (the
    8-dim table wraps); the bounce-salted Cranley-Patterson rotation must
    decorrelate them — and stay bit-exact for bounces 0-3 (salt 0)."""
    from pnraytracing_tpu.ops.sampling import (
        SOBOL_DIMS,
        cranley_patterson_rotation_c,
        sobol_vec2,
    )

    frame = jnp.uint32(7)
    px = jnp.arange(1024, dtype=jnp.uint32) % 512
    py = jnp.arange(1024, dtype=jnp.uint32) // 512

    def bounce_samples(b):
        su, sv = sobol_vec2(frame, b)
        return cranley_patterson_rotation_c(
            su, sv, px, py, 512, 512, salt=(2 * b) // SOBOL_DIMS
        )

    u0, v0 = bounce_samples(0)
    u4, v4 = bounce_samples(4)
    # raw table values identical (the wrap)...
    su0, sv0 = sobol_vec2(frame, 0)
    su4, sv4 = sobol_vec2(frame, 4)
    assert float(su0) == float(su4) and float(sv0) == float(sv4)
    # ...but the salted rotation must separate the final samples
    assert not np.allclose(np.asarray(u0), np.asarray(u4))
    assert not np.allclose(np.asarray(v0), np.asarray(v4))
    # per-pixel decorrelation: the (u0, u4) pairs should not be a
    # constant offset of each other across pixels
    du = (np.asarray(u4) - np.asarray(u0)) % 1.0
    assert du.std() > 0.05
    # salt=0 path unchanged: bounces 0-3 use the unsalted rotation
    un, vn = cranley_patterson_rotation_c(su0, sv0, px, py, 512, 512)
    np.testing.assert_array_equal(np.asarray(u0), np.asarray(un))
    np.testing.assert_array_equal(np.asarray(v0), np.asarray(vn))
