"""Random / low-discrepancy sampling.

Rebuilds the reference's sampler stack (ray_tracing.comp:496-624) as
stateless vectorized jnp ops:

* ``wang_hash`` PRNG with explicit seed threading — the GLSL keeps a mutable
  per-thread ``seed`` (comp:497, 528-530); here every draw returns the new
  seed so the sequence is reproducible and jit-friendly.
* Sobol sequence, dims 0-7, generated from Joe-Kuo primitive-polynomial
  direction numbers.  The reference embeds the resulting 8x32 table as a
  literal (comp:508-510); tests assert our generated table matches it.
* Cranley-Patterson per-pixel rotation (comp:539-557).
* Area-light selection by prefix-area binary search (comp:237-251,
  light.hpp:10-24) via ``searchsorted``.
* Uniform triangle sampling (comp:598-624) and hemisphere sampling.

The reference's ``SampleCosineHemisphere`` (comp:642-647) is *not* actually
cosine-weighted: it uses a raw U[0,1) draw as an angle in radians and another
as the radius.  Default mode uses a true cosine-weighted concentric mapping
(matching the NdotL/pi pdf used in the MIS weights, comp:734); compat mode
reproduces the reference's distribution.
"""

from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from pnraytracing_tpu.core.math import TWO_PI, safe_sqrt

# --------------------------------------------------------------------------
# wang_hash PRNG (ray_tracing.comp:499-506)
# --------------------------------------------------------------------------


def wang_hash(seed: jnp.ndarray) -> jnp.ndarray:
    """One PRNG step; returns the new seed (also the 32-bit random draw)."""
    seed = jnp.asarray(seed, jnp.uint32)
    seed = (seed ^ jnp.uint32(61)) ^ (seed >> 16)
    seed = seed * jnp.uint32(9)
    seed = seed ^ (seed >> 4)
    seed = seed * jnp.uint32(0x27D4EB2D)
    seed = seed ^ (seed >> 15)
    return seed


def rand01(seed: jnp.ndarray):
    """(new_seed, uniform in [0,1)) — ``Rand0To1`` (comp:528-530)."""
    seed = wang_hash(seed)
    return seed, seed.astype(jnp.float32) * jnp.float32(1.0 / 4294967296.0)


def pixel_seed(x: jnp.ndarray, y: jnp.ndarray, frame: jnp.ndarray) -> jnp.ndarray:
    """Per-pixel stream seed (comp:977-979):
    (x*1973 + y*9277 + frame*26699) | 1."""
    s = (
        x.astype(jnp.uint32) * jnp.uint32(1973)
        + y.astype(jnp.uint32) * jnp.uint32(9277)
        + jnp.asarray(frame, jnp.uint32) * jnp.uint32(26699)
    )
    return s | jnp.uint32(1)


# --------------------------------------------------------------------------
# Sobol sequence (comp:508-537)
# --------------------------------------------------------------------------

# Joe-Kuo (new-joe-kuo-6) primitive polynomial parameters for Sobol
# dimensions 1..7 (dimension 0 is the van der Corput sequence).  Each entry:
# (s, a, m[1..s]) — degree, encoded middle coefficients, initial direction
# numbers.  Generating from these reproduces the literal V[8*32] table of the
# reference (asserted in tests/test_sampling.py).
_JOE_KUO = [
    (1, 0, [1]),
    (2, 1, [1, 3]),
    (3, 1, [1, 3, 1]),
    (3, 2, [1, 1, 1]),
    (4, 1, [1, 1, 3, 3]),
    (4, 4, [1, 3, 5, 13]),
    (5, 2, [1, 1, 5, 5, 17]),
]

SOBOL_DIMS = 8
SOBOL_BITS = 32


@functools.lru_cache(maxsize=1)
def sobol_direction_table() -> np.ndarray:
    """[SOBOL_DIMS, 32] uint32 direction numbers, bit j scaled by 2^(31-j)."""
    table = np.zeros((SOBOL_DIMS, SOBOL_BITS), np.uint32)
    # dimension 0: v_k = 2^(32-k)
    for k in range(1, SOBOL_BITS + 1):
        table[0, k - 1] = np.uint32(1) << np.uint32(32 - k)
    for dim, (s, a, m) in enumerate(_JOE_KUO, start=1):
        v = np.zeros(SOBOL_BITS + 1, np.uint64)
        for k in range(1, s + 1):
            v[k] = np.uint64(m[k - 1]) << np.uint64(32 - k)
        for k in range(s + 1, SOBOL_BITS + 1):
            acc = v[k - s] ^ (v[k - s] >> np.uint64(s))
            for i in range(1, s):
                if (a >> (s - 1 - i)) & 1:
                    acc ^= v[k - i]
            v[k] = acc
        table[dim] = v[1:].astype(np.uint32)
    return table


def gray_code(i: jnp.ndarray) -> jnp.ndarray:
    i = jnp.asarray(i, jnp.uint32)
    return i ^ (i >> 1)


def sobol_u32(d, i: jnp.ndarray) -> jnp.ndarray:
    """32-bit Sobol value of index i in dimension d (comp:518-526):
    XOR of direction numbers at the set bits of i.  ``d`` may be a Python
    int or a traced scalar (the scan-mode bounce counter)."""
    v = jnp.asarray(sobol_direction_table())[d]  # [32] u32
    i = jnp.asarray(i, jnp.uint32)
    bits = (i[..., None] >> jnp.arange(32, dtype=jnp.uint32)) & jnp.uint32(1)
    terms = jnp.where(bits.astype(bool), v, jnp.uint32(0))
    return functools.reduce(jnp.bitwise_xor, jnp.moveaxis(terms, -1, 0))


def sobol_float(d, i: jnp.ndarray) -> jnp.ndarray:
    return sobol_u32(d, i).astype(jnp.float32) * jnp.float32(1.0 / 0xFFFFFFFF)


def sobol_vec2(frame: jnp.ndarray, bounce) -> tuple[jnp.ndarray, jnp.ndarray]:
    """The (u,v) pair for bounce b of frame i (comp:533-537): dims (2b, 2b+1)
    at gray-coded index.  ``bounce`` may be a Python int or traced."""
    g = gray_code(frame)
    d0 = (2 * bounce) % SOBOL_DIMS
    d1 = (2 * bounce + 1) % SOBOL_DIMS
    return sobol_float(d0, g), sobol_float(d1, g)


def cranley_patterson_rotation(
    p: jnp.ndarray, px: jnp.ndarray, py: jnp.ndarray, width: int, height: int
) -> jnp.ndarray:
    """Per-pixel toroidal shift of a [R?,2] sample (comp:539-557).  The
    shift seed reproduces the reference exactly, including its quirky
    ``x*W*1973 + y*H*9277 + 59*26699`` mix."""
    s = (
        px.astype(jnp.uint32) * jnp.uint32(width) * jnp.uint32(1973)
        + py.astype(jnp.uint32) * jnp.uint32(height) * jnp.uint32(9277)
        + jnp.uint32(114514 // 1919) * jnp.uint32(26699)
    ) | jnp.uint32(1)
    s, u = rand01(s)
    _, v = rand01(s)
    shifted = p + jnp.stack([u, v], axis=-1)
    return jnp.where(shifted > 1.0, shifted - 1.0, shifted)


def cranley_patterson_rotation_c(
    su, sv, px: jnp.ndarray, py: jnp.ndarray, width: int, height: int,
    salt=0,
):
    """Component twin of :func:`cranley_patterson_rotation` — same
    arithmetic on two flat [R] (or scalar) sample coordinates, no [R, 2]
    materialization (which lane-pads 64x on TPU).

    ``salt`` decorrelates reuse of the 8-dim Sobol table beyond depth 4:
    ``sobol_vec2`` wraps its dimension pair at SOBOL_DIMS (matching the
    reference's 8-dim literal, comp:508-510 — the reference never
    exceeds depth 4, main.cpp:572), so bounces b and b+4 would otherwise
    draw the IDENTICAL (dim, index) sample pair.  The integrator passes
    ``salt = 2*bounce // SOBOL_DIMS``: zero for bounces 0-3 (bit-exact
    reference behaviour preserved) and a fresh per-pixel toroidal shift
    for each table reuse after that.  May be a Python int or traced
    (scan-mode bounce counter)."""
    s = (
        px.astype(jnp.uint32) * jnp.uint32(width) * jnp.uint32(1973)
        + py.astype(jnp.uint32) * jnp.uint32(height) * jnp.uint32(9277)
        + jnp.uint32(114514 // 1919) * jnp.uint32(26699)
        + jnp.asarray(salt, jnp.uint32) * jnp.uint32(0x9E3779B9)
    ) | jnp.uint32(1)
    s, u = rand01(s)
    _, v = rand01(s)
    a = su + u
    b = sv + v
    return (
        jnp.where(a > 1.0, a - 1.0, a),
        jnp.where(b > 1.0, b - 1.0, b),
    )


# --------------------------------------------------------------------------
# Light & geometry sampling
# --------------------------------------------------------------------------


def pick_light(prefix_area: jnp.ndarray, total_area: jnp.ndarray, u: jnp.ndarray):
    """Area-proportional light selection (GetLightIndex, comp:237-251):
    smallest slot with prefix >= u * total.  Returns the slot index into the
    light list (caller maps through ``lights.tri_index``)."""
    target = u * total_area
    slot = jnp.searchsorted(prefix_area, target, side="left")
    return jnp.clip(slot, 0, prefix_area.shape[0] - 1).astype(jnp.int32)


def sample_uniform_triangle(u1: jnp.ndarray, u2: jnp.ndarray):
    """Uniform barycentrics (UniformSampleTriangle, comp:598-601):
    b0 = 1 - sqrt(u1), b1 = u2 * sqrt(u1)."""
    su = safe_sqrt(u1)
    return 1.0 - su, u2 * su


def sample_cosine_hemisphere_local(
    u1: jnp.ndarray, u2: jnp.ndarray, compat: bool = False
) -> jnp.ndarray:
    """Local-frame direction sample for the diffuse lobe.

    Default: true cosine-weighted hemisphere (pdf = cos/pi, consistent with
    the pdf used in the MIS weights, comp:734/780).  Compat: the reference's
    ``SampleCosineHemisphere`` (comp:642-647), which misuses u1 as an angle
    in radians and u2 as radius.
    """
    if compat:
        theta = u1
        r = u2
        x = r * jnp.sin(theta)
        y = r * jnp.cos(theta)
    else:
        r = safe_sqrt(u1)
        phi = TWO_PI * u2
        x = r * jnp.cos(phi)
        y = r * jnp.sin(phi)
    z = safe_sqrt(1.0 - x * x - y * y)
    return jnp.stack([x, y, z], axis=-1)


def sample_uniform_hemisphere_local(u1: jnp.ndarray, u2: jnp.ndarray) -> jnp.ndarray:
    """UniformSampleHemisphere (comp:590-595): z = u1, r = sqrt(1-z^2)."""
    z = u1
    r = safe_sqrt(1.0 - z * z)
    phi = TWO_PI * u2
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
