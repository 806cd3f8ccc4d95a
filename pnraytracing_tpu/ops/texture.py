"""Base-color texture fetch from the stacked atlas.

The reference binds each texture to its own GL sampler unit (max 20,
main.cpp:527-554) and overrides ``material.baseColor`` at shade time
(ray_tracing.comp:870-872).  Here all textures live in one padded [K, H, W, 3]
array; the fetch is a batched dynamic gather with repeat wrapping and
bilinear filtering, differentiable w.r.t. the texel values.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from pnraytracing_tpu.core.types import TextureAtlas


def _box_down2(im: np.ndarray) -> np.ndarray:
    """2x box downsample (glGenerateMipmap-style); odd dims floor-halve."""
    h, w = im.shape[0] & ~1, im.shape[1] & ~1
    im = im[:h, :w]
    return 0.25 * (im[0::2, 0::2] + im[1::2, 0::2]
                   + im[0::2, 1::2] + im[1::2, 1::2])


def build_atlas(images: list[np.ndarray],
                mips: bool = True) -> TextureAtlas | None:
    """Stack variable-size [h, w, 3] float images (values in [0,1]) into a
    padded atlas.  Returns None for an empty list.

    ``mips=True`` additionally bakes a box-filtered mip strip per texture
    (the analogue of the reference's glGenerateMipmap, main.cpp:541-546):
    level l lives at rows [h - (h >> (l-1)), h - (h >> l)), width w >> l
    of the ``mips`` plane — the whole pyramid fits one extra data-sized
    array."""
    if not images:
        return None
    max_h = max(im.shape[0] for im in images)
    max_w = max(im.shape[1] for im in images)
    data = np.zeros((len(images), max_h, max_w, 3), np.float32)
    strip = np.zeros((len(images), max_h, max_w, 3), np.float32)
    sizes = np.zeros((len(images), 2), np.int32)
    for k, im in enumerate(images):
        h, w = im.shape[0], im.shape[1]
        data[k, :h, :w] = im[..., :3]
        sizes[k] = (w, h)
        if mips:
            level = np.asarray(im[..., :3], np.float32)
            lvl = 1
            while (h >> lvl) >= 1 and (w >> lvl) >= 1:
                level = _box_down2(level)
                y0 = h - (h >> (lvl - 1))
                strip[k, y0:y0 + level.shape[0], :level.shape[1]] = level
                lvl += 1
    return TextureAtlas(
        data=jnp.asarray(data),
        sizes=jnp.asarray(sizes),
        mips=jnp.asarray(strip) if mips else None,
    )


def _bilinear_level(atlas: TextureAtlas, tid, u, v, level):
    """Bilinear fetch at mip ``level`` ([R] i32, 0 = base plane).  Level
    l >= 1 reads the mip strip at rows [h-(h>>(l-1)), +h>>l), width
    w>>l.  Repeat wrap inside the level's region."""
    wh = atlas.sizes[tid]
    wi = jnp.maximum(wh[..., 0] >> level, 1)
    hi = jnp.maximum(wh[..., 1] >> level, 1)
    y_off = jnp.where(
        level > 0,
        wh[..., 1] - (wh[..., 1] >> jnp.maximum(level - 1, 0)),
        0,
    )
    fx = u * wi.astype(jnp.float32) - 0.5
    fy = v * hi.astype(jnp.float32) - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]
    x0i = jnp.mod(x0.astype(jnp.int32), wi)
    x1i = jnp.mod(x0i + 1, wi)
    y0i = jnp.mod(y0.astype(jnp.int32), hi)
    y1i = jnp.mod(y0i + 1, hi)
    # select base plane vs strip per ray: gather from both, select
    def tap(yy, xx):
        base = atlas.data[tid, yy, xx]
        if atlas.mips is None:
            return base
        strip = atlas.mips[tid, y_off + yy, xx]
        return jnp.where((level > 0)[..., None], strip, base)

    c00 = tap(y0i, x0i)
    c10 = tap(y0i, x1i)
    c01 = tap(y1i, x0i)
    c11 = tap(y1i, x1i)
    top = c00 * (1 - tx) + c10 * tx
    bot = c01 * (1 - tx) + c11 * tx
    return top * (1 - ty) + bot * ty


def fetch_base_color_trilinear(
    atlas: TextureAtlas,
    texture_id: jnp.ndarray,
    uv: jnp.ndarray,
    base_color: jnp.ndarray,
    lod: jnp.ndarray,
) -> jnp.ndarray:
    """Trilinear (GL_LINEAR_MIPMAP_LINEAR, main.cpp:541-546) fetch:
    bilinear at floor(lod) and floor(lod)+1, mixed by the fraction.
    ``lod`` is [R] float; clamped per texture to its available levels."""
    tid = jnp.maximum(texture_id, 0)
    wh = atlas.sizes[tid].astype(jnp.float32)
    max_l = jnp.floor(
        jnp.log2(jnp.maximum(jnp.minimum(wh[..., 0], wh[..., 1]), 1.0))
    )
    lod = jnp.clip(lod, 0.0, max_l)
    l0 = jnp.floor(lod).astype(jnp.int32)
    l1 = jnp.minimum(l0 + 1, max_l.astype(jnp.int32))
    frac = (lod - l0.astype(jnp.float32))[..., None]
    u = uv[..., 0] - jnp.floor(uv[..., 0])
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    c0 = _bilinear_level(atlas, tid, u, v, l0)
    c1 = _bilinear_level(atlas, tid, u, v, l1)
    color = c0 * (1 - frac) + c1 * frac
    return jnp.where((texture_id >= 0)[..., None], color, base_color)


def fetch_base_color(
    atlas: TextureAtlas,
    texture_id: jnp.ndarray,
    uv: jnp.ndarray,
    base_color: jnp.ndarray,
) -> jnp.ndarray:
    """Replace base_color where texture_id >= 0 with a bilinear texture
    fetch at uv (repeat wrap)."""
    tid = jnp.maximum(texture_id, 0)
    wh = atlas.sizes[tid].astype(jnp.float32)  # [R, 2] = (w, h)
    w = wh[..., 0]
    h = wh[..., 1]
    u = uv[..., 0] - jnp.floor(uv[..., 0])  # repeat wrap
    v = uv[..., 1] - jnp.floor(uv[..., 1])
    fx = u * w - 0.5
    fy = v * h - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    tx = (fx - x0)[..., None]
    ty = (fy - y0)[..., None]

    wi = atlas.sizes[tid][..., 0]
    hi = atlas.sizes[tid][..., 1]
    x0i = jnp.mod(x0.astype(jnp.int32), wi)
    x1i = jnp.mod(x0i + 1, wi)
    y0i = jnp.mod(y0.astype(jnp.int32), hi)
    y1i = jnp.mod(y0i + 1, hi)

    c00 = atlas.data[tid, y0i, x0i]
    c10 = atlas.data[tid, y0i, x1i]
    c01 = atlas.data[tid, y1i, x0i]
    c11 = atlas.data[tid, y1i, x1i]
    top = c00 * (1 - tx) + c10 * tx
    bot = c01 * (1 - tx) + c11 * tx
    color = top * (1 - ty) + bot * ty
    return jnp.where((texture_id >= 0)[..., None], color, base_color)
