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


def build_atlas(images: list[np.ndarray]) -> TextureAtlas | None:
    """Stack variable-size [h, w, 3] float images (values in [0,1]) into a
    padded atlas.  Returns None for an empty list."""
    if not images:
        return None
    max_h = max(im.shape[0] for im in images)
    max_w = max(im.shape[1] for im in images)
    data = np.zeros((len(images), max_h, max_w, 3), np.float32)
    sizes = np.zeros((len(images), 2), np.int32)
    for k, im in enumerate(images):
        h, w = im.shape[0], im.shape[1]
        data[k, :h, :w] = im[..., :3]
        sizes[k] = (w, h)
    return TextureAtlas(data=jnp.asarray(data), sizes=jnp.asarray(sizes))


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
