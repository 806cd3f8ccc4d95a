"""Frame rendering and progressive accumulation.

The analogue of the reference's frame loop (main.cpp:569-630): generate
primary rays, trace one sample per pixel, average into the accumulation
state.  The GLSL running average ``mix(prev, color, 1/(frameCount+1))``
(ray_tracing.comp:989-991) is kept as an exact (sum, count) pair here.
Interaction semantics (accumulation reset + 1-bounce preview,
main.cpp:589-601) live in :mod:`pnraytracing_tpu.render.session`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from flax import struct

from pnraytracing_tpu.core.camera import camera_rays
from pnraytracing_tpu.core.config import RenderConfig
from pnraytracing_tpu.core.types import Camera, Scene
from pnraytracing_tpu.ops.sampling import pixel_seed, rand01
from pnraytracing_tpu.render.integrator import render_rays


def pixel_coords(cfg: RenderConfig):
    """Per-ray pixel coordinates in the reference's GL convention
    (x = column, y = row from the bottom), matching the ray order of
    :func:`camera_rays` (row-major from the top row)."""
    xs = jnp.arange(cfg.width, dtype=jnp.uint32)
    ys = jnp.arange(cfg.height, dtype=jnp.uint32)
    gx, gy = jnp.meshgrid(xs, ys, indexing="xy")
    gy = jnp.uint32(cfg.height - 1) - gy
    return gx.reshape(-1), gy.reshape(-1)


def primary_jitter(px, py, frame, cfg: RenderConfig):
    """Optional sub-pixel jitter (off by default: the reference casts
    pixel-corner rays only, comp:980).  Derived from a salted hash stream so
    it is decorrelated from the path RNG."""
    if not cfg.jitter_primary:
        return None
    s = pixel_seed(px, py, frame) ^ jnp.uint32(0x9E3779B9)
    s, jx = rand01(s)
    _, jy = rand01(s)
    return jnp.stack([jx, jy], axis=-1)


def render_frame(
    scene: Scene, camera: Camera, cfg: RenderConfig, frame
) -> jnp.ndarray:
    """Render one 1-spp sample image [H, W, 3] for frame index ``frame``."""
    frame = jnp.asarray(frame, jnp.uint32)
    px, py = pixel_coords(cfg)
    o, d, _ = camera_rays(
        camera, cfg.width, cfg.height, jitter=primary_jitter(px, py, frame, cfg)
    )
    p = o.shape[0]
    tile = min(cfg.tile_pixels, p)
    if p % tile != 0:
        tile = p  # fall back to one dispatch for awkward sizes
    chunks = []
    for lo in range(0, p, tile):
        hi = lo + tile
        chunks.append(
            render_rays(scene, o[lo:hi], d[lo:hi], px[lo:hi], py[lo:hi], frame, cfg)
        )
    color = jnp.concatenate(chunks, axis=0) if len(chunks) > 1 else chunks[0]
    return color.reshape(cfg.height, cfg.width, 3)


def render(
    scene: Scene,
    camera: Camera,
    cfg: RenderConfig,
    spp: int | None = None,
    start_frame: int = 0,
) -> jnp.ndarray:
    """Render ``spp`` progressive samples and return their mean [H, W, 3]."""
    n = cfg.spp if spp is None else spp
    acc = jnp.zeros((cfg.height, cfg.width, 3), jnp.float32)
    for f in range(start_frame, start_frame + n):
        acc = acc + render_frame(scene, camera, cfg, f)
    return acc / jnp.float32(n)


@functools.partial(jax.jit, static_argnames=("cfg", "spp"))
def render_average(
    scene: Scene,
    camera: Camera,
    cfg: RenderConfig,
    start_frame: jnp.ndarray,
    spp: int,
) -> jnp.ndarray:
    """Mean of ``spp`` progressive samples computed in ONE compiled
    program (``lax.fori_loop`` over the frame counter) — amortizes
    dispatch for benchmarking and production rendering.  Assumes the frame
    fits one dispatch (no host-side tiling)."""
    px, py = pixel_coords(cfg)

    def body(i, acc):
        frame = jnp.asarray(start_frame, jnp.uint32) + jnp.uint32(i)
        o, d, _ = camera_rays(
            camera, cfg.width, cfg.height,
            jitter=primary_jitter(px, py, frame, cfg),
        )
        return acc + render_rays(scene, o, d, px, py, frame, cfg)

    acc = jax.lax.fori_loop(
        0, spp, body, jnp.zeros((cfg.num_pixels, 3), jnp.float32)
    )
    return (acc / jnp.float32(spp)).reshape(cfg.height, cfg.width, 3)


@struct.dataclass
class AccumState:
    """Progressive accumulation buffer — the persistent state of the
    reference (output image + frameCount, main.cpp:556-559, 628)."""

    total: jnp.ndarray  # [H, W, 3] sum of samples
    count: jnp.ndarray  # [] int32 number of accumulated frames

    @classmethod
    def create(cls, cfg: RenderConfig) -> "AccumState":
        return cls(
            total=jnp.zeros((cfg.height, cfg.width, 3), jnp.float32),
            count=jnp.zeros((), jnp.int32),
        )

    def add(self, sample_image: jnp.ndarray) -> "AccumState":
        return AccumState(total=self.total + sample_image, count=self.count + 1)

    def reset(self) -> "AccumState":
        return AccumState(total=jnp.zeros_like(self.total), count=jnp.zeros_like(self.count))

    def resolve(self) -> jnp.ndarray:
        return self.total / jnp.maximum(self.count, 1).astype(jnp.float32)


@functools.partial(jax.jit, donate_argnums=(0,))
def accum_add(acc: AccumState, sample_image: jnp.ndarray) -> AccumState:
    """Donating accumulation step: the previous ``total`` buffer is
    reused in place — progressive rendering at 2048^2 otherwise
    reallocates a 50 MB [H, W, 3] sum every frame (SURVEY §5's
    aliasing/donation row; XLA checks the aliasing contract at compile
    time, the analogue of a race/aliasing assert)."""
    return acc.add(sample_image)
