"""pnraytracing_tpu — a TPU-native differentiable path-tracing framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of
position72/PnRayTracing (a Windows/OpenGL GLSL compute-shader path tracer):

* struct-of-arrays scenes as JAX pytrees (vs. GL texel-fetch buffers),
* a wavefront path integrator built from `jit`-able pure functions
  (vs. the 991-line GLSL megakernel ``shaders/ray_tracing.comp``),
* host-side SAH BVH build (numpy + native C++) shipping flat node arrays
  to the device (vs. ``include/BVH.hpp``),
* batched fixed-stack BVH traversal under ``lax.while_loop`` plus Pallas
  kernels for the hot path,
* Disney principled BRDF with light/env/BRDF multiple importance sampling,
* HDR environment importance sampling via marginal/conditional CDFs,
* end-to-end differentiability: pixel gradients flow to material
  parameters, environment texels and vertex positions,
* multi-chip scaling via `jax.sharding.Mesh` + `shard_map`: image tiles
  sharded over chips, scene replicated, gradients `psum`-reduced.
"""

__version__ = "0.1.0"

from pnraytracing_tpu.core.camera import CameraState, camera_rays, make_camera
from pnraytracing_tpu.core.config import RenderConfig
from pnraytracing_tpu.core.types import (
    Camera,
    EnvMap,
    Lights,
    Materials,
    Scene,
    TriangleMesh,
)


def __getattr__(name):
    """Lazy top-level conveniences (keeps package import light)."""
    if name in ("render", "render_frame", "render_average"):
        from pnraytracing_tpu.render import renderer

        return getattr(renderer, name)
    if name == "render_rays":
        from pnraytracing_tpu.render.integrator import render_rays

        return render_rays
    if name == "SceneBuilder":
        from pnraytracing_tpu.scene.build import SceneBuilder

        return SceneBuilder
    if name == "RenderSession":
        from pnraytracing_tpu.render.session import RenderSession

        return RenderSession
    raise AttributeError(f"module 'pnraytracing_tpu' has no attribute {name!r}")


__all__ = [
    "RenderConfig",
    "Camera",
    "CameraState",
    "EnvMap",
    "Lights",
    "Materials",
    "Scene",
    "TriangleMesh",
    "SceneBuilder",
    "RenderSession",
    "make_camera",
    "camera_rays",
    "render",
    "render_frame",
    "render_average",
    "render_rays",
]
