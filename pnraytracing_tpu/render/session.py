"""Interactive render session and checkpointing.

Rebuilds the reference's frame-loop semantics (main.cpp:569-630):

* progressive accumulation of 1 spp per frame;
* any interaction (camera orbit/pan/zoom, material edit) switches to a
  1-bounce preview and resets the accumulation (main.cpp:589-601,
  ``MAX_BOUNCE_DEPTH=1, redraw=1, frameCount=0``);
* material edits patch the scene in place (the ImGui material editor's
  ``glTexSubImage1D`` live-update, ImGuiLayer.hpp:73-83) — here a pytree
  ``replace``, which re-uses the compiled executable (shapes unchanged, no
  re-jit).

Checkpoint/resume (absent in the reference, SURVEY.md §5) persists the
accumulation buffer + frame counter + scene parameters with numpy, and the
optimizer state for inverse-rendering runs via orbax when available.
"""

from __future__ import annotations

import dataclasses
import os
import time
import jax
import jax.numpy as jnp
import numpy as np

from pnraytracing_tpu.core.camera import CameraState
from pnraytracing_tpu.core.config import RenderConfig
from pnraytracing_tpu.core.types import Scene
from pnraytracing_tpu.render.renderer import (
    AccumState,
    accum_add,
    render_frame,
)


@dataclasses.dataclass
class SessionStats:
    frames: int = 0
    last_frame_ms: float = 0.0
    rays_per_s: float = 0.0


class RenderSession:
    """Progressive renderer with interaction semantics."""

    def __init__(self, scene: Scene, camera: CameraState, cfg: RenderConfig,
                 preview_depth: int = 1):
        self.scene = scene
        self.camera = camera
        self.cfg = cfg
        # fast preview config: 1 bounce, like the reference's interactive
        # mode (main.cpp:593-596).  The coherence sort is a latency tax
        # at preview depth (one bounce, mostly-coherent rays): off.
        self.preview_cfg = dataclasses.replace(
            cfg, max_depth=preview_depth, compact_rays=False)
        self.accum = AccumState.create(cfg)
        self.interacting = False
        self.stats = SessionStats()

    # --- interactions (all reset accumulation) ---------------------------
    def _dirty(self):
        self.accum = self.accum.reset()
        self.interacting = True

    def orbit(self, dphi: float, dtheta: float):
        self.camera.orbit(dphi, dtheta)
        self._dirty()

    def pan(self, dx: float, dy: float):
        self.camera.pan(dx, dy)
        self._dirty()

    def zoom(self, dfov: float):
        self.camera.zoom_fov(dfov)
        self._dirty()

    def edit_material(self, index: int, **fields):
        """Live material patch (ImGuiLayer.hpp:60-83)."""
        mats = self.scene.materials
        for key, val in fields.items():
            arr = getattr(mats, key)
            mats = mats.replace(**{key: arr.at[index].set(jnp.asarray(val, arr.dtype))})
        self.scene = self.scene.replace(materials=mats)
        self._dirty()

    # --- stepping --------------------------------------------------------
    def step(self) -> jnp.ndarray:
        """Render one sample; returns the resolved progressive image.
        The first step after an interaction uses the 1-bounce preview and
        does not advance the accumulation (redraw=1 semantics)."""
        cfg = self.preview_cfg if self.interacting else self.cfg
        frame = int(self.accum.count)
        t0 = time.perf_counter()
        img = render_frame(self.scene, self.camera.basis(), cfg, frame)
        # fetch one scalar rather than block_until_ready: on the tunneled
        # TPU the latter can return before execution (BASELINE.md round-2
        # integrity notes), which silently inflates the stats
        float(img[0, 0, 0])
        dt = time.perf_counter() - t0
        self.stats.frames += 1
        self.stats.last_frame_ms = dt * 1e3
        self.stats.rays_per_s = cfg.num_pixels * (1 + 3 * cfg.max_depth) / dt
        if self.interacting:
            self.interacting = False  # next step resumes converged mode
            return img
        # donating step: the previous accumulation buffer is reused
        self.accum = accum_add(self.accum, img)
        return self.accum.resolve()

    def converge(self, spp: int) -> jnp.ndarray:
        out = None
        for _ in range(spp):
            out = self.step()
        return out

    # --- checkpoint / resume --------------------------------------------
    def save(self, path: str) -> None:
        """Persist accumulation state + materials (the mutable scene part)."""
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        mats = self.scene.materials
        np.savez(
            path,
            total=np.asarray(self.accum.total),
            count=np.asarray(self.accum.count),
            eye=self.camera.eye, center=self.camera.center, up=self.camera.up,
            fov=self.camera.fov_deg, aspect=self.camera.aspect,
            **{f"mat_{k}": np.asarray(getattr(mats, k))
               for k in ("emissive", "base_color", "subsurface", "metallic",
                          "specular", "specular_tint", "roughness",
                          "anisotropic", "sheen", "sheen_tint", "clearcoat",
                          "clearcoat_gloss", "ior", "transmission")},
        )

    def load(self, path: str) -> None:
        data = np.load(path if path.endswith(".npz") else path + ".npz")
        self.accum = AccumState(
            total=jnp.asarray(data["total"]), count=jnp.asarray(data["count"])
        )
        self.camera = CameraState(
            eye=data["eye"], center=data["center"], up=data["up"],
            fov_deg=float(data["fov"]), aspect=float(data["aspect"]),
        )
        mats = self.scene.materials
        fields = {k[4:]: jnp.asarray(v) for k, v in data.items()
                  if k.startswith("mat_")}
        self.scene = self.scene.replace(materials=mats.replace(**fields))
        self.interacting = False


def save_optimizer_checkpoint(path: str, params, opt_state, step: int) -> None:
    """Orbax-backed checkpoint for inverse-rendering runs (falls back to
    pickle-free npz of flattened leaves)."""
    try:
        import orbax.checkpoint as ocp

        ckpt = ocp.PyTreeCheckpointer()
        ckpt.save(os.path.abspath(path),
                  {"params": params, "opt_state": opt_state, "step": step},
                  force=True)
    except Exception:
        leaves, _ = jax.tree_util.tree_flatten((params, opt_state, step))
        np.savez(path + ".npz", **{f"leaf_{i}": np.asarray(x)
                                   for i, x in enumerate(leaves)})


def load_optimizer_checkpoint(path: str, like):
    """Restore a checkpoint written by :func:`save_optimizer_checkpoint`;
    ``like`` is a matching (params, opt_state, step) template."""
    import orbax.checkpoint as ocp

    ckpt = ocp.PyTreeCheckpointer()
    restored = ckpt.restore(os.path.abspath(path), item={
        "params": like[0], "opt_state": like[1], "step": like[2]})
    return restored["params"], restored["opt_state"], restored["step"]
