"""Multi-chip scaling: device mesh, tile-sharded rendering, data-parallel
gradient training.

The reference's only parallelism is the one-GPU 32x32 workgroup grid
(ray_tracing.comp:3, main.cpp:613).  The TPU-native design (SURVEY.md §2.3):

* a 1-D ``jax.sharding.Mesh`` over all chips, axis ``"tiles"``;
* primary rays (image tiles / ray batches) sharded over ``tiles`` via
  ``shard_map`` — rays are independent, so the forward pass needs **no**
  communication at all;
* the scene/BVH replicated per chip (small scenes; primitive-sharding with
  gather-on-demand is a possible extension for giant scenes);
* for training, per-chip gradients are ``psum``-reduced over ICI — the only
  collective in the system.

Everything works identically on a fake CPU mesh
(``--xla_force_host_platform_device_count``), which is how the test-suite
and the driver's multi-chip dry-run validate the sharding without a pod.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import Mesh, PartitionSpec as P

from pnraytracing_tpu.core.config import RenderConfig
from pnraytracing_tpu.core.types import Camera, Scene

try:  # JAX >= 0.6 exposes shard_map at top level
    shard_map = jax.shard_map
except AttributeError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map  # type: ignore

AXIS = "tiles"


def make_device_mesh(n_devices: int | None = None) -> Mesh:
    """1-D mesh over the first n (default: all) devices.  After
    ``parallel.distributed.initialize`` this spans every host's chips."""
    devs = jax.devices()
    n = len(devs) if n_devices is None else n_devices
    return Mesh(np.asarray(devs[:n]), (AXIS,))


def to_global(tree, mesh: Mesh, spec: P):
    """Assemble global jax.Arrays on a (possibly multi-host) mesh from
    host data every process holds in full.

    Each process slices its addressable chunk out of its own full copy
    (``jax.make_array_from_callback``) — the multi-host analogue of
    ``jax.device_put``: scenes are replicated (``P()``), ray batches
    sharded (``P(AXIS)``).  Deterministic inputs (camera grids, loaded
    scenes) are identical on every host, so no broadcast is needed."""
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)

    def put(x):
        if x is None:
            return None
        x = np.asarray(x)
        return jax.make_array_from_callback(x.shape, sharding,
                                            lambda idx: x[idx])

    return jax.tree_util.tree_map(put, tree)


def pad_to_multiple(x: jnp.ndarray, m: int):
    r = x.shape[0]
    pad = (-r) % m
    if pad == 0:
        return x, r
    widths = [(0, pad)] + [(0, 0)] * (x.ndim - 1)
    return jnp.pad(x, widths), r


def shard_render_rays(
    scene: Scene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    frame,
    cfg: RenderConfig,
    mesh: Mesh,
) -> jnp.ndarray:
    """Render a ray batch with rays sharded over the mesh's ``tiles`` axis
    and the scene replicated.  Communication-free (rays are independent —
    the property that replaces CP/ring exchanges of LLM frameworks,
    SURVEY.md §5)."""
    from pnraytracing_tpu.render.integrator import render_rays

    n = mesh.shape[AXIS]
    (o_p, r), (d_p, _), (px_p, _), (py_p, _) = (
        pad_to_multiple(o, n),
        pad_to_multiple(d, n),
        pad_to_multiple(px, n),
        pad_to_multiple(py, n),
    )

    frame = jnp.asarray(frame, jnp.uint32)
    if jax.process_count() > 1:
        # multi-host: shard_map needs global arrays; every process holds
        # identical full inputs, so each contributes its own chunk
        scene = to_global(scene, mesh, P())
        o_p, d_p, px_p, py_p = (
            to_global(x, mesh, P(AXIS)) for x in (o_p, d_p, px_p, py_p)
        )
        frame = to_global(frame, mesh, P())

    fn = shard_map(
        functools.partial(render_rays, cfg=cfg),
        mesh=mesh,
        in_specs=(P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P()),
        out_specs=P(AXIS),
        check_vma=False,
    )
    out = fn(scene, o_p, d_p, px_p, py_p, frame)
    return out if r == out.shape[0] else out[:r]


def render_frame_sharded(
    scene: Scene, camera: Camera, cfg: RenderConfig, frame, mesh: Mesh
) -> jnp.ndarray:
    """Tile-sharded version of ``render_frame``: one full [H, W, 3] sample
    image computed across all chips."""
    from pnraytracing_tpu.core.camera import camera_rays
    from pnraytracing_tpu.render.renderer import pixel_coords, primary_jitter

    frame = jnp.asarray(frame, jnp.uint32)
    px, py = pixel_coords(cfg)
    o, d, _ = camera_rays(
        camera, cfg.width, cfg.height, jitter=primary_jitter(px, py, frame, cfg)
    )
    color = shard_render_rays(scene, o, d, px, py, frame, cfg, mesh)
    return color.reshape(cfg.height, cfg.width, 3)


def dp_loss_and_grad(
    params: dict,
    scene: Scene,
    o: jnp.ndarray,
    d: jnp.ndarray,
    px: jnp.ndarray,
    py: jnp.ndarray,
    frame,
    target: jnp.ndarray,
    cfg: RenderConfig,
    mesh: Mesh,
    use_replay: bool = False,
):
    """Data-parallel value+grad: rays sharded over ``tiles``, loss/grads
    ``pmean``-reduced over the mesh (the psum the survey's distribution
    table calls for).  Returns replicated (loss, grads).

    ``use_replay`` runs each chip's shard through the trace/replay split
    (traversal once, forward-only; backward over the while-loop-free
    replay) — it composes with the sharding because both phases are
    per-ray."""
    from pnraytracing_tpu.diff.grad import (
        apply_params,
        render_image_from_params,
    )
    from pnraytracing_tpu.render.integrator import (
        render_rays_replay,
        trace_paths,
    )

    n = mesh.shape[AXIS]
    r = o.shape[0]
    (o_p, _), (d_p, _), (px_p, _), (py_p, _), (t_p, _) = (
        pad_to_multiple(o, n),
        pad_to_multiple(d, n),
        pad_to_multiple(px, n),
        pad_to_multiple(py, n),
        pad_to_multiple(target, n),
    )
    # weight padded rows out of the loss (they render the environment and
    # would otherwise contaminate gradients)
    w_p, _ = pad_to_multiple(jnp.ones((r,), jnp.float32), n)
    denom = jnp.float32(r * target.shape[-1])

    def local(params, scene, frame_, o, d, px, py, target, w):
        if use_replay:
            recs = trace_paths(
                apply_params(scene, jax.lax.stop_gradient(params)),
                o, d, px, py, frame_, cfg,
            )

        def f(p):
            if use_replay:
                img = render_rays_replay(
                    apply_params(scene, p), o, d, px, py, frame_, cfg, recs
                )
            else:
                img = render_image_from_params(
                    p, scene, o, d, px, py, frame_, cfg
                )
            return jnp.sum(w[:, None] * (img - target) ** 2)  # local sum

        local_loss, grads = jax.value_and_grad(f)(params)
        # collectives stay outside the differentiated function: summed
        # local-sum losses/grads over the mesh, normalized by the global
        # element count = exact global-mean MSE and its gradient
        loss = jax.lax.psum(local_loss, AXIS) / denom
        grads = jax.tree_util.tree_map(
            lambda g: jax.lax.psum(g, AXIS) / denom, grads
        )
        return loss, grads

    fn = shard_map(
        local,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS), P(AXIS)),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return fn(
        params, scene, jnp.asarray(frame, jnp.uint32), o_p, d_p, px_p, py_p,
        t_p, w_p,
    )


def dp_train_step(
    params: dict,
    opt_state,
    optimizer,
    scene: Scene,
    o, d, px, py, frame, target,
    cfg: RenderConfig,
    mesh: Mesh,
    use_replay: bool = False,
):
    """One full data-parallel training step: sharded forward+backward,
    gradient pmean over ICI, replicated optimizer update."""
    import optax

    loss, grads = dp_loss_and_grad(
        params, scene, o, d, px, py, frame, target, cfg, mesh,
        use_replay=use_replay,
    )
    updates, opt_state = optimizer.update(grads, opt_state, params)
    params = optax.apply_updates(params, updates)
    return params, opt_state, loss
