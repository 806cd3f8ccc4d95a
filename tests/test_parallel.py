"""Multi-device sharding tests on the 8-device fake CPU mesh (SURVEY.md §4:
tile-sharded render must equal the single-device render)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pnraytracing_tpu.core.camera import camera_rays, make_camera
from pnraytracing_tpu.core.config import RenderConfig
from pnraytracing_tpu.diff.grad import extract_params, loss_and_grad
from pnraytracing_tpu.parallel.mesh import (
    dp_loss_and_grad,
    make_device_mesh,
    shard_render_rays,
)
from pnraytracing_tpu.render.integrator import render_rays
from pnraytracing_tpu.render.renderer import pixel_coords
from pnraytracing_tpu.scene import shapes
from pnraytracing_tpu.scene.build import SceneBuilder
from pnraytracing_tpu.scene.transform import compose, rotate, translate

CFG = RenderConfig(width=16, height=16, max_depth=2, sampler="hash",
                   clamp_radiance=False)


@pytest.fixture(scope="module")
def setup():
    assert len(jax.devices()) >= 8, "conftest must force 8 CPU devices"
    b = SceneBuilder()
    b.add(shapes.cube(0.8), dict(base_color=(0.7, 0.3, 0.3), roughness=0.5),
          name="cube", transform=translate(0, 0.8, 0))
    b.add(shapes.quad(6.0), dict(base_color=(0.7, 0.7, 0.7), roughness=0.9),
          name="floor")
    b.add(shapes.quad(1.0), dict(emissive=(15.0, 15.0, 15.0)), name="light",
          transform=compose(translate(0, 5.0, 0), rotate(180, (0, 0, 1))))
    scene = b.build(env_constant=(0.2, 0.25, 0.3))
    cam = make_camera((3.5, 3.0, 3.5), (0, 0.8, 0), (0, 1, 0), 45.0, 1.0)
    px, py = pixel_coords(CFG)
    o, d, _ = camera_rays(cam, CFG.width, CFG.height)
    return scene, o, d, px, py


@pytest.mark.slow
def test_sharded_render_equals_single_device(setup):
    scene, o, d, px, py = setup
    mesh = make_device_mesh(8)
    sharded = np.asarray(
        shard_render_rays(scene, o, d, px, py, 0, CFG, mesh)
    )
    single = np.asarray(render_rays(scene, o, d, px, py, jnp.uint32(0), CFG))
    np.testing.assert_allclose(sharded, single, atol=1e-6)


def test_sharded_render_odd_ray_count(setup):
    """Ray counts not divisible by the mesh are padded transparently."""
    scene, o, d, px, py = setup
    mesh = make_device_mesh(8)
    n = 16 * 16 - 3
    sharded = np.asarray(
        shard_render_rays(scene, o[:n], d[:n], px[:n], py[:n], 0, CFG, mesh)
    )
    single = np.asarray(
        render_rays(scene, o, d, px, py, jnp.uint32(0), CFG)
    )[:n]
    assert sharded.shape == (n, 3)
    np.testing.assert_allclose(sharded, single, atol=1e-6)


@pytest.mark.slow
def test_dp_gradients_match_single_device(setup):
    scene, o, d, px, py = setup
    mesh = make_device_mesh(8)
    params = extract_params(scene, ("materials",))
    target = jnp.zeros((o.shape[0], 3), jnp.float32)

    loss_s, grads_s = loss_and_grad(
        params, scene, o, d, px, py, jnp.uint32(0), target, CFG
    )
    loss_p, grads_p = dp_loss_and_grad(
        params, scene, o, d, px, py, 0, target, CFG, mesh
    )
    np.testing.assert_allclose(float(loss_s), float(loss_p), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(grads_s), jax.tree_util.tree_leaves(grads_p)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-7)


@pytest.mark.slow
def test_dp_replay_gradients_match(setup):
    """The trace/replay dp step must give the same loss and gradients as
    the live dp step (same estimator; traversal hoisted out of autodiff)."""
    scene, o, d, px, py = setup
    mesh = make_device_mesh(8)
    params = extract_params(scene, ("materials",))
    target = jnp.zeros((o.shape[0], 3), jnp.float32)
    loss_a, grads_a = dp_loss_and_grad(
        params, scene, o, d, px, py, 0, target, CFG, mesh
    )
    loss_b, grads_b = dp_loss_and_grad(
        params, scene, o, d, px, py, 0, target, CFG, mesh, use_replay=True
    )
    np.testing.assert_allclose(float(loss_a), float(loss_b), rtol=1e-6)
    for a, b in zip(
        jax.tree_util.tree_leaves(grads_a), jax.tree_util.tree_leaves(grads_b)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5,
                                   atol=1e-8)


@pytest.mark.slow
def test_mesh_subset_sizes(setup):
    scene, o, d, px, py = setup
    for n in (2, 4):
        mesh = make_device_mesh(n)
        out = np.asarray(shard_render_rays(scene, o, d, px, py, 0, CFG, mesh))
        single = np.asarray(render_rays(scene, o, d, px, py, jnp.uint32(0), CFG))
        np.testing.assert_allclose(out, single, atol=1e-6)


@pytest.mark.slow
def test_dp_gradients_with_padding(setup):
    """Ray counts not divisible by the mesh: padded rays must not
    contaminate the loss or gradients."""
    scene, o, d, px, py = setup
    mesh = make_device_mesh(8)
    n = 16 * 16 - 5  # not divisible by 8
    params = extract_params(scene, ("materials",))
    target = jnp.zeros((n, 3), jnp.float32)
    loss_s, grads_s = loss_and_grad(
        params, scene, o[:n], d[:n], px[:n], py[:n], jnp.uint32(0), target, CFG
    )
    loss_p, grads_p = dp_loss_and_grad(
        params, scene, o[:n], d[:n], px[:n], py[:n], 0, target, CFG, mesh
    )
    np.testing.assert_allclose(float(loss_s), float(loss_p), rtol=1e-5)
    for a, b in zip(
        jax.tree_util.tree_leaves(grads_s), jax.tree_util.tree_leaves(grads_p)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-4,
                                   atol=1e-7)


@pytest.mark.slow
def test_sharded_bitwise_production_shape(setup):
    """Round-5 hardening (VERDICT r4 #6): the PRODUCTION integrator shape
    — 256^2, depth 4, traversal='packet' (the Mosaic kernel's algorithm
    twin), packed-carry compaction + coherence sort ON — must be BITWISE
    identical sharded over the 8-device mesh vs single-device."""
    scene, *_ = setup
    cfg = RenderConfig(width=256, height=256, max_depth=4,
                       traversal="packet", loop="scan",
                       compact_rays=True, sort_rays=True)
    cam = make_camera((3.5, 3.0, 3.5), (0, 0.8, 0), (0, 1, 0), 45.0, 1.0)
    px, py = pixel_coords(cfg)
    o, d, _ = camera_rays(cam, cfg.width, cfg.height)
    mesh = make_device_mesh(8)
    sharded = np.asarray(
        shard_render_rays(scene, o, d, px, py, 0, cfg, mesh)
    )
    single = np.asarray(render_rays(scene, o, d, px, py, 0, cfg))
    np.testing.assert_array_equal(sharded, single)


@pytest.mark.slow
def test_sharded_multistep_training_loop(setup):
    """Multi-step sharded training: 3 dp_train_step iterations (render ->
    pmean'd grads -> adam) must run and strictly reduce the loss."""
    import optax

    from pnraytracing_tpu.parallel.mesh import dp_train_step

    scene, o, d, px, py = setup
    mesh = make_device_mesh(8)
    cfg = RenderConfig(width=16, height=16, max_depth=2, sampler="hash",
                       clamp_radiance=False, traversal="packet")
    # target = render with brighter emissive; optimize materials toward it
    bright = scene.replace(
        materials=scene.materials.replace(
            emissive=scene.materials.emissive * 1.5))
    target = render_rays(bright, o, d, px, py, 0, cfg)
    params = extract_params(scene, ("materials",))
    optimizer = __import__("optax").adam(5e-2)
    opt_state = optimizer.init(params)
    losses = []
    for step in range(3):
        params, opt_state, loss = dp_train_step(
            params, opt_state, optimizer, scene,
            o, d, px, py, jnp.uint32(0), target, cfg, mesh,
            use_replay=True,
        )
        losses.append(float(loss))
    assert np.isfinite(losses).all()
    assert losses[-1] < losses[0], losses
