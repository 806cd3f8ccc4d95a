"""Brick-paged streaming traversal (accel/bricks.py +
accel/traverse_stream.py): decomposition invariants and hit-for-hit
agreement with the packed-layout oracle, under the Pallas interpreter."""

import numpy as np
import jax.numpy as jnp

from pnraytracing_tpu.accel.bricks import (
    BRICK_HEADER_WORDS,
    build_stream_data,
)
from pnraytracing_tpu.accel.traverse_packed import (
    any_hit_packed,
    closest_hit_packed,
)
from pnraytracing_tpu.accel.traverse_stream import (
    any_hit_stream,
    closest_hit_stream,
)
from pnraytracing_tpu.core.camera import camera_rays, make_camera
from pnraytracing_tpu.scene import shapes
from pnraytracing_tpu.scene.build import SceneBuilder


def _scene():
    b = SceneBuilder()
    b.add(shapes.icosphere(3, radius=1.0), dict(base_color=(0.7, 0.3, 0.2)),
          name="ball")
    b.add(shapes.quad(half=4.0), dict(base_color=(0.6, 0.6, 0.6)),
          name="floor")
    return b.build(env_constant=(0.3, 0.3, 0.3))


def _rays(n=16):
    cam = make_camera((0.0, 1.2, 3.5), (0, 0, 0), (0, 1, 0), 55.0, 1.0)
    o, d, _ = camera_rays(cam, n, n)
    return o, d


def test_brick_decomposition_invariants():
    scene = _scene()
    sd = build_stream_data(scene.bvh, scene.mesh, brick_budget_bytes=8 << 10)
    assert sd.n_bricks >= 2
    bricks = np.asarray(sd.bricks)
    # every triangle appears in exactly one brick's contiguous range
    covered = np.zeros(sd.n_tris, bool)
    for b in range(sd.n_bricks):
        t_lo = int(bricks[b, 1])
        n_tris = int(bricks[b, 3])
        assert n_tris > 0
        assert not covered[t_lo:t_lo + n_tris].any()
        covered[t_lo:t_lo + n_tris] = True
        # triangle rows must match the mesh's corner positions
        tris_off = int(bricks[b, 0])
        assert tris_off == BRICK_HEADER_WORDS + 16 * int(bricks[b, 2])
        got = bricks[b, tris_off:tris_off + 9 * n_tris].reshape(n_tris, 9)
        pos = np.asarray(scene.mesh.positions)
        idx = np.asarray(scene.mesh.indices)[t_lo:t_lo + n_tris]
        np.testing.assert_array_equal(got, pos[idx].reshape(n_tris, 9))
    assert covered.all()
    # top tree references every brick exactly once
    top = np.asarray(sd.top16)
    infos = np.concatenate([top[:, 12], top[:, 13]]).astype(np.int64)
    brick_refs = sorted(-i - 1 for i in infos if i < 0)
    assert brick_refs == list(range(sd.n_bricks))


def test_stream_closest_matches_packed():
    scene = _scene()
    sd = build_stream_data(scene.bvh, scene.mesh, brick_budget_bytes=8 << 10)
    trav = scene.trav.replace(stream=sd)
    o, d = _rays(16)
    r = o.shape[0]
    t_max = jnp.full((r,), 1e7, jnp.float32)
    ref = closest_hit_packed(scene.trav, o, d, t_max, None)
    got = closest_hit_stream(trav, o, d, t_max, None, tile_size=128,
                             interpret=True)
    np.testing.assert_array_equal(np.asarray(ref.tri), np.asarray(got.tri))
    np.testing.assert_allclose(np.asarray(ref.t), np.asarray(got.t),
                               rtol=1e-6, atol=1e-6)
    assert np.asarray(ref.valid).any()  # the scene is actually hit


def test_stream_any_hit_matches_packed():
    scene = _scene()
    sd = build_stream_data(scene.bvh, scene.mesh, brick_budget_bytes=8 << 10)
    trav = scene.trav.replace(stream=sd)
    o, d = _rays(16)
    r = o.shape[0]
    t_max = jnp.full((r,), 1e7, jnp.float32)
    mask = jnp.arange(r) % 3 != 0
    ref = any_hit_packed(scene.trav, o, d, t_max, mask)
    got = any_hit_stream(trav, o, d, t_max, mask, tile_size=128,
                         interpret=True)
    np.testing.assert_array_equal(np.asarray(ref), np.asarray(got))


def test_stream_masked_and_padded_tiles():
    """Ray counts that don't divide the tile, plus all-dead tiles."""
    scene = _scene()
    sd = build_stream_data(scene.bvh, scene.mesh, brick_budget_bytes=8 << 10)
    trav = scene.trav.replace(stream=sd)
    o, d = _rays(10)  # 100 rays -> pads to 128
    r = o.shape[0]
    t_max = jnp.full((r,), 1e7, jnp.float32)
    mask = jnp.zeros((r,), bool).at[:7].set(True)
    ref = closest_hit_packed(scene.trav, o, d, t_max, mask)
    got = closest_hit_stream(trav, o, d, t_max, mask, tile_size=128,
                             interpret=True)
    np.testing.assert_array_equal(
        np.asarray(ref.tri[:7]), np.asarray(got.tri[:7])
    )


def test_integrator_routes_oversize_scene_to_stream():
    """A scene carrying a stream layout renders through traversal='pallas'
    (interpreted here) and matches the packet-backend image."""
    import dataclasses

    import numpy as np

    from pnraytracing_tpu.core.config import RenderConfig
    from pnraytracing_tpu.render.renderer import render_frame
    from pnraytracing_tpu.core.camera import make_camera

    scene = _scene()
    sd = build_stream_data(scene.bvh, scene.mesh, brick_budget_bytes=8 << 10)
    # the test scene fits SMEM, so force the > SMEM route by patching
    # the budget check (the integrator re-imports it at trace time)
    import pnraytracing_tpu.accel.traverse_pallas as tp

    scene_s = scene.replace(trav=scene.trav.replace(stream=sd))
    cam = make_camera((0.0, 1.2, 3.5), (0, 0, 0), (0, 1, 0), 55.0, 1.0)
    cfg_pk = RenderConfig(width=12, height=12, max_depth=2, sampler="hash",
                          traversal="packet")
    ref = np.asarray(render_frame(scene, cam, cfg_pk, 0))

    orig = tp.scene_fits_smem
    tp.scene_fits_smem = lambda *a, **k: False  # force the stream route
    try:
        cfg_pl = dataclasses.replace(cfg_pk, traversal="pallas",
                                     trav_tile=128)
        got = np.asarray(render_frame(scene_s, cam, cfg_pl, 0))
    finally:
        tp.scene_fits_smem = orig
    np.testing.assert_allclose(ref, got, rtol=1e-5, atol=2e-5)
