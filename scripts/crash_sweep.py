#!/usr/bin/env python
"""Which program class crashes the TPU worker?  One case per process.

Usage: python scripts/crash_sweep.py {matmul,gather,trav,depth1,noenv}
Each case builds + executes + FETCHES a checksum (execution cannot be
faked by an early-returning block_until_ready).
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pnraytracing_tpu.utils.cache import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp


def log(*a):
    print(*a, flush=True)


def case_matmul():
    x = jnp.ones((512, 512))
    return float((x @ x).sum())


def case_gather():
    """Synthetic stand-in for traversal: a while loop of dynamic row
    gathers over a node-table-sized array, 16k lanes."""
    table = jnp.arange(40000 * 8, dtype=jnp.float32).reshape(40000, 8)
    idx0 = jnp.arange(16384, dtype=jnp.int32) % 40000

    @jax.jit
    def f(table, idx):
        def body(state):
            i, idx, acc = state
            rows = table[idx]  # [L, 8] dynamic gather
            acc = acc + rows.sum(axis=1)
            idx = (idx * 7 + 13) % 40000
            return i + 1, idx, acc

        def cond(state):
            return state[0] < 64

        _, _, acc = jax.lax.while_loop(
            cond, body, (jnp.int32(0), idx, jnp.zeros((16384,), jnp.float32))
        )
        return acc.sum()

    return float(f(table, idx0))


def _scene(env):
    from pnraytracing_tpu.scene.scenes import config3_teapot_night

    scene, cam_state = config3_teapot_night(env_height=32)
    cam_state.aspect = 1.0
    if not env:
        scene = scene.replace(env=None, env_constant=jnp.ones(3) * 0.3)
    return jax.device_put(scene), cam_state.basis()


def case_trav(tile_size=4096):
    from pnraytracing_tpu.accel.traverse_packed import closest_hit_packed
    from pnraytracing_tpu.core.camera import camera_rays
    from pnraytracing_tpu.core.math import FLOAT_MAX

    scene, cam = _scene(env=True)
    o, d, _ = camera_rays(cam, 128, 128)
    tm = jnp.full((o.shape[0],), FLOAT_MAX, jnp.float32)
    hit = closest_hit_packed(scene.trav, o, d, tm, None, tile_size=tile_size)
    return float(hit.t.sum()) + float(hit.tri.sum())


def case_trav_generic():
    """The non-packed while-loop traversal (accel/traverse.py)."""
    from pnraytracing_tpu.accel.traverse import closest_hit
    from pnraytracing_tpu.core.camera import camera_rays
    from pnraytracing_tpu.core.math import FLOAT_MAX

    scene, cam = _scene(env=True)
    o, d, _ = camera_rays(cam, 128, 128)
    tm = jnp.full((o.shape[0],), FLOAT_MAX, jnp.float32)
    hit = closest_hit(scene.bvh, scene.mesh, o, d, tm, None)
    return float(hit.t.sum()) + float(hit.tri.sum())


def _render(env):
    from pnraytracing_tpu.core.config import RenderConfig
    from pnraytracing_tpu.render.renderer import render_frame

    scene, cam = _scene(env=env)
    cfg = RenderConfig(width=128, height=128,
                       max_depth=1 if env else 4)
    img = render_frame(scene, cam, cfg, 0)
    return float(img.sum())


def main():
    case = sys.argv[1]
    t0 = time.perf_counter()
    fn = {
        "matmul": case_matmul,
        "gather": case_gather,
        "trav": case_trav,
        "trav_notile": lambda: case_trav(tile_size=None),
        "trav_generic": case_trav_generic,
        "depth1": lambda: _render(env=True),
        "noenv": lambda: _render(env=False),
    }[case]
    try:
        chk = fn()
        log(f"{case}: OK chk={chk:.3f} ({time.perf_counter() - t0:.1f}s)")
    except Exception as e:
        log(f"{case}: FAILED {type(e).__name__}: {e}")
        sys.exit(1)


if __name__ == "__main__":
    main()
