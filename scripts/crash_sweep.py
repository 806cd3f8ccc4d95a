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


def case_flops():
    """Speed forensics: 10 chained 4096^2 bf16 matmuls, fetch-bounded.
    A real v5e MXU (~200 TFLOP/s bf16) finishes ~1.4 TFLOP in ~10 ms;
    a CPU emulating the device needs minutes.  Distinguishes 'chip is
    fast, our program is latency-bound' from 'tunnel executes slowly'."""
    n, iters = 4096, 10
    x = jnp.ones((n, n), jnp.bfloat16)

    @jax.jit
    def f(x):
        def body(i, acc):
            return (acc @ x) * jnp.bfloat16(0.5)

        return jax.lax.fori_loop(0, iters, body, x).astype(jnp.float32).sum()

    float(f(x))  # warmup/compile
    t0 = time.perf_counter()
    chk = float(f(x))
    dt = time.perf_counter() - t0
    tflops = 2 * n**3 * iters / dt / 1e12
    log(f"flops: {tflops:.2f} TFLOP/s (dt={dt*1e3:.1f} ms)")
    return chk


def case_membw():
    """HBM bandwidth probe: 10 passes of read+write over a 512 MB array,
    fetch-bounded.  v5e HBM ~ 800 GB/s; host emulation ~ 10 GB/s."""
    n = 128 * 1024 * 1024  # 512 MB of f32
    x = jnp.ones((n,), jnp.float32)

    @jax.jit
    def f(x):
        def body(i, v):
            return v * 1.0000001 + 0.5
        return jax.lax.fori_loop(0, 10, body, x).sum()

    float(f(x))
    t0 = time.perf_counter()
    chk = float(f(x))
    dt = time.perf_counter() - t0
    gbs = 10 * 2 * 4 * n / dt / 1e9
    log(f"membw: {gbs:.1f} GB/s (dt={dt*1e3:.1f} ms)")
    return chk


def case_gather_rate():
    """Dynamic-gather throughput: the traversal's dominant primitive.
    Times 256 sequential [65536]-lane row gathers from a [40000, 8]
    table inside one program (fetch-bounded) — reports gathers/s and
    effective GB/s so the render's per-iteration cost has a roofline."""
    table = jnp.arange(40000 * 8, dtype=jnp.float32).reshape(40000, 8)
    idx0 = jnp.arange(65536, dtype=jnp.int32) % 40000
    iters = 256

    @jax.jit
    def f(table, idx):
        def body(i, state):
            idx, acc = state
            rows = table[idx]
            acc = acc + rows.sum(axis=1)
            idx = (idx * 7 + 13) % 40000
            return idx, acc

        _, acc = jax.lax.fori_loop(
            0, iters, body, (idx0, jnp.zeros((65536,), jnp.float32))
        )
        return acc.sum()

    float(f(table, idx0))
    t0 = time.perf_counter()
    chk = float(f(table, idx0))
    dt = time.perf_counter() - t0
    per_gather = dt / iters
    gbs = 65536 * 8 * 4 / per_gather / 1e9
    log(f"gather_rate: {per_gather*1e6:.1f} us/gather-pass, {gbs:.1f} GB/s "
        f"(dt={dt*1e3:.1f} ms)")
    return chk


def _time_gather(make_fn, iters, lanes, bytes_per_row, label):
    f, args = make_fn()
    float(f(*args))
    t0 = time.perf_counter()
    chk = float(f(*args))
    dt = time.perf_counter() - t0
    per_pass = dt / iters
    gbs = lanes * bytes_per_row / per_pass / 1e9
    log(f"{label}: {per_pass*1e6:.1f} us/pass ({per_pass/lanes*1e9:.2f} "
        f"ns/row), {gbs:.2f} GB/s useful (dt={dt*1e3:.1f} ms)")
    return chk


def case_gather_forms():
    """Which gather FORM is fast on this TPU?  All fetch 65536 rows/pass
    for 64 passes, fetch-bounded; differ in table layout / mechanism."""
    lanes, iters = 65536, 64
    idx0 = jnp.arange(lanes, dtype=jnp.int32) % 40000

    def loop(body, init_acc):
        @jax.jit
        def f(table, idx):
            def b(i, st):
                idx, acc = st
                acc = body(table, idx, acc)
                idx = (idx * 7 + 13) % table.shape[0 if table.ndim == 1 else 0]
                return idx, acc

            _, acc = jax.lax.fori_loop(0, iters, b, (idx0, init_acc))
            return acc.sum()

        return f

    acc0 = jnp.zeros((lanes,), jnp.float32)

    # 1) [N, 8] row gather (the traversal's nodes8 form)
    t8 = jnp.arange(40000 * 8, dtype=jnp.float32).reshape(40000, 8)
    _time_gather(
        lambda: (loop(lambda t, i, a: a + t[i].sum(axis=1), acc0), (t8, idx0)),
        iters, lanes, 32, "rows8",
    )
    # 2) [N, 128] row gather (lane-aligned rows)
    t128 = jnp.ones((40000, 128), jnp.float32)
    _time_gather(
        lambda: (loop(lambda t, i, a: a + t[i].sum(axis=1), acc0),
                 (t128, idx0)),
        iters, lanes, 512, "rows128",
    )
    # 3) 1-D element gather (the env bisection's form)
    t1 = jnp.arange(40000, dtype=jnp.float32)
    _time_gather(
        lambda: (loop(lambda t, i, a: a + t[i], acc0), (t1, idx0)),
        iters, lanes, 4, "elem1d",
    )
    # 4) one-hot bf16 matmul "gather" from a SMALL table (materials form)
    tm = jnp.ones((8, 128), jnp.bfloat16)

    @jax.jit
    def f_onehot_small(table, idx):
        def b(i, st):
            idx, acc = st
            oh = jax.nn.one_hot(idx % 8, 8, dtype=jnp.bfloat16)
            rows = jnp.dot(oh, table, preferred_element_type=jnp.float32)
            acc = acc + rows.sum(axis=1)
            return (idx * 7 + 13) % 40000, acc

        _, acc = jax.lax.fori_loop(0, iters, b, (idx0, jnp.zeros((lanes,), jnp.float32)))
        return acc.sum()

    float(f_onehot_small(tm, idx0))
    t0 = time.perf_counter()
    chk = float(f_onehot_small(tm, idx0))
    dt = time.perf_counter() - t0
    log(f"onehot8x128: {dt/iters*1e6:.1f} us/pass (dt={dt*1e3:.1f} ms)")
    # 5) take_along_axis on a transposed [8, N] table
    tT = jnp.arange(8 * 40000, dtype=jnp.float32).reshape(8, 40000)

    @jax.jit
    def f_transposed(table, idx):
        def b(i, st):
            idx, acc = st
            rows = jnp.take(table, idx, axis=1)  # [8, L]
            acc = acc + rows.sum(axis=0)
            return (idx * 7 + 13) % 40000, acc

        _, acc = jax.lax.fori_loop(0, iters, b, (idx0, jnp.zeros((lanes,), jnp.float32)))
        return acc.sum()

    float(f_transposed(tT, idx0))
    t0 = time.perf_counter()
    chk2 = float(f_transposed(tT, idx0))
    dt = time.perf_counter() - t0
    log(f"transposed8xN: {dt/iters*1e6:.1f} us/pass (dt={dt*1e3:.1f} ms)")
    return chk + chk2


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



def case_packet_trav(res=128, tile=4096):
    """Isolated packet-traversal query: one closest-hit pass, timed on the
    second (cached) call.  Prints iteration-rate forensics."""
    from pnraytracing_tpu.accel.traverse_packet import closest_hit_packet
    from pnraytracing_tpu.core.camera import camera_rays
    from pnraytracing_tpu.core.math import FLOAT_MAX

    scene, cam = _scene(env=True)
    o, d, _ = camera_rays(cam, res, res)
    tm = jnp.full((o.shape[0],), FLOAT_MAX, jnp.float32)

    @jax.jit
    def q(trav, o, d, tm):
        h = closest_hit_packet(trav, o, d, tm, None, tile_size=tile)
        return h.t.sum() + h.tri.sum()

    t0 = time.perf_counter()
    chk = float(q(scene.trav, o, d, tm))
    log(f"packet_trav{res}: first call (compile+run) {time.perf_counter()-t0:.1f}s")
    t0 = time.perf_counter()
    chk = float(q(scene.trav, o, d, tm))
    dt = time.perf_counter() - t0
    rays = o.shape[0]
    log(f"packet_trav{res}: {dt*1e3:.1f} ms/query, {rays/dt:.3g} rays/s "
        f"(tile={tile})")
    return chk



def case_loop_overhead():
    """while_loop vs fori_loop iteration overhead: same trivial vector
    body, 512 iterations.  The difference is the per-iteration cost of
    the dynamic condition on this platform."""
    x0 = jnp.ones((4096,), jnp.float32)

    @jax.jit
    def f_while(x):
        def cond(st):
            return st[0] < 512

        def body(st):
            i, x = st
            return i + 1, x * 1.0000001 + 1e-7

        _, x = jax.lax.while_loop(cond, body, (jnp.int32(0), x))
        return x.sum()

    @jax.jit
    def f_fori(x):
        def body(i, x):
            return x * 1.0000001 + 1e-7

        return jax.lax.fori_loop(0, 512, body, x).sum()

    @jax.jit
    def f_chunked(x):
        def cond(st):
            return st[0] < 512

        def outer(st):
            def inner(j, st2):
                i, x = st2
                return i + 1, x * 1.0000001 + 1e-7

            return jax.lax.fori_loop(0, 32, inner, st)

        _, x = jax.lax.while_loop(cond, outer, (jnp.int32(0), x))
        return x.sum()

    for name, f in (("while", f_while), ("fori", f_fori),
                    ("chunked32", f_chunked)):
        float(f(x0))
        t0 = time.perf_counter()
        chk = float(f(x0))
        dt = time.perf_counter() - t0
        log(f"loop_overhead {name}: {dt/512*1e6:.1f} us/iter "
            f"(dt={dt*1e3:.1f} ms)")
    return chk


def main():
    case = sys.argv[1]
    t0 = time.perf_counter()
    fn = {
        "matmul": case_matmul,
        "flops": case_flops,
        "membw": case_membw,
        "gather_rate": case_gather_rate,
        "gather_forms": case_gather_forms,
        "packet_trav": case_packet_trav,
        "loop_overhead": case_loop_overhead,
        "packet_trav512": lambda: case_packet_trav(res=512),
        "packet_trav512_t16": lambda: case_packet_trav(res=512, tile=16384),
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
