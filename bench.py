#!/usr/bin/env python
"""Benchmark harness: rays/s/chip on the flagship configuration.

Scene: BASELINE.json config 3 (teapot + area light + night HDR env, full
Disney BRDF with light/env/BRDF MIS) at 512x512, 1 spp, 4 bounces — the
reference's converged-mode render configuration (PnRT.hpp:41-42,
main.cpp:572).

Metric: traced rays per second per chip, counting every traversal query a
pixel's path issues (primary + per-bounce: light shadow + env shadow +
continuation), i.e. rays/pixel = 1 + 3 * depth.  ``--bwd`` measures the
forward+backward step (gradients to materials + env texels) instead.

Methodology: one frame is ~0.2-0.5 ms of device time, far below host
dispatch overhead, so the frame loop runs INSIDE one compiled program
(``lax.fori_loop`` for forward, a rematerialized ``lax.scan`` under
``jax.grad`` for forward+backward) and the harness times whole multi-frame
calls — the reference's progressive accumulation (main.cpp:628), compiled.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": "rays/s/chip", "vs_baseline": N}
"""

from __future__ import annotations

import argparse
import functools
import json
import sys
import time

import jax
import jax.numpy as jnp

# vs_baseline anchor: the HBM-roofline rays/s for the flagship query mix
# on a v5e chip (BASELINE.md round-3 roofline: ~670 gathered bytes per
# query at spec 819 GB/s).  The reported ratio therefore reads "fraction
# of roofline".  (Round-1/2 measured anchors were invalidated by the
# tunnel's timing behavior — BASELINE.md integrity notes.)
BASELINE_RAYS_PER_S = 1.2e9


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--width", type=int, default=512)
    ap.add_argument("--height", type=int, default=512)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--frames", type=int, default=8,
                    help="total timed frames (1 spp each)")
    ap.add_argument("--frames-per-call", type=int, default=1,
                    help="frames accumulated inside one compiled program "
                    "(keep low on the tunneled chip: the worker kills "
                    "program executions that run past its deadline)")
    ap.add_argument("--warmup", type=int, default=1, help="warmup calls")
    ap.add_argument("--bwd", action="store_true",
                    help="benchmark forward+backward instead of forward")
    ap.add_argument("--no-replay", action="store_true",
                    help="with --bwd: differentiate the live integrator "
                    "(rematerialized traversal) instead of the trace/replay "
                    "split")
    ap.add_argument("--env-height", type=int, default=256)
    ap.add_argument("--loop", default="unroll", choices=["unroll", "scan"],
                    help="bounce-loop construction (scan: O(1) compile in "
                    "depth)")
    ap.add_argument("--trav-tile", type=int, default=None,
                    help="traversal tile size; 0 = untiled (one lockstep "
                    "batch); default = RenderConfig default")
    ap.add_argument("--traversal", default=None,
                    choices=["packed", "pop", "wide", "packet", "wide4",
                             "pallas"],
                    help="default: 'pallas' (the Mosaic packet kernel) on "
                    "TPU, RenderConfig default elsewhere")
    ap.add_argument("--trav-chunk", type=int, default=None,
                    help="traversal loop chunk (condition checked every N "
                    "iterations; 1 = plain while_loop)")
    ap.add_argument("--no-compact", action="store_true")
    ap.add_argument("--no-fuse", action="store_true",
                    help="disable fused NEE shadow rays")
    ap.add_argument("--sort-rays", action="store_true",
                    help="coherence-sort live rays when compacting")
    ap.add_argument("--cpu", action="store_true",
                    help="force the CPU backend (smoke testing)")
    ap.add_argument("--quiet", action="store_true",
                    help="suppress phase-progress lines on stderr")
    args = ap.parse_args()

    t_start = time.perf_counter()

    def phase(msg: str) -> None:
        """Crash forensics: when the TPU worker dies mid-run, the last
        phase line in the log says which dispatch was in flight."""
        if not args.quiet:
            print(f"[bench +{time.perf_counter() - t_start:7.1f}s] {msg}",
                  file=sys.stderr, flush=True)

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from pnraytracing_tpu.core.camera import camera_rays
    from pnraytracing_tpu.core.config import RenderConfig
    from pnraytracing_tpu.render.renderer import pixel_coords, render_average
    from pnraytracing_tpu.scene.scenes import config3_teapot_night
    from pnraytracing_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    k = max(1, args.frames_per_call)
    n_calls = max(1, args.frames // k)
    frames = n_calls * k

    overrides = {}
    if args.trav_tile is not None:
        overrides["trav_tile"] = args.trav_tile if args.trav_tile > 0 else None
    if args.traversal is not None:
        overrides["traversal"] = args.traversal
    elif jax.default_backend() == "tpu":
        # the Mosaic packet kernel is the TPU hot path (the XLA loop
        # backends run ~35x slower and overrun the worker's execution
        # deadline at flagship size); on other backends keep the
        # RenderConfig default — running Mosaic under the Pallas
        # interpreter is pathologically slow
        overrides["traversal"] = "pallas"
    if args.trav_chunk is not None:
        overrides["trav_chunk"] = args.trav_chunk
    if args.no_compact:
        overrides["compact_rays"] = False
    if args.no_fuse:
        overrides["fuse_shadows"] = False
    if args.sort_rays:
        overrides["sort_rays"] = True
    cfg = RenderConfig(width=args.width, height=args.height,
                       max_depth=args.depth, loop=args.loop, **overrides)
    scene, cam_state = config3_teapot_night(env_height=args.env_height)
    cam_state.aspect = args.width / args.height
    camera = cam_state.basis()
    scene = jax.device_put(scene)
    phase(f"scene on device ({jax.devices()[0].platform})")

    if args.bwd:
        from pnraytracing_tpu.diff.grad import (
            apply_params,
            extract_params,
            render_image_from_params,
        )
        from pnraytracing_tpu.render.integrator import (
            render_rays_replay,
            trace_paths,
        )

        px, py = pixel_coords(cfg)
        o, d, _ = camera_rays(camera, cfg.width, cfg.height)
        params = extract_params(scene, ("materials", "env_image"))
        target = jnp.zeros((cfg.num_pixels, 3), jnp.float32)

        if args.no_replay:
            # differentiate the live integrator; jax.checkpoint makes the
            # backward pass re-run every BVH traversal
            @functools.partial(jax.jit, donate_argnums=())
            def step(p, start):
                def f(pp):
                    @jax.checkpoint
                    def body(acc, i):
                        img = render_image_from_params(
                            pp, scene, o, d, px, py, start + i, cfg
                        )
                        return acc + jnp.mean((img - target) ** 2), None

                    loss, _ = jax.lax.scan(
                        body, jnp.float32(0.0), jnp.arange(k, dtype=jnp.uint32)
                    )
                    return loss / k

                return jax.value_and_grad(f)(p)

        else:
            # trace/replay split: traversal runs ONCE per frame (forward
            # only, the same-size program as the fwd bench), then ONE
            # compiled grad pass over the while-loop-free replay.  Two
            # small programs instead of one mega-program — the latter
            # takes pathologically long to compile on this toolchain.
            @functools.partial(jax.jit, static_argnames=())
            def grad_step(p, recs, start):
                steps_u32 = jnp.arange(k, dtype=jnp.uint32)

                def f(pp):
                    # NOTE: no jax.checkpoint here — the replay graph is
                    # while-loop-free and fits memory, and remat measured
                    # 655 vs 456 ms for the grad pass (bwd_profile2 r4)
                    def body(acc, xs):
                        i, rec = xs
                        img = render_rays_replay(
                            apply_params(scene, pp), o, d, px, py,
                            start + i, cfg, rec,
                        )
                        return acc + jnp.mean((img - target) ** 2), None

                    loss, _ = jax.lax.scan(
                        body, jnp.float32(0.0), (steps_u32, recs)
                    )
                    return loss / k

                return jax.value_and_grad(f)(p)

            def step(p, start):
                recs = [
                    trace_paths(scene, o, d, px, py, start + jnp.uint32(j), cfg)
                    for j in range(k)
                ]
                recs = jax.tree_util.tree_map(
                    lambda *xs: jnp.stack(xs), *recs
                )
                return grad_step(p, recs, start)

        def run(call_idx):
            loss, grads = step(params, jnp.uint32(call_idx * k))
            return loss

    else:

        def run(call_idx):
            return render_average(
                scene, camera, cfg, jnp.uint32(call_idx * k), k
            ).sum()

    # warmup / compile.  Timing note: the result is FETCHED to the host (a
    # scalar), not merely block_until_ready'd — on the tunneled TPU
    # platform a dispatch can report ready before the program has actually
    # executed, which silently inflates throughput numbers; the device
    # executes programs in order, so fetching the last call's scalar
    # bounds the wall time of every timed dispatch.
    for i in range(args.warmup):
        phase(f"warmup call {i} (compiling on first run)")
        float(run(0))
        phase(f"warmup call {i} fetched")

    t0 = time.perf_counter()
    for i in range(n_calls):
        out = run(i)
    phase(f"{n_calls} timed calls dispatched; fetching")
    float(out)
    dt = time.perf_counter() - t0
    phase("timed fetch complete")

    rays_total = cfg.num_pixels * (1 + 3 * cfg.max_depth) * frames
    rays_per_s = rays_total / dt
    mode = "fwd+bwd" if args.bwd else "fwd"
    metric = (
        f"rays/s/chip {mode} ({args.width}x{args.height}, 1spp, "
        f"{args.depth} bounces, teapot_night)"
    )
    print(json.dumps({
        "metric": metric,
        "value": round(rays_per_s, 1),
        "unit": "rays/s/chip",
        "vs_baseline": round(rays_per_s / BASELINE_RAYS_PER_S, 4),
    }))
    return 0


def _main_with_retry() -> int:
    """The tunneled TPU worker can crash mid-run (see BASELINE.md round-2
    notes); a crashed worker poisons the whole client process, so the only
    clean retry is a fresh process: re-exec once after a recovery wait."""
    import os

    try:
        return main()
    except Exception as e:
        # Only transport/worker failures are worth a blind re-exec; a
        # deterministic error (bad flags, OOM, shape bug) should surface
        # immediately with its traceback.
        msg = f"{type(e).__name__}: {e}"
        transient = type(e).__name__ == "JaxRuntimeError" and any(
            s in str(e)
            for s in ("UNAVAILABLE", "worker process crashed",
                      "FAILED_PRECONDITION", "DEADLINE_EXCEEDED")
        )
        if not transient:
            raise
        if os.environ.get("PNRT_BENCH_RETRIED"):
            print(f"bench failed twice: {msg}", file=sys.stderr)
            return 1
        print(f"bench attempt failed ({msg}); waiting for the "
              "TPU worker and retrying once in a fresh process",
              file=sys.stderr, flush=True)
        time.sleep(180)
        os.environ["PNRT_BENCH_RETRIED"] = "1"
        os.execv(sys.executable, [sys.executable] + sys.argv)


if __name__ == "__main__":
    sys.exit(_main_with_retry())
