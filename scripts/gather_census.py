#!/usr/bin/env python
"""Count dynamic gather/scatter/while ops in the compiled frame program.

On this TPU each [R]-row gather/scatter pass costs ~3.3 ns x R and each
while-loop condition ~0.6 ms (BASELINE.md round-3 calibration), so the
op census of the HLO is a direct cost model of a frame.  Runs on CPU —
the op mix, not the timing, is the signal.

Usage: python scripts/gather_census.py [--traversal packed|pop|wide4]
           [--width 64] [--depth 4] [--no-compact] [--loop unroll|scan]
"""

from __future__ import annotations

import argparse
import collections
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--traversal", default="packed")
    ap.add_argument("--width", type=int, default=64)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--env-height", type=int, default=64)
    ap.add_argument("--no-compact", action="store_true")
    ap.add_argument("--no-fuse", action="store_true")
    ap.add_argument("--loop", default="unroll")
    ap.add_argument("--sampler", default="sobol")
    args = ap.parse_args()

    from pnraytracing_tpu.core.config import RenderConfig
    from pnraytracing_tpu.render.renderer import render_frame
    from pnraytracing_tpu.scene.scenes import config3_teapot_night

    cfg = RenderConfig(
        width=args.width, height=args.height if hasattr(args, "height")
        else args.width,
        max_depth=args.depth, loop=args.loop, sampler=args.sampler,
        traversal=args.traversal,
        compact_rays=not args.no_compact,
        fuse_shadows=not args.no_fuse,
        trav_tile=None,
    )
    scene, cam_state = config3_teapot_night(env_height=args.env_height)
    camera = cam_state.basis()

    lowered = jax.jit(
        lambda s, c: render_frame(s, c, cfg, 0)
    ).lower(scene, camera)
    hlo = lowered.compile().as_text()

    ops = collections.Counter()
    by_rows = collections.Counter()
    for line in hlo.splitlines():
        m = re.search(r"=\s*(\S+)\s+(gather|scatter|while|dynamic-slice|"
                      r"dynamic-update-slice|sort|fusion)\(", line)
        if not m:
            m2 = re.search(r"=\s*(\S+)\s+(gather|scatter|while|sort)\b",
                           line)
            m = m2
        if m:
            ops[m.group(2)] += 1
            if m.group(2) in ("gather", "scatter"):
                sh = re.match(r"[a-z0-9]+\[([0-9,]*)\]", m.group(1))
                rows = 0
                if sh and sh.group(1):
                    rows = int(sh.group(1).split(",")[0])
                by_rows[(m.group(2), rows)] += 1

    print(f"config: traversal={args.traversal} {args.width}^2 depth "
          f"{args.depth} compact={cfg.compact_rays} fuse={cfg.fuse_shadows} "
          f"loop={cfg.loop}")
    for k in ("gather", "scatter", "while", "sort", "dynamic-slice",
              "dynamic-update-slice"):
        print(f"  {k:22s} {ops.get(k, 0)}")
    num_px = args.width * args.width
    big = [(kind, rows, n) for (kind, rows), n in sorted(by_rows.items())
           if rows >= num_px // 2]
    print(f"  full-batch (>= {num_px // 2} rows) passes:")
    for kind, rows, n in big:
        print(f"    {kind:8s} rows={rows:<8d} x{n}")
    # rough per-frame cost model at 512^2 (R = 262144): while-loop bodies
    # re-run their gathers per iteration, so static counts undercount —
    # still, deltas between configs are meaningful.
    return 0


if __name__ == "__main__":
    sys.exit(main())
