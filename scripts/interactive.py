#!/usr/bin/env python
"""Interactive progressive renderer — the reference's windowed app
(main.cpp frame loop + camera callbacks + ImGui material editor) as a
terminal REPL.  Renders continuously, writes the latest progressive image
to a PNG after every sample, accepts edit commands between samples.

Commands (stdin):
  orbit <dphi> <dtheta>   rotate camera around the target (degrees)
  pan <dx> <dy>           translate in the view plane
  zoom <dfov>             change fov
  mat <idx> <field> <v..> edit a material (e.g. mat 0 base_color 1 0 0)
  spp <n>                 render n more samples then pause
  save <path> / load <path>   checkpoint accumulation + materials
  status                  print frame stats
  quit
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="cornell")
    ap.add_argument("--size", type=int, default=256)
    ap.add_argument("--depth", type=int, default=4)
    ap.add_argument("--out", default="out/interactive.png")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    from pnraytracing_tpu.utils.cache import enable_compile_cache

    enable_compile_cache()

    import numpy as np

    from pnraytracing_tpu.core.config import RenderConfig
    from pnraytracing_tpu.render.session import RenderSession
    from pnraytracing_tpu.utils.image import save_png
    from scripts.render import build_scene

    cfg = RenderConfig(width=args.size, height=args.size, max_depth=args.depth)
    scene, cam_state = build_scene(args.scene, 1.0)
    cam_state.aspect = 1.0
    session = RenderSession(scene, cam_state, cfg)

    print(f"interactive: {args.scene} at {args.size}px; commands: orbit/pan/"
          f"zoom/mat/spp/save/load/status/quit", flush=True)

    def snap():
        img = np.asarray(session.accum.resolve() if int(session.accum.count)
                         else session.step())
        save_png(args.out, img)

    while True:
        try:
            line = input("> ").strip()
        except EOFError:
            break
        if not line:
            img = session.step()
            save_png(args.out, np.asarray(img))
            print(f"frame {int(session.accum.count)}  "
                  f"{session.stats.last_frame_ms:.0f} ms  "
                  f"{session.stats.rays_per_s/1e6:.0f} M rays/s -> {args.out}")
            continue
        parts = line.split()
        cmd = parts[0]
        try:
            if cmd == "quit":
                break
            elif cmd == "orbit":
                session.orbit(float(parts[1]), float(parts[2]))
            elif cmd == "pan":
                session.pan(float(parts[1]), float(parts[2]))
            elif cmd == "zoom":
                session.zoom(float(parts[1]))
            elif cmd == "mat":
                idx = int(parts[1])
                field = parts[2]
                vals = [float(v) for v in parts[3:]]
                session.edit_material(
                    idx, **{field: vals if len(vals) > 1 else vals[0]}
                )
                print(f"material {idx}.{field} updated; accumulation reset")
            elif cmd == "spp":
                n = int(parts[1])
                for _ in range(n):
                    img = session.step()
                save_png(args.out, np.asarray(img))
                print(f"{n} samples -> frame {int(session.accum.count)}")
            elif cmd == "save":
                session.save(parts[1])
                print(f"checkpoint -> {parts[1]}")
            elif cmd == "load":
                session.load(parts[1])
                print(f"restored frame {int(session.accum.count)}")
            elif cmd == "status":
                print(f"frames {session.stats.frames}, accumulated "
                      f"{int(session.accum.count)}, last "
                      f"{session.stats.last_frame_ms:.0f} ms")
            else:
                print(f"unknown command {cmd!r}")
        except (IndexError, ValueError) as e:
            print(f"bad arguments: {e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
