"""Static render configuration.

The reference's knobs are scattered across compile-time constants
(``include/PnRT.hpp:41-49``), GLSL uniforms (``MAX_BOUNCE_DEPTH``,
``frameCount``, camera, ray_tracing.comp:85-97,195-199,496,859,974) and code
edits (scene choice, main.cpp:357-359).  Here: one frozen dataclass passed as
a static argument to ``jit`` — shapes and loop bounds derive from it.
"""

from __future__ import annotations

import dataclasses


@dataclasses.dataclass(frozen=True)
class RenderConfig:
    width: int = 512  # SCREEN_WIDTH (PnRT.hpp:41)
    height: int = 512  # SCREEN_HEIGHT (PnRT.hpp:42)
    max_depth: int = 4  # MAX_BOUNCE_DEPTH in converged mode (main.cpp:572)
    spp: int = 1  # samples/pixel per call (reference: 1 per frame)

    # Traversal geometry.
    stack_depth: int = 64  # reference uses 128 (ray_tracing.comp:431)
    max_leaf_size: int = 4  # builder guarantees <= this many tris per leaf

    # Rays processed per device dispatch; frames larger than this render in
    # sequential tiles to bound live-state memory (stacks, path state).
    tile_pixels: int = 1 << 18

    # Traversal tile: the batched while-loop runs until the slowest ray in
    # the batch finishes (~5-6x more iterations than the mean ray needs);
    # running it per tile of this many rays lets coherent tiles exit early.
    # None disables tiling.
    trav_tile: int | None = 4096

    # Evaluate the traversal while-loop's condition only every N body
    # iterations (accel/loops.py::chunked_while).  Hardware measurement
    # (crash_sweep loop_overhead): while and fori iterations both cost
    # ~50 us of loop overhead — the condition itself is nearly free — so
    # chunking is neutral and overshoot wastes whole body iterations.
    # Default 1 (plain while_loop); kept as an A/B knob.
    trav_chunk: int = 1

    # Per-ray leaf-collection buffer of the 4-wide collect-then-test
    # backend (traversal='wide4', accel/traverse_wide4.py); rays that
    # visit more leaves fall back to the exact binary walk.
    trav_leaf_buffer: int = 32

    # Traversal backend over the packed layout: 'packed' is the per-node
    # [.,8] row-gather loop (accel/traverse_packed.py); 'wide' pops internal
    # nodes only and issues one [.,16] node gather + one batched [., 2L]
    # triangle gather per iteration (accel/traverse_wide.py).  Identical
    # images.  Measured on one v5e chip (teapot_night 512p/4 bounces):
    # packed 0.36 ms/frame, wide 1.92 ms — TPU gathers cost per gathered
    # row, so the wide backend's bigger batched leaf gather loses despite
    # fewer loop iterations; 'packed' stays the default.  'pop' tests each
    # node's AABB when popped and pushes children untested: ~2x pops but
    # ONE row gather per pop instead of three (~33% fewer gathered rows)
    # and a tighter t_max at test time.  'packet' walks the tree with ONE
    # shared stack per trav_tile rays (zero gathers) as an XLA while loop;
    # 'pallas' is the same packet walk compiled as a Mosaic kernel
    # (accel/traverse_pallas.py) — iterations cost ~ns instead of the
    # ~50 us XLA loop overhead, the production TPU path.
    traversal: str = "packed"

    # Sampler: 'sobol' uses Sobol + Cranley-Patterson rotation for the BRDF
    # lobe sample like the reference (ray_tracing.comp:928-929); 'hash' uses
    # pure counter-hash streams.
    sampler: str = "sobol"
    jitter_primary: bool = False  # reference casts pixel-corner rays only
    # (ray_tracing.comp:980) — enable for antialiasing.

    clamp_radiance: bool = True  # clamp color to [0,1] pre-accumulation
    # (ray_tracing.comp:988); biased but reference-faithful.

    # Compact live rays to the front of the batch between bounces.  With
    # tiled traversal, all-dead tiles drain their while loop immediately,
    # so later bounces only pay for tiles that still hold live rays.
    # The permutation itself is value-exact (per-ray RNG state and pixel
    # ids travel with the ray), but compact on/off compile to different
    # XLA programs whose FMA contraction differs at ulp level — same
    # contract as sort_rays below.
    # Round-4 history: with the original 25-pass per-array permutation
    # this cost ~90 ms/bounce and was turned off (509 -> 237 ms/frame);
    # after the permute became ONE packed [R, 32]-row gather, compaction
    # PLUS the coherence sort won the frame A/B (tile_sweep: 232 ms
    # plain vs 183 ms compact+sort-pos), so both default on again.
    compact_rays: bool = True

    # When compacting, additionally sort live rays by a spatial-directional
    # coherence key (normal octant + position cell) so each traversal tile
    # of the next bounce holds similar rays — the tile exits at its local
    # max stack depth, so coherence converts directly into fewer loop
    # iterations.  Pure permutation (values bit-exact; compiled-program
    # FMA contraction may differ by an ulp).  Round-4 chip A/B: the
    # Morton position sort cut the flagship frame 232 -> 183 ms.
    sort_rays: bool = True

    # Sort/compact only the first N bounces (unrolled loop; scan mode
    # ignores this and sorts every bounce).  The permute itself costs
    # ~10-14 ms/bounce at 512^2 (gather-wall bound) while deaths cluster
    # by tile once a bounce has been sorted — later bounces keep most of
    # the coherence for free.  Round-5 chip sweep (scripts/entry_ab.py,
    # flagship 512^2 depth-4): smb=4 166 ms, 3 156, 2 151, 1 153 -> 2.
    sort_max_bounce: int = 2

    # Sort key: 'entry' = nearest-treelet-entry of the ACTUAL continuation
    # ray (the sort sits right before the continuation traversal, so the
    # sampled direction is available; key = argmin slab-entry over the
    # ~256-512 treelet AABBs of accel/bricks.py::treelet_cut_aabbs, with
    # the direction octant in the low bits).  'dir' = normal-octant-major
    # (octant, |n|, position cell); 'pos' = position-major Morton.
    # Round-5 chip sweep on realistic bounce rays (scripts/sort_exp.py):
    # entry 9.1 ms vs pos 20.3 ms vs 5.6 ms coherent floor — 'entry' is
    # the default; scenes without a treelet table fall back to 'pos'.
    sort_key: str = "entry"

    # Bounce-loop construction.  'unroll' emits max_depth copies of the
    # bounce body (best steady-state code); 'scan' drives one compiled body
    # with lax.scan, so program size / compile time are O(1) in depth —
    # use for deep-bounce configs (e.g. 8-bounce config 5) and anywhere
    # XLA compile time hurts.  Same images up to compiler rounding.
    loop: str = "unroll"

    # Batch the area-light and environment NEE shadow rays of each bounce
    # into ONE any-hit traversal call (2R rays) instead of two R-ray calls.
    # Identical results (same queries, one batch); halves the per-bounce
    # shadow dispatches — 14% faster full frames on CPU, default on.
    fuse_shadows: bool = True

    # Russian-roulette path termination from this bounce on (None = off,
    # like the reference's fixed-depth loop).  Unbiased: survivors are
    # reweighted by 1/p.
    rr_start: int | None = None

    # Per-contribution radiance clamp (firefly suppression; None = off).
    # Biased, like the reference's [0,1] clamp but tunable.
    max_radiance: float | None = None

    # MIS combine. 'reference' reproduces the GLSL estimator exactly
    # (comp:937-938: one-sample partial combine, BRDF-sampled env/emissive
    # contributions unweighted — slightly over-counts the BRDF strategy);
    # 'balanced' is a proper per-strategy balance heuristic (unbiased,
    # passes the furnace test).
    mis: str = "reference"

    # Reproduce reference quirks bit-for-bit where feasible (see SURVEY.md
    # §3.3): material decode bug, GTR half-vector construction, tMax-ignoring
    # AABB test, z-only axis permutation in the watertight test.
    compat_pnrt: bool = False

    # Environment light. Constant-color env when the scene has no HDR map.
    env_scale: float = 1.0

    # Emit the interaction fill (shading normal, uv, material/texture id)
    # from the Mosaic traversal kernel at triangle-test time instead of a
    # per-ray [T, 26] row gather afterwards (accel/traverse_pallas.py::
    # closest_hit_pallas_attr) — the megakernel direction of
    # ray_tracing.comp:861-992.  Live/trace paths only; the replay
    # (gradient) path always re-derives attributes differentiably, and
    # vertex-position gradients through the NON-replay path need this
    # off (diff/grad.py forces it off there).  Falls back automatically
    # when the scene + attribute rows exceed the SMEM budget.
    kernel_interaction: bool = True

    # Trilinear mip-mapped texture sampling (ray-cone LOD).  None keeps
    # the reference's effective behavior: it BUILDS mipmaps
    # (main.cpp:541-546) but its compute-shader texture() has no
    # implicit derivatives, so fetches hit LOD 0.  Set to the camera's
    # pixel angle (2*tan(fov/2)/height) to enable: per-ray
    # lod = log2(path_distance * scale * texture_size).
    texture_lod_scale: float | None = None

    def __post_init__(self):
        assert self.loop in ("unroll", "scan")
        assert self.sampler in ("sobol", "hash")
        assert self.traversal in (
            "wide", "packed", "pop", "packet", "wide4", "pallas"
        )
        assert self.mis in ("reference", "balanced")
        assert self.sort_key in ("dir", "pos", "entry")
        assert not (self.compat_pnrt and self.mis == "balanced"), (
            "compat mode implies the reference estimator"
        )
        assert self.max_depth >= 1
        assert self.stack_depth >= 2

    @property
    def num_pixels(self) -> int:
        return self.width * self.height
