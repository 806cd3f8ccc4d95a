"""Packet BVH traversal as a Pallas (Mosaic) kernel — the TPU-native hot
path.

Same algorithm as ``accel/traverse_packet.py`` (one shared DFS stack per
ray tile, pop-test node order, whole-tile VPU tests — the Wald-style SIMD
packet walk of the reference's per-thread stack traversal,
shaders/ray_tracing.comp:429-494), but compiled with Mosaic instead of
driving an XLA ``lax.while_loop``:

* the XLA loop pays ~50 us of dispatch overhead PER ITERATION on this
  part (BASELINE.md round-3 calibration) — a frame needs ~1e6 traversal
  iterations, which is the measured 30 s/frame wall and what the tunnel
  worker's execution deadline kills;
* inside a Mosaic kernel the same iteration is straight-line machine
  code: measured <= ~30 ns/iteration, below dispatch noise
  (scripts/probe_packet_pallas.py) — three orders of magnitude.

Layout: the whole scene (``nodes8`` + ``tri9`` rows, accel/layout.py)
lives in SMEM as a flat f32 scalar-prefetch array; node/triangle fetches
are scalar reads broadcast against (sublane, 128)-shaped ray-component
tiles.  Zero gathers, zero per-lane dynamic indexing (the construct
Mosaic rejects — scripts/probe_pallas.py).  The grid runs one program
per ray tile; ray blocks stream HBM->VMEM through the BlockSpec
pipeline.

Results are bit-identical to ``traversal="packet"``: the arithmetic is
`ops/intersect.py::intersect_{triangle,aabb}_c` (op-for-op twins of the
array forms) and the visit order (pop-test, near-child-first by the
tile's mean direction sign) matches `_closest_hit_packet_tile` when the
tile sizes agree.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pnraytracing_tpu.accel.layout import TravData
from pnraytracing_tpu.ops.intersect import (
    Hit,
    intersect_aabb_c,
    intersect_triangle_c,
    triangle_setup_c,
    triangle_setup_static,
)

# The flat scene array must fit Mosaic's scalar memory alongside stacks
# and control state.  Measured on the v5e (scripts/probe_smem_limit.py +
# the config4 compile error): SMEM is exactly 1 MB; leave headroom for
# the stack scratch and control state.
SMEM_SCENE_BUDGET_BYTES = (1 << 20) - (16 << 10)


def _node_rows(trav: TravData, variant: str) -> int:
    """Node-table row count of the variant's SMEM layout (wide uses the
    compact internal-only rows when the scene carries them)."""
    if variant in ("wide", "wide_attr"):
        if trav.nodes16c is not None:
            return int(trav.nodes16c.shape[0])
        return int(trav.nodes8.shape[0])
    return int(trav.nodes8.shape[0])


def _scene_bytes(trav: TravData, variant: str) -> int:
    n_tris = int(trav.tri9.shape[0])
    per_node = 16 if variant in ("wide", "wide_attr") else 8
    per_tri = 9 + (16 if variant == "wide_attr" else 0)
    return 4 * (per_node * _node_rows(trav, variant) + per_tri * n_tris)


def scene_fits_smem(trav: TravData, variant: str = "binary") -> bool:
    return _scene_bytes(trav, variant) <= SMEM_SCENE_BUDGET_BYTES


def pick_variant(trav: TravData, requested: str = "wide") -> str:
    """Largest-win kernel variant that fits SMEM: wide_attr (wide rows +
    per-triangle attribute rows, interaction emitted in-kernel) when
    requested and it fits, else wide (16-float rows, ~2x fewer
    iterations than binary), else binary (8-float rows); raises if even
    binary exceeds the budget (the integrator routes such scenes to the
    brick-paged streaming kernel, accel/traverse_stream.py, before ever
    calling this)."""
    if (requested == "wide_attr" and trav.nodes16 is not None
            and trav.tri_attr16 is not None
            and scene_fits_smem(trav, "wide_attr")):
        return "wide_attr"
    if requested in ("wide", "wide_attr") and trav.nodes16 is not None \
            and scene_fits_smem(trav, "wide"):
        return "wide"
    if not scene_fits_smem(trav, "binary"):
        raise ValueError(
            f"scene ({_scene_bytes(trav, 'binary')} B packed) exceeds the "
            f"Mosaic SMEM budget ({SMEM_SCENE_BUDGET_BYTES} B); use "
            "traversal='packet'"
        )
    return "binary"


def _node_scalars(scene_ref, node):
    """8 scalar reads of one packed node row from SMEM + topology decode
    (arithmetic encoding, accel/layout.py)."""
    base = node * 8
    nmin = (scene_ref[base], scene_ref[base + 1], scene_ref[base + 2])
    nmax = (scene_ref[base + 3], scene_ref[base + 4], scene_ref[base + 5])
    enc_right = scene_ref[base + 6].astype(jnp.int32)
    enc_meta = scene_ref[base + 7].astype(jnp.int32)
    right = jnp.where(enc_right >= 0, enc_right // 4, -1)
    axis = jnp.where(enc_right >= 0, enc_right % 4, 0)
    start = enc_meta // 16
    count = enc_meta % 16
    return nmin, nmax, right, start, count, axis


def _tri_scalars(scene_ref, tri_base, ti):
    base = tri_base + ti * 9
    v0 = (scene_ref[base], scene_ref[base + 1], scene_ref[base + 2])
    v1 = (scene_ref[base + 3], scene_ref[base + 4], scene_ref[base + 5])
    v2 = (scene_ref[base + 6], scene_ref[base + 7], scene_ref[base + 8])
    return v0, v1, v2


def _ray_components(rays_ref):
    # block shape (8, 1, sub, 128): component-major, tile axis blocked
    ox = rays_ref[0, 0]
    oy = rays_ref[1, 0]
    oz = rays_ref[2, 0]
    dx = rays_ref[3, 0]
    dy = rays_ref[4, 0]
    dz = rays_ref[5, 0]
    t_max = rays_ref[6, 0]
    active = rays_ref[7, 0] > 0.0
    return ox, oy, oz, dx, dy, dz, t_max, active


def _safe_inv_c(d, eps=1e-20):
    # twin of ops/intersect.py::safe_inv_dir, componentwise
    return jnp.where(d >= 0, 1.0, -1.0) / jnp.maximum(jnp.abs(d), eps)


def _closest_kernel(
    n_nodes: int,
    n_tris: int,
    max_leaf_size: int,
    compat: bool,
    dsign_ref,
    axinfo_ref,
    scene_ref,
    rays_ref,
    t_ref,
    tri_ref,
    b1_ref,
    b2_ref,
    iters_ref,
    stack_ref,
):
    tile = pl.program_id(0)
    tri_base = 8 * n_nodes
    ox, oy, oz, dx, dy, dz, t_max, active = _ray_components(rays_ref)
    inv_dx = _safe_inv_c(dx)
    inv_dy = _safe_inv_c(dy)
    inv_dz = _safe_inv_c(dz)
    tri_setup = triangle_setup_c(dx, dy, dz, compat=compat)

    stack_ref[0] = 0
    top0 = jnp.where(jnp.any(active), jnp.int32(1), jnp.int32(0))
    zero = jnp.zeros_like(t_max)

    def body(state):
        top, it, t_best, tri_best, b1_best, b2_best = state
        node = stack_ref[jnp.maximum(top - 1, 0)]
        top = top - 1
        nmin, nmax, right, start, count, axis = _node_scalars(scene_ref, node)
        hits = active & intersect_aabb_c(
            nmin, nmax, ox, oy, oz, inv_dx, inv_dy, inv_dz, t_best,
            compat=compat,
        )
        alive = jnp.any(hits)
        is_leaf = right < 0

        do_leaf = alive & is_leaf
        for k in range(max_leaf_size):
            ti = start + k
            ti_c = jnp.minimum(ti, n_tris - 1)
            valid = do_leaf & (k < count)
            v0, v1, v2 = _tri_scalars(scene_ref, tri_base, ti_c)
            tri_hit, t, b1, b2 = intersect_triangle_c(
                v0, v1, v2, ox, oy, oz, dx, dy, dz, t_best, compat=compat,
                setup=tri_setup,
            )
            win = hits & tri_hit & valid & (t < t_best)
            t_best = jnp.where(win, t, t_best)
            tri_best = jnp.where(win, ti, tri_best)
            b1_best = jnp.where(win, b1, b1_best)
            b2_best = jnp.where(win, b2, b2_best)

        left = node + 1
        d_neg = dsign_ref[tile * 3 + axis] < 0
        near = jnp.where(d_neg, right, left)
        far = jnp.where(d_neg, left, right)
        push = alive & jnp.logical_not(is_leaf)
        inc = push.astype(jnp.int32)
        # slots at indices >= top are free: write unconditionally, commit
        # by advancing top only when pushing
        stack_ref[jnp.maximum(top, 0)] = far
        top1 = top + inc
        stack_ref[jnp.maximum(top1, 0)] = near
        top2 = top1 + inc
        return top2, it + 1, t_best, tri_best, b1_best, b2_best

    _, iters, t_best, tri_best, b1_best, b2_best = jax.lax.while_loop(
        lambda s: s[0] > 0,
        body,
        (
            top0,
            jnp.int32(0),
            jnp.asarray(t_max, jnp.float32),
            jnp.full(t_max.shape, -1, jnp.int32),
            zero,
            zero,
        ),
    )
    t_ref[0] = t_best
    tri_ref[0] = tri_best
    b1_ref[0] = b1_best
    b2_ref[0] = b2_best
    iters_ref[:, :, :] = jnp.full((1, 8, 128), iters, jnp.int32)


def _any_kernel(
    n_nodes: int,
    n_tris: int,
    max_leaf_size: int,
    compat: bool,
    dsign_ref,
    axinfo_ref,
    scene_ref,
    rays_ref,
    occ_ref,
    iters_ref,
    stack_ref,
):
    tile = pl.program_id(0)
    tri_base = 8 * n_nodes
    ox, oy, oz, dx, dy, dz, t_max, active = _ray_components(rays_ref)
    inv_dx = _safe_inv_c(dx)
    inv_dy = _safe_inv_c(dy)
    inv_dz = _safe_inv_c(dz)
    tri_setup = triangle_setup_c(dx, dy, dz, compat=compat)

    stack_ref[0] = 0
    top0 = jnp.where(jnp.any(active), jnp.int32(1), jnp.int32(0))

    def body(state):
        top, it, occ = state
        node = stack_ref[jnp.maximum(top - 1, 0)]
        top = top - 1
        nmin, nmax, right, start, count, axis = _node_scalars(scene_ref, node)
        pending = active & jnp.logical_not(occ > 0)
        hits = pending & intersect_aabb_c(
            nmin, nmax, ox, oy, oz, inv_dx, inv_dy, inv_dz, t_max,
            compat=compat,
        )
        alive = jnp.any(hits)
        is_leaf = right < 0

        do_leaf = alive & is_leaf
        new_occ = occ
        for k in range(max_leaf_size):
            ti = start + k
            ti_c = jnp.minimum(ti, n_tris - 1)
            valid = do_leaf & (k < count)
            v0, v1, v2 = _tri_scalars(scene_ref, tri_base, ti_c)
            tri_hit, _, _, _ = intersect_triangle_c(
                v0, v1, v2, ox, oy, oz, dx, dy, dz, t_max, compat=compat,
                setup=tri_setup,
            )
            new_occ = jnp.where(hits & tri_hit & valid,
                                jnp.int32(1), new_occ)

        left = node + 1
        d_neg = dsign_ref[tile * 3 + axis] < 0
        near = jnp.where(d_neg, right, left)
        far = jnp.where(d_neg, left, right)
        push = alive & jnp.logical_not(is_leaf)
        inc = push.astype(jnp.int32)
        stack_ref[jnp.maximum(top, 0)] = far
        top1 = top + inc
        stack_ref[jnp.maximum(top1, 0)] = near
        top2 = top1 + inc
        # all pending rays resolved -> drain the stack
        done = jnp.all((new_occ > 0) | jnp.logical_not(active))
        top2 = jnp.where(done, 0, top2)
        return top2, it + 1, new_occ

    _, iters, occ = jax.lax.while_loop(
        lambda s: s[0] > 0,
        body,
        (top0, jnp.int32(0), jnp.zeros(t_max.shape, jnp.int32)),
    )
    occ_ref[0] = occ
    iters_ref[:, :, :] = jnp.full((1, 8, 128), iters, jnp.int32)


def _wide_row(scene_ref, row):
    """16 scalar reads of one wide internal row (accel/layout.py::
    pack_wide_nodes): both children's AABBs + encoded child infos + split
    axis.  ``info >= 0`` = internal child's row id; ``< 0`` encodes a
    leaf as ``-(start*16+count)-1``."""
    base = row * 16
    lmin = (scene_ref[base], scene_ref[base + 1], scene_ref[base + 2])
    lmax = (scene_ref[base + 3], scene_ref[base + 4], scene_ref[base + 5])
    rmin = (scene_ref[base + 6], scene_ref[base + 7], scene_ref[base + 8])
    rmax = (scene_ref[base + 9], scene_ref[base + 10], scene_ref[base + 11])
    left_info = scene_ref[base + 12].astype(jnp.int32)
    right_info = scene_ref[base + 13].astype(jnp.int32)
    axis = scene_ref[base + 14].astype(jnp.int32)
    return lmin, lmax, rmin, rmax, left_info, right_info, axis


def _leaf_setups(compat, dx, dy, dz, tri_setup):
    """The general watertight setup + the three statically-permuted
    twins (triangle_setup_static).  A tile whose rays all share the
    dominant axis (axinfo >= 0 — most tiles after the coherence sort
    groups by direction octant) takes the static branch, where the
    permutation's ~18 per-test vector selects fold to rewiring.
    Bit-identical results: live lanes' per-ray permutation equals the
    static one on uniform tiles; dead/padded lanes may see NaN t (their
    wins are masked)."""
    if compat:
        return [tri_setup]
    return [tri_setup] + [
        triangle_setup_static(ax, dx, dy, dz) for ax in range(3)
    ]


def _closest_kernel_wide(
    tri_base: int,
    n_tris: int,
    max_leaf_size: int,
    compat: bool,
    dsign_ref,
    axinfo_ref,
    scene_ref,
    rays_ref,
    t_ref,
    tri_ref,
    b1_ref,
    b2_ref,
    iters_ref,
    stack_ref,
):
    """Push-test packet walk over the wide [N, 16] rows: an internal pop
    slab-tests BOTH children and pushes only hit children; a leaf pop
    only runs triangle tests (the AABB filter already passed at the
    parent).  Half the iterations of the pop-test binary walk, and each
    iteration runs ONE branch (``lax.cond``), not both masked."""
    tile = pl.program_id(0)
    ox, oy, oz, dx, dy, dz, t_max, active = _ray_components(rays_ref)
    inv_dx = _safe_inv_c(dx)
    inv_dy = _safe_inv_c(dy)
    inv_dz = _safe_inv_c(dz)
    tri_setup = triangle_setup_c(dx, dy, dz, compat=compat)
    setups = _leaf_setups(compat, dx, dy, dz, tri_setup)
    ax_branch = (jnp.int32(0) if compat else axinfo_ref[tile] + 1)

    # stack entries are child infos; seed with the root's internal row
    stack_ref[0] = 0
    top0 = jnp.where(jnp.any(active), jnp.int32(1), jnp.int32(0))
    zero = jnp.zeros_like(t_max)

    def body(state):
        top, it, lit, t_best, tri_best, b1_best, b2_best = state
        info = stack_ref[jnp.maximum(top - 1, 0)]
        top = top - 1
        is_leaf = info < 0
        lit = lit + is_leaf.astype(jnp.int32)  # leaf-pop counter (stats)

        def leaf_branch(_):
            meta = -info - 1
            start = meta // 16
            count = meta % 16

            # leaves average ~2.2 of max_leaf_size=4 triangles, so the
            # flat masked unroll wasted ~45% of its VPU tests; branch
            # per slot instead (count is a kernel scalar, so this is a
            # cheap scalar branch; k=0 is guarded too — synthetic empty
            # leaves have count 0)
            def test_k(k, setup, carry):
                t_b, tri_b, b1_b, b2_b = carry
                ti = start + k
                ti_c = jnp.minimum(ti, n_tris - 1)
                v0, v1, v2 = _tri_scalars(scene_ref, tri_base, ti_c)
                tri_hit, t, b1, b2 = intersect_triangle_c(
                    v0, v1, v2, ox, oy, oz, dx, dy, dz, t_b, compat=compat,
                    setup=setup,
                )
                win = active & tri_hit & (t < t_b)
                return (
                    jnp.where(win, t, t_b),
                    jnp.where(win, ti, tri_b),
                    jnp.where(win, b1, b1_b),
                    jnp.where(win, b2, b2_b),
                )

            def tests_with(setup):
                def run(carry):
                    for k in range(max_leaf_size):
                        carry = jax.lax.cond(
                            k < count,
                            functools.partial(test_k, k, setup),
                            lambda c: c, carry,
                        )
                    return carry

                return run

            carry = (t_best, tri_best, b1_best, b2_best)
            if compat:
                carry = tests_with(tri_setup)(carry)
            else:
                carry = jax.lax.switch(
                    ax_branch, [tests_with(s) for s in setups], carry
                )
            t_b, tri_b, b1_b, b2_b = carry
            z = jnp.int32(0)
            return t_b, tri_b, b1_b, b2_b, z, z, z, z

        def internal_branch(_):
            lmin, lmax, rmin, rmax, li, ri, axis = _wide_row(scene_ref, info)
            hits_l = active & intersect_aabb_c(
                lmin, lmax, ox, oy, oz, inv_dx, inv_dy, inv_dz, t_best,
                compat=compat,
            )
            hits_r = active & intersect_aabb_c(
                rmin, rmax, ox, oy, oz, inv_dx, inv_dy, inv_dz, t_best,
                compat=compat,
            )
            inc_l = jnp.any(hits_l).astype(jnp.int32)
            inc_r = jnp.any(hits_r).astype(jnp.int32)
            d_neg = dsign_ref[tile * 3 + axis] < 0
            near = jnp.where(d_neg, ri, li)
            far = jnp.where(d_neg, li, ri)
            inc_near = jnp.where(d_neg, inc_r, inc_l)
            inc_far = jnp.where(d_neg, inc_l, inc_r)
            return (t_best, tri_best, b1_best, b2_best,
                    far, near, inc_far, inc_near)

        t_best, tri_best, b1_best, b2_best, far, near, inc_f, inc_n = (
            jax.lax.cond(is_leaf, leaf_branch, internal_branch, 0)
        )
        # far pushed first so near pops first
        stack_ref[jnp.maximum(top, 0)] = far
        top1 = top + inc_f
        stack_ref[jnp.maximum(top1, 0)] = near
        top2 = top1 + inc_n
        return top2, it + 1, lit, t_best, tri_best, b1_best, b2_best

    _, iters, leaf_iters, t_best, tri_best, b1_best, b2_best = (
        jax.lax.while_loop(
            lambda s: s[0] > 0,
            body,
            (
                top0,
                jnp.int32(0),
                jnp.int32(0),
                jnp.asarray(t_max, jnp.float32),
                jnp.full(t_max.shape, -1, jnp.int32),
                zero,
                zero,
            ),
        )
    )
    t_ref[0] = t_best
    tri_ref[0] = tri_best
    b1_ref[0] = b1_best
    b2_ref[0] = b2_best
    # stats rows: sublanes 0-3 = total pops, 4-7 = leaf pops
    iters_ref[:, :, :] = jnp.concatenate(
        [jnp.full((1, 4, 128), iters, jnp.int32),
         jnp.full((1, 4, 128), leaf_iters, jnp.int32)], axis=1
    )


def _closest_kernel_wide_attr(
    tri_base: int,
    attr_base: int,
    n_tris: int,
    max_leaf_size: int,
    compat: bool,
    dsign_ref,
    axinfo_ref,
    scene_ref,
    rays_ref,
    t_ref,
    tri_ref,
    b1_ref,
    b2_ref,
    nx_ref,
    ny_ref,
    nz_ref,
    u_ref,
    v_ref,
    mt_ref,
    iters_ref,
    stack_ref,
):
    """The wide push-test walk, additionally emitting the interaction
    fill: at the moment a triangle test WINS, the triangle id is a
    kernel SCALAR, so its shading attributes (corner normals, uvs,
    material/texture id — the [T, 16] rows of layout.py::pack_tri_attr16
    appended to the SMEM scene) are scalar reads broadcast against the
    tile, interpolated with the test's own barycentrics and committed
    under the win mask.  This replaces the integrator's per-ray [T, 26]
    interaction row gather (the one remaining gather of the hot path,
    make_interaction) with ~25 extra VPU ops per leaf test — the
    megakernel direction of ray_tracing.comp:861-992, where traversal
    and shading-point fill are one kernel."""
    tile = pl.program_id(0)
    ox, oy, oz, dx, dy, dz, t_max, active = _ray_components(rays_ref)
    inv_dx = _safe_inv_c(dx)
    inv_dy = _safe_inv_c(dy)
    inv_dz = _safe_inv_c(dz)
    tri_setup = triangle_setup_c(dx, dy, dz, compat=compat)
    setups = _leaf_setups(compat, dx, dy, dz, tri_setup)
    ax_branch = (jnp.int32(0) if compat else axinfo_ref[tile] + 1)

    stack_ref[0] = 0
    top0 = jnp.where(jnp.any(active), jnp.int32(1), jnp.int32(0))
    zero = jnp.zeros_like(t_max)

    def body(state):
        (top, it, t_best, tri_best, b1_best, b2_best,
         nx_b, ny_b, nz_b, u_b, v_b, mt_b) = state
        info = stack_ref[jnp.maximum(top - 1, 0)]
        top = top - 1
        is_leaf = info < 0

        def leaf_branch(_):
            meta = -info - 1
            start = meta // 16
            count = meta % 16

            def test_k(k, setup, carry):
                (t_b, tri_b, b1_c, b2_c, nx_c, ny_c, nz_c, u_c, v_c,
                 mt_c) = carry
                ti = start + k
                ti_c = jnp.minimum(ti, n_tris - 1)
                v0, v1, v2 = _tri_scalars(scene_ref, tri_base, ti_c)
                tri_hit, t, b1, b2 = intersect_triangle_c(
                    v0, v1, v2, ox, oy, oz, dx, dy, dz, t_b, compat=compat,
                    setup=setup,
                )
                win = active & tri_hit & (t < t_b)
                ab = attr_base + ti_c * 16
                b0 = 1.0 - b1 - b2
                # interpolate with THIS test's barycentrics; corner
                # attributes are SMEM scalars (zero gathers)
                nx = (scene_ref[ab] * b0 + scene_ref[ab + 3] * b1
                      + scene_ref[ab + 6] * b2)
                ny = (scene_ref[ab + 1] * b0 + scene_ref[ab + 4] * b1
                      + scene_ref[ab + 7] * b2)
                nz = (scene_ref[ab + 2] * b0 + scene_ref[ab + 5] * b1
                      + scene_ref[ab + 8] * b2)
                u = (scene_ref[ab + 9] * b0 + scene_ref[ab + 11] * b1
                     + scene_ref[ab + 13] * b2)
                v = (scene_ref[ab + 10] * b0 + scene_ref[ab + 12] * b1
                     + scene_ref[ab + 14] * b2)
                mt = scene_ref[ab + 15]
                return (
                    jnp.where(win, t, t_b),
                    jnp.where(win, ti, tri_b),
                    jnp.where(win, b1, b1_c),
                    jnp.where(win, b2, b2_c),
                    jnp.where(win, nx, nx_c),
                    jnp.where(win, ny, ny_c),
                    jnp.where(win, nz, nz_c),
                    jnp.where(win, u, u_c),
                    jnp.where(win, v, v_c),
                    jnp.where(win, mt, mt_c),
                )

            def tests_with(setup):
                def run(carry):
                    for k in range(max_leaf_size):
                        carry = jax.lax.cond(
                            k < count,
                            functools.partial(test_k, k, setup),
                            lambda cc: cc, carry,
                        )
                    return carry

                return run

            carry = (t_best, tri_best, b1_best, b2_best,
                     nx_b, ny_b, nz_b, u_b, v_b, mt_b)
            if compat:
                carry = tests_with(tri_setup)(carry)
            else:
                carry = jax.lax.switch(
                    ax_branch, [tests_with(s) for s in setups], carry
                )
            z = jnp.int32(0)
            return carry + (z, z, z, z)

        def internal_branch(_):
            lmin, lmax, rmin, rmax, li, ri, axis = _wide_row(scene_ref, info)
            hits_l = active & intersect_aabb_c(
                lmin, lmax, ox, oy, oz, inv_dx, inv_dy, inv_dz, t_best,
                compat=compat,
            )
            hits_r = active & intersect_aabb_c(
                rmin, rmax, ox, oy, oz, inv_dx, inv_dy, inv_dz, t_best,
                compat=compat,
            )
            inc_l = jnp.any(hits_l).astype(jnp.int32)
            inc_r = jnp.any(hits_r).astype(jnp.int32)
            d_neg = dsign_ref[tile * 3 + axis] < 0
            near = jnp.where(d_neg, ri, li)
            far = jnp.where(d_neg, li, ri)
            inc_near = jnp.where(d_neg, inc_r, inc_l)
            inc_far = jnp.where(d_neg, inc_l, inc_r)
            return (t_best, tri_best, b1_best, b2_best,
                    nx_b, ny_b, nz_b, u_b, v_b, mt_b,
                    far, near, inc_far, inc_near)

        (t_best, tri_best, b1_best, b2_best, nx_b, ny_b, nz_b, u_b, v_b,
         mt_b, far, near, inc_f, inc_n) = jax.lax.cond(
            is_leaf, leaf_branch, internal_branch, 0
        )
        stack_ref[jnp.maximum(top, 0)] = far
        top1 = top + inc_f
        stack_ref[jnp.maximum(top1, 0)] = near
        top2 = top1 + inc_n
        return (top2, it + 1, t_best, tri_best, b1_best, b2_best,
                nx_b, ny_b, nz_b, u_b, v_b, mt_b)

    (_, iters, t_best, tri_best, b1_best, b2_best, nx_b, ny_b, nz_b,
     u_b, v_b, mt_b) = jax.lax.while_loop(
        lambda s: s[0] > 0,
        body,
        (
            top0,
            jnp.int32(0),
            jnp.asarray(t_max, jnp.float32),
            jnp.full(t_max.shape, -1, jnp.int32),
            zero, zero,
            zero, zero, jnp.ones_like(t_max),  # miss normal = +z (unit)
            zero, zero, zero,
        ),
    )
    t_ref[0] = t_best
    tri_ref[0] = tri_best
    b1_ref[0] = b1_best
    b2_ref[0] = b2_best
    nx_ref[0] = nx_b
    ny_ref[0] = ny_b
    nz_ref[0] = nz_b
    u_ref[0] = u_b
    v_ref[0] = v_b
    mt_ref[0] = mt_b
    iters_ref[:, :, :] = jnp.full((1, 8, 128), iters, jnp.int32)


def _any_kernel_wide(
    tri_base: int,
    n_tris: int,
    max_leaf_size: int,
    compat: bool,
    dsign_ref,
    axinfo_ref,
    scene_ref,
    rays_ref,
    occ_ref,
    iters_ref,
    stack_ref,
):
    tile = pl.program_id(0)
    ox, oy, oz, dx, dy, dz, t_max, active = _ray_components(rays_ref)
    inv_dx = _safe_inv_c(dx)
    inv_dy = _safe_inv_c(dy)
    inv_dz = _safe_inv_c(dz)
    tri_setup = triangle_setup_c(dx, dy, dz, compat=compat)
    setups = _leaf_setups(compat, dx, dy, dz, tri_setup)
    ax_branch = (jnp.int32(0) if compat else axinfo_ref[tile] + 1)

    stack_ref[0] = 0
    top0 = jnp.where(jnp.any(active), jnp.int32(1), jnp.int32(0))

    def body(state):
        top, it, occ = state
        info = stack_ref[jnp.maximum(top - 1, 0)]
        top = top - 1
        is_leaf = info < 0
        pending = active & jnp.logical_not(occ > 0)

        def leaf_branch(_):
            meta = -info - 1
            start = meta // 16
            count = meta % 16

            def test_k(k, setup, new_occ):
                ti = start + k
                ti_c = jnp.minimum(ti, n_tris - 1)
                v0, v1, v2 = _tri_scalars(scene_ref, tri_base, ti_c)
                tri_hit, _, _, _ = intersect_triangle_c(
                    v0, v1, v2, ox, oy, oz, dx, dy, dz, t_max, compat=compat,
                    setup=setup,
                )
                return jnp.where(pending & tri_hit, jnp.int32(1), new_occ)

            def tests_with(setup):
                def run(new_occ):
                    for k in range(max_leaf_size):
                        new_occ = jax.lax.cond(
                            k < count, functools.partial(test_k, k, setup),
                            lambda c: c, new_occ,
                        )
                    return new_occ

                return run

            if compat:
                new_occ = tests_with(tri_setup)(occ)
            else:
                new_occ = jax.lax.switch(
                    ax_branch, [tests_with(s) for s in setups], occ
                )
            z = jnp.int32(0)
            return new_occ, z, z, z, z

        def internal_branch(_):
            lmin, lmax, rmin, rmax, li, ri, axis = _wide_row(scene_ref, info)
            hits_l = pending & intersect_aabb_c(
                lmin, lmax, ox, oy, oz, inv_dx, inv_dy, inv_dz, t_max,
                compat=compat,
            )
            hits_r = pending & intersect_aabb_c(
                rmin, rmax, ox, oy, oz, inv_dx, inv_dy, inv_dz, t_max,
                compat=compat,
            )
            inc_l = jnp.any(hits_l).astype(jnp.int32)
            inc_r = jnp.any(hits_r).astype(jnp.int32)
            d_neg = dsign_ref[tile * 3 + axis] < 0
            near = jnp.where(d_neg, ri, li)
            far = jnp.where(d_neg, li, ri)
            inc_near = jnp.where(d_neg, inc_r, inc_l)
            inc_far = jnp.where(d_neg, inc_l, inc_r)
            return occ, far, near, inc_far, inc_near

        occ2, far, near, inc_f, inc_n = jax.lax.cond(
            is_leaf, leaf_branch, internal_branch, 0
        )
        stack_ref[jnp.maximum(top, 0)] = far
        top1 = top + inc_f
        stack_ref[jnp.maximum(top1, 0)] = near
        top2 = top1 + inc_n
        # all pending rays resolved -> drain the stack
        done = jnp.all((occ2 > 0) | jnp.logical_not(active))
        top2 = jnp.where(done, 0, top2)
        return top2, it + 1, occ2

    _, iters, occ = jax.lax.while_loop(
        lambda s: s[0] > 0,
        body,
        (top0, jnp.int32(0), jnp.zeros(t_max.shape, jnp.int32)),
    )
    occ_ref[0] = occ
    iters_ref[:, :, :] = jnp.full((1, 8, 128), iters, jnp.int32)


def _ray_comps(v):
    """Accept either an [R, 3] array or a V3 (core/vec.py — the
    integrator's native layout; avoids any [R, 3] materialization)."""
    if hasattr(v, "x"):
        return v.x, v.y, v.z
    return v[:, 0], v[:, 1], v[:, 2]


def _pack_inputs(trav, o, d, t_max, mask, tile_size):
    """Reshape rays into [n_tiles, 8, sub, 128] component tiles (+
    per-tile mean-direction signs).  The SMEM scene array is built
    separately by :func:`_scene_flat` (layout depends on the variant)."""
    del trav
    ox, oy, oz = _ray_comps(o)
    dx, dy, dz = _ray_comps(d)
    r = ox.shape[0]
    tile = tile_size if tile_size else max(r, 128)
    tile = max(128, (tile // 128) * 128)
    sub = tile // 128
    pad = (-r) % tile
    t_max = jnp.broadcast_to(jnp.asarray(t_max, jnp.float32), (r,))
    act = mask if mask is not None else jnp.ones((r,), bool)
    if pad:
        zpad = lambda a: jnp.pad(a, (0, pad))
        ox, oy, oz = zpad(ox), zpad(oy), zpad(oz)
        dx = jnp.pad(dx, (0, pad), constant_values=1.0)
        dy = jnp.pad(dy, (0, pad), constant_values=1.0)
        dz = jnp.pad(dz, (0, pad), constant_values=1.0)
        t_max = zpad(t_max)
        act = jnp.pad(act, (0, pad))
    n_tiles = (r + pad) // tile

    # [8, R_pad] with the TILE axis second: the BlockSpec indexes axis 1,
    # so no [n_tiles, 8, ...] transpose pass is materialized per call
    comps = jnp.stack(
        [ox, oy, oz, dx, dy, dz, t_max, act.astype(jnp.float32)],
        axis=0,
    )
    rays = comps.reshape(8, n_tiles, sub, 128)

    # near/far order per tile from the mean direction sign (same policy
    # as traverse_packet.py's per-tile dsum); padded/inactive lanes are
    # excluded so a mostly-padded tail tile orders by its REAL rays
    actf = act.astype(jnp.float32)
    dsign = jnp.stack(
        [(c * actf).reshape(n_tiles, tile).sum(axis=1)
         for c in (dx, dy, dz)],
        axis=1,
    )
    dsign = jnp.where(dsign < 0, -1, 1).astype(jnp.int32).reshape(-1)

    # per-tile dominant-axis uniformity: the coherence sort groups rays
    # by direction octant, so most tiles share argmax |d| — those tiles
    # take the statically-permuted watertight path (lax.switch in the
    # leaf branch; triangle_setup_static).  Same argmax tie-breaking as
    # triangle_setup_c; padded/inactive lanes inherit a live ray's axis
    # so they can't break uniformity (their results are masked anyway).
    adx, ady, adz = jnp.abs(dx), jnp.abs(dy), jnp.abs(dz)
    kz = jnp.where(
        adx >= ady,
        jnp.where(adx >= adz, 0, 2),
        jnp.where(ady >= adz, 1, 2),
    ).astype(jnp.int32)
    kz_t = kz.reshape(n_tiles, tile)
    act_t = act.reshape(n_tiles, tile)
    kz_live = jnp.where(act_t, kz_t, -1)
    kz0 = jnp.max(kz_live, axis=1)  # axis of SOME live ray (-1: none)
    uniform = jnp.all((kz_t == kz0[:, None]) | ~act_t, axis=1)
    axinfo = jnp.where(uniform & (kz0 >= 0), kz0, -1).astype(jnp.int32)
    return None, dsign, axinfo, rays, n_tiles, sub, pad


def _scene_flat(trav: TravData, variant: str):
    """Flat SMEM scene array: binary = nodes8 rows + tri9 rows; wide =
    wide rows (compact internal-only when available) + tri9 rows;
    wide_attr additionally appends the [T, 16] attribute rows."""
    if variant in ("wide", "wide_attr"):
        assert trav.nodes16 is not None, (
            "traversal='pallas' wide variant needs packed wide rows "
            "(pack_traversal_data builds them)"
        )
        nodes = trav.nodes16c if trav.nodes16c is not None else trav.nodes16
    else:
        nodes = trav.nodes8
    parts = [nodes.reshape(-1), trav.tri9.reshape(-1)]
    if variant == "wide_attr":
        assert trav.tri_attr16 is not None
        parts.append(trav.tri_attr16.reshape(-1))
    return jnp.concatenate(parts).astype(jnp.float32)


_OUT_DTYPES = {
    4: [jnp.float32, jnp.int32, jnp.float32, jnp.float32],
    1: [jnp.int32],
    # attr kernel: t, tri, b1, b2, nx, ny, nz, u, v, enc(mat,tex)
    10: [jnp.float32, jnp.int32] + [jnp.float32] * 8,
}


def _call_kernel(
    kernel, n_outs, trav, o, d, t_max, mask, *,
    stack_depth, tile_size, interpret, variant,
):
    r = _ray_comps(o)[0].shape[0]
    _, dsign, axinfo, rays, n_tiles, sub, pad = _pack_inputs(
        trav, o, d, t_max, mask, tile_size
    )
    scene = _scene_flat(trav, variant)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (8, 1, sub, 128),
                lambda i, *_: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=tuple(
            pl.BlockSpec(
                (1, sub, 128), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for _ in range(n_outs)
        ) + (
            # per-tile iteration stats: a (1, 128) VMEM block per grid
            # step (an SMEM whole-array window pads the minor dim to
            # 128 — 1 MB of scalar memory at 2048 tiles, which OOM'd
            # the 2048^2 config5 frame compile)
            pl.BlockSpec((1, 8, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[pltpu.SMEM((stack_depth + 2,), jnp.int32)],
    )
    dtypes = _OUT_DTYPES[n_outs]
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_tiles, sub, 128), dt) for dt in dtypes
        ) + (jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.int32),),
        grid_spec=grid_spec,
        interpret=interpret,
    )(dsign, axinfo, scene, rays)
    return outs, r


@functools.partial(
    jax.jit,
    static_argnames=(
        "stack_depth", "max_leaf_size", "compat", "tile_size", "chunk",
        "interpret", "variant", "with_stats",
    ),
)
def closest_hit_pallas(
    trav: TravData,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_max: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    *,
    stack_depth: int = 64,
    max_leaf_size: int = 4,
    compat: bool = False,
    tile_size: int | None = 4096,
    chunk: int = 1,  # unused: in-kernel iterations are ~ns, no chunking
    interpret: bool = False,
    variant: str = "wide",
    with_stats: bool = False,
):
    del chunk
    n_tris = int(trav.tri9.shape[0])
    variant = pick_variant(trav, variant)
    if variant == "wide":
        tri_base = 16 * _node_rows(trav, variant)
        kernel = functools.partial(
            _closest_kernel_wide, tri_base, n_tris, max_leaf_size, compat)
    else:
        kernel = functools.partial(
            _closest_kernel, int(trav.nodes8.shape[0]), n_tris,
            max_leaf_size, compat)
    (t, tri, b1, b2, iters), r = _call_kernel(
        kernel, 4, trav, o, d, t_max, mask,
        stack_depth=stack_depth, tile_size=tile_size, interpret=interpret,
        variant=variant,
    )
    hit = Hit(
        tri=tri.reshape(-1)[:r],
        t=t.reshape(-1)[:r],
        b1=b1.reshape(-1)[:r],
        b2=b2.reshape(-1)[:r],
    )
    if with_stats:
        return hit, iters[:, 0, :1]
    return hit


@functools.partial(
    jax.jit,
    static_argnames=(
        "stack_depth", "max_leaf_size", "compat", "tile_size", "chunk",
        "interpret", "with_stats",
    ),
)
def closest_hit_pallas_attr(
    trav: TravData,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_max: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    *,
    stack_depth: int = 64,
    max_leaf_size: int = 4,
    compat: bool = False,
    tile_size: int | None = 4096,
    chunk: int = 1,
    interpret: bool = False,
    with_stats: bool = False,
):
    """Closest hit + in-kernel interaction fill.

    Returns ``(Hit, (nrm_raw V3-components, u, v, enc_mt i32))`` where
    ``nrm_raw`` is the barycentric-interpolated (unnormalized, unflipped)
    shading normal, ``u/v`` the interpolated uvs, and ``enc_mt`` the
    encoded material/texture word (layout.py::ATTR_TEX_BASE).  Caller
    must fit: requires ``pick_variant(trav, 'wide_attr') == 'wide_attr'``.
    """
    del chunk
    n_tris = int(trav.tri9.shape[0])
    variant = pick_variant(trav, "wide_attr")
    assert variant == "wide_attr", (
        "closest_hit_pallas_attr: scene lacks attr rows or exceeds SMEM "
        f"(picked {variant}); route through closest_hit_pallas instead"
    )
    node_rows = _node_rows(trav, variant)
    tri_base = 16 * node_rows
    attr_base = tri_base + 9 * n_tris
    kernel = functools.partial(
        _closest_kernel_wide_attr, tri_base, attr_base, n_tris,
        max_leaf_size, compat)
    (t, tri, b1, b2, nx, ny, nz, u, v, mt, iters), r = _call_kernel(
        kernel, 10, trav, o, d, t_max, mask,
        stack_depth=stack_depth, tile_size=tile_size, interpret=interpret,
        variant=variant,
    )
    flat = lambda a: a.reshape(-1)[:r]
    hit = Hit(tri=flat(tri), t=flat(t), b1=flat(b1), b2=flat(b2))
    attrs = (flat(nx), flat(ny), flat(nz), flat(u), flat(v),
             flat(mt).astype(jnp.int32))
    if with_stats:
        return hit, attrs, iters[:, 0, :1]
    return hit, attrs


@functools.partial(
    jax.jit,
    static_argnames=(
        "stack_depth", "max_leaf_size", "compat", "tile_size", "chunk",
        "interpret", "variant", "with_stats",
    ),
)
def any_hit_pallas(
    trav: TravData,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_max: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    *,
    stack_depth: int = 64,
    max_leaf_size: int = 4,
    compat: bool = False,
    tile_size: int | None = 4096,
    chunk: int = 1,
    interpret: bool = False,
    variant: str = "wide",
    with_stats: bool = False,
):
    del chunk
    n_tris = int(trav.tri9.shape[0])
    variant = pick_variant(trav, variant)
    if variant == "wide":
        kernel = functools.partial(
            _any_kernel_wide, 16 * _node_rows(trav, variant), n_tris,
            max_leaf_size, compat)
    else:
        kernel = functools.partial(
            _any_kernel, int(trav.nodes8.shape[0]), n_tris,
            max_leaf_size, compat)
    (occ, iters), r = _call_kernel(
        kernel, 1, trav, o, d, t_max, mask,
        stack_depth=stack_depth, tile_size=tile_size, interpret=interpret,
        variant=variant,
    )
    out = occ.reshape(-1)[:r] > 0
    if with_stats:
        return out, iters[:, 0, :1]
    return out
