"""Streaming (brick-paged) BVH traversal — the Mosaic kernel for scenes
larger than SMEM.

Same packet walk as ``accel/traverse_pallas.py`` (shared per-tile stack,
wide push-test rows, whole-tile VPU slab/triangle tests), but the scene
does NOT need to fit scalar memory: the tree is cut into treelet
*bricks* (accel/bricks.py) living in HBM; only the small top tree is
SMEM-resident.  Each ray tile

1. walks the top tree, collecting the bricks whose AABBs its rays hit
   into a per-tile queue (the parent's push-test already culls), then
2. pages the queued bricks through a double-buffered SMEM window with
   async DMA (fetch brick i+1 while walking brick i) and walks each
   exactly like the resident kernel.

This matches the reference's size-independent device traversal
(main.cpp:485-507 uploads a BVH of any size; ray_tracing.comp:429-461
fetches nodes per visit) with bandwidth-shaped access: per tile, each
touched brick streams ONCE over DMA instead of per-node gathers.

Results are bit-identical to the resident wide kernel on the same tile
split: the per-node arithmetic is the same ``intersect_*_c`` twins, and
t-pruning only tightens across bricks (closest-hit merge order cannot
change the final minimum).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pnraytracing_tpu.accel.bricks import BRICK_HEADER_WORDS, StreamData
from pnraytracing_tpu.accel.layout import TravData
from pnraytracing_tpu.accel.traverse_pallas import _pack_inputs, _safe_inv_c
from pnraytracing_tpu.ops.intersect import (
    Hit,
    intersect_aabb_c,
    intersect_triangle_c,
    triangle_setup_c,
)


def _top_row(top_ref, row):
    base = row * 16
    lmin = (top_ref[base], top_ref[base + 1], top_ref[base + 2])
    lmax = (top_ref[base + 3], top_ref[base + 4], top_ref[base + 5])
    rmin = (top_ref[base + 6], top_ref[base + 7], top_ref[base + 8])
    rmax = (top_ref[base + 9], top_ref[base + 10], top_ref[base + 11])
    li = top_ref[base + 12].astype(jnp.int32)
    ri = top_ref[base + 13].astype(jnp.int32)
    axis = top_ref[base + 14].astype(jnp.int32)
    return lmin, lmax, rmin, rmax, li, ri, axis


def _buf_read(buf_ref, slot, word):
    """Scalar read of flat word offset from the (2, rows, 128) SMEM
    brick window (HBM->SMEM DMA doesn't lower on this toolchain — probe
    r4 — so bricks arrive via VMEM and the window keeps the DMA'd
    (rows, 128) shape; flat offsets are divmod-addressed)."""
    return buf_ref[slot, word // 128, word % 128]


def _buf_row(buf_ref, slot, row):
    base = BRICK_HEADER_WORDS + row * 16
    rd = lambda k: _buf_read(buf_ref, slot, base + k)
    lmin = (rd(0), rd(1), rd(2))
    lmax = (rd(3), rd(4), rd(5))
    rmin = (rd(6), rd(7), rd(8))
    rmax = (rd(9), rd(10), rd(11))
    li = rd(12).astype(jnp.int32)
    ri = rd(13).astype(jnp.int32)
    axis = rd(14).astype(jnp.int32)
    return lmin, lmax, rmin, rmax, li, ri, axis


def _buf_tri(buf_ref, slot, tris_off, ti):
    base = tris_off + ti * 9
    rd = lambda k: _buf_read(buf_ref, slot, base + k)
    return (rd(0), rd(1), rd(2)), (rd(3), rd(4), rd(5)), (rd(6), rd(7),
                                                          rd(8))


def _make_stream_kernel(*, n_bricks, max_leaf_size, compat, mode):
    """mode: 'closest' or 'any'."""
    closest = mode == "closest"

    def kernel(dsign_ref, top_ref, rays_ref, bricks_ref, *refs):
        if closest:
            t_ref, tri_ref, b1_ref, b2_ref, iters_ref = refs[:5]
            stack_ref, queue_ref, vbuf, buf_ref, sem_v, sem_s = refs[5:]
        else:
            occ_ref, iters_ref = refs[:2]
            stack_ref, queue_ref, vbuf, buf_ref, sem_v, sem_s = refs[2:]

        tile = pl.program_id(0)
        # block shape (8, 1, sub, 128): component-major, tile axis blocked
        ox = rays_ref[0, 0]
        oy = rays_ref[1, 0]
        oz = rays_ref[2, 0]
        dx = rays_ref[3, 0]
        dy = rays_ref[4, 0]
        dz = rays_ref[5, 0]
        t_max = rays_ref[6, 0]
        active = rays_ref[7, 0] > 0.0
        inv_dx = _safe_inv_c(dx)
        inv_dy = _safe_inv_c(dy)
        inv_dz = _safe_inv_c(dz)
        tri_setup = triangle_setup_c(dx, dy, dz, compat=compat)
        any_active = jnp.any(active)

        # ---- phase 1: top-tree walk, collect hit bricks ----------------
        # stack entries: >=0 top-internal row, <0 brick ref -(b)-1 (the
        # top tree has no real leaves — bricks.py invariant)
        stack_ref[0] = 0
        top0 = jnp.where(any_active, jnp.int32(1), jnp.int32(0))

        def top_body(state):
            top, qn = state
            info = stack_ref[jnp.maximum(top - 1, 0)]
            top = top - 1
            is_brick = info < 0
            # enqueue (slot qn is free; commit by advancing only on brick)
            queue_ref[qn] = -info - 1
            qn = qn + is_brick.astype(jnp.int32)

            lmin, lmax, rmin, rmax, li, ri, axis = _top_row(
                top_ref, jnp.maximum(info, 0)
            )
            hits_l = active & intersect_aabb_c(
                lmin, lmax, ox, oy, oz, inv_dx, inv_dy, inv_dz, t_max,
                compat=compat,
            )
            hits_r = active & intersect_aabb_c(
                rmin, rmax, ox, oy, oz, inv_dx, inv_dy, inv_dz, t_max,
                compat=compat,
            )
            not_brick = jnp.logical_not(is_brick)
            inc_l = (jnp.any(hits_l) & not_brick).astype(jnp.int32)
            inc_r = (jnp.any(hits_r) & not_brick).astype(jnp.int32)
            d_neg = dsign_ref[tile * 3 + axis] < 0
            near = jnp.where(d_neg, ri, li)
            far = jnp.where(d_neg, li, ri)
            inc_near = jnp.where(d_neg, inc_r, inc_l)
            inc_far = jnp.where(d_neg, inc_l, inc_r)
            stack_ref[jnp.maximum(top, 0)] = far
            top1 = top + inc_far
            stack_ref[jnp.maximum(top1, 0)] = near
            top2 = top1 + inc_near
            return top2, qn

        _, qn = jax.lax.while_loop(
            lambda s: s[0] > 0, top_body, (top0, jnp.int32(0))
        )

        # ---- phase 2: brick paging, 3-stage pipeline --------------------
        # H_i: HBM brick -> VMEM slot; S_i: VMEM -> SMEM slot; W_i: walk.
        # (HBM->SMEM directly doesn't lower — probe r4 — so bricks hop
        # through VMEM; double-buffered slots overlap H/S with walks.)
        def dma_h(qi, slot):
            return pltpu.make_async_copy(
                bricks_ref.at[queue_ref[qi]], vbuf.at[slot],
                sem_v.at[slot],
            )

        def dma_s(slot):
            return pltpu.make_async_copy(
                vbuf.at[slot], buf_ref.at[slot], sem_s.at[slot]
            )

        @pl.when(qn > 0)
        def _():
            d0 = dma_h(0, 0)
            d0.start()
            d0.wait()
            dma_s(0).start()

        @pl.when(qn > 1)
        def _():
            dma_h(1, 1).start()

        zero = jnp.zeros_like(t_max)
        if closest:
            init = (
                jnp.asarray(t_max, jnp.float32),
                jnp.full(t_max.shape, -1, jnp.int32),
                zero,
                zero,
                jnp.int32(0),
            )
        else:
            init = (jnp.zeros(t_max.shape, jnp.int32), jnp.int32(0))

        def qbody(qi, carry):
            slot = jax.lax.rem(qi, 2)
            nslot = jax.lax.rem(qi + 1, 2)

            dma_s(slot).wait()  # brick qi now in SMEM

            @pl.when(qi + 1 < qn)
            def _():
                # brick qi+1's HBM fetch was started earlier; stage it
                # into the other SMEM slot while we walk brick qi
                dma_h(qi + 1, nslot).wait()
                dma_s(nslot).start()

            @pl.when(qi + 2 < qn)
            def _():
                # vbuf[slot] is free again (its VMEM->SMEM copy is done)
                dma_h(qi + 2, slot).start()

            tris_off = _buf_read(buf_ref, slot, 0).astype(jnp.int32)
            tri_base = _buf_read(buf_ref, slot, 1).astype(jnp.int32)
            n_tris = _buf_read(buf_ref, slot, 3).astype(jnp.int32)

            # walk the brick (wide push-test, same arithmetic as the
            # resident kernel); stack is empty after phase 1 / prior brick
            stack_ref[0] = 0
            if closest:
                t_best, tri_best, b1_best, b2_best, it = carry
                inner0 = (jnp.where(any_active, jnp.int32(1),
                                    jnp.int32(0)),
                          it, t_best, tri_best, b1_best, b2_best)

                def body(state):
                    top, it, t_b, tri_b, b1_b, b2_b = state
                    info = stack_ref[jnp.maximum(top - 1, 0)]
                    top = top - 1
                    is_leaf = info < 0

                    def leaf_branch(_):
                        meta = -info - 1
                        start = meta // 16
                        count = meta % 16

                        def test_k(k, cy):
                            t2, tri2, b12, b22 = cy
                            ti = start + k
                            ti_c = jnp.minimum(ti, n_tris - 1)
                            v0, v1, v2 = _buf_tri(buf_ref, slot, tris_off,
                                                  ti_c)
                            hit, t, b1, b2 = intersect_triangle_c(
                                v0, v1, v2, ox, oy, oz, dx, dy, dz, t2,
                                compat=compat, setup=tri_setup,
                            )
                            win = active & hit & (t < t2)
                            return (jnp.where(win, t, t2),
                                    jnp.where(win, tri_base + ti, tri2),
                                    jnp.where(win, b1, b12),
                                    jnp.where(win, b2, b22))

                        cy = (t_b, tri_b, b1_b, b2_b)
                        for k in range(max_leaf_size):
                            cy = jax.lax.cond(
                                k < count, functools.partial(test_k, k),
                                lambda c: c, cy,
                            )
                        t2, tri2, b12, b22 = cy
                        z = jnp.int32(0)
                        return t2, tri2, b12, b22, z, z, z, z

                    def internal_branch(_):
                        lmin, lmax, rmin, rmax, li, ri, axis = _buf_row(
                            buf_ref, slot, info
                        )
                        hits_l = active & intersect_aabb_c(
                            lmin, lmax, ox, oy, oz, inv_dx, inv_dy,
                            inv_dz, t_b, compat=compat,
                        )
                        hits_r = active & intersect_aabb_c(
                            rmin, rmax, ox, oy, oz, inv_dx, inv_dy,
                            inv_dz, t_b, compat=compat,
                        )
                        inc_l = jnp.any(hits_l).astype(jnp.int32)
                        inc_r = jnp.any(hits_r).astype(jnp.int32)
                        d_neg = dsign_ref[tile * 3 + axis] < 0
                        near = jnp.where(d_neg, ri, li)
                        far = jnp.where(d_neg, li, ri)
                        inc_near = jnp.where(d_neg, inc_r, inc_l)
                        inc_far = jnp.where(d_neg, inc_l, inc_r)
                        return (t_b, tri_b, b1_b, b2_b,
                                far, near, inc_far, inc_near)

                    t_b, tri_b, b1_b, b2_b, far, near, inc_f, inc_n = (
                        jax.lax.cond(is_leaf, leaf_branch,
                                     internal_branch, 0)
                    )
                    stack_ref[jnp.maximum(top, 0)] = far
                    top1 = top + inc_f
                    stack_ref[jnp.maximum(top1, 0)] = near
                    top2 = top1 + inc_n
                    return top2, it + 1, t_b, tri_b, b1_b, b2_b

                _, it, t_best, tri_best, b1_best, b2_best = (
                    jax.lax.while_loop(lambda s: s[0] > 0, body, inner0)
                )
                return t_best, tri_best, b1_best, b2_best, it

            else:
                occ, it = carry
                pending0 = active & jnp.logical_not(occ > 0)
                inner0 = (
                    jnp.where(jnp.any(pending0), jnp.int32(1),
                              jnp.int32(0)),
                    it, occ,
                )

                def body(state):
                    top, it, occ_c = state
                    info = stack_ref[jnp.maximum(top - 1, 0)]
                    top = top - 1
                    is_leaf = info < 0
                    pending = active & jnp.logical_not(occ_c > 0)

                    def leaf_branch(_):
                        meta = -info - 1
                        start = meta // 16
                        count = meta % 16

                        def test_k(k, new_occ):
                            ti = start + k
                            ti_c = jnp.minimum(ti, n_tris - 1)
                            v0, v1, v2 = _buf_tri(buf_ref, slot, tris_off,
                                                  ti_c)
                            hit, _, _, _ = intersect_triangle_c(
                                v0, v1, v2, ox, oy, oz, dx, dy, dz,
                                t_max, compat=compat, setup=tri_setup,
                            )
                            return jnp.where(pending & hit, jnp.int32(1),
                                             new_occ)

                        new_occ = occ_c
                        for k in range(max_leaf_size):
                            new_occ = jax.lax.cond(
                                k < count, functools.partial(test_k, k),
                                lambda c: c, new_occ,
                            )
                        z = jnp.int32(0)
                        return new_occ, z, z, z, z

                    def internal_branch(_):
                        lmin, lmax, rmin, rmax, li, ri, axis = _buf_row(
                            buf_ref, slot, info
                        )
                        hits_l = pending & intersect_aabb_c(
                            lmin, lmax, ox, oy, oz, inv_dx, inv_dy,
                            inv_dz, t_max, compat=compat,
                        )
                        hits_r = pending & intersect_aabb_c(
                            rmin, rmax, ox, oy, oz, inv_dx, inv_dy,
                            inv_dz, t_max, compat=compat,
                        )
                        inc_l = jnp.any(hits_l).astype(jnp.int32)
                        inc_r = jnp.any(hits_r).astype(jnp.int32)
                        d_neg = dsign_ref[tile * 3 + axis] < 0
                        near = jnp.where(d_neg, ri, li)
                        far = jnp.where(d_neg, li, ri)
                        inc_near = jnp.where(d_neg, inc_r, inc_l)
                        inc_far = jnp.where(d_neg, inc_l, inc_r)
                        return occ_c, far, near, inc_far, inc_near

                    occ2, far, near, inc_f, inc_n = jax.lax.cond(
                        is_leaf, leaf_branch, internal_branch, 0
                    )
                    stack_ref[jnp.maximum(top, 0)] = far
                    top1 = top + inc_f
                    stack_ref[jnp.maximum(top1, 0)] = near
                    top2 = top1 + inc_n
                    done = jnp.all((occ2 > 0) | jnp.logical_not(active))
                    top2 = jnp.where(done, 0, top2)
                    return top2, it + 1, occ2

                _, it, occ = jax.lax.while_loop(
                    lambda s: s[0] > 0, body, inner0
                )
                return occ, it

        carry = jax.lax.fori_loop(0, qn, qbody, init)

        if closest:
            t_best, tri_best, b1_best, b2_best, iters = carry
            t_ref[0] = t_best
            tri_ref[0] = tri_best
            b1_ref[0] = b1_best
            b2_ref[0] = b2_best
            iters_ref[:, :, :] = jnp.full((1, 8, 128), iters, jnp.int32)
        else:
            occ, iters = carry
            occ_ref[0] = occ
            iters_ref[:, :, :] = jnp.full((1, 8, 128), iters, jnp.int32)

    return kernel


def _call_stream(mode, stream: StreamData, o, d, t_max, mask, *,
                 max_leaf_size, compat, tile_size, interpret):
    from pnraytracing_tpu.accel.traverse_pallas import _ray_comps

    r = _ray_comps(o)[0].shape[0]
    _, dsign, _axinfo, rays, n_tiles, sub, pad = _pack_inputs(
        None, o, d, t_max, mask, tile_size
    )
    top_flat = stream.top16.reshape(-1)
    n_outs = 4 if mode == "closest" else 1
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec(
                (8, 1, sub, 128),
                lambda i, *_: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pltpu.ANY),  # bricks stay in HBM
        ],
        out_specs=tuple(
            pl.BlockSpec(
                (1, sub, 128), lambda i, *_: (i, 0, 0),
                memory_space=pltpu.VMEM,
            )
            for _ in range(n_outs)
        ) + (
            # per-tile iteration stats as a (1, 128) VMEM block (SMEM
            # whole-array windows pad the minor dim to 128 and OOM at
            # large tile counts)
            pl.BlockSpec((1, 8, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[
            pltpu.SMEM((stream.brick_stack + 2,), jnp.int32),
            pltpu.SMEM((stream.n_bricks + 2,), jnp.int32),
            pltpu.VMEM((2, stream.brick_words // 128, 128), jnp.float32),
            pltpu.SMEM((2, stream.brick_words // 128, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = _make_stream_kernel(
        n_bricks=stream.n_bricks, max_leaf_size=max_leaf_size,
        compat=compat, mode=mode,
    )
    dtypes = ([jnp.float32, jnp.int32, jnp.float32, jnp.float32]
              if mode == "closest" else [jnp.int32])
    outs = pl.pallas_call(
        kernel,
        out_shape=tuple(
            jax.ShapeDtypeStruct((n_tiles, sub, 128), dt) for dt in dtypes
        ) + (jax.ShapeDtypeStruct((n_tiles, 8, 128), jnp.int32),),
        grid_spec=grid_spec,
        interpret=interpret,
    )(dsign, top_flat, rays,
      stream.bricks.reshape(stream.n_bricks, stream.brick_words // 128,
                            128))
    return outs, r


@functools.partial(
    jax.jit,
    static_argnames=(
        "stack_depth", "max_leaf_size", "compat", "tile_size", "chunk",
        "interpret", "with_stats",
    ),
)
def closest_hit_stream(
    trav: TravData,
    o, d, t_max, mask=None, *,
    stack_depth: int = 64,  # unused: per-brick depth is in StreamData
    max_leaf_size: int = 4,
    compat: bool = False,
    tile_size: int | None = 4096,
    chunk: int = 1,
    interpret: bool = False,
    with_stats: bool = False,
):
    del stack_depth, chunk
    assert trav.stream is not None, (
        "closest_hit_stream needs TravData.stream (build_stream_data)"
    )
    (t, tri, b1, b2, iters), r = _call_stream(
        "closest", trav.stream, o, d, t_max, mask,
        max_leaf_size=max_leaf_size, compat=compat, tile_size=tile_size,
        interpret=interpret,
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
def any_hit_stream(
    trav: TravData,
    o, d, t_max, mask=None, *,
    stack_depth: int = 64,
    max_leaf_size: int = 4,
    compat: bool = False,
    tile_size: int | None = 4096,
    chunk: int = 1,
    interpret: bool = False,
    with_stats: bool = False,
):
    del stack_depth, chunk
    assert trav.stream is not None, (
        "any_hit_stream needs TravData.stream (build_stream_data)"
    )
    (occ, iters), r = _call_stream(
        "any", trav.stream, o, d, t_max, mask,
        max_leaf_size=max_leaf_size, compat=compat, tile_size=tile_size,
        interpret=interpret,
    )
    out = occ.reshape(-1)[:r] > 0
    if with_stats:
        return out, iters[:, 0, :1]
    return out
