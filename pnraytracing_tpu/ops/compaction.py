"""Stream compaction via parallel prefix scan.

The reference ships a workgroup shared-memory inclusive scan
(``shaders/prefix_sum.comp``) with a manual test harness
(``PrefixSum()``, main.cpp:144-170) — dead code in its render path, but the
building block for wavefront ray compaction.  The TPU-native equivalent is
``jax.lax.associative_scan`` (log-depth, XLA-fused), used here to pack live
rays to the front of the batch between bounces, the optimization SURVEY.md
§2.3 maps ``prefix_sum.comp`` to."""

from __future__ import annotations

import jax
import jax.numpy as jnp


def inclusive_scan(x: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    """Inclusive prefix sum (the exact operation of prefix_sum.comp:10-23,
    without the 1024-element workgroup limit)."""
    return jax.lax.associative_scan(jnp.add, x, axis=axis)


def exclusive_scan(x: jnp.ndarray, axis: int = 0) -> jnp.ndarray:
    inc = inclusive_scan(x, axis=axis)
    return inc - x


def compact_indices(mask: jnp.ndarray):
    """Pack the indices of True lanes to the front.

    Returns (perm [R] i32, count) where perm's first ``count`` entries are
    the indices of live lanes (in order) and the rest are the dead lanes —
    a permutation, so ``x[perm]`` never gathers out of bounds and
    ``invert_permutation`` restores the original order.
    """
    mask = mask.astype(jnp.int32)
    r = mask.shape[0]
    pos_live = exclusive_scan(mask)  # rank among live
    count = pos_live[-1] + mask[-1]
    pos_dead = exclusive_scan(1 - mask) + count  # rank among dead, after live
    dest = jnp.where(mask == 1, pos_live, pos_dead)  # [R] destination slot
    perm = jnp.zeros((r,), jnp.int32).at[dest].set(jnp.arange(r, dtype=jnp.int32))
    return perm, count


def scatter_back(values: jnp.ndarray, perm: jnp.ndarray) -> jnp.ndarray:
    """Undo ``x[perm]``: returns array y with y[perm[i]] = values[i]."""
    out = jnp.zeros_like(values)
    return out.at[perm].set(values)


def coherence_key(nrm: jnp.ndarray, pos: jnp.ndarray,
                  lo: jnp.ndarray, inv_extent: jnp.ndarray) -> jnp.ndarray:
    """Spatial-directional coherence key for live-ray sorting.

    Next-bounce rays leave from ``pos`` with directions distributed around
    ``nrm`` (BRDF lobes) or toward fixed targets (shadow segments), so rays
    with similar (normal octant, position cell) traverse similar BVH
    subtrees.  Key layout, most-significant first: 3-bit normal octant,
    2 bits per axis of quantized |n|, 2 bits per axis of the position cell
    within the scene bounds — 15 bits total.
    """
    nx, ny, nz = _components(nrm)
    px_, py_, pz_ = _components(pos)
    oct_ = (
        (nx > 0).astype(jnp.uint32) * 4
        + (ny > 0).astype(jnp.uint32) * 2
        + (nz > 0).astype(jnp.uint32)
    )
    key = oct_
    for i, nc in enumerate((nx, ny, nz)):
        qn = jnp.clip((jnp.abs(nc) * 4).astype(jnp.uint32), 0, 3)
        key = key * 4 + qn
    for i, pc in enumerate((px_, py_, pz_)):
        rel = (pc - lo[i]) * inv_extent[i]
        qp = jnp.clip((rel * 4).astype(jnp.uint32), 0, 3)
        key = key * 4 + qp
    return key


def _components(v):
    """Accept either a trailing-axis-3 array or a V3 (core/vec.py)."""
    if hasattr(v, "x"):
        return v.x, v.y, v.z
    return v[:, 0], v[:, 1], v[:, 2]


def coherence_key_pos(nrm: jnp.ndarray, pos: jnp.ndarray,
                      lo: jnp.ndarray, inv_extent: jnp.ndarray
                      ) -> jnp.ndarray:
    """Position-major variant: 12-bit Morton code of the position cell
    (4 bits/axis, bit-interleaved) above the 3-bit normal octant.

    For packet traversal the iteration count per tile is the UNION of BVH
    nodes the tile's rays touch; rays leaving the same region share the
    near subtrees regardless of direction, so position-major grouping can
    tighten the union more than direction-major (A/B'd on hardware)."""
    nx, ny, nz = _components(nrm)
    pc = _components(pos)
    oct_ = (
        (nx > 0).astype(jnp.uint32) * 4
        + (ny > 0).astype(jnp.uint32) * 2
        + (nz > 0).astype(jnp.uint32)
    )
    qp = [
        jnp.clip(((pc[i] - lo[i]) * inv_extent[i] * 16).astype(jnp.uint32),
                 0, 15)
        for i in range(3)
    ]
    morton = jnp.zeros_like(oct_)
    for bit in range(3, -1, -1):  # msb first
        for ax in range(3):
            morton = morton * 2 + ((qp[ax] >> bit) & 1)
    return morton * 8 + oct_


def treelet_entry_key(o, d, treelets: jnp.ndarray) -> jnp.ndarray:
    """Coherence key for a ray that is ABOUT to traverse: index of the
    nearest treelet (BVH subtree from accel/bricks.py::treelet_cut_aabbs)
    its segment enters, direction octant in the low bits.

    Unlike the position/direction proxies, this uses the actual ray —
    so it keys the sort placed right BEFORE the continuation traversal
    (the integrator's pre-hit2 sort), not the end-of-bounce one.  Rays
    sharing the nearest treelet walk overlapping subtrees, which is what
    bounds the shared-stack packet kernel's per-tile union.  Round-5
    chip sweep (scripts/sort_exp.py, realistic bounce rays, flagship
    scene): 20.3 ms (Morton pos key) -> 9.1 ms, vs 5.6 ms coherent.

    Cost: K unrolled slab tests of elementwise [R] math (zero gathers),
    ~18 ops each; treelet_cut_aabbs caps K at 512.
    """
    ox, oy, oz = _components(o)
    dx, dy, dz = _components(d)

    def inv(c):
        return jnp.where(c >= 0, 1.0, -1.0) / jnp.maximum(jnp.abs(c), 1e-20)

    ix, iy, iz = inv(dx), inv(dy), inv(dz)
    # broadcast [R, 1] x [1, K] slab tests — a handful of HLO ops (an
    # unrolled per-treelet scalar loop compiled fine but took XLA >8 min
    # at K=375 x 4 bounces); the [R, K] intermediates fuse into the
    # argmin reduction
    col = lambda a: a[:, None]
    row = lambda k: treelets[None, :, k]
    fx = (row(3) - col(ox)) * col(ix)
    nx = (row(0) - col(ox)) * col(ix)
    fy = (row(4) - col(oy)) * col(iy)
    ny = (row(1) - col(oy)) * col(iy)
    fz = (row(5) - col(oz)) * col(iz)
    nz = (row(2) - col(oz)) * col(iz)
    t_far = jnp.minimum(
        jnp.minimum(jnp.maximum(fx, nx), jnp.maximum(fy, ny)),
        jnp.maximum(fz, nz),
    )
    t_near = jnp.maximum(
        jnp.maximum(jnp.minimum(fx, nx), jnp.minimum(fy, ny)),
        jnp.maximum(jnp.minimum(fz, nz), 0.0),
    )
    big = jnp.float32(3e38)
    tn = jnp.where(t_far >= t_near, t_near, big)  # [R, K]
    best_k = jnp.argmin(tn, axis=1).astype(jnp.uint32)
    any_hit_ = jnp.min(tn, axis=1) < big
    best_k = jnp.where(any_hit_, best_k, jnp.uint32(treelets.shape[0]))
    oct_ = (
        (dx > 0).astype(jnp.uint32) * 4
        + (dy > 0).astype(jnp.uint32) * 2
        + (dz > 0).astype(jnp.uint32)
    )
    # NOTE: adding the dominant axis to the key (best_k*32 + kz*8 + oct)
    # was A/B'd on chip and LOST (2.46e7 -> 2.29e7 rays/s): splitting
    # each treelet group by axis fragments the binning, and the union
    # growth outweighs the statically-permuted leaf path it enables.
    return best_k * 8 + oct_


def treelet_entry_key_pallas(o, d, treelets: jnp.ndarray,
                             tile_size: int = 4096) -> jnp.ndarray:
    """Mosaic version of :func:`treelet_entry_key` — the K slab tests run
    as an in-kernel ``fori_loop`` over the SMEM treelet table instead of
    [R, K] broadcast intermediates (XLA materializes several of those:
    4.9 ms at K=375, R=262k on the chip; the kernel is ~2x cheaper).
    Key values may differ from the XLA form only in argmin tie-breaking
    noise — the key drives a permutation, so renders are unaffected."""
    import functools as _ft

    import jax as _jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from pnraytracing_tpu.accel.traverse_pallas import (
        _pack_inputs,
        _safe_inv_c,
    )

    k_total = int(treelets.shape[0])

    def kernel(dsign_ref, tre_ref, rays_ref, key_ref):
        ox = rays_ref[0, 0]
        oy = rays_ref[1, 0]
        oz = rays_ref[2, 0]
        dx = rays_ref[3, 0]
        dy = rays_ref[4, 0]
        dz = rays_ref[5, 0]
        ix = _safe_inv_c(dx)
        iy = _safe_inv_c(dy)
        iz = _safe_inv_c(dz)
        big = jnp.float32(3e38)

        def body(k, carry):
            best_t, best_k = carry
            base = k * 6
            nx = (tre_ref[base + 0] - ox) * ix
            ny = (tre_ref[base + 1] - oy) * iy
            nz = (tre_ref[base + 2] - oz) * iz
            fx = (tre_ref[base + 3] - ox) * ix
            fy = (tre_ref[base + 4] - oy) * iy
            fz = (tre_ref[base + 5] - oz) * iz
            t_far = jnp.minimum(
                jnp.minimum(jnp.maximum(fx, nx), jnp.maximum(fy, ny)),
                jnp.maximum(fz, nz),
            )
            t_near = jnp.maximum(
                jnp.maximum(jnp.minimum(fx, nx), jnp.minimum(fy, ny)),
                jnp.maximum(jnp.minimum(fz, nz), 0.0),
            )
            win = (t_far >= t_near) & (t_near < best_t)
            return (jnp.where(win, t_near, best_t),
                    jnp.where(win, k, best_k))

        best_t, best_k = _jax.lax.fori_loop(
            0, k_total, body,
            (jnp.full(ox.shape, big, jnp.float32),
             jnp.full(ox.shape, k_total, jnp.int32)),
        )
        oct_ = ((dx > 0).astype(jnp.int32) * 4
                + (dy > 0).astype(jnp.int32) * 2
                + (dz > 0).astype(jnp.int32))
        key_ref[0] = best_k * 8 + oct_

    r = (o.x if hasattr(o, "x") else o[:, 0]).shape[0]
    _, dsign, _axinfo, rays, n_tiles, sub, pad = _pack_inputs(
        None, o, d, jnp.float32(1.0), None, tile_size
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=2,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((8, 1, sub, 128), lambda i, *_: (0, i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, sub, 128), lambda i, *_: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        scratch_shapes=[],
    )
    out = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((n_tiles, sub, 128), jnp.int32),),
        grid_spec=grid_spec,
        interpret=_jax.default_backend() != "tpu",
    )(dsign, treelets.reshape(-1), rays)[0]
    return out.reshape(-1)[:r].astype(jnp.uint32)


def sort_live_first(mask: jnp.ndarray, key: jnp.ndarray):
    """Permutation packing live lanes first, ordered by ``key`` (stable).

    A strict generalization of :func:`compact_indices` (key=0 reduces to
    it); used between bounces so coherent rays land in the same traversal
    tile.  Pure permutation — results are bit-identical, only lane order
    changes.
    """
    dead = (~mask).astype(jnp.uint32)
    composite = dead * jnp.uint32(1 << 16) + key.astype(jnp.uint32)
    perm = jnp.argsort(composite, stable=True).astype(jnp.int32)
    count = jnp.sum(mask.astype(jnp.int32))
    return perm, count
