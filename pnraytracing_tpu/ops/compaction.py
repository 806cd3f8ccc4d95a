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
