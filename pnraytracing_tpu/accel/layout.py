"""Traversal-optimized device layout.

The generic traversal gathers ~6 separate rows per node visit (bounds x2,
axis, right_child, start, end) plus 1+3 rows per triangle test (index
triple, then three vertex positions).  On TPU every gather pays a full
dynamic-gather pass, so the packed layout collapses them:

* ``nodes8``  [N, 8] f32 — min.xyz, max.xyz, bitcast(right_child),
  bitcast(start | count<<26 | axis<<30): ONE row gather per node visit;
* ``tri9``    [T, 9] f32 — the three corner positions, pre-gathered: ONE
  row gather per triangle test.

This is pure data layout (same flat BVH contract as the reference,
BVH.hpp:6-12); results are bit-identical to the unpacked traversal.
Packing runs in-graph so a refit/rebuild can re-derive it cheaply.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from pnraytracing_tpu.core.types import BVH, TriangleMesh

_START_BITS = 26
_START_MASK = (1 << _START_BITS) - 1
_COUNT_BITS = 4
_COUNT_MASK = (1 << _COUNT_BITS) - 1

MAX_PACKED_LEAF = _COUNT_MASK  # 15 triangles


@struct.dataclass
class TravData:
    nodes8: jnp.ndarray  # [N, 8] f32
    tri9: jnp.ndarray  # [T, 9] f32
    # Wide layout: per INTERNAL node, both children's AABBs + encoded child
    # infos + split axis in one [N, 16] row, so the traversal loop issues
    # ONE node gather per iteration and iterates over internal nodes only
    # (see accel/traverse_wide.py).  None when not packed.
    nodes16: jnp.ndarray | None = None


def pack_traversal_data(bvh: BVH, mesh: TriangleMesh) -> TravData:
    n = bvh.num_nodes
    count = bvh.end - bvh.start
    # leaves must fit the 4-bit count field (builder default is 4)
    meta = (
        (bvh.start & _START_MASK)
        | ((jnp.minimum(count, _COUNT_MASK) & _COUNT_MASK) << _START_BITS)
        | ((jnp.maximum(bvh.axis, 0) & 0x3) << (_START_BITS + _COUNT_BITS))
    ).astype(jnp.int32)
    nodes8 = jnp.concatenate(
        [
            bvh.node_min,
            bvh.node_max,
            jax_bitcast_i2f(bvh.right_child)[:, None],
            jax_bitcast_i2f(meta)[:, None],
        ],
        axis=1,
    )
    p = mesh.positions[mesh.indices]  # [T, 3, 3]
    tri9 = p.reshape(p.shape[0], 9)
    return TravData(nodes8=nodes8, tri9=tri9, nodes16=pack_wide_nodes(bvh))


def pack_wide_nodes(bvh: BVH) -> jnp.ndarray:
    """[N, 16] f32 rows for the wide traversal: per internal node
    ``[lmin(3), lmax(3), rmin(3), rmax(3), left_info, right_info, axis,
    pad]``.

    ``child_info >= 0`` is an internal child's node id; ``< 0`` encodes a
    leaf as ``-(start | count << 26) - 1``.  Rows of leaf nodes are never
    visited (their parents resolve them inline) and hold safe dummy values.
    A leaf ROOT (scenes of <= 2 triangles) gets a synthetic row 0 whose left
    "child" is the root leaf itself and whose right child is an empty box
    with a zero-count leaf, so the traversal is uniform.
    """
    n = bvh.num_nodes
    ids = jnp.arange(n, dtype=jnp.int32)
    is_leaf = bvh.right_child < 0
    count = bvh.end - bvh.start
    meta = (
        (bvh.start & _START_MASK)
        | ((jnp.minimum(count, _COUNT_MASK) & _COUNT_MASK) << _START_BITS)
    ).astype(jnp.int32)
    leaf_info = -meta - 1

    left = jnp.minimum(ids + 1, n - 1)
    right = jnp.clip(bvh.right_child, 0, n - 1)

    def info_of(ch):
        return jnp.where(is_leaf[ch], leaf_info[ch], ch)

    big = jnp.float32(3e38)
    empty_min = jnp.full((3,), big, jnp.float32)
    empty_max = jnp.full((3,), -big, jnp.float32)

    rows = jnp.concatenate(
        [
            bvh.node_min[left],
            bvh.node_max[left],
            bvh.node_min[right],
            bvh.node_max[right],
            jax_bitcast_i2f(info_of(left))[:, None],
            jax_bitcast_i2f(info_of(right))[:, None],
            jax_bitcast_i2f(jnp.maximum(bvh.axis, 0))[:, None],
            jnp.zeros((n, 1), jnp.float32),
        ],
        axis=1,
    )
    syn_row0 = jnp.concatenate(
        [
            bvh.node_min[0],
            bvh.node_max[0],
            empty_min,
            empty_max,
            jax_bitcast_i2f(leaf_info[0])[None],
            jax_bitcast_i2f(jnp.int32(-1))[None],  # empty leaf: meta 0
            jax_bitcast_i2f(jnp.int32(0))[None],
            jnp.zeros((1,), jnp.float32),
        ]
    )
    rows = rows.at[0].set(jnp.where(is_leaf[0], syn_row0, rows[0]))
    return rows


def jax_bitcast_i2f(x: jnp.ndarray) -> jnp.ndarray:
    import jax

    return jax.lax.bitcast_convert_type(x.astype(jnp.int32), jnp.float32)


def jax_bitcast_f2i(x: jnp.ndarray) -> jnp.ndarray:
    import jax

    return jax.lax.bitcast_convert_type(x, jnp.int32)


def unpack_wide_rows(rows: jnp.ndarray):
    """[..., 16] row -> (lmin, lmax, rmin, rmax, left_info, right_info,
    axis)."""
    lmin = rows[..., 0:3]
    lmax = rows[..., 3:6]
    rmin = rows[..., 6:9]
    rmax = rows[..., 9:12]
    li = jax_bitcast_f2i(rows[..., 12])
    ri = jax_bitcast_f2i(rows[..., 13])
    axis = jax_bitcast_f2i(rows[..., 14])
    return lmin, lmax, rmin, rmax, li, ri, axis


def decode_leaf_info(info: jnp.ndarray):
    """Negative child_info -> (start, count); count is 0 for non-leaves."""
    meta = -info - 1
    start = meta & _START_MASK
    count = jnp.where(info < 0, (meta >> _START_BITS) & _COUNT_MASK, 0)
    return start, count


def unpack_node_rows(rows: jnp.ndarray):
    """[..., 8] row -> (nmin, nmax, right_child, start, count, axis)."""
    nmin = rows[..., 0:3]
    nmax = rows[..., 3:6]
    right = jax_bitcast_f2i(rows[..., 6])
    meta = jax_bitcast_f2i(rows[..., 7])
    start = meta & _START_MASK
    count = (meta >> _START_BITS) & _COUNT_MASK
    axis = (meta >> (_START_BITS + _COUNT_BITS)) & 0x3
    return nmin, nmax, right, start, count, axis
