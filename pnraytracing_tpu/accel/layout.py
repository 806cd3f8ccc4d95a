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
    return TravData(nodes8=nodes8, tri9=tri9)


def jax_bitcast_i2f(x: jnp.ndarray) -> jnp.ndarray:
    import jax

    return jax.lax.bitcast_convert_type(x.astype(jnp.int32), jnp.float32)


def jax_bitcast_f2i(x: jnp.ndarray) -> jnp.ndarray:
    import jax

    return jax.lax.bitcast_convert_type(x, jnp.int32)


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
