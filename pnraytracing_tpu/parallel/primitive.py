"""Primitive-sharded scene placement — device traversal for scenes too
large for ONE chip's memory (SURVEY §2.3's "large scene" branch).

The default placements replicate the scene (small scenes) or stream
bricks from the chip's own HBM (accel/traverse_stream.py — scenes
larger than SMEM but smaller than HBM).  This module covers the last
regime: the TRIANGLES themselves are partitioned across the mesh, each
device builds/holds a BVH over only its shard (1/D of the geometry),
rays are replicated, and the per-device closest hits are combined with
a pmin/psum reduction over ICI — the classic data-parallel scene
decomposition, expressed entirely in XLA collectives.

Correctness: a closest hit over a partition of the triangle set is the
min-t winner over per-shard closest hits; occlusion is the OR.  Ties in
t across shards resolve to the lowest shard id (deterministic).

Cost model: each device walks a D-times-smaller BVH for ALL rays, so a
query costs ~(log of shard size) like the replicated walk but the SCENE
memory per chip is size/D; the combine is two pmins + five psums of [R]
lanes over ICI per query.  The right choice only when the scene cannot
fit one chip — for everything else the replicated/streaming paths are
faster (no collectives).

Reference contrast: main.cpp:485-507 uploads the whole scene to the one
GPU; there is no multi-GPU path to mirror, so this subsystem is
TPU-native by design (SURVEY §2.3 table).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from flax import struct
from jax.sharding import PartitionSpec as P

from pnraytracing_tpu.accel.layout import TravData
from pnraytracing_tpu.accel.traverse_packed import (
    any_hit_packed,
    closest_hit_packed,
)
from pnraytracing_tpu.ops.intersect import Hit
from pnraytracing_tpu.parallel.mesh import AXIS, shard_map, to_global

_BIG = jnp.float32(3e38)


@struct.dataclass
class PrimShards:
    """Per-shard packed traversal data, stacked on a leading device
    axis (built host-side by :func:`build_primitive_shards`)."""

    nodes8: jnp.ndarray  # [D, Np, 8] f32 packed nodes (padded rows are
    # empty leaves — unreachable, present only to equalize shapes)
    tri9: jnp.ndarray  # [D, Tp, 9] f32 corner rows (padding: degenerate
    # all-zero triangles — the watertight test cannot hit them)
    tri_map: jnp.ndarray  # [D, Tp] i32 shard-local -> GLOBAL triangle id
    n_shards: int = struct.field(pytree_node=False, default=1)
    stack_depth: int = struct.field(pytree_node=False, default=64)


def build_primitive_shards(positions, indices, n_shards: int,
                           max_leaf_size: int = 4) -> PrimShards:
    """Partition the triangle list into ``n_shards`` contiguous chunks
    and build an independent flat BVH + packed layout per chunk
    (host-side, like every other acceleration build)."""
    from pnraytracing_tpu.accel.bvh import build_bvh
    from pnraytracing_tpu.accel.layout import _AXIS_BASE, _COUNT_BASE

    try:
        from pnraytracing_tpu.accel.native import (
            build_bvh_native,
            native_available,
        )

        builder = build_bvh_native if native_available() else build_bvh
    except ImportError:  # pragma: no cover
        builder = build_bvh

    positions = np.asarray(positions, np.float32)
    indices = np.asarray(indices, np.int32)
    t_total = len(indices)
    assert n_shards >= 1 and t_total >= n_shards
    bounds = np.linspace(0, t_total, n_shards + 1).astype(np.int64)

    nodes_l, tri_l, map_l = [], [], []
    max_depth = 1
    for s in range(n_shards):
        lo, hi = int(bounds[s]), int(bounds[s + 1])
        chunk_idx = indices[lo:hi]
        built = builder(positions, chunk_idx, max_leaf_size=max_leaf_size)
        order = np.asarray(built.order)
        max_depth = max(max_depth, built.max_depth)
        count = built.end - built.start
        enc_right = np.where(
            built.right_child >= 0,
            built.right_child * _AXIS_BASE + np.maximum(built.axis, 0),
            -1,
        )
        enc_meta = (built.start * _COUNT_BASE
                    + np.minimum(count, _COUNT_BASE - 1))
        nodes8 = np.concatenate(
            [built.node_min, built.node_max,
             enc_right[:, None].astype(np.float32),
             enc_meta[:, None].astype(np.float32)], axis=1,
        ).astype(np.float32)
        tri9 = positions[chunk_idx[order]].reshape(len(order), 9)
        nodes_l.append(nodes8)
        tri_l.append(tri9.astype(np.float32))
        map_l.append((lo + order).astype(np.int32))

    np_pad = max(len(n) for n in nodes_l)
    tp_pad = max(len(t) for t in tri_l)
    nodes = np.zeros((n_shards, np_pad, 8), np.float32)
    # padded node rows: empty leaf (never referenced by any child id)
    nodes[:, :, 0:3] = 3e38
    nodes[:, :, 3:6] = -3e38
    nodes[:, :, 6] = -1.0
    tri9 = np.zeros((n_shards, tp_pad, 9), np.float32)
    tri_map = np.full((n_shards, tp_pad), -1, np.int32)
    for s in range(n_shards):
        nodes[s, : len(nodes_l[s])] = nodes_l[s]
        tri9[s, : len(tri_l[s])] = tri_l[s]
        tri_map[s, : len(map_l[s])] = map_l[s]
    return PrimShards(
        nodes8=jnp.asarray(nodes),
        tri9=jnp.asarray(tri9),
        tri_map=jnp.asarray(tri_map),
        n_shards=n_shards,
        stack_depth=int(max_depth + 4),
    )


def put_shards(shards: PrimShards, mesh) -> PrimShards:
    """Place each device's shard on its device (leading axis over the
    mesh) — the scene then occupies 1/D of each chip's memory."""
    arrays = to_global(
        {"nodes8": shards.nodes8, "tri9": shards.tri9,
         "tri_map": shards.tri_map},
        mesh, P(AXIS),
    )
    return shards.replace(**arrays)


@functools.partial(
    jax.jit, static_argnames=("mesh", "max_leaf_size", "compat",
                              "tile_size"),
)
def primitive_sharded_closest_hit(
    shards: PrimShards, o, d, t_max, mesh, *,
    max_leaf_size: int = 4, compat: bool = False,
    tile_size: int | None = 4096,
) -> Hit:
    """Closest hit over the partitioned scene: every device walks its
    own sub-BVH for ALL rays, then the global winner is reduced with
    pmin (t), lowest-shard tie-break, and psum field selection.
    Returns a replicated Hit with GLOBAL triangle ids."""
    n = shards.n_shards

    def body(nodes8, tri9, tri_map, o_, d_, tm_):
        trav = TravData(nodes8=nodes8[0], tri9=tri9[0])
        hit = closest_hit_packed(
            trav, o_, d_, tm_, None,
            stack_depth=shards.stack_depth,
            max_leaf_size=max_leaf_size, compat=compat,
            tile_size=tile_size,
        )
        t = jnp.where(hit.valid, hit.t, _BIG)
        tmin = jax.lax.pmin(t, AXIS)
        sid = jax.lax.axis_index(AXIS).astype(jnp.int32)
        claim = jnp.where(hit.valid & (t == tmin), sid, jnp.int32(n))
        owner = jax.lax.pmin(claim, AXIS)
        mine = (claim == owner) & (owner < n)
        gtri = tri_map[0][jnp.maximum(hit.tri, 0)]

        def pick(v):
            return jax.lax.psum(jnp.where(mine, v, jnp.zeros_like(v)),
                                AXIS)

        any_owner = owner < n
        tri = jnp.where(any_owner, pick(gtri), jnp.int32(-1))
        t_out = jnp.where(any_owner, tmin, tm_)
        return Hit(tri=tri, t=t_out, b1=pick(hit.b1), b2=pick(hit.b2))

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )(shards.nodes8, shards.tri9, shards.tri_map, o, d, t_max)


@functools.partial(
    jax.jit, static_argnames=("mesh", "max_leaf_size", "compat",
                              "tile_size"),
)
def primitive_sharded_any_hit(
    shards: PrimShards, o, d, t_max, mesh, *,
    max_leaf_size: int = 4, compat: bool = False,
    tile_size: int | None = 4096,
) -> jnp.ndarray:
    """Occlusion over the partitioned scene: per-shard any-hit, OR'd
    over the mesh (psum > 0)."""

    def body(nodes8, tri9, tri_map, o_, d_, tm_):
        del tri_map
        trav = TravData(nodes8=nodes8[0], tri9=tri9[0])
        occ = any_hit_packed(
            trav, o_, d_, tm_, None,
            stack_depth=shards.stack_depth,
            max_leaf_size=max_leaf_size, compat=compat,
            tile_size=tile_size,
        )
        return jax.lax.psum(occ.astype(jnp.int32), AXIS) > 0

    return shard_map(
        body, mesh=mesh,
        in_specs=(P(AXIS), P(AXIS), P(AXIS), P(), P(), P()),
        out_specs=P(),
        check_vma=False,
    )(shards.nodes8, shards.tri9, shards.tri_map, o, d, t_max)
