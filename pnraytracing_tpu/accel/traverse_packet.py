"""Packet BVH traversal: one SHARED stack per ray tile, zero gathers.

The wavefront backends (traverse_packed/pop) give every ray its own stack
and gather one node row per ray per iteration.  On TPU that dynamic
row-gather is the whole cost: XLA lowers a [R]-index gather into per-row
dynamic slices, so each traversal step pays O(R) sequential row fetches —
measured orders of magnitude below HBM speed on hardware.

This backend transposes the loop structure instead of feeding the gather:
a TILE of rays walks the tree together behind ONE scalar stack (the
classic SIMD ray-packet traversal — Wald et al. 2001 — which is exactly
the TPU execution model: scalar control flow + 8x128-lane vector tests).

Per loop iteration:
* pop ONE node id (scalar) and fetch its [1, 8] row with a scalar
  ``lax.dynamic_slice`` — no gather anywhere;
* AABB-test the node against ALL rays in the tile on the VPU;
* leaf: its triangles are CONTIGUOUS rows of ``tri9`` (the packed layout
  orders triangles by leaf, accel/layout.py), so one scalar dynamic_slice
  fetches them all; every ray tests every leaf triangle;
* internal: push both children (pop-test style — children are tested
  when popped, so a node is fetched exactly once).

Iteration count per tile = the UNION of nodes any live ray visits, so
packets shine on coherent rays (primary, shadow) and degrade toward
O(nodes) for fully incoherent ones — still a win here because each
iteration is gather-free vector work instead of R row fetches.  The
coherence sort in ops/compaction.py raises union tightness for bounce
rays.

Results are bit-identical to the other backends up to closest-hit ties
between coplanar triangles (same float arithmetic, different visit
order).  Reference contract: shaders/ray_tracing.comp:420-470 (per-thread
stack); this is its tile-cooperative redesign for a vector machine.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pnraytracing_tpu.accel.layout import TravData
from pnraytracing_tpu.ops.intersect import (
    Hit,
    intersect_aabb,
    intersect_triangle,
    safe_inv_dir,
)


def _fetch_node(nodes8: jnp.ndarray, node: jnp.ndarray):
    """Scalar-indexed [1, 8] row -> (nmin [3], nmax [3], right, start,
    count, axis) with scalar topology."""
    row = jax.lax.dynamic_slice(nodes8, (node, jnp.int32(0)), (1, 8))[0]
    nmin = row[0:3]
    nmax = row[3:6]
    enc_right = row[6].astype(jnp.int32)
    enc_meta = row[7].astype(jnp.int32)
    right = jnp.where(enc_right >= 0, enc_right // 4, -1)
    axis = jnp.where(enc_right >= 0, enc_right % 4, 0)
    start = enc_meta // 16
    count = enc_meta % 16
    return nmin, nmax, right, start, count, axis


def _leaf_rows(tri9: jnp.ndarray, start, max_leaf_size: int):
    """Contiguous [L, 9] leaf-triangle rows via scalar dynamic_slice.
    dynamic_slice clamps the start, so return the effective start too."""
    t = tri9.shape[0]
    start_c = jnp.clip(start, 0, max(t - max_leaf_size, 0))
    rows = jax.lax.dynamic_slice(
        tri9, (start_c, jnp.int32(0)), (max_leaf_size, 9)
    )
    return rows, start_c


def _closest_hit_packet_tile(
    trav: TravData,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_max: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    *,
    stack_depth: int = 64,
    max_leaf_size: int = 4,
    compat: bool = False,
    chunk: int = 16,
) -> Hit:
    r = o.shape[0]
    inv_d = safe_inv_dir(d)
    active0 = jnp.ones((r,), bool) if mask is None else mask
    # mean direction decides the shared near/far order per split axis
    dsum = d.sum(axis=0)  # [3]

    # +2: the shared DFS stack peaks at tree_depth + 1, and the
    # unconditional push writes one slot above top
    stack = jnp.zeros((stack_depth + 2,), jnp.int32)
    top = jnp.where(jnp.any(active0), jnp.int32(1), jnp.int32(0))
    hit0 = Hit(
        tri=jnp.full((r,), -1, jnp.int32),
        t=jnp.asarray(t_max, jnp.float32),
        b1=jnp.zeros((r,), jnp.float32),
        b2=jnp.zeros((r,), jnp.float32),
    )

    def cond(state):
        return state[1] > 0

    def body(state):
        stack, top, best = state
        live = top > 0  # chunked outer loop may overshoot: body must no-op
        node = stack[jnp.maximum(top - 1, 0)]
        top = jnp.where(live, top - 1, top)
        nmin, nmax, right, start, count, axis = _fetch_node(trav.nodes8, node)
        hits = live & active0 & intersect_aabb(
            nmin[None, :], nmax[None, :], o, inv_d, best.t, compat=compat
        )
        alive = jnp.any(hits)
        is_leaf = right < 0

        # --- leaf: test the contiguous triangle rows against every ray
        rows, start_c = _leaf_rows(trav.tri9, start, max_leaf_size)
        do_leaf = alive & is_leaf
        t_best, tri_best = best.t, best.tri
        b1_best, b2_best = best.b1, best.b2
        for k in range(max_leaf_size):
            ti = start_c + k
            valid = do_leaf & (ti >= start) & (ti < start + count)
            row = rows[k]
            tri_hit, t, b1, b2 = intersect_triangle(
                row[None, 0:3], row[None, 3:6], row[None, 6:9],
                o, d, t_best, compat=compat,
            )
            win = hits & tri_hit & valid & (t < t_best)
            t_best = jnp.where(win, t, t_best)
            tri_best = jnp.where(win, ti, tri_best)
            b1_best = jnp.where(win, b1, b1_best)
            b2_best = jnp.where(win, b2, b2_best)

        # --- internal: push far then near (near popped first)
        left = node + 1
        d_ax = jax.lax.dynamic_index_in_dim(dsum, axis, keepdims=False)
        neg = d_ax < 0
        near = jnp.where(neg, right, left)
        far = jnp.where(neg, left, right)
        push = alive & ~is_leaf
        inc = push.astype(jnp.int32)
        # slots at indices >= top are free space: write unconditionally,
        # commit by advancing top only when pushing
        stack = jax.lax.dynamic_update_index_in_dim(stack, far, top, 0)
        top1 = top + inc
        stack = jax.lax.dynamic_update_index_in_dim(stack, near, top1, 0)
        top2 = top1 + inc
        return stack, top2, Hit(tri=tri_best, t=t_best, b1=b1_best, b2=b2_best)

    from pnraytracing_tpu.accel.loops import chunked_while

    _, _, best = chunked_while(cond, body, (stack, top, hit0), chunk)
    return best


def _any_hit_packet_tile(
    trav: TravData,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_max: jnp.ndarray,
    mask: jnp.ndarray | None = None,
    *,
    stack_depth: int = 64,
    max_leaf_size: int = 4,
    compat: bool = False,
    chunk: int = 16,
) -> jnp.ndarray:
    r = o.shape[0]
    inv_d = safe_inv_dir(d)
    active0 = jnp.ones((r,), bool) if mask is None else mask
    t_max = jnp.asarray(t_max, jnp.float32)
    dsum = d.sum(axis=0)

    # +2: the shared DFS stack peaks at tree_depth + 1, and the
    # unconditional push writes one slot above top
    stack = jnp.zeros((stack_depth + 2,), jnp.int32)
    top = jnp.where(jnp.any(active0), jnp.int32(1), jnp.int32(0))
    occ0 = jnp.zeros((r,), bool)

    def cond(state):
        return state[1] > 0

    def body(state):
        stack, top, occ = state
        live = top > 0
        node = stack[jnp.maximum(top - 1, 0)]
        top = jnp.where(live, top - 1, top)
        nmin, nmax, right, start, count, axis = _fetch_node(trav.nodes8, node)
        pending = live & active0 & ~occ
        hits = pending & intersect_aabb(
            nmin[None, :], nmax[None, :], o, inv_d, t_max, compat=compat
        )
        alive = jnp.any(hits)
        is_leaf = right < 0

        rows, start_c = _leaf_rows(trav.tri9, start, max_leaf_size)
        do_leaf = alive & is_leaf
        new_occ = occ
        for k in range(max_leaf_size):
            ti = start_c + k
            valid = do_leaf & (ti >= start) & (ti < start + count)
            row = rows[k]
            tri_hit, _, _, _ = intersect_triangle(
                row[None, 0:3], row[None, 3:6], row[None, 6:9],
                o, d, t_max, compat=compat,
            )
            new_occ = new_occ | (hits & tri_hit & valid)

        left = node + 1
        d_ax = jax.lax.dynamic_index_in_dim(dsum, axis, keepdims=False)
        neg = d_ax < 0
        near = jnp.where(neg, right, left)
        far = jnp.where(neg, left, right)
        push = alive & ~is_leaf
        inc = push.astype(jnp.int32)
        # slots at indices >= top are free space: write unconditionally,
        # commit by advancing top only when pushing
        stack = jax.lax.dynamic_update_index_in_dim(stack, far, top, 0)
        top1 = top + inc
        stack = jax.lax.dynamic_update_index_in_dim(stack, near, top1, 0)
        top2 = top1 + inc
        # all rays resolved -> drain the stack
        done = jnp.all(new_occ | ~active0)
        top2 = jnp.where(done, 0, top2)
        return stack, top2, new_occ

    from pnraytracing_tpu.accel.loops import chunked_while

    _, _, occ = chunked_while(cond, body, (stack, top, occ0), chunk)
    return occ


def _make_tiled(flat_fn):
    from pnraytracing_tpu.accel.traverse_packed import _tiled

    return _tiled(flat_fn, None)


closest_hit_packet = jax.jit(
    _make_tiled(_closest_hit_packet_tile),
    static_argnames=("stack_depth", "max_leaf_size", "compat", "tile_size", "chunk"),
)
any_hit_packet = jax.jit(
    _make_tiled(_any_hit_packet_tile),
    static_argnames=("stack_depth", "max_leaf_size", "compat", "tile_size", "chunk"),
)
