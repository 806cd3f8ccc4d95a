"""Batched BVH traversal on device.

The reference traverses with one thread per ray and an explicit 128-deep
stack in registers (GLSL ``BVHIntersect``/``BVHIntersectP``,
ray_tracing.comp:429-494; CPU mirror BVH.hpp:21-85).  The TPU-native
formulation keeps a *batch* of rays in lockstep: the per-ray stacks live in a
``[R, depth]`` array, a single ``lax.while_loop`` pops one node per ray per
iteration (masked where a ray's stack is empty), node/vertex fetches are
vectorized gathers, and leaf handling is unrolled to the builder's
``max_leaf_size`` bound.  Rays that finish idle until the last ray's stack
drains — the SIMT behaviour of the original, without warps.

Ordering matches the reference: the child nearer along the split axis is
pushed last (popped first), using the ray-direction sign on ``node.axis``
(ray_tracing.comp:447-457).  Unlike the reference, both children are
bound-tested *before* pushing (the reference pushes the far child blindly and
tests at pop time), which only prunes work.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from pnraytracing_tpu.core.types import BVH, TriangleMesh
from pnraytracing_tpu.accel.loops import chunked_while
from pnraytracing_tpu.ops.intersect import (
    Hit,
    intersect_aabb,
    intersect_triangle,
    safe_inv_dir,
)


def _prepare(o, d):
    r = o.shape[0]
    arange = jnp.arange(r, dtype=jnp.int32)
    inv_d = safe_inv_dir(d)
    return r, arange, inv_d


def _push(stack, top, child, mask, arange, depth):
    """Masked vectorized stack push."""
    idx = jnp.clip(top, 0, depth - 1)
    cur = stack[arange, idx]
    stack = stack.at[arange, idx].set(jnp.where(mask, child, cur))
    top = top + mask.astype(jnp.int32)
    return stack, top


def _pop(stack, top, arange):
    active = top > 0
    idx = jnp.maximum(top - 1, 0)
    node_id = jnp.where(active, stack[arange, idx], 0)
    top = jnp.where(active, top - 1, top)
    return node_id, top, active


def _children(bvh: BVH, node_id, d):
    """(near, far) child ids per ray for internal nodes."""
    left = node_id + 1
    right = bvh.right_child[node_id]
    ax = bvh.axis[node_id]
    d_ax = jnp.take_along_axis(d, jnp.maximum(ax, 0)[:, None], axis=-1)[:, 0]
    neg = d_ax < 0
    near = jnp.where(neg, right, left)
    far = jnp.where(neg, left, right)
    return near, far


def _leaf_triangles(
    mesh: TriangleMesh,
    node_start,
    node_end,
    leaf_mask,
    o,
    d,
    t_best,
    max_leaf_size: int,
    compat: bool,
):
    """Unrolled masked intersection of up to ``max_leaf_size`` triangles of a
    leaf; yields (hit_mask, tri_idx, t, b1, b2) per slot.

    Hits are tested against the *leaf-entry* ``t_best`` (a valid upper
    bound); the caller must additionally compare ``t`` against its running
    best so a later slot cannot overwrite a closer earlier hit.
    """
    for k in range(max_leaf_size):
        ti = node_start + k
        valid = leaf_mask & (ti < node_end)
        ti_safe = jnp.where(valid, ti, 0)
        idx = mesh.indices[ti_safe]  # [R, 3]
        p = mesh.positions[idx]  # [R, 3, 3]
        hit, t, b1, b2 = intersect_triangle(
            p[:, 0], p[:, 1], p[:, 2], o, d, t_best, compat=compat
        )
        yield hit & valid, ti_safe, t, b1, b2


@functools.partial(
    jax.jit, static_argnames=("stack_depth", "max_leaf_size", "compat", "chunk")
)
def closest_hit(
    bvh: BVH,
    mesh: TriangleMesh,
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
    """Closest-hit traversal over a ray batch (BVHIntersect,
    ray_tracing.comp:429-461).  o, d: [R, 3]; t_max: [R].
    mask: optional [R] bool; False rays skip traversal entirely."""
    r, arange, inv_d = _prepare(o, d)

    stack = jnp.zeros((r, stack_depth), jnp.int32)
    top = jnp.ones((r,), jnp.int32)  # root pushed
    if mask is not None:
        top = jnp.where(mask, top, 0)
    hit0 = Hit(
        tri=jnp.full((r,), -1, jnp.int32),
        t=jnp.asarray(t_max, jnp.float32),
        b1=jnp.zeros((r,), jnp.float32),
        b2=jnp.zeros((r,), jnp.float32),
    )

    def cond(state):
        _, top, _ = state
        return jnp.any(top > 0)

    def body(state):
        stack, top, best = state
        node_id, top, active = _pop(stack, top, arange)
        bhit = active & intersect_aabb(
            bvh.node_min[node_id], bvh.node_max[node_id], o, inv_d, best.t, compat=compat
        )
        is_leaf = bvh.right_child[node_id] < 0

        # --- leaf: unrolled triangle tests -------------------------------
        leaf = bhit & is_leaf
        t_best, tri_best, b1_best, b2_best = best.t, best.tri, best.b1, best.b2
        for tri_hit, ti, t, b1, b2 in _leaf_triangles(
            mesh, bvh.start[node_id], bvh.end[node_id], leaf, o, d, t_best,
            max_leaf_size, compat,
        ):
            win = tri_hit & (t < t_best)
            t_best = jnp.where(win, t, t_best)
            tri_best = jnp.where(win, ti, tri_best)
            b1_best = jnp.where(win, b1, b1_best)
            b2_best = jnp.where(win, b2, b2_best)

        # --- internal: push far then near (near popped first) ------------
        internal = bhit & ~is_leaf
        near, far = _children(bvh, node_id, d)
        far_ok = internal & intersect_aabb(
            bvh.node_min[far], bvh.node_max[far], o, inv_d, t_best, compat=compat
        )
        near_ok = internal & intersect_aabb(
            bvh.node_min[near], bvh.node_max[near], o, inv_d, t_best, compat=compat
        )
        stack2, top2 = _push(stack, top, far, far_ok, arange, stack_depth)
        stack2, top2 = _push(stack2, top2, near, near_ok, arange, stack_depth)
        return stack2, top2, Hit(tri=tri_best, t=t_best, b1=b1_best, b2=b2_best)

    _, _, best = chunked_while(cond, body, (stack, top, hit0), chunk)
    # Report miss t as the original t_max (reference leaves ray.tMax there).
    return best


@functools.partial(
    jax.jit, static_argnames=("stack_depth", "max_leaf_size", "compat", "chunk")
)
def traversal_stats(
    bvh: BVH,
    mesh: TriangleMesh,
    o: jnp.ndarray,
    d: jnp.ndarray,
    t_max: jnp.ndarray,
    *,
    stack_depth: int = 64,
    max_leaf_size: int = 4,
    compat: bool = False,
    chunk: int = 16,
):
    """Instrumented closest-hit: returns (per-ray node visits [R],
    lockstep iterations []).  The gap between mean visits and lockstep
    iterations is the tail-divergence waste of the batched while loop —
    the number the wavefront-compaction optimisation targets."""
    r, arange, inv_d = _prepare(o, d)
    stack = jnp.zeros((r, stack_depth), jnp.int32)
    top = jnp.ones((r,), jnp.int32)
    t_best = jnp.asarray(t_max, jnp.float32)
    visits = jnp.zeros((r,), jnp.int32)
    iters = jnp.zeros((), jnp.int32)

    def cond(state):
        return jnp.any(state[1] > 0)

    def body(state):
        stack, top, t_best, visits, iters = state
        node_id, top, active = _pop(stack, top, arange)
        visits = visits + active.astype(jnp.int32)
        bhit = active & intersect_aabb(
            bvh.node_min[node_id], bvh.node_max[node_id], o, inv_d, t_best,
            compat=compat,
        )
        is_leaf = bvh.right_child[node_id] < 0
        leaf = bhit & is_leaf
        for tri_hit, _, t, _, _ in _leaf_triangles(
            mesh, bvh.start[node_id], bvh.end[node_id], leaf, o, d, t_best,
            max_leaf_size, compat,
        ):
            t_best = jnp.where(tri_hit & (t < t_best), t, t_best)
        internal = bhit & ~is_leaf
        near, far = _children(bvh, node_id, d)
        far_ok = internal & intersect_aabb(
            bvh.node_min[far], bvh.node_max[far], o, inv_d, t_best, compat=compat
        )
        near_ok = internal & intersect_aabb(
            bvh.node_min[near], bvh.node_max[near], o, inv_d, t_best, compat=compat
        )
        stack2, top2 = _push(stack, top, far, far_ok, arange, stack_depth)
        stack2, top2 = _push(stack2, top2, near, near_ok, arange, stack_depth)
        return stack2, top2, t_best, visits, iters + 1

    _, _, _, visits, iters = jax.lax.while_loop(
        cond, body, (stack, top, t_best, visits, iters)
    )
    return visits, iters


@functools.partial(
    jax.jit, static_argnames=("stack_depth", "max_leaf_size", "compat", "chunk")
)
def any_hit(
    bvh: BVH,
    mesh: TriangleMesh,
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
    """Occlusion traversal with per-ray early exit (BVHIntersectP,
    ray_tracing.comp:464-494): a ray's stack is cleared the moment any
    triangle hit is found.  Returns [R] bool.
    mask: optional [R] bool; False rays skip traversal and report False."""
    r, arange, inv_d = _prepare(o, d)
    t_max = jnp.asarray(t_max, jnp.float32)

    stack = jnp.zeros((r, stack_depth), jnp.int32)
    top = jnp.ones((r,), jnp.int32)
    if mask is not None:
        top = jnp.where(mask, top, 0)
    occluded0 = jnp.zeros((r,), bool)

    def cond(state):
        _, top, _ = state
        return jnp.any(top > 0)

    def body(state):
        stack, top, occ = state
        node_id, top, active = _pop(stack, top, arange)
        bhit = active & intersect_aabb(
            bvh.node_min[node_id], bvh.node_max[node_id], o, inv_d, t_max, compat=compat
        )
        is_leaf = bvh.right_child[node_id] < 0

        leaf = bhit & is_leaf
        new_occ = occ
        for win, _, _, _, _ in _leaf_triangles(
            mesh, bvh.start[node_id], bvh.end[node_id], leaf, o, d, t_max,
            max_leaf_size, compat,
        ):
            new_occ = new_occ | win

        internal = bhit & ~is_leaf
        near, far = _children(bvh, node_id, d)
        far_ok = internal & intersect_aabb(
            bvh.node_min[far], bvh.node_max[far], o, inv_d, t_max, compat=compat
        )
        near_ok = internal & intersect_aabb(
            bvh.node_min[near], bvh.node_max[near], o, inv_d, t_max, compat=compat
        )
        stack2, top2 = _push(stack, top, far, far_ok, arange, stack_depth)
        stack2, top2 = _push(stack2, top2, near, near_ok, arange, stack_depth)
        top2 = jnp.where(new_occ, 0, top2)  # early exit
        return stack2, top2, new_occ

    _, _, occluded = chunked_while(cond, body, (stack, top, occluded0), chunk)
    return occluded
