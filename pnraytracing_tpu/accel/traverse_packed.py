"""Gather-minimized batched BVH traversal over the packed layout.

Same algorithm and results as :mod:`pnraytracing_tpu.accel.traverse`, but
every node visit is ONE [.,8] row gather and every triangle test ONE [.,9]
row gather (see :mod:`pnraytracing_tpu.accel.layout`) — roughly 4-6x fewer
dynamic-gather passes per traversal step, the dominant cost on TPU.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pnraytracing_tpu.accel.layout import TravData, unpack_node_rows
from pnraytracing_tpu.accel.loops import chunked_while
from pnraytracing_tpu.ops.intersect import (
    Hit,
    intersect_aabb,
    intersect_triangle,
    safe_inv_dir,
)


def _pop(stack, top, arange):
    active = top > 0
    idx = jnp.maximum(top - 1, 0)
    node_id = jnp.where(active, stack[arange, idx], 0)
    top = jnp.where(active, top - 1, top)
    return node_id, top, active


def _push(stack, top, child, mask, arange, depth):
    idx = jnp.clip(top, 0, depth - 1)
    cur = stack[arange, idx]
    stack = stack.at[arange, idx].set(jnp.where(mask, child, cur))
    top = top + mask.astype(jnp.int32)
    return stack, top


def _leaf_tests(trav, start, count, leaf_mask, o, d, t_best, max_leaf_size, compat):
    for k in range(max_leaf_size):
        ti = start + k
        valid = leaf_mask & (k < count)
        ti_safe = jnp.where(valid, ti, 0)
        rows = trav.tri9[ti_safe]  # [R, 9] — single gather
        hit, t, b1, b2 = intersect_triangle(
            rows[:, 0:3], rows[:, 3:6], rows[:, 6:9], o, d, t_best, compat=compat
        )
        yield hit & valid, ti_safe, t, b1, b2


def _children_of(rows, node_id, d):
    _, _, right, _, _, axis = unpack_node_rows(rows)
    left = node_id + 1
    d_ax = jnp.take_along_axis(d, axis[:, None], axis=-1)[:, 0]
    neg = d_ax < 0
    near = jnp.where(neg, right, left)
    far = jnp.where(neg, left, right)
    return near, far


def _closest_hit_flat(
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
    arange = jnp.arange(r, dtype=jnp.int32)
    inv_d = safe_inv_dir(d)

    stack = jnp.zeros((r, stack_depth), jnp.int32)
    top = jnp.ones((r,), jnp.int32)
    if mask is not None:
        top = jnp.where(mask, top, 0)
    hit0 = Hit(
        tri=jnp.full((r,), -1, jnp.int32),
        t=jnp.asarray(t_max, jnp.float32),
        b1=jnp.zeros((r,), jnp.float32),
        b2=jnp.zeros((r,), jnp.float32),
    )

    def cond(state):
        return jnp.any(state[1] > 0)

    def body(state):
        stack, top, best = state
        node_id, top, active = _pop(stack, top, arange)
        rows = trav.nodes8[node_id]  # [R, 8] — single gather
        nmin, nmax, right, start, count, _ = unpack_node_rows(rows)
        bhit = active & intersect_aabb(nmin, nmax, o, inv_d, best.t, compat=compat)
        is_leaf = right < 0

        leaf = bhit & is_leaf
        t_best, tri_best = best.t, best.tri
        b1_best, b2_best = best.b1, best.b2
        for tri_hit, ti, t, b1, b2 in _leaf_tests(
            trav, start, count, leaf, o, d, t_best, max_leaf_size, compat
        ):
            win = tri_hit & (t < t_best)
            t_best = jnp.where(win, t, t_best)
            tri_best = jnp.where(win, ti, tri_best)
            b1_best = jnp.where(win, b1, b1_best)
            b2_best = jnp.where(win, b2, b2_best)

        internal = bhit & ~is_leaf
        near, far = _children_of(rows, node_id, d)
        frows = trav.nodes8[far]
        nrows = trav.nodes8[near]
        fmin, fmax, *_ = unpack_node_rows(frows)
        nmin2, nmax2, *_ = unpack_node_rows(nrows)
        far_ok = internal & intersect_aabb(fmin, fmax, o, inv_d, t_best, compat=compat)
        near_ok = internal & intersect_aabb(
            nmin2, nmax2, o, inv_d, t_best, compat=compat
        )
        stack2, top2 = _push(stack, top, far, far_ok, arange, stack_depth)
        stack2, top2 = _push(stack2, top2, near, near_ok, arange, stack_depth)
        return stack2, top2, Hit(tri=tri_best, t=t_best, b1=b1_best, b2=b2_best)

    _, _, best = chunked_while(cond, body, (stack, top, hit0), chunk)
    return best


def _any_hit_flat(
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
    arange = jnp.arange(r, dtype=jnp.int32)
    inv_d = safe_inv_dir(d)
    t_max = jnp.asarray(t_max, jnp.float32)

    stack = jnp.zeros((r, stack_depth), jnp.int32)
    top = jnp.ones((r,), jnp.int32)
    if mask is not None:
        top = jnp.where(mask, top, 0)
    occ0 = jnp.zeros((r,), bool)

    def cond(state):
        return jnp.any(state[1] > 0)

    def body(state):
        stack, top, occ = state
        node_id, top, active = _pop(stack, top, arange)
        rows = trav.nodes8[node_id]
        nmin, nmax, right, start, count, _ = unpack_node_rows(rows)
        bhit = active & intersect_aabb(nmin, nmax, o, inv_d, t_max, compat=compat)
        is_leaf = right < 0

        leaf = bhit & is_leaf
        new_occ = occ
        for tri_hit, *_ in _leaf_tests(
            trav, start, count, leaf, o, d, t_max, max_leaf_size, compat
        ):
            new_occ = new_occ | tri_hit

        internal = bhit & ~is_leaf
        near, far = _children_of(rows, node_id, d)
        frows = trav.nodes8[far]
        nrows = trav.nodes8[near]
        fmin, fmax, *_ = unpack_node_rows(frows)
        nmin2, nmax2, *_ = unpack_node_rows(nrows)
        far_ok = internal & intersect_aabb(fmin, fmax, o, inv_d, t_max, compat=compat)
        near_ok = internal & intersect_aabb(
            nmin2, nmax2, o, inv_d, t_max, compat=compat
        )
        stack2, top2 = _push(stack, top, far, far_ok, arange, stack_depth)
        stack2, top2 = _push(stack2, top2, near, near_ok, arange, stack_depth)
        top2 = jnp.where(new_occ, 0, top2)
        return stack2, top2, new_occ

    _, _, occ = chunked_while(cond, body, (stack, top, occ0), chunk)
    return occ


def _closest_hit_flat_pop(
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
    """Pop-test variant: each node's AABB is tested when it is POPPED, and
    children of passing internal nodes are pushed untested.  Versus the
    push-test loop (`_closest_hit_flat`): ~2x pops but ONE [.,8] row gather
    per pop instead of three (~33% fewer gathered rows — the dominant TPU
    cost), and the test uses the tighter ``t_best`` available at pop time."""
    r = o.shape[0]
    arange = jnp.arange(r, dtype=jnp.int32)
    inv_d = safe_inv_dir(d)

    stack = jnp.zeros((r, stack_depth), jnp.int32)
    top = jnp.ones((r,), jnp.int32)
    if mask is not None:
        top = jnp.where(mask, top, 0)
    hit0 = Hit(
        tri=jnp.full((r,), -1, jnp.int32),
        t=jnp.asarray(t_max, jnp.float32),
        b1=jnp.zeros((r,), jnp.float32),
        b2=jnp.zeros((r,), jnp.float32),
    )

    def cond(state):
        return jnp.any(state[1] > 0)

    def body(state):
        stack, top, best = state
        node_id, top, active = _pop(stack, top, arange)
        rows = trav.nodes8[node_id]  # the ONLY gather this iteration
        nmin, nmax, right, start, count, axis = unpack_node_rows(rows)
        bhit = active & intersect_aabb(nmin, nmax, o, inv_d, best.t, compat=compat)
        is_leaf = right < 0

        leaf = bhit & is_leaf
        t_best, tri_best = best.t, best.tri
        b1_best, b2_best = best.b1, best.b2
        for tri_hit, ti, t, b1, b2 in _leaf_tests(
            trav, start, count, leaf, o, d, t_best, max_leaf_size, compat
        ):
            win = tri_hit & (t < t_best)
            t_best = jnp.where(win, t, t_best)
            tri_best = jnp.where(win, ti, tri_best)
            b1_best = jnp.where(win, b1, b1_best)
            b2_best = jnp.where(win, b2, b2_best)

        internal = bhit & ~is_leaf
        left = node_id + 1
        d_ax = jnp.take_along_axis(d, axis[:, None], axis=-1)[:, 0]
        neg = d_ax < 0
        near = jnp.where(neg, right, left)
        far = jnp.where(neg, left, right)
        stack2, top2 = _push(stack, top, far, internal, arange, stack_depth)
        stack2, top2 = _push(stack2, top2, near, internal, arange, stack_depth)
        return stack2, top2, Hit(tri=tri_best, t=t_best, b1=b1_best, b2=b2_best)

    _, _, best = chunked_while(cond, body, (stack, top, hit0), chunk)
    return best


def _any_hit_flat_pop(
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
    arange = jnp.arange(r, dtype=jnp.int32)
    inv_d = safe_inv_dir(d)
    t_max = jnp.asarray(t_max, jnp.float32)

    stack = jnp.zeros((r, stack_depth), jnp.int32)
    top = jnp.ones((r,), jnp.int32)
    if mask is not None:
        top = jnp.where(mask, top, 0)
    occ0 = jnp.zeros((r,), bool)

    def cond(state):
        return jnp.any(state[1] > 0)

    def body(state):
        stack, top, occ = state
        node_id, top, active = _pop(stack, top, arange)
        rows = trav.nodes8[node_id]
        nmin, nmax, right, start, count, axis = unpack_node_rows(rows)
        bhit = active & intersect_aabb(nmin, nmax, o, inv_d, t_max, compat=compat)
        is_leaf = right < 0

        leaf = bhit & is_leaf
        new_occ = occ
        for tri_hit, *_ in _leaf_tests(
            trav, start, count, leaf, o, d, t_max, max_leaf_size, compat
        ):
            new_occ = new_occ | tri_hit

        internal = bhit & ~is_leaf
        left = node_id + 1
        stack2, top2 = _push(stack, top, right, internal, arange, stack_depth)
        stack2, top2 = _push(stack2, top2, left, internal, arange, stack_depth)
        top2 = jnp.where(new_occ, 0, top2)
        return stack2, top2, new_occ

    _, _, occ = chunked_while(cond, body, (stack, top, occ0), chunk)
    return occ


def _tiled(flat_fn, zero_like):
    """Build a tiled traversal wrapper.

    Lockstep batched traversal runs until the SLOWEST ray in the batch
    drains its stack — measured ~5-6x more iterations than the mean ray
    needs on the flagship scene.  Splitting the batch into tiles and
    running the while loop per tile under ``lax.map`` lets each tile exit
    at its own local maximum; screen-space tiles are coherent, so most
    tiles finish early.
    """

    def tiled(
        trav, o, d, t_max, mask=None, *,
        stack_depth=64, max_leaf_size=4, compat=False, tile_size=None,
        chunk=16,
    ):
        r = o.shape[0]
        kw = dict(stack_depth=stack_depth, max_leaf_size=max_leaf_size,
                  compat=compat, chunk=chunk)
        if tile_size is None or r <= tile_size:
            return flat_fn(trav, o, d, t_max, mask, **kw)
        pad = (-r) % tile_size
        if pad:
            o = jnp.pad(o, ((0, pad), (0, 0)))
            d = jnp.pad(d, ((0, pad), (0, 0)), constant_values=1.0)
            t_max = jnp.pad(jnp.asarray(t_max, jnp.float32), (0, pad))
            mask_full = (
                jnp.pad(mask, (0, pad)) if mask is not None
                else jnp.pad(jnp.ones((r,), bool), (0, pad))
            )
        else:
            mask_full = mask if mask is not None else jnp.ones((r,), bool)
        n_tiles = (r + pad) // tile_size

        def per_tile(args):
            o_t, d_t, tm_t, m_t = args
            return flat_fn(trav, o_t, d_t, tm_t, m_t, **kw)

        out = jax.lax.map(
            per_tile,
            (
                o.reshape(n_tiles, tile_size, 3),
                d.reshape(n_tiles, tile_size, 3),
                t_max.reshape(n_tiles, tile_size),
                mask_full.reshape(n_tiles, tile_size),
            ),
        )
        flat = jax.tree_util.tree_map(
            lambda a: a.reshape((n_tiles * tile_size,) + a.shape[2:])[:r], out
        )
        return flat

    return tiled


closest_hit_packed = jax.jit(
    _tiled(_closest_hit_flat, None),
    static_argnames=("stack_depth", "max_leaf_size", "compat", "tile_size", "chunk"),
)
any_hit_packed = jax.jit(
    _tiled(_any_hit_flat, None),
    static_argnames=("stack_depth", "max_leaf_size", "compat", "tile_size", "chunk"),
)
closest_hit_pop = jax.jit(
    _tiled(_closest_hit_flat_pop, None),
    static_argnames=("stack_depth", "max_leaf_size", "compat", "tile_size", "chunk"),
)
any_hit_pop = jax.jit(
    _tiled(_any_hit_flat_pop, None),
    static_argnames=("stack_depth", "max_leaf_size", "compat", "tile_size", "chunk"),
)
