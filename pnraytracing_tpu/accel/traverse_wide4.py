"""Collect-then-test traversal over the 4-wide layout (see accel/wide4.py).

Phase 1 (chunked while): pop one 4-wide node id per ray, gather its ONE
[., 32] row, box-test all 4 children, push internal children (one 4-slot
scatter), append leaf children to a fixed per-ray buffer (one 4-slot
scatter).  Phase 2 (static fori): for each buffer slot, gather ONE
[., 40] leaf row and test its 4 pre-gathered triangles.

Row economy per phase-1 iteration: 1 gather + 1 stack-read + 2 scatters
(vs 5-7 row passes in the binary backends), and the 4-wide tree halves
the iteration count.  Phase 2 adds `leaf_buffer` passes.  Buffer
overflow is tracked per ray; overflowing rays (rare) are re-walked with
the exact binary pop backend and merged.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pnraytracing_tpu.accel.loops import chunked_while
from pnraytracing_tpu.ops.intersect import (
    Hit,
    intersect_aabb,
    intersect_triangle,
    safe_inv_dir,
)


def _children_boxes(rows, width: int):
    """[R, row] -> (mins [R, W, 3], maxs [R, W, 3], enc [R, W] i32)."""
    boxes = rows[:, : 6 * width].reshape(-1, width, 6)
    enc = rows[:, 6 * width: 7 * width].astype(jnp.int32)
    return boxes[..., 0:3], boxes[..., 3:6], enc


def _phase1_collect(
    nodes32, o, d, t_cap, active0, *, width, stack_depth, leaf_buffer, chunk
):
    """Walk internal topology; return (leaf_buf [R, B] i32 leaf ids
    (-1 empty), overflow [R] bool)."""
    r = o.shape[0]
    arange = jnp.arange(r, dtype=jnp.int32)
    inv_d = safe_inv_dir(d)
    stack = jnp.zeros((r, stack_depth), jnp.int32)  # 4-wide node ids
    top = jnp.where(active0, 1, 0).astype(jnp.int32)
    leaf_buf = jnp.full((r, leaf_buffer), -1, jnp.int32)
    leaf_cnt = jnp.zeros((r,), jnp.int32)
    overflow = jnp.zeros((r,), bool)

    def cond(st):
        return jnp.any(st[1] > 0)

    def body(st):
        stack, top, leaf_buf, leaf_cnt, overflow = st
        live = top > 0
        idx = jnp.maximum(top - 1, 0)
        node = jnp.where(live, stack[arange, idx], 0)
        top = jnp.where(live, top - 1, top)

        rows = nodes32[node]  # [R, row] — the iteration's one gather
        mins, maxs, enc = _children_boxes(rows, width)
        hitk = jnp.stack(
            [
                intersect_aabb(mins[:, k], maxs[:, k], o, inv_d, t_cap)
                for k in range(width)
            ],
            axis=1,
        )  # [R, W]
        occupied = enc != 0
        passk = hitk & occupied & live[:, None]
        is_leaf = (enc % 2) == 1

        # ---- push internal children: compact them to the row's prefix
        # with a stable 4-element ranking, then ONE 4-slot scatter
        int_pass = passk & ~is_leaf
        int_ids = enc // 2 - 1
        rank = jnp.cumsum(int_pass.astype(jnp.int32), axis=1) - 1  # [R, 4]
        n_int = int_pass.sum(axis=1)
        # one 4-slot scatter: non-passing children aim out of bounds and
        # are dropped — no read-modify-write gather needed
        col = jnp.where(int_pass, top[:, None] + rank, stack_depth + 7)
        stack = stack.at[arange[:, None], col].set(int_ids, mode="drop")
        top = jnp.minimum(top + n_int, stack_depth)

        # ---- append leaf children to the buffer (same compaction)
        leaf_pass = passk & is_leaf
        leaf_ids = (enc - 1) // 2
        lrank = jnp.cumsum(leaf_pass.astype(jnp.int32), axis=1) - 1
        n_leaf = leaf_pass.sum(axis=1)
        lcol = leaf_cnt[:, None] + lrank
        will_overflow = leaf_pass & (lcol >= leaf_buffer)
        lcol_w = jnp.where(leaf_pass & ~will_overflow, lcol,
                           leaf_buffer + 7)
        leaf_buf = leaf_buf.at[arange[:, None], lcol_w].set(
            leaf_ids, mode="drop"
        )
        leaf_cnt = jnp.minimum(leaf_cnt + n_leaf, leaf_buffer)
        overflow = overflow | jnp.any(will_overflow, axis=1)
        return stack, top, leaf_buf, leaf_cnt, overflow

    _, _, leaf_buf, _, overflow = chunked_while(
        cond, body, (stack, top, leaf_buf, leaf_cnt, overflow), chunk
    )
    return leaf_buf, overflow


def _phase2_closest(leaf40, leaf_buf, o, d, t_max, max_leaf_size, compat):
    r = o.shape[0]
    nl9 = 9 * max_leaf_size
    best0 = Hit(
        tri=jnp.full((r,), -1, jnp.int32),
        t=jnp.asarray(t_max, jnp.float32),
        b1=jnp.zeros((r,), jnp.float32),
        b2=jnp.zeros((r,), jnp.float32),
    )
    b = leaf_buf.shape[1]

    def slot(i, best):
        lid = jax.lax.dynamic_index_in_dim(leaf_buf, i, axis=1,
                                           keepdims=False)
        valid_leaf = lid >= 0
        rows = leaf40[jnp.maximum(lid, 0)]  # [R, 40] — one gather
        t_best, tri_best = best.t, best.tri
        b1_best, b2_best = best.b1, best.b2
        for k in range(max_leaf_size):
            p = rows[:, 9 * k:9 * k + 9]
            tid = rows[:, nl9 + k].astype(jnp.int32)
            hit, t, b1, b2 = intersect_triangle(
                p[:, 0:3], p[:, 3:6], p[:, 6:9], o, d, t_best, compat=compat
            )
            win = valid_leaf & (tid >= 0) & hit & (t < t_best)
            t_best = jnp.where(win, t, t_best)
            tri_best = jnp.where(win, tid, tri_best)
            b1_best = jnp.where(win, b1, b1_best)
            b2_best = jnp.where(win, b2, b2_best)
        return Hit(tri=tri_best, t=t_best, b1=b1_best, b2=b2_best)

    return jax.lax.fori_loop(0, b, slot, best0)


def _phase2_any(leaf40, leaf_buf, o, d, t_max, max_leaf_size, compat):
    nl9 = 9 * max_leaf_size
    b = leaf_buf.shape[1]
    occ0 = jnp.zeros((o.shape[0],), bool)

    def slot(i, occ):
        lid = jax.lax.dynamic_index_in_dim(leaf_buf, i, axis=1,
                                           keepdims=False)
        valid_leaf = lid >= 0
        rows = leaf40[jnp.maximum(lid, 0)]
        for k in range(max_leaf_size):
            p = rows[:, 9 * k:9 * k + 9]
            tid = rows[:, nl9 + k].astype(jnp.int32)
            hit, _, _, _ = intersect_triangle(
                p[:, 0:3], p[:, 3:6], p[:, 6:9], o, d, t_max, compat=compat
            )
            occ = occ | (valid_leaf & (tid >= 0) & hit)
        return occ

    return jax.lax.fori_loop(0, b, slot, occ0)


def closest_hit_wide4(
    w4,
    o, d, t_max,
    mask=None,
    *,
    stack_depth: int = 24,
    max_leaf_size: int = 4,
    compat: bool = False,
    leaf_buffer: int = 32,
    chunk: int = 8,
    fallback=None,
):
    """w4: object with .nodes32 [N4,32] and .leaf40 [NL,40] jnp arrays.
    ``fallback(o, d, t_max, mask)`` handles buffer-overflow rays (exact
    binary walk); None asserts none overflow (tests)."""
    t_max = jnp.asarray(t_max, jnp.float32)
    active0 = jnp.ones(o.shape[:1], bool) if mask is None else mask
    leaf_buf, overflow = _phase1_collect(
        w4.nodes32, o, d, t_max, active0, width=w4.width,
        stack_depth=stack_depth, leaf_buffer=leaf_buffer, chunk=chunk,
    )
    best = _phase2_closest(w4.leaf40, leaf_buf, o, d, t_max,
                           max_leaf_size, compat)
    if fallback is not None:
        redo = overflow & active0

        def do_fallback(_):
            fb = fallback(o, d, t_max, redo)
            return Hit(
                tri=jnp.where(redo, fb.tri, best.tri),
                t=jnp.where(redo, fb.t, best.t),
                b1=jnp.where(redo, fb.b1, best.b1),
                b2=jnp.where(redo, fb.b2, best.b2),
            )

        best = jax.lax.cond(jnp.any(redo), do_fallback, lambda _: best,
                            operand=None)
    return best, overflow


def any_hit_wide4(
    w4,
    o, d, t_max,
    mask=None,
    *,
    stack_depth: int = 24,
    max_leaf_size: int = 4,
    compat: bool = False,
    leaf_buffer: int = 32,
    chunk: int = 8,
    fallback=None,
):
    t_max = jnp.asarray(t_max, jnp.float32)
    active0 = jnp.ones(o.shape[:1], bool) if mask is None else mask
    leaf_buf, overflow = _phase1_collect(
        w4.nodes32, o, d, t_max, active0, width=w4.width,
        stack_depth=stack_depth, leaf_buffer=leaf_buffer, chunk=chunk,
    )
    occ = _phase2_any(w4.leaf40, leaf_buf, o, d, t_max, max_leaf_size,
                      compat)
    occ = occ & active0
    if fallback is not None:
        redo = overflow & active0 & ~occ

        def do_fallback(_):
            fb = fallback(o, d, t_max, redo)
            return occ | (redo & fb)

        occ = jax.lax.cond(jnp.any(redo), do_fallback, lambda _: occ,
                           operand=None)
    return occ, overflow
