"""Wide-node BVH traversal: one gather per iteration, internal nodes only.

Third traversal backend (same results as :mod:`.traverse` /
:mod:`.traverse_packed`, same flat SAH tree — BVH.hpp:92-173).  Two changes
motivated by how batched gathers cost on TPU, where every *gather pass*
over the ray batch pays full dynamic-gather latency regardless of masks:

* **Inlined child AABBs.**  Each `[N, 16]` row stores BOTH children's
  bounds plus encoded child infos (``accel/layout.py::pack_wide_nodes``),
  so one row gather per iteration replaces the packed layout's three
  (self + two children), and the loop pops internal nodes only — leaf
  AABB tests and triangle tests resolve inline at the parent.
* **Single-pass leaf tests.**  Both children's candidate triangles are
  gathered with ONE batched ``tri9[[R, 2L]]`` gather and intersected
  vectorized, instead of L sequential row-gather passes.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pnraytracing_tpu.accel.layout import (
    TravData,
    decode_leaf_info,
    unpack_wide_rows,
)
from pnraytracing_tpu.accel.traverse_packed import _pop, _push, _tiled
from pnraytracing_tpu.accel.loops import chunked_while
from pnraytracing_tpu.ops.intersect import (
    Hit,
    intersect_aabb,
    intersect_triangle,
    safe_inv_dir,
)


def _visit(trav, state_best_t, node_id, active, o, d, inv_d, L, compat):
    """Shared per-iteration work: unpack the popped row, AABB-test both
    children, run the combined leaf-triangle pass.  Returns everything the
    closest/any-hit bodies need."""
    rows = trav.nodes16[node_id]  # [R, 16] — the ONE node gather
    lmin, lmax, rmin, rmax, li, ri, axis = unpack_wide_rows(rows)
    l_ok = active & intersect_aabb(lmin, lmax, o, inv_d, state_best_t, compat=compat)
    r_ok = active & intersect_aabb(rmin, rmax, o, inv_d, state_best_t, compat=compat)
    l_leaf = li < 0
    r_leaf = ri < 0

    ls, lc = decode_leaf_info(li)
    rs, rc = decode_leaf_info(ri)
    ks = jnp.arange(L, dtype=jnp.int32)[None, :]
    lt_valid = (l_ok & l_leaf)[:, None] & (ks < lc[:, None])
    rt_valid = (r_ok & r_leaf)[:, None] & (ks < rc[:, None])
    ti = jnp.concatenate([ls[:, None] + ks, rs[:, None] + ks], axis=1)  # [R, 2L]
    valid = jnp.concatenate([lt_valid, rt_valid], axis=1)
    ti_safe = jnp.where(valid, ti, 0)
    rows9 = trav.tri9[ti_safe]  # [R, 2L, 9] — the ONE triangle gather
    hit, t, b1, b2 = intersect_triangle(
        rows9[..., 0:3],
        rows9[..., 3:6],
        rows9[..., 6:9],
        o[:, None, :],
        d[:, None, :],
        state_best_t[:, None],
        compat=compat,
    )
    hit = hit & valid
    push_l = l_ok & ~l_leaf
    push_r = r_ok & ~r_leaf
    d_ax = jnp.take_along_axis(d, axis[:, None], axis=-1)[:, 0]
    neg = d_ax < 0
    near_id = jnp.where(neg, ri, li)
    far_id = jnp.where(neg, li, ri)
    near_push = jnp.where(neg, push_r, push_l)
    far_push = jnp.where(neg, push_l, push_r)
    # ids may be negative leaf encodings when not pushed; clamp for safety
    near_id = jnp.maximum(near_id, 0)
    far_id = jnp.maximum(far_id, 0)
    return hit, ti_safe, t, b1, b2, near_id, far_id, near_push, far_push


def _closest_hit_wide(
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
        hit, ti_safe, t, b1, b2, near_id, far_id, near_push, far_push = _visit(
            trav, best.t, node_id, active, o, d, inv_d, max_leaf_size, compat
        )
        tm = jnp.where(hit, t, jnp.inf)
        j = jnp.argmin(tm, axis=1)
        t_j = tm[arange, j]
        win = hit[arange, j] & (t_j < best.t)
        best = Hit(
            tri=jnp.where(win, ti_safe[arange, j], best.tri),
            t=jnp.where(win, t_j, best.t),
            b1=jnp.where(win, b1[arange, j], best.b1),
            b2=jnp.where(win, b2[arange, j], best.b2),
        )
        stack2, top2 = _push(stack, top, far_id, far_push, arange, stack_depth)
        stack2, top2 = _push(stack2, top2, near_id, near_push, arange, stack_depth)
        return stack2, top2, best

    _, _, best = chunked_while(cond, body, (stack, top, hit0), chunk)
    return best


def _any_hit_wide(
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
        hit, *_rest = _visit(
            trav, t_max, node_id, active, o, d, inv_d, max_leaf_size, compat
        )
        _, _, _, _, near_id, far_id, near_push, far_push = _rest
        new_occ = occ | jnp.any(hit, axis=1)
        stack2, top2 = _push(stack, top, far_id, far_push, arange, stack_depth)
        stack2, top2 = _push(stack2, top2, near_id, near_push, arange, stack_depth)
        top2 = jnp.where(new_occ, 0, top2)
        return stack2, top2, new_occ

    _, _, occ = chunked_while(cond, body, (stack, top, occ0), chunk)
    return occ


closest_hit_wide = jax.jit(
    _tiled(_closest_hit_wide, None),
    static_argnames=("stack_depth", "max_leaf_size", "compat", "tile_size", "chunk"),
)
any_hit_wide = jax.jit(
    _tiled(_any_hit_wide, None),
    static_argnames=("stack_depth", "max_leaf_size", "compat", "tile_size", "chunk"),
)
