"""Treelet ("brick") decomposition of the flat BVH for the streaming
Mosaic traversal (accel/traverse_stream.py) — the device path for scenes
larger than the ~1 MB SMEM-resident kernel budget.

The reference streams BVH nodes/triangles from arbitrarily large texel
buffers per fetch (main.cpp:485-507 uploads any size;
shaders/ray_tracing.comp:429-461 fetches per node).  The TPU analogue
cannot gather per lane, so instead the tree is cut into *bricks*:
maximal subtrees whose packed bytes fit a brick budget.  The small tree
ABOVE the cuts ("top tree") stays SMEM-resident; each brick is a
self-contained [W]-word blob in HBM that a ray tile DMAs into SMEM on
demand (double-buffered), then walks exactly like the resident kernel.

Flat-layout facts used (BVH.hpp:6-12 contract, accel/bvh.py):
* depth-first ids, left child = id+1, so a subtree is the contiguous id
  range [i, subtree_end(i));
* triangles are partitioned in build order, so a subtree's leaves cover
  the contiguous triangle range [tri_lo(i), tri_hi(i)).

Brick blob layout (f32 words, exact-small-int encoded like layout.py;
all ids exact below 2**24 — build_stream_data asserts n_tris < 2**24 so
the f32 ``tri_base + ti`` hit ids can never silently round):
  [0] tris_off  — word offset of the triangle section (= 4 + 16*n_rows)
  [1] tri_base  — global id of the brick's first triangle
  [2] n_rows    — local wide node rows (debug/bounds)
  [3] n_tris
  [4 : tris_off]            — wide rows (local ids; leaf info encodes
                              LOCAL start: -(local_start*16+count)-1)
  [tris_off : +9*n_tris]    — tri9 rows of the brick's triangles

Top-tree wide rows: identical wide encoding, except a negative child
info means "brick ref": info = -(brick_id)-1 (the top tree has NO real
leaves — every cut subtree, however small, becomes a brick).
"""

from __future__ import annotations

import numpy as np
from flax import struct

import jax.numpy as jnp

_COUNT_BASE = 16
_AXIS_BASE = 4

BRICK_HEADER_WORDS = 4


@struct.dataclass
class StreamData:
    """Host-built streaming scene (bricks in HBM, top tree for SMEM)."""

    top16: jnp.ndarray  # [Nt, 16] f32 wide rows of the top tree
    bricks: jnp.ndarray  # [B, W] f32 brick blobs (uniform padded width)
    brick_words: int = struct.field(pytree_node=False, default=0)
    n_bricks: int = struct.field(pytree_node=False, default=0)
    n_top_rows: int = struct.field(pytree_node=False, default=0)
    # max wide-walk stack depth needed inside any single brick
    brick_stack: int = struct.field(pytree_node=False, default=32)
    # total triangle count (for clamping)
    n_tris: int = struct.field(pytree_node=False, default=0)


def _subtree_extents(right_child: np.ndarray, start: np.ndarray,
                     end: np.ndarray):
    """Per-node (id_end, tri_lo, tri_hi) via one reverse pass (children
    have larger ids than their parent in the depth-first layout)."""
    n = len(right_child)
    id_end = np.empty(n, np.int64)
    tri_lo = np.empty(n, np.int64)
    tri_hi = np.empty(n, np.int64)
    for i in range(n - 1, -1, -1):
        r = right_child[i]
        if r < 0:  # leaf
            id_end[i] = i + 1
            tri_lo[i] = start[i]
            tri_hi[i] = end[i]
        else:
            id_end[i] = id_end[r]
            tri_lo[i] = tri_lo[i + 1]
            tri_hi[i] = tri_hi[r]
    return id_end, tri_lo, tri_hi


def _node_bytes(n_nodes: int, n_tris: int) -> int:
    return 4 * (BRICK_HEADER_WORDS + 16 * n_nodes + 9 * n_tris)


def treelet_cut_aabbs(bvh, n_target: int = 256, cap: int = 512
                      ) -> np.ndarray:
    """[K, 6] f32 treelet AABBs (lo.xyz, hi.xyz) from a node-count
    top-down cut of the flat BVH — the binning table for the
    ray-coherence sort (ops/compaction.py::treelet_entry_key).

    Bounce rays sorted by "nearest treelet my ray enters" put rays that
    will walk the same subtree into the same traversal tile, which is
    what bounds the shared-stack packet kernel's per-tile node union
    (round-5 sweep, scripts/sort_exp.py: 2.2-2.5x over the Morton
    position key on realistic bounce rays, plateauing at ~n/256-node
    treelets).  ``cap`` bounds K so the in-graph unrolled entry tests
    stay cheap; the cut is re-run coarser until it fits."""
    right = np.asarray(bvh.right_child, np.int64)
    node_min = np.asarray(bvh.node_min, np.float32)
    node_max = np.asarray(bvh.node_max, np.float32)
    n = len(right)
    id_end = np.empty(n, np.int64)
    for i in range(n - 1, -1, -1):
        id_end[i] = i + 1 if right[i] < 0 else id_end[right[i]]
    max_nodes = max(n // n_target, 1)
    while True:
        roots = []
        stack = [0]
        while stack:
            i = stack.pop()
            if id_end[i] - i <= max_nodes or right[i] < 0:
                roots.append(i)
                continue
            stack.append(int(right[i]))
            stack.append(i + 1)
        if len(roots) <= cap or max_nodes >= n:
            break
        max_nodes *= 2
    roots = np.array(sorted(roots))
    return np.concatenate([node_min[roots], node_max[roots]],
                          axis=1).astype(np.float32)


def build_stream_data(bvh, mesh, brick_budget_bytes: int = 256 << 10,
                      ) -> StreamData:
    """Cut the tree into maximal <=budget subtrees and pack blobs.

    ``bvh``/``mesh`` are the host-side flat BVH and triangle mesh (jnp or
    numpy arrays; pulled to numpy here — this runs once at scene build,
    like the reference's CPU-side buffer packing, main.cpp:485-507)."""
    node_min = np.asarray(bvh.node_min, np.float32)
    node_max = np.asarray(bvh.node_max, np.float32)
    axis = np.asarray(bvh.axis, np.int64)
    right = np.asarray(bvh.right_child, np.int64)
    start = np.asarray(bvh.start, np.int64)
    end = np.asarray(bvh.end, np.int64)
    pos = np.asarray(mesh.positions, np.float32)
    idxs = np.asarray(mesh.indices, np.int64)
    tri9_all = pos[idxs].reshape(len(idxs), 9).astype(np.float32)

    n = len(right)
    id_end, tri_lo, tri_hi = _subtree_extents(right, start, end)
    sub_bytes = _node_bytes(id_end - np.arange(n), tri_hi - tri_lo)

    if sub_bytes[0] <= brick_budget_bytes:
        raise ValueError(
            "scene fits a single brick — use the SMEM-resident kernel "
            "(traverse_pallas) instead of the streaming one"
        )

    # --- top-down cut: descend while the subtree exceeds the budget ----
    cut_of_node = np.full(n, -1, np.int64)  # node id -> brick id
    brick_roots: list[int] = []
    top_nodes: list[int] = []
    top_depth = 0  # max DFS depth of the TOP tree (phase-1 stack sizing)
    stack = [(0, 1)]
    while stack:
        i, dep = stack.pop()
        top_depth = max(top_depth, dep)
        if sub_bytes[i] <= brick_budget_bytes:
            cut_of_node[i] = len(brick_roots)
            brick_roots.append(i)
            continue
        # over budget -> internal (a leaf is <= 15 tris, always fits)
        assert right[i] >= 0, "over-budget leaf cannot happen"
        top_nodes.append(i)
        stack.append((int(right[i]), dep + 1))
        stack.append((i + 1, dep + 1))

    top_nodes.sort()
    top_local = {g: l for l, g in enumerate(top_nodes)}

    # --- pack the top tree (wide rows; negative info = brick ref) ------
    def child_info_top(c: int) -> int:
        b = cut_of_node[c]
        if b >= 0:
            return -int(b) - 1
        return top_local[c]

    nt = len(top_nodes)
    top16 = np.zeros((nt, 16), np.float32)
    for l, g in enumerate(top_nodes):
        lc, rc = g + 1, int(right[g])
        top16[l, 0:3] = node_min[lc]
        top16[l, 3:6] = node_max[lc]
        top16[l, 6:9] = node_min[rc]
        top16[l, 9:12] = node_max[rc]
        top16[l, 12] = float(child_info_top(lc))
        top16[l, 13] = float(child_info_top(rc))
        top16[l, 14] = float(max(axis[g], 0))

    # --- pack bricks ----------------------------------------------------
    blobs = []
    max_words = 0
    max_depth = 0
    for b_root in brick_roots:
        lo_id, hi_id = b_root, int(id_end[b_root])
        t_lo, t_hi = int(tri_lo[b_root]), int(tri_hi[b_root])
        n_rows = hi_id - lo_id
        n_tris = t_hi - t_lo
        rows = np.zeros((n_rows, 16), np.float32)
        depth = _pack_brick_rows(
            rows, b_root, lo_id, t_lo, node_min, node_max, axis, right,
            start, end,
        )
        max_depth = max(max_depth, depth)
        tris_off = BRICK_HEADER_WORDS + 16 * n_rows
        words = tris_off + 9 * n_tris
        blob = np.zeros(words, np.float32)
        blob[0] = float(tris_off)
        blob[1] = float(t_lo)
        blob[2] = float(n_rows)
        blob[3] = float(n_tris)
        blob[BRICK_HEADER_WORDS:tris_off] = rows.reshape(-1)
        blob[tris_off:words] = tri9_all[t_lo:t_hi].reshape(-1)
        blobs.append(blob)
        max_words = max(max_words, words)

    # pad to a uniform DMA-friendly width (multiple of 128 words)
    max_words = ((max_words + 127) // 128) * 128
    bricks = np.zeros((len(blobs), max_words), np.float32)
    for i, blob in enumerate(blobs):
        bricks[i, : len(blob)] = blob

    # The kernel's ONE stack scratch serves both the phase-1 top-tree
    # walk and the per-brick wide walks, so size it for whichever is
    # deeper (a big SAH-unbalanced scene's top tree can be far deeper
    # than any brick's internal depth — sizing by brick depth alone
    # silently overflowed into adjacent SMEM).
    assert len(idxs) < (1 << 24), (
        f"{len(idxs)} triangles: brick tri ids are exact-small-int f32 "
        "words, exact only below 2**24 — split the scene or widen the id "
        "encoding before streaming it"
    )
    return StreamData(
        top16=jnp.asarray(top16),
        bricks=jnp.asarray(bricks),
        brick_words=int(max_words),
        n_bricks=len(blobs),
        n_top_rows=nt,
        brick_stack=int(max(max_depth, top_depth + 1) + 4),
        n_tris=len(idxs),
    )


def _pack_brick_rows(rows, b_root, lo_id, t_lo, node_min, node_max, axis,
                     right, start, end) -> int:
    """Wide rows for the subtree rooted at b_root, ids/tris re-based to
    the brick.  Returns the subtree's internal depth (stack sizing).
    Row l corresponds to global node lo_id + l; leaf rows are dummies
    (never visited — parents resolve leaves inline, layout.py
    pack_wide_nodes semantics).  A brick whose ROOT is a leaf gets the
    synthetic row-0 treatment (left = the leaf itself, right = empty)."""

    def leaf_info_local(c: int) -> int:
        meta = (start[c] - t_lo) * _COUNT_BASE + min(
            end[c] - start[c], _COUNT_BASE - 1
        )
        return -int(meta) - 1

    def child_info(c: int) -> int:
        if right[c] < 0:
            return leaf_info_local(c)
        return c - lo_id

    if right[b_root] < 0:
        # leaf root: synthetic row 0
        rows[0, 0:3] = node_min[b_root]
        rows[0, 3:6] = node_max[b_root]
        rows[0, 6:9] = 3e38
        rows[0, 9:12] = -3e38
        rows[0, 12] = float(leaf_info_local(b_root))
        rows[0, 13] = float(-0 - 1)  # empty leaf: local start 0, count 0
        rows[0, 14] = 0.0
        return 1

    # iterative DFS for depth + row fill
    max_depth = 0
    stack = [(b_root, 1)]
    while stack:
        g, dep = stack.pop()
        max_depth = max(max_depth, dep)
        if right[g] < 0:
            continue
        l = g - lo_id
        lc, rc = g + 1, int(right[g])
        rows[l, 0:3] = node_min[lc]
        rows[l, 3:6] = node_max[lc]
        rows[l, 6:9] = node_min[rc]
        rows[l, 9:12] = node_max[rc]
        rows[l, 12] = float(child_info(lc))
        rows[l, 13] = float(child_info(rc))
        rows[l, 14] = float(max(axis[g], 0))
        stack.append((lc, dep + 1))
        stack.append((rc, dep + 1))
    return max_depth
