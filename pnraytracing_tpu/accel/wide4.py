"""4-wide BVH layout + collect-then-test traversal (TPU round-3 design).

Motivation (BASELINE.md round-3 calibration): on TPU a dynamic row-gather
costs ~3.3 ns per gathered row and a while-loop condition ~0.6 ms per
iteration.  Traversal cost is therefore

    iterations x (rows gathered per iteration) x R x 3.3 ns  +  conds

The binary backends gather node AND leaf rows every iteration (masked
lanes still gather), wasting most rows.  This backend minimizes gathered
rows per query:

* **4-wide nodes** (`nodes32` [N4, 32]): each internal node stores its
  <=4 children's AABBs + encoded child links in ONE row — a visit is one
  gather and one 4-box VPU test, and the tree has ~half the depth of the
  binary one.
* **collect-then-test**: phase 1 walks ONLY internal topology, appending
  passing leaf children to a fixed per-ray buffer (no triangle gathers
  mixed in); phase 2 is a static ``fori_loop`` over buffer slots, each
  gathering ONE padded leaf row (`leaf36` [NL, 36] = up to 4 triangles,
  pre-gathered) and testing its triangles.  No iteration gathers both
  node and triangle rows.

Trade-off: without inline leaf tests, ``t_best`` does not tighten during
the walk, so pruning is box-vs-t_max only — more leaf visits than the
binary walk, paid back many times over by the row economy.  Buffer
overflow (a ray collecting more than ``leaf_buffer`` leaves) is detected
and those rays are re-walked with the binary pop backend (rare; exact).

Built host-side (numpy) by collapsing the binary SAH tree two levels at
a time — same world-space boxes, so results match the binary backends
exactly up to closest-hit ties.
"""

from __future__ import annotations

import numpy as np

# child encodings in nodes32[:, 6*W : 7*W]: 0 = empty, odd = leaf,
# even = internal; enc_internal(i) = 2*(i+1), enc_leaf(l) = 2*l + 1


def _row_width(width: int) -> int:
    """6 box floats + 1 child code per slot, padded up to a multiple
    of 8 (sublane alignment)."""
    need = 7 * width
    return (need + 7) // 8 * 8


def collapse_binary(node_min, node_max, right_child, start, end,
                    max_leaf_size: int = 4, width: int = 4):
    """Binary flat BVH -> (nodes32 [Nw, row_width] f32, leaf_start [NL]
    i32, leaf_count [NL] i32, depth int) at branching factor ``width``.

    A wide node's children are grown from the binary node by repeatedly
    expanding the internal child with the largest surface area until
    ``width`` slots are filled (leaves stay as-is) — the SAH-greedy
    collapse."""
    node_min = np.asarray(node_min)
    node_max = np.asarray(node_max)
    right_child = np.asarray(right_child)
    start = np.asarray(start)
    end = np.asarray(end)
    PAD = _row_width(width)

    def kids(b):
        """Binary children of binary node b, or None for a leaf."""
        r = right_child[b]
        if r < 0:
            return None
        return [b + 1, int(r)]

    rows = []
    leaf_start, leaf_count = [], []

    def add_leaf(b) -> int:
        leaf_start.append(int(start[b]))
        leaf_count.append(int(end[b] - start[b]))
        return len(leaf_start) - 1

    # root special case: binary root may itself be a leaf
    if right_child[0] < 0:
        li = add_leaf(0)
        row = np.zeros(PAD, np.float32)
        row[0:3] = node_min[0]
        row[3:6] = node_max[0]
        row[6 * width] = 2 * li + 1
        nodes32 = np.asarray([row], np.float32)
        return (nodes32, np.asarray(leaf_start, np.int32),
                np.asarray(leaf_count, np.int32), 1)

    def area(b):
        d = np.maximum(node_max[b] - node_min[b], 0.0)
        return 2.0 * (d[0] * d[1] + d[1] * d[2] + d[2] * d[0])

    def gather_children(b):
        """Up to ``width`` binary descendants: greedily expand the
        largest-area internal entry until the slots are full."""
        out = list(kids(b))
        while len(out) < width:
            best_i, best_a = -1, -1.0
            for i, c in enumerate(out):
                if kids(c) is not None and area(c) > best_a:
                    best_i, best_a = i, area(c)
            if best_i < 0:
                break
            c = out.pop(best_i)
            out.extend(kids(c))
        return out

    # breadth-first emission so child indices are assigned forward
    rows_children: list[list[int]] = []  # binary ids per 4-node
    queue = [0]
    emitted = {}  # binary internal id -> 4-node index
    order = []
    while queue:
        b = queue.pop(0)
        if b in emitted:
            continue
        emitted[b] = len(order)
        order.append(b)
        ch = gather_children(b)
        rows_children.append(ch)
        for c in ch:
            if kids(c) is not None:
                queue.append(c)

    n4 = len(order)
    nodes32 = np.zeros((n4, PAD), np.float32)
    depth = np.ones(n4, np.int32)
    for i, b in enumerate(order):
        ch = rows_children[i]
        for k, c in enumerate(ch):
            nodes32[i, 6 * k:6 * k + 3] = node_min[c]
            nodes32[i, 6 * k + 3:6 * k + 6] = node_max[c]
            if kids(c) is None:
                li = add_leaf(c)
                nodes32[i, 6 * width + k] = 2 * li + 1
            else:
                j = emitted[c]
                nodes32[i, 6 * width + k] = 2 * (j + 1)
                depth[j] = depth[i] + 1
    return (nodes32, np.asarray(leaf_start, np.int32),
            np.asarray(leaf_count, np.int32), int(depth.max()))


def build_leaf40(tri9: np.ndarray, leaf_start: np.ndarray,
                 leaf_count: np.ndarray, max_leaf_size: int = 4):
    """[NL, 9*max_leaf + max_leaf] padded leaf rows: triangle corner
    positions then the global triangle ids as exact small-int floats
    (-1 pad; pad triangles are degenerate and can never hit).  ONE gather
    fetches everything a leaf test needs."""
    nl = len(leaf_start)
    w = 10 * max_leaf_size * 9 // 10 + max_leaf_size  # 9*L + L
    out = np.zeros((nl, 9 * max_leaf_size + max_leaf_size), np.float32)
    out[:, 9 * max_leaf_size:] = -1.0
    tri9 = np.asarray(tri9)
    for i in range(nl):
        s, c = int(leaf_start[i]), min(int(leaf_count[i]), max_leaf_size)
        out[i, : 9 * c] = tri9[s:s + c].reshape(-1)
        out[i, 9 * max_leaf_size: 9 * max_leaf_size + c] = np.arange(
            s, s + c, dtype=np.float32
        )
    return out


def pack_wide4(built, tri9_np: np.ndarray, max_leaf_size: int = 4,
               width: int = 4):
    """BVHArrays + reordered tri9 -> Wide4Data (host)."""
    import jax.numpy as jnp

    from pnraytracing_tpu.accel.layout import Wide4Data

    nodes32, ls, lc, depth4 = collapse_binary(
        built.node_min, built.node_max, built.right_child,
        built.start, built.end, max_leaf_size, width=width,
    )
    leaf40 = build_leaf40(tri9_np, ls, lc, max_leaf_size)
    return Wide4Data(nodes32=jnp.asarray(nodes32),
                     leaf40=jnp.asarray(leaf40), depth4=depth4,
                     width=width)
