"""Traversal-optimized device layout.

The generic traversal gathers ~6 separate rows per node visit (bounds x2,
axis, right_child, start, end) plus 1+3 rows per triangle test (index
triple, then three vertex positions).  On TPU every gather pays a full
dynamic-gather pass, so the packed layout collapses them:

* ``nodes8``  [N, 8] f32 — min.xyz, max.xyz, enc(right_child, axis),
  enc(start, count): ONE row gather per node visit;
* ``tri9``    [T, 9] f32 — the three corner positions, pre-gathered: ONE
  row gather per triangle test.

Topology fields are stored as EXACT small-integer floats (arithmetic
packing: ``right*4 + axis``, ``start*16 + count``), NOT int32 bit patterns
bitcast to f32: float32 represents integers below 2^24 exactly, while a
bitcast int can alias a NaN payload that TPU data movement is allowed to
canonicalize — observed on hardware as corrupted node ids driving the
traversal while-loop until the worker watchdog killed it
(scripts/crash_sweep.py: packed crashed, generic passed).  The arithmetic
encoding bounds: < 2^22 BVH nodes, < 2^20 triangles, leaves <= 15 — the
scene builder falls back to the generic traversal beyond them.

This is pure data layout (same flat BVH contract as the reference,
BVH.hpp:6-12); results are bit-identical to the unpacked traversal.
Packing runs in-graph so a refit/rebuild can re-derive it cheaply.
"""

from __future__ import annotations

import jax.numpy as jnp
from flax import struct

from pnraytracing_tpu.core.types import BVH, TriangleMesh

_COUNT_BASE = 16  # count in the low base-16 digit of enc(start, count)
_AXIS_BASE = 4  # axis in the low base-4 digit of enc(right, axis)

MAX_PACKED_LEAF = _COUNT_BASE - 1  # 15 triangles
MAX_PACKED_NODES = 1 << 22  # right*4+axis must stay < 2^24 (exact f32)
MAX_PACKED_TRIS = 1 << 20  # start*16+count must stay < 2^24 (exact f32)


@struct.dataclass
class Wide4Data:
    """4-wide collect-then-test layout (accel/wide4.py): one [N4, 32] row
    per internal node (4 child boxes + links), one [NL, 40] row per leaf
    (4 pre-gathered triangles + ids).  Host-built; depth4 is the 4-wide
    tree depth (static, sizes the traversal stack)."""

    nodes32: jnp.ndarray  # [Nw, row_width] f32
    leaf40: jnp.ndarray  # [NL, 40] f32
    depth4: int = struct.field(pytree_node=False, default=0)
    width: int = struct.field(pytree_node=False, default=4)


@struct.dataclass
class TravData:
    nodes8: jnp.ndarray  # [N, 8] f32
    tri9: jnp.ndarray  # [T, 9] f32
    # Wide layout: per INTERNAL node, both children's AABBs + encoded child
    # infos + split axis in one [N, 16] row, so the traversal loop issues
    # ONE node gather per iteration and iterates over internal nodes only
    # (see accel/traverse_wide.py).  None when not packed.
    nodes16: jnp.ndarray | None = None
    # 4-wide collect-then-test layout (host-built; None in-graph refits
    # rebuild it via pack_wide4 on the host path)
    w4: Wide4Data | None = None
    # Brick-paged streaming layout for > SMEM scenes (accel/bricks.py;
    # host-built at scene build when the packed scene exceeds the
    # SMEM-resident kernel budget; None in-graph)
    stream: "object | None" = None
    # [K, 6] treelet AABBs (lo.xyz, hi.xyz) for the bounce-ray coherence
    # sort (accel/bricks.py::treelet_cut_aabbs; host-built, None
    # in-graph — the sort falls back to the Morton position key)
    treelets: jnp.ndarray | None = None
    # Wide rows compacted to INTERNAL nodes only (child infos are row
    # ids into this table).  pack_wide_nodes stores a dummy row per leaf
    # so row id == node id; that wastes ~half the SMEM-resident kernel's
    # scene budget (leaf rows are never visited).  Host-built
    # (pack_wide_nodes_compact — the live row count is data-dependent,
    # so it cannot be traced); None in-graph.
    nodes16c: jnp.ndarray | None = None
    # [T, 16] per-triangle shading attributes for the attribute-emitting
    # Mosaic kernel (pack_tri_attr16): corner normals (9), corner uvs
    # (6), encoded material/texture id (1).  Lets the kernel emit the
    # interaction fill at triangle-test time (triangle data are SMEM
    # scalars there) instead of a per-ray [T, 26] row gather afterwards.
    tri_attr16: jnp.ndarray | None = None


def _enc_i2f(x: jnp.ndarray) -> jnp.ndarray:
    """Exact small-int -> f32 (values must stay within +-2^24)."""
    return x.astype(jnp.int32).astype(jnp.float32)


def _dec_f2i(x: jnp.ndarray) -> jnp.ndarray:
    return x.astype(jnp.int32)


def pack_traversal_data(bvh: BVH, mesh: TriangleMesh) -> TravData:
    count = bvh.end - bvh.start
    # enc(right, axis): -1 for leaves; internal = right*4 + axis
    axis_nn = jnp.maximum(bvh.axis, 0)
    enc_right = jnp.where(
        bvh.right_child >= 0,
        bvh.right_child * _AXIS_BASE + axis_nn,
        -1,
    )
    enc_meta = bvh.start * _COUNT_BASE + jnp.minimum(count, MAX_PACKED_LEAF)
    nodes8 = jnp.concatenate(
        [
            bvh.node_min,
            bvh.node_max,
            _enc_i2f(enc_right)[:, None],
            _enc_i2f(enc_meta)[:, None],
        ],
        axis=1,
    )
    p = mesh.positions[mesh.indices]  # [T, 3, 3]
    tri9 = p.reshape(p.shape[0], 9)
    return TravData(nodes8=nodes8, tri9=tri9, nodes16=pack_wide_nodes(bvh))


def unpack_node_rows(rows: jnp.ndarray):
    """[..., 8] row -> (nmin, nmax, right_child, start, count, axis)."""
    nmin = rows[..., 0:3]
    nmax = rows[..., 3:6]
    enc_right = _dec_f2i(rows[..., 6])
    enc_meta = _dec_f2i(rows[..., 7])
    right = jnp.where(enc_right < 0, -1, enc_right // _AXIS_BASE)
    axis = jnp.where(enc_right < 0, 0, enc_right % _AXIS_BASE)
    start = enc_meta // _COUNT_BASE
    count = enc_meta % _COUNT_BASE
    return nmin, nmax, right, start, count, axis


def pack_wide_nodes(bvh: BVH) -> jnp.ndarray:
    """[N, 16] f32 rows for the wide traversal: per internal node
    ``[lmin(3), lmax(3), rmin(3), rmax(3), left_info, right_info, axis,
    pad]``.

    ``child_info >= 0`` is an internal child's node id; ``< 0`` encodes a
    leaf as ``-(start*16 + count) - 1`` (exact-float arithmetic packing,
    see module docstring).  Rows of leaf nodes are never visited (their
    parents resolve them inline) and hold safe dummy values.  A leaf ROOT
    (scenes of <= 2 triangles) gets a synthetic row 0 whose left "child"
    is the root leaf itself and whose right child is an empty box with a
    zero-count leaf, so the traversal is uniform.
    """
    n = bvh.num_nodes
    ids = jnp.arange(n, dtype=jnp.int32)
    is_leaf = bvh.right_child < 0
    count = bvh.end - bvh.start
    meta = bvh.start * _COUNT_BASE + jnp.minimum(count, MAX_PACKED_LEAF)
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
            _enc_i2f(info_of(left))[:, None],
            _enc_i2f(info_of(right))[:, None],
            _enc_i2f(jnp.maximum(bvh.axis, 0))[:, None],
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
            _enc_i2f(leaf_info[0])[None],
            _enc_i2f(jnp.int32(-1))[None],  # empty leaf: meta 0
            _enc_i2f(jnp.int32(0))[None],
            jnp.zeros((1,), jnp.float32),
        ]
    )
    rows = rows.at[0].set(jnp.where(is_leaf[0], syn_row0, rows[0]))
    return rows


def pack_wide_nodes_compact(built) -> "np.ndarray":
    """Internal-only wide rows (numpy, host-built at scene build).

    Same row content as :func:`pack_wide_nodes`, but leaf nodes get no
    row and internal child infos are COMPACT ROW IDS — for the flagship
    scene this halves the node side of the Mosaic kernel's SMEM budget
    (357 KB -> 178 KB), the headroom the per-triangle attribute table
    needs.  ``built`` is the host BVHArrays."""
    import numpy as np

    right = np.asarray(built.right_child, np.int64)
    node_min = np.asarray(built.node_min, np.float32)
    node_max = np.asarray(built.node_max, np.float32)
    axis = np.asarray(built.axis, np.int64)
    start = np.asarray(built.start, np.int64)
    end = np.asarray(built.end, np.int64)
    n = len(right)
    is_leaf = right < 0
    count = end - start
    meta = start * _COUNT_BASE + np.minimum(count, MAX_PACKED_LEAF)
    leaf_info = (-meta - 1).astype(np.int64)

    if bool(is_leaf[0]):
        # leaf root: one synthetic row (left = the leaf, right = empty)
        row = np.zeros((1, 16), np.float32)
        row[0, 0:3] = node_min[0]
        row[0, 3:6] = node_max[0]
        row[0, 6:9] = 3e38
        row[0, 9:12] = -3e38
        row[0, 12] = float(leaf_info[0])
        row[0, 13] = float(-1)  # empty leaf: meta 0
        return row

    internal = np.nonzero(~is_leaf)[0]
    row_of = np.cumsum(~is_leaf) - (~is_leaf)  # exclusive scan
    lc = internal + 1
    rc = right[internal]
    info = np.where(is_leaf, leaf_info, row_of)
    rows = np.zeros((len(internal), 16), np.float32)
    rows[:, 0:3] = node_min[lc]
    rows[:, 3:6] = node_max[lc]
    rows[:, 6:9] = node_min[rc]
    rows[:, 9:12] = node_max[rc]
    rows[:, 12] = info[lc].astype(np.float32)
    rows[:, 13] = info[rc].astype(np.float32)
    rows[:, 14] = np.maximum(axis[internal], 0).astype(np.float32)
    return rows


# encoded material/texture word of the attribute rows: mat*4096+(tex+1),
# exact in f32 for mat < 4096 and tex < 4095 (tex -1 = untextured)
ATTR_TEX_BASE = 4096


def pack_tri_attr16(mesh: TriangleMesh) -> jnp.ndarray:
    """[T, 16] per-triangle shading attributes for the attribute-emitting
    Mosaic kernel: corner shading normals (9; zero normals replaced by
    the geometric normal at BAKE time, mirroring make_interaction's
    any-corner-zero fallback), corner uvs (6), enc(mat, tex) (1)."""
    t = mesh.indices.shape[0]
    p = mesh.positions[mesh.indices]  # [T, 3, 3]
    n = mesh.normals[mesh.indices]  # [T, 3, 3]
    gn = jnp.cross(p[:, 1] - p[:, 0], p[:, 2] - p[:, 0])
    gn = gn / jnp.maximum(
        jnp.linalg.norm(gn, axis=1, keepdims=True), 1e-20
    )
    any_zero = jnp.any(jnp.all(n == 0.0, axis=2), axis=1)  # [T]
    n = jnp.where(any_zero[:, None, None], gn[:, None, :], n)
    uv = mesh.uvs[mesh.indices].reshape(t, 6)
    enc = (mesh.material_id.astype(jnp.int32) * ATTR_TEX_BASE
           + mesh.texture_id.astype(jnp.int32) + 1)
    return jnp.concatenate(
        [n.reshape(t, 9), uv, _enc_i2f(enc)[:, None]], axis=1
    )


def unpack_wide_rows(rows: jnp.ndarray):
    """[..., 16] row -> (lmin, lmax, rmin, rmax, left_info, right_info,
    axis)."""
    lmin = rows[..., 0:3]
    lmax = rows[..., 3:6]
    rmin = rows[..., 6:9]
    rmax = rows[..., 9:12]
    li = _dec_f2i(rows[..., 12])
    ri = _dec_f2i(rows[..., 13])
    axis = _dec_f2i(rows[..., 14])
    return lmin, lmax, rmin, rmax, li, ri, axis


def decode_leaf_info(info: jnp.ndarray):
    """Negative child_info -> (start, count); count is 0 for non-leaves."""
    meta = -info - 1
    start = meta // _COUNT_BASE
    count = jnp.where(info < 0, meta % _COUNT_BASE, 0)
    return start, count
