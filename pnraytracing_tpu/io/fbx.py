"""Binary FBX (Kaydara 7.x) mesh loader.

The reference imports FBX through the closed assimp binary
(include/model.hpp:25, `lib/assimp-vc143-mt.lib`); this is a from-scratch
reader of the documented binary container: a tree of node records
(EndOffset/NumProperties/PropertyListLen/Name) with typed properties,
array properties optionally zlib-deflated (stdlib ``zlib``).

Scope: `Objects/Geometry` meshes — `Vertices`, `PolygonVertexIndex`
(negative index = last corner of a polygon, XOR'd with -1),
`LayerElementNormal` / `LayerElementUV` with the common mapping modes
(`ByPolygonVertex`, `ByVertice`/`ByVertex`, with `Direct` or
`IndexToDirect` referencing) — plus per-model local transforms
(`Lcl Translation/Rotation/Scaling`, rotation applied XYZ order) wired to
geometries through the `Connections` section.  Skins, animation, embedded
media and ASCII FBX are out of scope.

Polygons are fan-triangulated like the OBJ/PLY paths (assimp's
aiProcess_Triangulate).  Returns `(mesh_dict, material_dict, None, name,
transform)` tuples compatible with `SceneBuilder.add`.
"""

from __future__ import annotations

import struct
import zlib

import numpy as np

_MAGIC = b"Kaydara FBX Binary  \x00"

_ARRAY_TYPES = {
    b"f": np.dtype("<f4"),
    b"d": np.dtype("<f8"),
    b"l": np.dtype("<i8"),
    b"i": np.dtype("<i4"),
    b"b": np.dtype("<i1"),
}
_SCALAR_FMT = {
    b"Y": "<h", b"C": "<b", b"I": "<i", b"F": "<f", b"D": "<d", b"L": "<q",
}


class _Node:
    __slots__ = ("name", "props", "children")

    def __init__(self, name, props):
        self.name = name
        self.props = props
        self.children = []

    def find(self, name):
        return [c for c in self.children if c.name == name]

    def first(self, name):
        for c in self.children:
            if c.name == name:
                return c
        return None


def _read_property(buf, off):
    code = buf[off:off + 1]
    off += 1
    if code in _SCALAR_FMT:
        fmt = _SCALAR_FMT[code]
        size = struct.calcsize(fmt)
        val = struct.unpack_from(fmt, buf, off)[0]
        return val, off + size
    if code in (b"S", b"R"):
        (n,) = struct.unpack_from("<I", buf, off)
        off += 4
        raw = buf[off:off + n]
        return (raw.decode("utf-8", "replace") if code == b"S" else raw), off + n
    if code in _ARRAY_TYPES:
        length, encoding, comp_len = struct.unpack_from("<III", buf, off)
        off += 12
        dt = _ARRAY_TYPES[code]
        if encoding == 0:
            raw = buf[off:off + length * dt.itemsize]
            off += length * dt.itemsize
        else:
            raw = zlib.decompress(buf[off:off + comp_len])
            off += comp_len
        return np.frombuffer(raw, dt, count=length), off
    raise ValueError(f"unknown FBX property type {code!r}")


def _read_node(buf, off, long_offsets):
    if long_offsets:
        end, n_props, _plen = struct.unpack_from("<QQQ", buf, off)
        off += 24
    else:
        end, n_props, _plen = struct.unpack_from("<III", buf, off)
        off += 12
    (name_len,) = struct.unpack_from("<B", buf, off)
    off += 1
    if end == 0 and n_props == 0 and name_len == 0:
        return None, off  # NULL terminator record
    name = buf[off:off + name_len].decode("ascii", "replace")
    off += name_len
    props = []
    for _ in range(n_props):
        val, off = _read_property(buf, off)
        props.append(val)
    node = _Node(name, props)
    while off < end:
        child, off = _read_node(buf, off, long_offsets)
        if child is None:
            break
        node.children.append(child)
    return node, max(off, end)


def _parse(buf: bytes) -> tuple[list[_Node], int]:
    if buf[: len(_MAGIC)] != _MAGIC:
        raise ValueError("not a binary FBX file (ASCII FBX is unsupported)")
    (version,) = struct.unpack_from("<I", buf, 23)
    long_offsets = version >= 7500
    off = 27
    roots = []
    while off < len(buf):
        node, off = _read_node(buf, off, long_offsets)
        if node is None:
            break
        roots.append(node)
    return roots, version


def _layer_values(geom, layer_name, value_name, index_name, n_corners,
                  poly_vertex_index, width):
    """Resolve a layer element to per-corner values [n_corners, width]."""
    layer = geom.first(layer_name)
    if layer is None:
        return None
    mapping = ""
    ref = "Direct"
    values = None
    indices = None
    for c in layer.children:
        if c.name == "MappingInformationType":
            mapping = c.props[0]
        elif c.name == "ReferenceInformationType":
            ref = c.props[0]
        elif c.name == value_name:
            values = np.asarray(c.props[0], np.float64).reshape(-1, width)
        elif c.name == index_name:
            indices = np.asarray(c.props[0], np.int64)
    if values is None:
        return None
    if ref == "IndexToDirect" and indices is not None:
        values = values[np.clip(indices, 0, len(values) - 1)]
    if mapping == "ByPolygonVertex":
        if len(values) < n_corners:
            # truncated/malformed layer: surface it and fall back to
            # geometric normals / zero UVs rather than misalign downstream
            import warnings

            warnings.warn(
                f"FBX {layer_name}: {len(values)} ByPolygonVertex values "
                f"for {n_corners} corners; ignoring layer"
            )
            return None
        return values[:n_corners]
    if mapping in ("ByVertice", "ByVertex"):
        ctrl = np.where(poly_vertex_index < 0, ~poly_vertex_index,
                        poly_vertex_index)
        if len(values) <= int(ctrl.max(initial=0)):
            import warnings

            warnings.warn(
                f"FBX {layer_name}: {len(values)} ByVertex values for "
                f"control point index {int(ctrl.max(initial=0))}; "
                "ignoring layer"
            )
            return None
        return values[np.clip(ctrl, 0, len(values) - 1)]
    if mapping == "AllSame":
        return np.broadcast_to(values[0], (n_corners, width)).copy()
    return None


def _geometry_mesh(geom) -> dict | None:
    v_node = geom.first("Vertices")
    i_node = geom.first("PolygonVertexIndex")
    if v_node is None or i_node is None:
        return None
    ctrl_points = np.asarray(v_node.props[0], np.float64).reshape(-1, 3)
    pvi = np.asarray(i_node.props[0], np.int64)
    n_corners = len(pvi)
    corner_ctrl = np.where(pvi < 0, ~pvi, pvi)

    normals = _layer_values(
        geom, "LayerElementNormal", "Normals", "NormalsIndex",
        n_corners, pvi, 3,
    )
    uvs = _layer_values(
        geom, "LayerElementUV", "UV", "UVIndex", n_corners, pvi, 2
    )

    # fan-triangulate: polygons end at negative (XOR'd) indices
    tris = []
    poly_start = 0
    for k in range(n_corners):
        if pvi[k] < 0:  # last corner of this polygon
            for m in range(poly_start + 1, k):
                tris.append((poly_start, m, m + 1))
            poly_start = k + 1
    tris = np.asarray(tris, np.int64).reshape(-1, 3)

    # corners are already per-polygon-vertex: emit one vertex per corner
    positions = ctrl_points[corner_ctrl].astype(np.float32)
    mesh = dict(
        positions=positions,
        normals=(normals.astype(np.float32) if normals is not None
                 else np.zeros_like(positions)),
        uvs=(uvs.astype(np.float32) if uvs is not None
             else np.zeros((n_corners, 2), np.float32)),
        indices=tris.astype(np.int32),
    )
    return mesh


def _props70(node) -> dict:
    out = {}
    p70 = node.first("Properties70")
    if p70 is None:
        return out
    for p in p70.find("P"):
        key = p.props[0]
        out[key] = p.props[4:]
    return out


def _model_transform(model) -> np.ndarray:
    p = _props70(model)
    m = np.eye(4)
    if "Lcl Scaling" in p:
        m = np.diag(list(np.asarray(p["Lcl Scaling"], np.float64)) + [1.0]) @ m
    if "Lcl Rotation" in p:
        rx, ry, rz = np.radians(np.asarray(p["Lcl Rotation"], np.float64))

        def rot(axis, a):
            c, s = np.cos(a), np.sin(a)
            r = np.eye(4)
            i, j = [(1, 2), (0, 2), (0, 1)][axis]
            r[i, i] = c
            r[j, j] = c
            r[i, j] = -s if axis != 1 else s
            r[j, i] = s if axis != 1 else -s
            return r

        m = rot(2, rz) @ rot(1, ry) @ rot(0, rx) @ m
    if "Lcl Translation" in p:
        t = np.eye(4)
        t[:3, 3] = np.asarray(p["Lcl Translation"], np.float64)
        m = t @ m
    return m


def load_fbx(path: str):
    """Load a binary FBX file.

    Returns a list of (mesh_dict, material_dict, None, name,
    world_transform_4x4) tuples, one per geometry, with its connected
    model's local transform applied (parent chains composed)."""
    with open(path, "rb") as f:
        buf = f.read()
    roots, _version = _parse(buf)
    by_name = {n.name: n for n in roots}
    objects = by_name.get("Objects")
    if objects is None:
        return []

    geoms = {}
    models = {}
    for node in objects.children:
        if node.name == "Geometry":
            gid = int(node.props[0])
            mesh = _geometry_mesh(node)
            if mesh is not None:
                geoms[gid] = (mesh, node)
        elif node.name == "Model":
            models[int(node.props[0])] = node

    # connections: child id -> parent id
    parents: dict[int, list[int]] = {}
    conn = by_name.get("Connections")
    if conn is not None:
        for c in conn.find("C"):
            if len(c.props) >= 3 and c.props[0] == "OO":
                parents.setdefault(int(c.props[1]), []).append(int(c.props[2]))

    def world_of(model_id, depth=0):
        if depth > 64 or model_id not in models:
            return np.eye(4)
        local = _model_transform(models[model_id])
        for par in parents.get(model_id, []):
            if par in models:
                return world_of(par, depth + 1) @ local
        return local

    out = []
    for gid, (mesh, node) in geoms.items():
        name = "geometry"
        if len(node.props) >= 2 and isinstance(node.props[1], str):
            name = node.props[1].split("\x00")[0] or name
        transform = np.eye(4)
        for par in parents.get(gid, []):
            if par in models:
                transform = world_of(par)
                mdl_name = models[par].props[1] if len(models[par].props) > 1 else ""
                if isinstance(mdl_name, str) and mdl_name:
                    name = mdl_name.split("\x00")[0] or name
                break
        out.append((mesh, {}, None, name, transform))
    return out
