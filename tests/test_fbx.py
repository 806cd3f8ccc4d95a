"""Binary FBX loader test: a synthetic FBX 7.4 file is written from the
container spec (node records, typed properties, zlib-deflated arrays) and
loaded back — the parser is tested against the format, not against itself."""

import struct
import zlib

import numpy as np

from pnraytracing_tpu.io.fbx import load_fbx

QUAD_POS = np.array(
    [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float64
)
# one quad as control points; corners 0,1,2,3 with the last XOR'd (-4 = ~3)
PVI = np.array([0, 1, 2, -4], np.int32)
NORMALS = np.tile([0.0, 0.0, 1.0], 4)


def _prop_str(s: str) -> bytes:
    b = s.encode()
    return b"S" + struct.pack("<I", len(b)) + b


def _prop_long(v: int) -> bytes:
    return b"L" + struct.pack("<q", v)


def _prop_double(v: float) -> bytes:
    return b"D" + struct.pack("<d", v)


def _prop_array(code: bytes, arr: np.ndarray, compress: bool) -> bytes:
    raw = arr.tobytes()
    if compress:
        comp = zlib.compress(raw)
        head = struct.pack("<III", len(arr), 1, len(comp))
        return code + head + comp
    return code + struct.pack("<III", len(arr), 0, len(raw)) + raw


def _node(name: str, props: list[bytes], children: list[bytes],
          base_offset: int) -> bytes:
    """Serialize one node record at absolute offset ``base_offset``."""
    name_b = name.encode()
    plist = b"".join(props)
    body = b"".join(children)
    if children:
        body += b"\x00" * 13  # NULL record terminates non-empty child lists
    header_len = 13 + len(name_b)
    end = base_offset + header_len + len(plist) + len(body)
    return (
        struct.pack("<III", end, len(props), len(plist))
        + struct.pack("<B", len(name_b))
        + name_b + plist + body
    )


def _write_fbx(path: str, translation=(2.0, 0.0, 0.0)) -> None:
    geom_id, model_id = 1001, 2002

    def build(off0: int) -> bytes:
        # -- Objects ----------------------------------------------------
        def objects(off):
            children = []
            coff = off + 13 + len(b"Objects")  # children start after header
            # Geometry node
            def geometry(goff):
                g_children = []
                g2 = goff

                def leaf(name, props):
                    nonlocal g2
                    b = _node(name, props, [], g2)
                    g2 += len(b)
                    return b

                hdr = 13 + len(b"Geometry")
                plist = (_prop_long(geom_id) + _prop_str("quad\x00\x01Geometry")
                         + _prop_str("Mesh"))
                g2 = goff + hdr + len(plist)
                g_children.append(leaf("Vertices",
                                       [_prop_array(b"d", QUAD_POS.reshape(-1), True)]))
                g_children.append(leaf("PolygonVertexIndex",
                                       [_prop_array(b"i", PVI, False)]))

                def normal_layer(noff):
                    n2 = noff + 13 + len(b"LayerElementNormal") + len(_prop_long(0))
                    n_children = []

                    def nleaf(name, props):
                        nonlocal n2
                        b = _node(name, props, [], n2)
                        n2 += len(b)
                        return b

                    n_children.append(nleaf("MappingInformationType",
                                            [_prop_str("ByPolygonVertex")]))
                    n_children.append(nleaf("ReferenceInformationType",
                                            [_prop_str("Direct")]))
                    n_children.append(nleaf("Normals",
                                            [_prop_array(b"d", NORMALS, True)]))
                    return _node("LayerElementNormal", [_prop_long(0)],
                                 n_children, noff)

                g_children.append(normal_layer(g2))
                return _node("Geometry",
                             [_prop_long(geom_id),
                              _prop_str("quad\x00\x01Geometry"),
                              _prop_str("Mesh")], g_children, goff)

            g = geometry(coff)
            children.append(g)
            coff += len(g)

            # Model node with Properties70 / Lcl Translation
            def model(moff):
                hdr = 13 + len(b"Model")
                plist = (_prop_long(model_id) + _prop_str("box\x00\x01Model")
                         + _prop_str("Mesh"))
                m2 = moff + hdr + len(plist)

                def p70(poff):
                    p_hdr = 13 + len(b"Properties70")
                    p2 = poff + p_hdr
                    p_entry = _node(
                        "P",
                        [_prop_str("Lcl Translation"), _prop_str("Lcl Translation"),
                         _prop_str(""), _prop_str("A"),
                         _prop_double(translation[0]),
                         _prop_double(translation[1]),
                         _prop_double(translation[2])],
                        [], p2,
                    )
                    return _node("Properties70", [], [p_entry], poff)

                return _node("Model",
                             [_prop_long(model_id), _prop_str("box\x00\x01Model"),
                              _prop_str("Mesh")], [p70(m2)], moff)

            m = model(coff)
            children.append(m)
            return _node("Objects", [], children, off)

        # -- Connections -------------------------------------------------
        def connections(off):
            c2 = off + 13 + len(b"Connections")
            entries = []

            def centry(child, parent):
                nonlocal c2
                b = _node("C", [_prop_str("OO"), _prop_long(child),
                                _prop_long(parent)], [], c2)
                c2 += len(b)
                return b

            entries.append(centry(geom_id, model_id))
            entries.append(centry(model_id, 0))
            return _node("Connections", [], entries, off)

        obj = objects(off0)
        conn = connections(off0 + len(obj))
        return obj + conn

    header = b"Kaydara FBX Binary  \x00" + b"\x1a\x00" + struct.pack("<I", 7400)
    body = build(len(header))
    with open(path, "wb") as f:
        f.write(header + body + b"\x00" * 13)


def test_fbx_roundtrip(tmp_path):
    p = str(tmp_path / "quad.fbx")
    _write_fbx(p)
    groups = load_fbx(p)
    assert len(groups) == 1
    mesh, mat, tex, name, m = groups[0]
    # corners expanded per polygon-vertex; fan-triangulated quad = 2 tris
    np.testing.assert_allclose(mesh["positions"], QUAD_POS[[0, 1, 2, 3]])
    np.testing.assert_array_equal(mesh["indices"],
                                  [[0, 1, 2], [0, 2, 3]])
    np.testing.assert_allclose(mesh["normals"],
                               np.tile([0, 0, 1.0], (4, 1)))
    np.testing.assert_allclose(m[:3, 3], [2.0, 0.0, 0.0])
    assert name.startswith("box") or name.startswith("quad")


def test_fbx_builder(tmp_path):
    from pnraytracing_tpu.scene.build import SceneBuilder

    p = str(tmp_path / "quad.fbx")
    _write_fbx(p, translation=(0.0, 5.0, 0.0))
    b = SceneBuilder()
    for mesh, mat, tex, name, m in load_fbx(p):
        b.add(mesh, dict(base_color=(0.5, 0.5, 0.5)), name=name, transform=m)
    scene = b.build(env_constant=(0.1, 0.1, 0.1))
    pos = np.asarray(scene.mesh.positions)
    assert pos[:, 1].min() >= 5.0 - 1e-6  # transform baked


ASCII_FBX = """
; ASCII FBX 7.3 — hand-written test document
FBXHeaderExtension:  {
    FBXVersion: 7300
}
Objects:  {
    Geometry: 1001, "Geometry::quad", "Mesh" {
        Vertices: *12 {
            a: 0,0,0, 1,0,0, 1,1,0, 0,1,0
        }
        PolygonVertexIndex: *4 {
            a: 0,1,2,-4
        }
        LayerElementNormal: 0 {
            MappingInformationType: "ByPolygonVertex"
            ReferenceInformationType: "Direct"
            Normals: *12 {
                a: 0,0,1, 0,0,1, 0,0,1, 0,0,1
            }
        }
    }
    Model: 2002, "Model::quadmodel", "Mesh" {
        Properties70:  {
            P: "Lcl Translation", "Lcl Translation", "", "A", 2, 0, 0
        }
    }
}
Connections:  {
    C: "OO", 1001, 2002
}
"""


def test_fbx_ascii_matches_binary(tmp_path):
    """The ASCII parser must produce the same mesh + transform as the
    binary writer's equivalent document."""
    bpath = tmp_path / "quad_bin.fbx"
    _write_fbx(str(bpath), translation=(2.0, 0.0, 0.0))
    apath = tmp_path / "quad_ascii.fbx"
    apath.write_text(ASCII_FBX)

    (mesh_b, _, _, _, tf_b), = load_fbx(str(bpath))
    (mesh_a, _, _, name_a, tf_a), = load_fbx(str(apath))
    np.testing.assert_allclose(mesh_a["positions"], mesh_b["positions"])
    np.testing.assert_allclose(mesh_a["normals"], mesh_b["normals"])
    np.testing.assert_array_equal(mesh_a["indices"], mesh_b["indices"])
    np.testing.assert_allclose(tf_a, tf_b)
    assert name_a == "quadmodel"


def _pivot_ascii(props: str) -> str:
    return ASCII_FBX.replace(
        'P: "Lcl Translation", "Lcl Translation", "", "A", 2, 0, 0',
        props,
    )


def test_fbx_pivot_chain(tmp_path):
    """PreRotation + RotationPivot compose per the FBX SDK chain:
    L = T*Roff*Rp*Rpre*R*Rpost^-1*Rp^-1*Soff*Sp*S*Sp^-1."""
    path = tmp_path / "pivot.fbx"
    path.write_text(_pivot_ascii(
        'P: "RotationPivot", "Vector3D", "", "A", 1, 0, 0\n'
        'P: "PreRotation", "Vector3D", "", "A", 0, 0, 90\n'
    ))
    (_, _, _, _, tf), = load_fbx(str(path))
    # point at the pivot stays fixed
    np.testing.assert_allclose(tf @ [1, 0, 0, 1], [1, 0, 0, 1], atol=1e-12)
    # +90 deg about z around pivot (1,0,0): origin -> (1,-1,0)... check:
    # Rz(90): (x,y)->(-y,x); relative (-1,0)->(0,-1) + pivot = (1,-1)
    np.testing.assert_allclose(tf @ [0, 0, 0, 1], [1, -1, 0, 1],
                               atol=1e-12)

    # RotationOrder: ZYX vs default XYZ differ for a compound rotation
    p_xyz = _pivot_ascii(
        'P: "Lcl Rotation", "Lcl Rotation", "", "A", 90, 90, 0\n')
    p_zyx = _pivot_ascii(
        'P: "Lcl Rotation", "Lcl Rotation", "", "A", 90, 90, 0\n'
        'P: "RotationOrder", "enum", "", "A", 5\n')
    f1 = tmp_path / "xyz.fbx"
    f1.write_text(p_xyz)
    f2 = tmp_path / "zyx.fbx"
    f2.write_text(p_zyx)
    (_, _, _, _, t_xyz), = load_fbx(str(f1))
    (_, _, _, _, t_zyx), = load_fbx(str(f2))
    # XYZ: v=(0,0,1): Rx(90): (0,-1,0); Ry(90): (0,-1,0); => (0,-1,0)
    np.testing.assert_allclose(t_xyz @ [0, 0, 1, 1], [0, -1, 0, 1],
                               atol=1e-12)
    # ZYX: Ry(90) first? no: ZYX applies z first, then y, then x:
    # v=(0,0,1): Rz: (0,0,1); Ry(90): (1,0,0); Rx(90): (1,0,0)
    np.testing.assert_allclose(t_zyx @ [0, 0, 1, 1], [1, 0, 0, 1],
                               atol=1e-12)
