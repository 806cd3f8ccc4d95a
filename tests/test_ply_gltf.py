"""PLY and glTF loader tests: synthetic files in every container flavor,
loaded back and checked against the geometry that generated them, then fed
through SceneBuilder to prove the mesh-dict contract holds."""

import base64
import json
import struct

import numpy as np

from pnraytracing_tpu.io import load_model
from pnraytracing_tpu.io.gltf import add_gltf_to_builder, load_gltf
from pnraytracing_tpu.io.ply import load_ply
from pnraytracing_tpu.scene.build import SceneBuilder

QUAD_POS = np.array(
    [[0, 0, 0], [1, 0, 0], [1, 1, 0], [0, 1, 0]], np.float32
)
QUAD_NRM = np.tile(np.array([[0, 0, 1]], np.float32), (4, 1))
QUAD_UV = np.array([[0, 0], [1, 0], [1, 1], [0, 1]], np.float32)
QUAD_TRIS = np.array([[0, 1, 2], [0, 2, 3]], np.int32)


# ---------------------------------------------------------------- PLY ----

def _write_ply_ascii(path):
    with open(path, "wb") as f:
        f.write(b"ply\nformat ascii 1.0\ncomment synthetic\n")
        f.write(b"element vertex 4\n")
        for p in ("x", "y", "z", "nx", "ny", "nz", "s", "t"):
            f.write(f"property float {p}\n".encode())
        f.write(b"element face 1\n")
        f.write(b"property list uchar int vertex_indices\n")
        f.write(b"end_header\n")
        for i in range(4):
            row = list(QUAD_POS[i]) + list(QUAD_NRM[i]) + list(QUAD_UV[i])
            f.write((" ".join(f"{v:g}" for v in row) + "\n").encode())
        f.write(b"4 0 1 2 3\n")  # quad -> fan-triangulated


def _write_ply_binary(path, big=False):
    endian = ">" if big else "<"
    fmt_name = "binary_big_endian" if big else "binary_little_endian"
    with open(path, "wb") as f:
        f.write(f"ply\nformat {fmt_name} 1.0\n".encode())
        f.write(b"element vertex 4\n")
        for p in ("x", "y", "z", "nx", "ny", "nz"):
            f.write(f"property float {p}\n".encode())
        f.write(b"element face 2\n")
        f.write(b"property list uchar int vertex_indices\n")
        f.write(b"end_header\n")
        for i in range(4):
            row = list(QUAD_POS[i]) + list(QUAD_NRM[i])
            f.write(struct.pack(endian + "6f", *row))
        for tri in QUAD_TRIS:
            f.write(struct.pack(endian + "B3i", 3, *tri))


def test_ply_ascii_roundtrip(tmp_path):
    p = str(tmp_path / "quad.ply")
    _write_ply_ascii(p)
    mesh = load_ply(p)
    np.testing.assert_allclose(mesh["positions"], QUAD_POS)
    np.testing.assert_allclose(mesh["normals"], QUAD_NRM)
    np.testing.assert_allclose(mesh["uvs"], QUAD_UV)
    np.testing.assert_array_equal(mesh["indices"], QUAD_TRIS)


def test_ply_binary_roundtrip(tmp_path):
    for big in (False, True):
        p = str(tmp_path / f"quad_{big}.ply")
        _write_ply_binary(p, big=big)
        mesh = load_ply(p)
        np.testing.assert_allclose(mesh["positions"], QUAD_POS, rtol=1e-6)
        np.testing.assert_array_equal(mesh["indices"], QUAD_TRIS)
        # no uvs in this file -> zeros, builder-compatible
        assert mesh["uvs"].shape == (4, 2)


def test_ply_feeds_scene_builder(tmp_path):
    p = str(tmp_path / "quad.ply")
    _write_ply_ascii(p)
    b = SceneBuilder()
    b.add(load_model(p), dict(base_color=(0.5, 0.5, 0.5)), name="quad")
    b.add(
        load_model(p), dict(emissive=(5.0, 5.0, 5.0)), name="light",
        transform=np.diag([1.0, 1.0, 1.0, 1.0]),
    )
    scene = b.build(env_constant=(0.1, 0.1, 0.1))
    assert int(scene.mesh.indices.shape[0]) == 4
    assert int(scene.lights.tri_index.shape[0]) == 2


# --------------------------------------------------------------- glTF ----

def _gltf_doc(buffer_uri, buffer_len):
    return {
        "asset": {"version": "2.0"},
        "scene": 0,
        "scenes": [{"nodes": [0]}],
        "nodes": [
            {"mesh": 0, "translation": [1.0, 2.0, 3.0],
             "children": [1]},
            {"mesh": 0, "scale": [2.0, 2.0, 2.0]},
        ],
        "meshes": [{
            "name": "quad",
            "primitives": [{
                "attributes": {"POSITION": 0, "NORMAL": 1, "TEXCOORD_0": 2},
                "indices": 3,
                "material": 0,
            }],
        }],
        "materials": [{
            "pbrMetallicRoughness": {
                "baseColorFactor": [0.8, 0.2, 0.1, 1.0],
                "metallicFactor": 0.3,
                "roughnessFactor": 0.6,
            },
            "emissiveFactor": [0.0, 0.0, 0.0],
        }],
        "buffers": [{"uri": buffer_uri, "byteLength": buffer_len}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 48},
            {"buffer": 0, "byteOffset": 48, "byteLength": 48},
            {"buffer": 0, "byteOffset": 96, "byteLength": 32},
            {"buffer": 0, "byteOffset": 128, "byteLength": 12},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5126, "count": 4,
             "type": "VEC3"},
            {"bufferView": 2, "componentType": 5126, "count": 4,
             "type": "VEC2"},
            {"bufferView": 3, "componentType": 5123, "count": 6,
             "type": "SCALAR"},
        ],
    }


def _gltf_binary_payload():
    buf = QUAD_POS.astype("<f4").tobytes()
    buf += QUAD_NRM.astype("<f4").tobytes()
    buf += QUAD_UV.astype("<f4").tobytes()
    buf += QUAD_TRIS.astype("<u2").tobytes()
    return buf


def test_gltf_data_uri(tmp_path):
    buf = _gltf_binary_payload()
    uri = "data:application/octet-stream;base64," + base64.b64encode(buf).decode()
    doc = _gltf_doc(uri, len(buf))
    p = str(tmp_path / "quad.gltf")
    with open(p, "w") as f:
        json.dump(doc, f)
    prims = load_gltf(p)
    assert len(prims) == 2  # node 0 and its scaled child both draw mesh 0
    mesh, mat, tex, name, m, _ = prims[0]
    np.testing.assert_allclose(mesh["positions"], QUAD_POS)
    np.testing.assert_array_equal(mesh["indices"], QUAD_TRIS)
    assert mat["base_color"] == (0.8, 0.2, 0.1)
    assert abs(mat["roughness"] - 0.6) < 1e-6
    np.testing.assert_allclose(m[:3, 3], [1, 2, 3])  # parent translation
    # child: translate(1,2,3) @ scale(2)
    _, _, _, _, m2, _ = prims[1]
    np.testing.assert_allclose(np.diag(m2)[:3], [2, 2, 2])
    np.testing.assert_allclose(m2[:3, 3], [1, 2, 3])


def test_glb_container(tmp_path):
    buf = _gltf_binary_payload()
    doc = _gltf_doc(None, len(buf))
    del doc["buffers"][0]["uri"]
    js = json.dumps(doc).encode()
    js += b" " * ((-len(js)) % 4)
    binp = buf + b"\0" * ((-len(buf)) % 4)
    glb = struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(js) + 8 + len(binp))
    glb += struct.pack("<II", len(js), 0x4E4F534A) + js
    glb += struct.pack("<II", len(binp), 0x004E4942) + binp
    p = str(tmp_path / "quad.glb")
    with open(p, "wb") as f:
        f.write(glb)
    prims = load_model(p)
    mesh = prims[0][0]
    np.testing.assert_allclose(mesh["positions"], QUAD_POS)
    np.testing.assert_allclose(mesh["uvs"], QUAD_UV)


def test_gltf_builder_bakes_transforms(tmp_path):
    buf = _gltf_binary_payload()
    uri = "data:application/octet-stream;base64," + base64.b64encode(buf).decode()
    doc = _gltf_doc(uri, len(buf))
    p = str(tmp_path / "quad.gltf")
    with open(p, "w") as f:
        json.dump(doc, f)
    b = add_gltf_to_builder(SceneBuilder(), p)
    scene = b.build(env_constant=(0.1, 0.1, 0.1))
    # first primitive translated by (1,2,3): its vertices must sit there
    pos = np.asarray(scene.mesh.positions)
    assert pos[:4].min(axis=0)[2] >= 3.0 - 1e-5
