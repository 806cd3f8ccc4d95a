"""Native C++ IO components vs their pure-Python oracles.

The reference's asset layer is native (assimp model import, model.hpp:25;
stb image IO, shader.hpp:131); csrc/obj_loader.cpp and csrc/image_io.cpp are
the TPU framework's counterparts.  These tests require g++ (baked into the
image); they cross-validate every native codepath against the Python
implementation byte-for-byte / array-for-array.
"""

from __future__ import annotations

import os

import numpy as np
import pytest

from pnraytracing_tpu.io import hdr as pyhdr
from pnraytracing_tpu.io import obj as pyobj

native = pytest.importorskip("pnraytracing_tpu.io.native")

if not native.native_io_available():
    pytest.skip("native toolchain unavailable", allow_module_level=True)


@pytest.fixture()
def rng():
    return np.random.default_rng(7)


# --------------------------------------------------------------------- HDR
def test_hdr_native_reads_python_written(tmp_path, rng):
    img = (rng.random((37, 64, 3)) * 10.0).astype(np.float32)
    img[5, 5] = 0.0  # exercise the zero-exponent case
    p = str(tmp_path / "flat.hdr")
    pyhdr.write_hdr(p, img)
    out = native.read_hdr_native(p)
    ref = pyhdr.read_hdr(p)
    np.testing.assert_array_equal(out, ref)


def test_hdr_python_reads_native_written_flat(tmp_path, rng):
    img = (rng.random((16, 33, 3)) * 100.0).astype(np.float32)
    p = str(tmp_path / "native_flat.hdr")
    native.write_hdr_native(p, img, rle=False)
    ref = pyhdr.read_hdr(p)
    out = native.read_hdr_native(p)
    np.testing.assert_array_equal(out, ref)
    # RGBE quantization error is bounded by the pixel's max channel / 128
    bound = img.max(axis=-1, keepdims=True) / 128.0 + 1e-6
    assert np.all(np.abs(out - img) <= bound)


def test_hdr_rle_roundtrip(tmp_path, rng):
    # long runs + noise to exercise both RLE paths
    img = np.zeros((24, 128, 3), np.float32)
    img[:, :64] = 3.25
    img[:, 64:] = (rng.random((24, 64, 3)) * 5.0).astype(np.float32)
    p_rle = str(tmp_path / "rle.hdr")
    p_flat = str(tmp_path / "flat.hdr")
    native.write_hdr_native(p_rle, img, rle=True)
    native.write_hdr_native(p_flat, img, rle=False)
    # RLE must actually compress the constant half
    assert os.path.getsize(p_rle) < os.path.getsize(p_flat)
    # both decoders agree on both encodings
    np.testing.assert_array_equal(
        native.read_hdr_native(p_rle), native.read_hdr_native(p_flat)
    )
    np.testing.assert_array_equal(
        pyhdr.read_hdr(p_rle), native.read_hdr_native(p_rle)
    )


def test_hdr_reads_reference_asset_if_present():
    ref = "/root/reference/HDR/vignaioli_night_1k.hdr"
    if not os.path.exists(ref):
        pytest.skip("reference HDR asset not present")
    a = native.read_hdr_native(ref)
    b = pyhdr.read_hdr(ref)
    np.testing.assert_array_equal(a, b)
    assert a.shape[0] > 0 and a.shape[1] > 0


# --------------------------------------------------------------------- PNG
def test_png_native_is_valid_and_pixel_exact(tmp_path, rng):
    pytest.importorskip("PIL")
    from PIL import Image

    img = rng.random((21, 45, 3)).astype(np.float32)
    p = str(tmp_path / "native.png")
    native.save_png_native(p, img, gamma=2.2)
    from pnraytracing_tpu.utils.image import tonemap

    expect = (tonemap(img, gamma=2.2) * 255.0 + 0.5).astype(np.uint8)
    got = np.asarray(Image.open(p).convert("RGB"))
    np.testing.assert_array_equal(got, expect)


# --------------------------------------------------------------------- OBJ
_OBJ = """\
# demo object
mtllib demo.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
v 0 0 1
vt 0 0
vt 1 0
vt 1 1
vt 0 1
vn 0 0 1
vn 0 1 0
usemtl red
f 1/1/1 2/2/1 3/3/1 4/4/1
usemtl glow
f 1//2 2//2 5//2
f -5/-4 -4/-3 -1/-1
"""

_MTL = """\
newmtl red
Kd 0.8 0.1 0.1
Ns 96
newmtl glow
Kd 0.2 0.2 0.2
Ke 4 3 2
"""


def _write_demo(tmp_path):
    (tmp_path / "demo.obj").write_text(_OBJ)
    (tmp_path / "demo.mtl").write_text(_MTL)
    return str(tmp_path / "demo.obj")


def test_obj_native_matches_python(tmp_path):
    path = _write_demo(tmp_path)
    py = pyobj.load_obj(path)
    nat = native.load_obj_native(path)
    assert len(py) == len(nat) == 2
    for (pm, pd, pt, pn), (nm, nd, nt, nn) in zip(py, nat):
        assert pn == nn
        assert pt is None and nt is None
        assert set(pd) == set(nd)
        for k, v in pd.items():  # f32 storage in the native path
            np.testing.assert_allclose(nd[k], v, rtol=1e-6)
        np.testing.assert_array_equal(pm["indices"], nm["indices"])
        np.testing.assert_allclose(pm["positions"], nm["positions"])
        np.testing.assert_allclose(pm["normals"], nm["normals"])
        np.testing.assert_allclose(pm["uvs"], nm["uvs"])


def test_obj_native_fan_and_negative_indices(tmp_path):
    path = _write_demo(tmp_path)
    nat = native.load_obj_native(path)
    red = nat[0][0]
    assert len(red["indices"]) == 2  # quad fan-triangulated
    glow = nat[1][0]
    assert len(glow["indices"]) == 2  # one positive + one negative-index tri
    # negative indices resolved the same triangle corners as positives
    mats = nat[1][1]
    assert mats["emissive"] == (4.0, 3.0, 2.0)


def test_obj_native_flip_v(tmp_path):
    path = _write_demo(tmp_path)
    flipped = native.load_obj_native(path, flip_v=True)[0][0]["uvs"]
    raw = native.load_obj_native(path, flip_v=False)[0][0]["uvs"]
    np.testing.assert_allclose(flipped[:, 1], 1.0 - raw[:, 1])
    np.testing.assert_allclose(flipped[:, 0], raw[:, 0])


def test_io_package_auto_dispatch(tmp_path, rng):
    """pnraytracing_tpu.io wrappers route to a working implementation."""
    import pnraytracing_tpu.io as pio

    img = (rng.random((8, 16, 3)) * 4).astype(np.float32)
    p = str(tmp_path / "w.hdr")
    pio.write_hdr(p, img)
    out = pio.read_hdr(p)
    bound = img.max(axis=-1, keepdims=True) / 128.0 + 1e-6
    assert np.all(np.abs(out - img) <= bound)
    path = _write_demo(tmp_path)
    groups = pio.load_obj(path)
    assert len(groups) == 2
    png = str(tmp_path / "w.png")
    pio.save_png(png, img)
    assert os.path.getsize(png) > 0
