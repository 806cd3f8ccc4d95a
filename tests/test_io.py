"""OBJ/MTL loader and shapes tests."""

import numpy as np

from pnraytracing_tpu.io.obj import load_mtl, load_obj
from pnraytracing_tpu.scene import shapes

OBJ = """\
# test file
mtllib test.mtl
v 0 0 0
v 1 0 0
v 1 1 0
v 0 1 0
vt 0 0
vt 1 0
vt 1 1
vt 0 1
vn 0 0 1
usemtl red
f 1/1/1 2/2/1 3/3/1 4/4/1
"""

MTL = """\
newmtl red
Kd 0.8 0.1 0.1
Ke 0 0 0
Ns 50
"""


def test_load_obj_quad_triangulated(tmp_path):
    (tmp_path / "test.obj").write_text(OBJ)
    (tmp_path / "test.mtl").write_text(MTL)
    groups = load_obj(str(tmp_path / "test.obj"))
    assert len(groups) == 1
    mesh, mat, tex, name = groups[0]
    assert mesh["indices"].shape == (2, 3)  # quad -> 2 tris (fan)
    assert mesh["positions"].shape == (4, 3)
    np.testing.assert_allclose(mat["base_color"], (0.8, 0.1, 0.1))
    assert tex is None
    # uv flip (aiProcess_FlipUVs semantics)
    assert mesh["uvs"][0, 1] == 1.0


def test_load_obj_negative_indices(tmp_path):
    obj = "v 0 0 0\nv 1 0 0\nv 0 1 0\nf -3 -2 -1\n"
    (tmp_path / "n.obj").write_text(obj)
    groups = load_obj(str(tmp_path / "n.obj"))
    mesh = groups[0][0]
    np.testing.assert_array_equal(mesh["indices"], [[0, 1, 2]])


def test_load_mtl_missing(tmp_path):
    assert load_mtl(str(tmp_path / "nope.mtl")) == {}


def test_shapes_wellformed():
    for mesh in (shapes.triangle(), shapes.quad(), shapes.cube(),
                 shapes.icosphere(2), shapes.teapot(segments=16)):
        p = mesh["positions"]
        idx = mesh["indices"]
        assert p.ndim == 2 and p.shape[1] == 3
        assert idx.min() >= 0 and idx.max() < len(p)
        # no degenerate triangles
        tri = p[idx]
        areas = 0.5 * np.linalg.norm(
            np.cross(tri[:, 1] - tri[:, 0], tri[:, 2] - tri[:, 0]), axis=1
        )
        assert (areas > 1e-9).all()


def test_teapot_size_class():
    """BASELINE config 2 wants a ~6k-triangle mesh at default resolution."""
    t = shapes.teapot()
    n = len(t["indices"])
    assert 4000 <= n <= 12000, n


def test_icosphere_counts():
    assert len(shapes.icosphere(0)["indices"]) == 20
    assert len(shapes.icosphere(3)["indices"]) == 20 * 4**3


def test_marry_texture_loads_if_present():
    import os

    from pnraytracing_tpu.io.obj import load_texture

    path = "/root/reference/model/marry/MC003_Kozakura_Mari.png"
    if not os.path.exists(path):
        return
    tex = load_texture(path)
    assert tex is not None and tex.ndim == 3 and tex.shape[2] == 3
    assert 0.0 <= tex.min() and tex.max() <= 1.0


def test_png_reader_roundtrip(tmp_path):
    """First-party PNG reader decodes the first-party writer's output
    (stored-deflate RGB) exactly."""
    import numpy as np

    from pnraytracing_tpu.io.png import read_png_rgb
    from pnraytracing_tpu.utils.image import save_png

    rng = np.random.default_rng(7)
    img = rng.random((33, 47, 3)).astype(np.float32)
    p = str(tmp_path / "rt.png")
    save_png(p, img, gamma=1.0)  # gamma 1: bytes are round(img*255)
    back = read_png_rgb(p)
    np.testing.assert_allclose(back, np.round(img * 255) / 255, atol=1e-7)


def test_png_reader_matches_pil_on_filtered_files(tmp_path):
    """PIL-written PNGs exercise real scanline filters (Sub/Up/Avg/Paeth)
    and palette/gray/alpha color types."""
    import numpy as np

    import pytest

    PIL = pytest.importorskip("PIL.Image")
    from pnraytracing_tpu.io.png import read_png, read_png_rgb

    rng = np.random.default_rng(3)
    # smooth gradient + noise: encoders pick varied filters per row
    g = np.linspace(0, 255, 64)[:, None] + rng.integers(0, 40, (64, 96))
    base = np.clip(g, 0, 255).astype(np.uint8)
    cases = {
        "rgb": np.stack([base, base[::-1], base[:, ::-1]], -1),
        "gray": base,
        "rgba": np.stack([base, base[::-1], base[:, ::-1],
                          np.full_like(base, 200)], -1),
    }
    for name, arr in cases.items():
        p = str(tmp_path / f"{name}.png")
        PIL.fromarray(arr).save(p)
        ours = read_png(p)
        ref = np.asarray(PIL.open(p).convert("RGB"), np.float32) / 255.0
        np.testing.assert_allclose(read_png_rgb(p), ref, atol=1e-7)
    # palette
    pal_img = PIL.fromarray(cases["rgb"]).quantize(colors=17)
    p = str(tmp_path / "pal.png")
    pal_img.save(p)
    ref = np.asarray(PIL.open(p).convert("RGB"), np.float32) / 255.0
    np.testing.assert_allclose(read_png_rgb(p), ref, atol=1e-7)
