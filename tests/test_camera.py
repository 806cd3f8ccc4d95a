"""Camera parity tests against the reference's formulas
(include/camera.hpp:11-81): basis construction, orbit/pan/zoom interaction
semantics and the GL ray parameterization."""

import numpy as np

from pnraytracing_tpu.core.camera import CameraState, camera_rays, make_camera


def _state():
    return CameraState(
        eye=np.array([0.0, 1.0, 5.0]),
        center=np.array([0.0, 0.5, 0.0]),
        up=np.array([0.0, 1.0, 0.0]),
        fov_deg=50.0,
        aspect=1.5,
    )


def test_center_ray_points_at_center():
    s = _state()
    cam = s.basis()
    o, d, _ = camera_rays(cam, 2, 2)
    # (s,t)=(0.5,0.5) is the exact screen center; synthesize it directly
    center_dir = np.asarray(
        cam.lower_left + 0.5 * cam.horizontal + 0.5 * cam.vertical - cam.eye
    )
    want = s.center - s.eye
    np.testing.assert_allclose(
        center_dir / np.linalg.norm(center_dir),
        want / np.linalg.norm(want), atol=1e-6,
    )


def test_screen_half_extent_matches_fov():
    s = _state()
    cam = s.basis()
    # |horizontal| = 2 * aspect * tan(fov/2), |vertical| = 2 * tan(fov/2)
    # (camera.hpp:24-25)
    half_h = np.tan(np.radians(s.fov_deg) / 2)
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(cam.vertical)), 2 * half_h, rtol=1e-6
    )
    np.testing.assert_allclose(
        np.linalg.norm(np.asarray(cam.horizontal)), 2 * s.aspect * half_h,
        rtol=1e-6,
    )


def test_orbit_preserves_radius_and_scales_by_0_6():
    s = _state()
    r0 = np.linalg.norm(s.eye - s.center)
    eye0 = s.eye.copy()
    s.orbit(10.0, 0.0)  # pure azimuth
    r1 = np.linalg.norm(s.eye - s.center)
    np.testing.assert_allclose(r0, r1, rtol=1e-12)
    # rotation angle must be 0.6 * 10 degrees (camera.hpp:35-36)
    w0 = (eye0 - s.center) / r0
    w1 = (s.eye - s.center) / r1
    ang = np.degrees(np.arccos(np.clip(np.dot(w0, w1), -1, 1)))
    np.testing.assert_allclose(ang, 6.0, atol=1e-6)


def test_orbit_pole_clamp():
    # eye on the z-axis: the new direction's y component is sin(0.6*theta),
    # so 0.6*theta = 89 deg exceeds the 0.9995 pole clamp and is rejected
    # (camera.hpp:40-41)
    s = CameraState(
        eye=np.array([0.0, 0.0, 5.0]), center=np.zeros(3),
        up=np.array([0.0, 1.0, 0.0]), fov_deg=50.0, aspect=1.0,
    )
    eye0 = s.eye.copy()
    s.orbit(0.0, 89.0 / 0.6)
    np.testing.assert_allclose(s.eye, eye0)
    # just inside the clamp: accepted
    s.orbit(0.0, 80.0 / 0.6)
    assert not np.allclose(s.eye, eye0)


def test_pan_moves_eye_and_center_together():
    s = _state()
    gap0 = s.eye - s.center
    s.pan(3.0, -2.0)
    np.testing.assert_allclose(s.eye - s.center, gap0, atol=1e-12)
    # 0.05 scale (camera.hpp:49)
    assert np.linalg.norm(s.eye - _state().eye) > 0
    np.testing.assert_allclose(
        np.linalg.norm(s.eye - _state().eye),
        0.05 * np.linalg.norm([3.0, -2.0]), rtol=1e-6,
    )


def test_zoom_fov_clamps_to_open_interval():
    s = _state()
    s.zoom_fov(1e4)  # would exceed 89
    assert s.fov_deg == 50.0
    s.zoom_fov(10.0)
    assert s.fov_deg == 60.0
    s.zoom_fov(-1e4)  # would go below 1
    assert s.fov_deg == 60.0


def test_ray_grid_gl_convention():
    cam = make_camera((0, 0, 2), (0, 0, 0), (0, 1, 0), 60.0, 1.0)
    o, d, _ = camera_rays(cam, 4, 4)
    img_dirs = np.asarray(d).reshape(4, 4, 3)
    # row 0 is the TOP row: larger +y than the bottom row
    assert img_dirs[0, :, 1].mean() > img_dirs[-1, :, 1].mean()
    # column 0 is -x side
    assert img_dirs[:, 0, 0].mean() < img_dirs[:, -1, 0].mean()
