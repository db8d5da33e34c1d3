"""Native software point-cloud viewer (native/libslamviz.so via ctypes)."""

import os

import numpy as np
import pytest

from slam_rgbd_tpu.core.config import CameraIntrinsics
from slam_rgbd_tpu.viz import native as nv

pytestmark = pytest.mark.skipif(
    not nv.native_available(), reason="native viewer unavailable"
)

CAM = CameraIntrinsics(fx=60.0, fy=60.0, cx=39.5, cy=29.5, width=80, height=60)
BG = np.array([11, 14, 20], np.uint8)


def _frame(seed=0):
    rng = np.random.default_rng(seed)
    depth = rng.integers(800, 3000, size=(60, 80)).astype(np.uint16)
    depth[10:20, 10:20] = 0
    rgb = rng.integers(0, 255, size=(60, 80, 3)).astype(np.uint8)
    return depth, rgb


class TestBackproject:
    def test_count_and_oracle(self):
        depth, rgb = _frame()
        pts, cols = nv.backproject(depth, rgb, CAM)
        assert pts.shape == (60 * 80 - 100, 3)
        assert cols.shape == pts.shape
        # reference math (viewerModule.c:336-357): z = mm/1000,
        # x = (u-cx) z / fx, y = (v-cy) z / fy — check against numpy oracle
        v, u = np.meshgrid(np.arange(60), np.arange(80), indexing="ij")
        z = depth.astype(np.float64) / 1000.0
        mask = depth > 0
        exp = np.stack(
            [(u - CAM.cx) * z / CAM.fx, (v - CAM.cy) * z / CAM.fy, z], -1
        )[mask]
        np.testing.assert_allclose(pts, exp.astype(np.float32), atol=1e-5)
        np.testing.assert_array_equal(cols, rgb[mask])

    def test_pose_transform(self):
        depth, rgb = _frame(1)
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = (0.5, -0.25, 1.0)
        p0, _ = nv.backproject(depth, rgb, CAM)
        p1, _ = nv.backproject(depth, rgb, CAM, T_cw=T)
        np.testing.assert_allclose(p1 - p0, np.tile(T[:3, 3], (len(p0), 1)),
                                   atol=1e-5)


class TestRender:
    def test_points_visible_and_zbuffered(self):
        with nv.NativeViewer(160, 120) as vw:
            # two points on the same ray: the nearer one must win
            pts = np.array([[0.0, 0.0, 1.0], [0.0, 0.0, 2.0]], np.float32)
            cols = np.array([[255, 0, 0], [0, 255, 0]], np.uint8)
            vw.set_target(0, 0, 0.0)  # camera at dist=2 behind origin
            frame = vw.render(pts, cols)
            lit = np.argwhere(np.any(frame != BG, axis=-1))
            assert len(lit) > 0
            # the red (nearer) point owns the center pixel
            cy, cx = 60, 80
            assert frame[cy, cx, 0] > frame[cy, cx, 1]

    def test_orbit_zoom_change_image(self):
        depth, rgb = _frame(2)
        pts, cols = nv.backproject(depth, rgb, CAM)
        with nv.NativeViewer(160, 120) as vw:
            vw.set_target(0, 0, float(np.median(pts[:, 2])))
            a = vw.render(pts, cols)
            vw.orbit(80.0, 30.0)
            b = vw.render(pts, cols)
            vw.zoom(4)
            c = vw.render(pts, cols)
        assert np.any(a != b) and np.any(b != c)
        for f in (a, b, c):
            assert int(np.sum(np.any(f != BG, axis=-1))) > 100

    def test_ppm_roundtrip(self, tmp_path):
        depth, rgb = _frame(3)
        pts, cols = nv.backproject(depth, rgb, CAM)
        path = str(tmp_path / "cloud.ppm")
        with nv.NativeViewer(64, 48) as vw:
            vw.set_target(0, 0, float(np.median(pts[:, 2])))
            frame = vw.render(pts, cols)
            vw.write_ppm(path, frame)
        data = open(path, "rb").read()
        assert data.startswith(b"P6\n64 48\n255\n")
        pixels = np.frombuffer(data.split(b"255\n", 1)[1], np.uint8)
        np.testing.assert_array_equal(pixels.reshape(48, 64, 3), frame)


def test_cli_export_ppm(tmp_path, monkeypatch):
    from slam_rgbd_tpu.cli.main import build_parser, main

    out = str(tmp_path / "snap.ppm")
    rc = main(["export", "synthetic:2", out, "--frame", "1", "--stride", "2"])
    assert rc == 0
    assert open(out, "rb").read(2) == b"P6"
