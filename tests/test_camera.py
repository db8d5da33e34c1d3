"""Camera / pyramid ops vs. NumPy oracles."""

import jax.numpy as jnp
import numpy as np

from slam_rgbd_tpu.core import camera
from slam_rgbd_tpu.core.config import CameraIntrinsics, SLAMConfig

CAM = CameraIntrinsics(fx=100.0, fy=120.0, cx=31.5, cy=23.5, width=64, height=48,
                       depth_scale=1000.0, min_depth=0.2, max_depth=8.0)


class TestProjection:
    def test_backproject_oracle(self, rng):
        depth = rng.uniform(500, 4000, size=(48, 64)).astype(np.uint16)
        verts = np.asarray(camera.backproject(
            camera.depth_to_metres(jnp.asarray(depth), CAM), CAM))
        u, v = 10, 20
        z = depth[v, u] / 1000.0
        np.testing.assert_allclose(verts[v, u, 2], z, rtol=1e-5)
        np.testing.assert_allclose(verts[v, u, 0], (u - CAM.cx) * z / CAM.fx, rtol=1e-5)
        np.testing.assert_allclose(verts[v, u, 1], (v - CAM.cy) * z / CAM.fy, rtol=1e-5)

    def test_project_backproject_roundtrip(self, rng):
        depth = rng.uniform(500, 4000, size=(48, 64)).astype(np.uint16)
        verts = camera.backproject(camera.depth_to_metres(jnp.asarray(depth), CAM), CAM)
        uv, valid = camera.project(verts.reshape(-1, 3), CAM)
        uv = np.asarray(uv).reshape(48, 64, 2)
        u, v = camera.pixel_grid(48, 64)
        np.testing.assert_allclose(uv[..., 0], np.asarray(u), atol=1e-3)
        np.testing.assert_allclose(uv[..., 1], np.asarray(v), atol=1e-3)
        assert bool(np.all(np.asarray(valid)))

    def test_invalid_depth_masked(self):
        depth = np.zeros((48, 64), np.uint16)
        depth[5, 5] = 50  # 5 cm < min_depth
        depth[6, 6] = 9000  # 9 m > max_depth
        verts = np.asarray(camera.backproject(
            camera.depth_to_metres(jnp.asarray(depth), CAM), CAM))
        assert np.all(verts == 0)


class TestNormals:
    def test_plane_normals(self):
        # A fronto-parallel plane at z=2 has normals (0, 0, -1).
        depth = jnp.full((48, 64), 2.0)
        verts = camera.backproject(depth, CAM)
        n = np.asarray(camera.normal_map(verts))
        interior = n[2:-2, 2:-2]
        np.testing.assert_allclose(interior[..., 2], -1.0, atol=1e-4)

    def test_sloped_plane_normals(self):
        # Plane z = 1 + 0.01 * x: surface normal ∝ (dz/dx, dz/dy, -1)
        # oriented toward the camera => (0.01, 0, -1) normalized.
        u, v = camera.pixel_grid(48, 64)
        # solve z = 1 + 0.01 * x where x = (u - cx) z / fx
        z = 1.0 / (1.0 - 0.01 * (u - CAM.cx) / CAM.fx)
        verts = camera.backproject(z, CAM)
        n = np.asarray(camera.normal_map(verts))[10:-10, 10:-10]
        want = np.array([0.01, 0.0, -1.0])
        want = want / np.linalg.norm(want)
        np.testing.assert_allclose(n, np.broadcast_to(want, n.shape), atol=1e-3)

    def test_border_invalid(self):
        depth = jnp.full((48, 64), 2.0)
        n = np.asarray(camera.normal_map(camera.backproject(depth, CAM)))
        assert np.all(n[0] == 0) and np.all(n[-1] == 0)
        assert np.all(n[:, 0] == 0) and np.all(n[:, -1] == 0)


class TestPyramid:
    def test_downsample_validity(self):
        d = np.full((8, 8), 2.0, np.float32)
        d[0:2, 0:2] = 0.0  # fully invalid block
        d[0, 2] = 0.0  # half-invalid block
        out = np.asarray(camera.downsample_depth(jnp.asarray(d)))
        assert out.shape == (4, 4)
        assert out[0, 0] == 0.0
        np.testing.assert_allclose(out[0, 1], 2.0)  # mean of valid only

    def test_build_pyramid_shapes(self, rng):
        depth = rng.uniform(500, 4000, size=(48, 64)).astype(np.uint16)
        pyr = camera.build_frame_pyramid(jnp.asarray(depth), CAM, levels=3)
        assert len(pyr) == 3
        assert pyr[0]["vertices"].shape == (48, 64, 3)
        assert pyr[1]["vertices"].shape == (24, 32, 3)
        assert pyr[2]["vertices"].shape == (12, 16, 3)
        assert pyr[0]["valid"].dtype == jnp.bool_

    def test_scaled_intrinsics(self):
        c2 = CAM.scaled(2.0)
        assert c2.width == 32 and c2.height == 24
        np.testing.assert_allclose(c2.fx, CAM.fx / 2)
        # pixel-center convention: cx' = (cx + 0.5)/s - 0.5
        np.testing.assert_allclose(c2.cx, (CAM.cx + 0.5) / 2 - 0.5)


class TestBilateral:
    def test_preserves_plane(self):
        d = jnp.full((32, 32), 2.0)
        out = np.asarray(camera.bilateral_depth_filter(d))
        np.testing.assert_allclose(out, 2.0, atol=1e-5)

    def test_smooths_noise_keeps_edges(self, rng):
        d = np.full((32, 32), 2.0, np.float32)
        d[:, 16:] = 4.0  # step edge
        noisy = d + rng.normal(size=d.shape).astype(np.float32) * 0.01
        out = np.asarray(camera.bilateral_depth_filter(jnp.asarray(noisy)))
        # noise reduced
        assert np.std(out[:, :14] - 2.0) < np.std(noisy[:, :14] - 2.0)
        # edge not smeared
        assert abs(out[16, 15] - 2.0) < 0.1 and abs(out[16, 16] - 4.0) < 0.1

    def test_invalid_not_filled(self):
        d = np.full((16, 16), 2.0, np.float32)
        d[8, 8] = 0.0
        out = np.asarray(camera.bilateral_depth_filter(jnp.asarray(d)))
        assert out[8, 8] == 0.0


class TestConfig:
    def test_yaml_roundtrip(self, tmp_path):
        cfg = SLAMConfig()
        p = tmp_path / "cfg.yaml"
        cfg.to_yaml(str(p))
        back = SLAMConfig.from_yaml(str(p))
        assert back == cfg

    def test_hashable_static_arg(self):
        cfg = SLAMConfig()
        assert hash(cfg.camera) == hash(SLAMConfig().camera)

    def test_rgb_to_intensity(self):
        rgb = np.zeros((4, 4, 3), np.uint8)
        rgb[..., 1] = 255
        i = np.asarray(camera.rgb_to_intensity(jnp.asarray(rgb)))
        np.testing.assert_allclose(i, 0.587 * 255, rtol=1e-5)
