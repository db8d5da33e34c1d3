"""Viz + CLI tests: PLY roundtrip, JSON payload, HTTP server, CLI verbs."""

import json
import os
import urllib.request

import numpy as np
import pytest

from slam_rgbd_tpu.cli.main import main as cli_main
from slam_rgbd_tpu.core.config import CameraIntrinsics
from slam_rgbd_tpu.io.synthetic import SyntheticSequence
from slam_rgbd_tpu.viz import pointcloud as pc
from slam_rgbd_tpu.viz.server import PointCloudServer

CAM = CameraIntrinsics(fx=80.0, fy=80.0, cx=39.5, cy=29.5, width=80, height=60)


class TestPointCloud:
    def test_frame_to_pointcloud(self):
        seq = SyntheticSequence(1, CAM)
        _, depth, rgb = seq.frame(0)
        pts, colors = pc.frame_to_pointcloud(depth, rgb, CAM)
        assert pts.shape[1] == 3 and colors.shape == (len(pts), 3)
        assert len(pts) > 4000
        assert np.all(pts[:, 2] > 0)

    def test_world_transform(self):
        seq = SyntheticSequence(1, CAM)
        _, depth, rgb = seq.frame(0)
        T = np.eye(4, dtype=np.float32)
        T[:3, 3] = (1.0, 2.0, 3.0)
        p1, _ = pc.frame_to_pointcloud(depth, rgb, CAM)
        p2, _ = pc.frame_to_pointcloud(depth, rgb, CAM, T_world_cam=T)
        np.testing.assert_allclose(p2 - p1, np.tile(T[:3, 3], (len(p1), 1)), atol=1e-5)

    @pytest.mark.parametrize("binary", [True, False])
    def test_ply_roundtrip(self, tmp_path, rng, binary):
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        colors = rng.integers(0, 255, size=(100, 3)).astype(np.uint8)
        path = str(tmp_path / "cloud.ply")
        pc.save_ply(path, pts, colors, binary=binary)
        p2, c2 = pc.load_ply(path)
        np.testing.assert_allclose(p2, pts, atol=1e-4)
        np.testing.assert_array_equal(c2, colors)

    def test_json_payload_caps_points(self, rng):
        pts = rng.normal(size=(1000, 3)).astype(np.float32)
        payload = json.loads(pc.pointcloud_json(pts, max_points=100))
        assert len(payload["positions"]) == 300


class TestServer:
    def test_serves_pointcloud(self, rng):
        pts = rng.normal(size=(50, 3)).astype(np.float32)
        colors = rng.integers(0, 255, size=(50, 3)).astype(np.uint8)
        srv = PointCloudServer(lambda: (pts, colors), port=0).start()
        try:
            url = f"http://127.0.0.1:{srv.port}"
            html = urllib.request.urlopen(url + "/").read().decode()
            assert "three" in html.lower()
            data = json.loads(urllib.request.urlopen(url + "/pointcloud").read())
            assert len(data["positions"]) == 150
            assert len(data["colors"]) == 150
            with pytest.raises(urllib.error.HTTPError):
                urllib.request.urlopen(url + "/nope")
        finally:
            srv.stop()

    def test_native_interactive_loop(self, rng):
        """The live native-viewer loop: /native/frame renders the current
        cloud through the C++ rasterizer, /native/orbit + /native/zoom
        mutate its camera (the reference's GLFW mouse verbs,
        `viewerModule.c:416-440`), and the next frame reflects it."""
        from slam_rgbd_tpu.viz.native import native_available

        if not native_available():
            pytest.skip("native viewer library not available")
        pts = rng.normal(size=(200, 3)).astype(np.float32)
        colors = rng.integers(0, 255, size=(200, 3)).astype(np.uint8)
        srv = PointCloudServer(lambda: (pts, colors), port=0).start()
        try:
            url = f"http://127.0.0.1:{srv.port}"
            html = urllib.request.urlopen(url + "/native").read().decode()
            assert "/native/orbit" in html
            f0 = urllib.request.urlopen(url + "/native/frame").read()
            assert f0[:8] == b"\x89PNG\r\n\x1a\n"
            urllib.request.urlopen(url + "/native/orbit?dx=120&dy=40").read()
            urllib.request.urlopen(url + "/native/zoom?steps=2").read()
            f1 = urllib.request.urlopen(url + "/native/frame").read()
            assert f1[:8] == b"\x89PNG\r\n\x1a\n"
            assert f1 != f0  # the camera moved; the rendering changed
        finally:
            srv.stop()


def small_cfg_yaml(tmp_path) -> str:
    """A small-resolution config so CLI tests compile fast on CPU."""
    from slam_rgbd_tpu.core.config import KeyframeConfig, ORBConfig, SLAMConfig

    cfg = SLAMConfig(
        camera=CAM,
        orb=ORBConfig(n_features=128, n_levels=3),
        keyframes=KeyframeConfig(max_keyframes=16, max_map_points=1024),
    )
    path = str(tmp_path / "cfg.yaml")
    cfg.to_yaml(path)
    return path


class TestCLI:
    def test_record_play_eval_roundtrip(self, tmp_path):
        cfgp = small_cfg_yaml(tmp_path)
        rec = str(tmp_path / "seq.rgbd")
        traj = str(tmp_path / "traj.txt")
        gt_traj = str(tmp_path / "gt.txt")
        # record a synthetic clip
        assert cli_main(["--config", cfgp, "record", "synthetic:6", rec, "--frames", "6"]) == 0
        assert os.path.getsize(rec) > 1000
        # write ground truth for eval (synthetic source regenerates same poses)
        from slam_rgbd_tpu.eval.trajectory import save_trajectory_tum
        from slam_rgbd_tpu.io.synthetic import SyntheticSequence as SS

        seq = SS(6, CAM)
        save_trajectory_tum(gt_traj, seq.timestamps, seq.groundtruth())
        # play the recording through SLAM
        assert cli_main(["--config", cfgp, "play", rec, "--traj", traj]) == 0
        assert os.path.exists(traj)
        # evaluate
        import io
        from contextlib import redirect_stdout

        buf = io.StringIO()
        with redirect_stdout(buf):
            assert cli_main(["eval", traj, gt_traj]) == 0
        out = json.loads(buf.getvalue().strip().splitlines()[-1])
        assert "ate_rmse_m" in out and out["frames"] == 6

    def test_export_ply(self, tmp_path):
        cfgp = small_cfg_yaml(tmp_path)
        out = str(tmp_path / "frame.ply")
        assert cli_main(["--config", cfgp, "export", "synthetic:1", out]) == 0
        pts, colors = pc.load_ply(out)
        assert len(pts) > 1000

    def test_run_synthetic_with_checkpoint(self, tmp_path):
        cfgp = small_cfg_yaml(tmp_path)
        ckpt = str(tmp_path / "ckpt")
        assert cli_main(["--config", cfgp, "run", "synthetic:5", "--checkpoint", ckpt]) == 0
        assert os.path.exists(os.path.join(ckpt, "state.npz"))

    def test_bad_input_rejected(self):
        with pytest.raises(SystemExit):
            cli_main(["run", "/nonexistent/path"])

    def test_run_serve_live_map(self, tmp_path):
        """`run --serve`: the reference's flagship live pipeline
        (camera -> hub -> viewer, `main.c:263-299`) as one command — the
        web endpoint streams the RUNNING session's map, which must be
        seen GROWING while frames are processed."""
        import socket
        import threading
        import time

        cfgp = small_cfg_yaml(tmp_path)
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()

        rc = {}
        t = threading.Thread(
            target=lambda: rc.update(code=cli_main(
                ["--config", cfgp, "run", "synthetic:40", "--threaded",
                 "--serve", str(port)]
            )),
            daemon=True,
        )
        t.start()
        url = f"http://127.0.0.1:{port}"
        counts = []
        deadline = time.monotonic() + 120
        while t.is_alive() and time.monotonic() < deadline:
            try:
                data = json.loads(
                    urllib.request.urlopen(url + "/pointcloud", timeout=2).read()
                )
                counts.append(len(data["positions"]) // 3)
            except Exception:  # noqa: BLE001 — server not up yet
                pass
            time.sleep(0.05)
        t.join(timeout=60)
        assert not t.is_alive()
        assert rc.get("code") == 0
        nonzero = [c for c in counts if c > 0]
        assert nonzero, "live endpoint never served map points"
        assert nonzero[-1] > nonzero[0], (
            f"map did not grow over the live run: {nonzero[:3]}..."
            f"{nonzero[-3:]}"
        )
