"""ICL-NUIM loader, fault injection, and profiling/metrics subsystem."""

import os
import struct
import zlib

import numpy as np
import pytest

from slam_rgbd_tpu.core.config import CameraIntrinsics
from slam_rgbd_tpu.io.faults import FaultInjector, FaultSpec
from slam_rgbd_tpu.io.icl_nuim import (
    ICLNUIMSequence,
    icl_nuim_camera,
    ray_to_planar_depth,
)
from slam_rgbd_tpu.io.synthetic import SyntheticSequence
from slam_rgbd_tpu.runtime import profiling
from slam_rgbd_tpu.io.tum import matrix_to_quat


def _write_png(path, arr):
    """Minimal PNG writer: (H,W) u16 gray or (H,W,3) u8 RGB, filter 0."""
    h, w = arr.shape[:2]
    if arr.ndim == 2:
        color_type, bit_depth = 0, 16
        raw = b"".join(
            b"\x00" + arr[r].astype(">u2").tobytes() for r in range(h)
        )
    else:
        color_type, bit_depth = 2, 8
        raw = b"".join(b"\x00" + arr[r].tobytes() for r in range(h))

    def chunk(tag, data):
        body = tag + data
        return (
            struct.pack(">I", len(data))
            + body
            + struct.pack(">I", zlib.crc32(body) & 0xFFFFFFFF)
        )

    ihdr = struct.pack(">IIBBBBB", w, h, bit_depth, color_type, 0, 0, 0)
    with open(path, "wb") as f:
        f.write(
            b"\x89PNG\r\n\x1a\n"
            + chunk(b"IHDR", ihdr)
            + chunk(b"IDAT", zlib.compress(raw))
            + chunk(b"IEND", b"")
        )


SMALL_CAM = CameraIntrinsics(fx=40.0, fy=40.0, cx=4.5, cy=3.5, width=10, height=8)


class TestICLNUIM:
    def test_ray_to_planar_oracle(self):
        cam = SMALL_CAM
        rng = np.random.default_rng(0)
        ray = rng.uniform(0.5, 4.0, size=(cam.height, cam.width))
        z = ray_to_planar_depth(ray, cam)
        # oracle: z * ||K^-1 [u v 1]|| == ray
        for v in (0, 3, 7):
            for u in (0, 4, 9):
                d = np.array([(u - cam.cx) / cam.fx, (v - cam.cy) / cam.fy, 1.0])
                np.testing.assert_allclose(
                    z[v, u] * np.linalg.norm(d), ray[v, u], rtol=1e-6
                )

    def test_raw_layout(self, tmp_path):
        cam = SMALL_CAM
        rng = np.random.default_rng(1)
        gt_lines = ["# frame tx ty tz qx qy qz qw"]
        rays = []
        for k in range(3):
            ray = rng.uniform(1.0, 3.0, size=(cam.height, cam.width))
            rays.append(ray)
            np.savetxt(tmp_path / f"scene_00_{k:04d}.depth", ray.reshape(1, -1))
            rgb = rng.integers(0, 255, size=(cam.height, cam.width, 3)).astype(
                np.uint8
            )
            _write_png(tmp_path / f"scene_00_{k:04d}.png", rgb)
            qx, qy, qz, qw = matrix_to_quat(np.eye(3))
            gt_lines.append(f"{k} {0.1*k} 0 0 {qx} {qy} {qz} {qw}")
        (tmp_path / "livingRoom0.gt.freiburg").write_text("\n".join(gt_lines))

        seq = ICLNUIMSequence(str(tmp_path), cam, fps=30.0)
        assert len(seq) == 3
        ts, depth, rgb = seq.frame(1)
        assert depth.shape == (cam.height, cam.width) and depth.dtype == np.uint16
        assert rgb.shape == (cam.height, cam.width, 3)
        expect = np.clip(
            np.round(ray_to_planar_depth(rays[1], cam) * 1000), 0, 65535
        ).astype(np.uint16)
        np.testing.assert_array_equal(depth, expect)
        gt = seq.groundtruth()
        assert gt.shape == (3, 4, 4)
        np.testing.assert_allclose(gt[2][:3, 3], (0.2, 0, 0), atol=1e-6)

    def test_tum_compatible_layout(self, tmp_path):
        cam = SMALL_CAM
        os.makedirs(tmp_path / "depth")
        os.makedirs(tmp_path / "rgb")
        rng = np.random.default_rng(2)
        depth_rows, rgb_rows = [], []
        for k in range(2):
            ts = k / 30.0
            d = rng.integers(500, 5000, size=(cam.height, cam.width)).astype(
                np.uint16
            )
            _write_png(tmp_path / "depth" / f"{ts:.6f}.png", d)
            rgb = rng.integers(0, 255, size=(cam.height, cam.width, 3)).astype(
                np.uint8
            )
            _write_png(tmp_path / "rgb" / f"{ts:.6f}.png", rgb)
            depth_rows.append(f"{ts:.6f} depth/{ts:.6f}.png")
            rgb_rows.append(f"{ts:.6f} rgb/{ts:.6f}.png")
        (tmp_path / "depth.txt").write_text("\n".join(depth_rows))
        (tmp_path / "rgb.txt").write_text("\n".join(rgb_rows))

        seq = ICLNUIMSequence(str(tmp_path), cam)
        assert len(seq) == 2
        _, depth, rgb = seq.frame(0)
        assert depth.dtype == np.uint16 and rgb.dtype == np.uint8

    def test_default_camera(self):
        cam = icl_nuim_camera()
        assert (cam.fx, cam.fy) == (481.20, 480.0)
        assert (cam.width, cam.height) == (640, 480)

    def test_missing_layout_raises(self, tmp_path):
        with pytest.raises(FileNotFoundError):
            ICLNUIMSequence(str(tmp_path))


class TestFaultInjection:
    def _source(self, n=6):
        cam = CameraIntrinsics(
            fx=40.0, fy=40.0, cx=15.5, cy=11.5, width=32, height=24
        )
        return SyntheticSequence(n, cam)

    def test_drop_and_groundtruth_filter(self):
        src = self._source()
        inj = FaultInjector(src, FaultSpec(drop_frames=(1, 3)))
        frames = list(inj)
        assert len(frames) == 4 == len(inj)
        assert inj.report.dropped == 2
        assert inj.groundtruth().shape == (4, 4, 4)

    def test_blackout_and_corrupt(self):
        src = self._source()
        inj = FaultInjector(
            src, FaultSpec(blackout_frames=(2,), corrupt_frames=(4,))
        )
        frames = list(inj)
        assert np.all(frames[2][1] == 0)
        d4 = frames[4][1]
        h, w = d4.shape
        assert np.all(d4[h // 4 : 3 * h // 4, w // 4 : 3 * w // 4] == 0)
        assert (inj.report.blacked_out, inj.report.corrupted) == (1, 1)

    def test_freeze_repeats_previous(self):
        src = self._source()
        inj = FaultInjector(src, FaultSpec(freeze_frames=(3,)))
        frames = list(inj)
        np.testing.assert_array_equal(frames[3][1], frames[2][1])
        assert frames[3][0] != frames[2][0]  # timestamp still advances

    def test_noise_keeps_invalid_invalid(self):
        src = self._source()
        inj = FaultInjector(src, FaultSpec(noise_mm=30.0, seed=7))
        _, d, _ = next(iter(inj))
        _, d0, _ = src.frame(0)
        invalid = d0 == 0
        assert np.all(d[invalid] == 0)
        changed = d[~invalid].astype(int) - d0[~invalid].astype(int)
        assert np.std(changed) > 5.0

    def test_session_survives_blackout(self):
        """Tracking-lost -> relocalize/odometry-fallback, no crash."""
        import dataclasses

        from slam_rgbd_tpu.core.config import astra_default_config
        from slam_rgbd_tpu.runtime.session import SLAMSession

        cam = CameraIntrinsics(
            fx=60.0, fy=60.0, cx=31.5, cy=23.5, width=64, height=48
        )
        cfg = astra_default_config()
        cfg = dataclasses.replace(
            cfg,
            camera=cam,
            icp=dataclasses.replace(
                cfg.icp, levels=2, iters=(3, 2), window_px=(4, 2)
            ),
        )
        n = 7
        src = SyntheticSequence(n, cam)
        inj = FaultInjector(src, FaultSpec(blackout_frames=(3,)))
        metrics = profiling.MetricsLog()
        sess = SLAMSession(cfg, metrics=metrics)
        for ts, depth, rgb in iter(inj):
            sess.process_frame(ts, depth, rgb)
        assert sess.state.frames == n
        assert sess.state.lost >= 1
        # tracking recovers on the frames after the blackout
        assert sess.stats[-1].tracking_ok


class TestProfiling:
    def test_stage_timer(self):
        t = profiling.StageTimer()
        with t.section("a"):
            pass
        t.add("a", 0.002)
        rep = t.report()
        assert rep["a"]["count"] == 2
        assert rep["a"]["max_ms"] >= 2.0
        assert "a" in t.summary()

    def test_metrics_log_file(self, tmp_path):
        import json

        path = str(tmp_path / "m.jsonl")
        m = profiling.MetricsLog(path)
        m.log("frame_window", fps=100.0)
        m.log("ate", rmse=0.01)
        m.close()
        rows = [json.loads(l) for l in open(path)]
        assert [r["kind"] for r in rows] == ["frame_window", "ate"]
        assert m.by_kind("ate")[0]["rmse"] == 0.01

    def test_speed_of_light(self):
        r = profiling.speed_of_light(8.19e11, 1.0, "v5e")
        assert r["fraction"] == 1.0
        assert r["sol_s"] == pytest.approx(1.0)


class TestFrameGrabber:
    """Pluggable live-sensor adapter boundary (io/grabber.py — the
    reference's astra_wrapper.h surface with the sensor loop's
    fault-tolerance, `sensorModule.c:25,50-67,216-239`)."""

    CAM = CameraIntrinsics(fx=80.0, fy=80.0, cx=39.5, cy=29.5,
                           width=80, height=60)

    def test_grabs_frames_with_intrinsics(self):
        from slam_rgbd_tpu.io.grabber import GrabberSource, SyntheticGrabber

        src = GrabberSource(
            lambda: SyntheticGrabber(self.CAM, n_frames=5))
        frames = list(src)
        assert len(frames) == 5
        ts, d, c = frames[0]
        assert d.shape == (60, 80) and d.dtype == np.uint16
        assert c.shape == (60, 80, 3) and c.dtype == np.uint8
        assert src.grabbers[-1].intrinsics.fx == 80.0

    def test_open_retry_then_success(self):
        from slam_rgbd_tpu.io.grabber import GrabberSource, SyntheticGrabber
        from slam_rgbd_tpu.core.config import StreamConfig

        g = SyntheticGrabber(self.CAM, n_frames=3, fail_open=2)
        src = GrabberSource(lambda: g, StreamConfig(init_retries=3))
        frames = list(src)
        assert len(frames) == 3
        assert g.open_attempts == 3  # two failures, then success

    def test_reinit_after_consecutive_errors(self):
        """5 consecutive grab failures tear the grabber down and open a
        REPLACEMENT (the old instance is closed first); frames before and
        after the fault window all arrive."""
        from slam_rgbd_tpu.io.grabber import GrabberSource, SyntheticGrabber
        from slam_rgbd_tpu.core.config import StreamConfig

        made = []

        def factory():
            # first instance fails frames 3..7 (5 consecutive); the
            # replacement is clean
            fail = (3, 4, 5, 6, 7) if not made else ()
            g = SyntheticGrabber(self.CAM, n_frames=10, fail_at=fail)
            made.append(g)
            return g

        src = GrabberSource(
            factory, StreamConfig(max_consecutive_errors=5))
        frames = list(src)
        assert src.reinit_count == 1
        assert len(made) == 2
        assert not made[0]._open  # predecessor torn down
        # 3 good frames from the first instance + 10 from the second
        assert len(frames) == 13

    def test_resolve_grabber_path(self):
        from slam_rgbd_tpu.io.grabber import resolve_grabber

        factory = resolve_grabber(
            "slam_rgbd_tpu.io.grabber:SyntheticGrabber")
        assert callable(factory)
        with pytest.raises(ValueError):
            resolve_grabber("no_colon_here")
        with pytest.raises(ModuleNotFoundError):
            resolve_grabber("not.a.module:thing")
