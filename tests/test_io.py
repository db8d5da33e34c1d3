"""IO layer tests: synthetic scenes, record/replay, queues, control, retry."""

import threading
import time

import jax.numpy as jnp
import numpy as np
import pytest

from slam_rgbd_tpu.core import camera, se3
from slam_rgbd_tpu.core.config import CameraIntrinsics
from slam_rgbd_tpu.io import stream as st
from slam_rgbd_tpu.io.synthetic import SceneSpec, SyntheticSequence, render_frame
from slam_rgbd_tpu.io.tum import associate, matrix_to_quat, quat_to_matrix

SMALL_CAM = CameraIntrinsics(fx=80.0, fy=80.0, cx=39.5, cy=29.5, width=80, height=60)


class TestSynthetic:
    def test_render_shapes_and_validity(self):
        seq = SyntheticSequence(3, SMALL_CAM)
        ts, depth, rgb = seq.frame(0)
        assert depth.shape == (60, 80) and depth.dtype == np.uint16
        assert rgb.shape == (60, 80, 3) and rgb.dtype == np.uint8
        # camera is inside the room: every ray hits something
        assert np.all(depth > 0)
        assert depth.max() < 65535

    def test_depth_consistency_with_groundtruth(self):
        """Backprojected points from frame i, moved to frame i+1's camera,
        must reproject onto surfaces with matching depth (static scene)."""
        seq = SyntheticSequence(6, SMALL_CAM, step_t=0.02)
        _, d0, _ = seq.frame(0)
        _, d5, _ = seq.frame(5)
        T0, T5 = seq.poses[0], seq.poses[5]
        v0 = camera.backproject(camera.depth_to_metres(jnp.asarray(d0), SMALL_CAM), SMALL_CAM)
        T_5_0 = np.asarray(se3.inverse(jnp.asarray(T5))) @ T0  # frame0 cam -> frame5 cam
        p5 = se3.transform_points(jnp.asarray(T_5_0.astype(np.float32)), v0.reshape(-1, 3))
        uv, valid = camera.project(p5, SMALL_CAM)
        uv = np.asarray(uv)
        valid = np.asarray(valid) & (np.asarray(v0.reshape(-1, 3))[:, 2] > 0)
        ui = np.clip(np.round(uv[:, 0]).astype(int), 0, 79)
        vi = np.clip(np.round(uv[:, 1]).astype(int), 0, 59)
        z_expected = np.asarray(p5)[:, 2]
        z_observed = d5[vi, ui] / 1000.0
        err = np.abs(z_expected - z_observed)[valid]
        # most points agree (occlusion changes affect a minority)
        assert np.median(err) < 0.02

    def test_texture_viewpoint_stable(self):
        """Same world point renders the same color from different poses."""
        spec = SceneSpec()
        seq = SyntheticSequence(2, SMALL_CAM, spec=spec, step_t=0.0, step_r=0.0)
        _, _, rgb0 = seq.frame(0)
        _, _, rgb1 = seq.frame(1)
        assert np.array_equal(rgb0, rgb1)

    def test_groundtruth_shape(self):
        seq = SyntheticSequence(10, SMALL_CAM)
        gt = seq.groundtruth()
        assert gt.shape == (10, 4, 4)
        # rotations orthonormal
        R = gt[:, :3, :3]
        err = np.abs(R @ R.transpose(0, 2, 1) - np.eye(3)).max()
        assert err < 1e-5


class TestRecordReplay:
    def test_roundtrip(self, tmp_path, rng):
        path = str(tmp_path / "seq.rgbd")
        frames = []
        with st.StreamRecorder(path) as rec:
            for i in range(5):
                d = rng.integers(0, 5000, size=(60, 80)).astype(np.uint16)
                c = rng.integers(0, 255, size=(60, 80, 3)).astype(np.uint8)
                rec.write(i / 30.0, d, c)
                frames.append((i / 30.0, d, c))
        out = list(st.StreamReader(path))
        assert len(out) == 5
        for (ts0, d0, c0), (ts1, d1, c1) in zip(frames, out):
            assert abs(ts0 - ts1) < 1e-6
            assert np.array_equal(d0, d1)
            assert np.array_equal(c0, c1)

    def test_truncated_file_stops_cleanly(self, tmp_path, rng):
        path = str(tmp_path / "trunc.rgbd")
        rec = st.StreamRecorder(path)
        d = rng.integers(0, 5000, size=(60, 80)).astype(np.uint16)
        c = rng.integers(0, 255, size=(60, 80, 3)).astype(np.uint8)
        rec.write(0.0, d, c)
        rec.write(1.0, d, c)
        rec._f.flush()
        # simulate crash: no EOF marker, half a frame appended
        with open(path, "ab") as f:
            f.write(b"\x01" * 10)
        out = list(st.StreamReader(path))
        assert len(out) == 2

    def test_bad_magic_rejected(self, tmp_path):
        p = tmp_path / "bad.rgbd"
        p.write_bytes(b"NOTMAGIC" + b"\x00" * 64)
        with pytest.raises(ValueError):
            st.StreamReader(str(p))

    def test_corrupt_header_rejected(self, tmp_path, rng):
        path = str(tmp_path / "corrupt.rgbd")
        with st.StreamRecorder(path) as rec:
            d = rng.integers(0, 5000, size=(60, 80)).astype(np.uint16)
            c = rng.integers(0, 255, size=(60, 80, 3)).astype(np.uint8)
            rec.write(0.0, d, c)
        data = bytearray(open(path, "rb").read())
        data[8 + 16] = 99  # clobber frame_type of first frame
        open(path, "wb").write(bytes(data))
        with pytest.raises(ValueError):
            list(st.StreamReader(path))


class TestBoundedQueue:
    def test_drop_policy(self):
        q = st.BoundedFrameQueue(capacity=10, drop_to=5)
        for i in range(11):
            q.put(i)
        # over capacity at 11 -> dropped oldest 6, keeping 5 freshest
        assert len(q) == 5
        assert q.dropped == 6
        assert q.get() == 6

    def test_blocking_get_and_close(self):
        q = st.BoundedFrameQueue()
        got = []

        def consumer():
            while True:
                item = q.get()
                if item is None:
                    return
                got.append(item)

        t = threading.Thread(target=consumer)
        t.start()
        for i in range(3):
            q.put(i)
        time.sleep(0.05)
        q.close()
        t.join(timeout=1)
        assert got == [0, 1, 2]

    def test_get_timeout(self):
        q = st.BoundedFrameQueue()
        with pytest.raises(TimeoutError):
            q.get(timeout=0.05)


class TestPacing:
    def test_paced_rate(self):
        frames = [(i, None, None) for i in range(10)]
        t0 = time.monotonic()
        out = list(st.paced(iter(frames), fps=100.0))
        dt = time.monotonic() - t0
        assert len(out) == 10
        assert dt >= 0.08  # ~9 inter-frame gaps at 10 ms

    def test_unpaced(self):
        frames = [(i, None, None) for i in range(100)]
        t0 = time.monotonic()
        list(st.paced(iter(frames), fps=0.0))
        assert time.monotonic() - t0 < 0.05


class TestControl:
    def test_verbs(self):
        ch = st.ControlChannel()
        assert ch.poll() is None
        ch.send(st.ControlCommand.START_RECORD, "out.rgbd")
        ch.send(st.ControlCommand.STOP_RECORD)
        cmd, arg = ch.poll()
        assert cmd == st.ControlCommand.START_RECORD and arg == "out.rgbd"
        cmd, arg = ch.poll()
        assert cmd == st.ControlCommand.STOP_RECORD and arg is None
        assert ch.poll() is None


class TestRetryingSource:
    def test_init_retries_then_success(self):
        calls = {"n": 0}

        def factory():
            calls["n"] += 1
            if calls["n"] < 3:
                raise RuntimeError("camera not ready")
            return iter([(0.0, None, None)])

        src = st.RetryingSource(factory, init_retries=3, backoff_s=0.0)
        assert len(list(src)) == 1
        assert calls["n"] == 3

    def test_init_gives_up(self):
        def factory():
            raise RuntimeError("no device")

        src = st.RetryingSource(factory, init_retries=2, backoff_s=0.0)
        with pytest.raises(st.SourceError):
            list(src)

    def test_reinit_after_consecutive_errors(self):
        state = {"inits": 0}

        class Flaky:
            def __init__(self):
                state["inits"] += 1
                self.n = 0
                self.fail = state["inits"] == 1

            def __iter__(self):
                return self

            def __next__(self):
                self.n += 1
                if self.fail and self.n > 1:
                    raise RuntimeError("read error")
                if self.n > 4:
                    raise StopIteration
                return (self.n, None, None)

        src = st.RetryingSource(Flaky, init_retries=1, max_consecutive_errors=3, backoff_s=0.0)
        out = list(src)
        assert state["inits"] == 2  # reinitialized once after 3 errors
        assert src.reinit_count == 1
        assert len(out) == 5  # 1 from first source + 4 from second


class TestQuat:
    def test_quat_roundtrip(self, rng):
        for _ in range(20):
            q = rng.normal(size=4)
            q = q / np.linalg.norm(q)
            R = quat_to_matrix(*q)
            q2 = np.array(matrix_to_quat(R))
            R2 = quat_to_matrix(*q2)
            np.testing.assert_allclose(R, R2, atol=1e-9)

    def test_associate(self):
        a = [(0.0, ["a0"]), (1.0, ["a1"]), (2.0, ["a2"])]
        b = [(0.01, ["b0"]), (1.5, ["b1"]), (2.005, ["b2"])]
        pairs = associate(a, b, max_offset=0.02)
        assert pairs == [(0, 0), (2, 2)]
