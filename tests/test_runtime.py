"""End-to-end session tests: full SLAM on synthetic sequences, runner
pipeline, checkpoint/resume, watchdog, reset."""

import os
import threading
import time

import jax.numpy as jnp
import numpy as np
import pytest

from slam_rgbd_tpu.core.config import (
    BAConfig,
    CameraIntrinsics,
    ICPConfig,
    KeyframeConfig,
    ORBConfig,
    SLAMConfig,
)
from slam_rgbd_tpu.eval.trajectory import ate_rmse, load_trajectory_tum
from slam_rgbd_tpu.io import stream as st
from slam_rgbd_tpu.io.synthetic import SyntheticSequence
from slam_rgbd_tpu.runtime import checkpoint
from slam_rgbd_tpu.runtime.runner import ControlMenu, PipelineRunner
from slam_rgbd_tpu.runtime.session import SLAMSession
from slam_rgbd_tpu.runtime.watchdog import GracefulShutdown, Watchdog

CAM = CameraIntrinsics(fx=120.0, fy=120.0, cx=79.5, cy=59.5, width=160, height=120)


def small_config() -> SLAMConfig:
    return SLAMConfig(
        camera=CAM,
        orb=ORBConfig(n_features=256, n_levels=4),
        keyframes=KeyframeConfig(max_keyframes=32, max_map_points=4096,
                                 kf_min_trans=0.05, kf_min_rot_deg=5.0),
        ba=BAConfig(window=4, iters=4),
    )


class TestSLAMSession:
    def test_full_slam_sequence(self):
        """25-frame synthetic clip through the full stack: ATE < 2 cm and
        keyframes + map points created."""
        cfg = small_config()
        seq = SyntheticSequence(25, CAM, step_t=0.015, step_r=0.012)
        sess = SLAMSession(cfg)
        for ts, d, c in seq:
            sess.process_frame(ts, d, c)
        ts, est = sess.poses()  # flushes the decision pipeline
        assert all(s.tracking_ok for s in sess.stats)
        # pipeline contract: every frame's control scalars resolved
        assert all(s.inlier_fraction >= 0 for s in sess.stats)
        rmse, _, _ = ate_rmse(est, seq.groundtruth())
        assert rmse < 0.02, f"session ATE {rmse:.4f}"
        assert sess.state.keyframes >= 3
        assert sess.map_point_count() > 200

    def test_warmup_leaves_session_pristine(self):
        """`warmup()` compiles the whole program set, then the session must
        behave exactly like a fresh one (state reset, tracking clean)."""
        cfg = small_config()
        sess = SLAMSession(cfg)
        sess.warmup()
        assert sess.state.frames == 0
        assert sess.state.keyframes == 0
        assert sess.map_point_count() == 0
        assert len(sess.stats) == 0
        seq = SyntheticSequence(8, CAM, step_t=0.015, step_r=0.012)
        for ts, d, c in seq:
            sess.process_frame(ts, d, c)
        ts, est = sess.poses()
        rmse, _, _ = ate_rmse(est, seq.groundtruth())
        assert rmse < 0.02, f"post-warmup ATE {rmse:.4f}"

    def test_deep_decision_lag(self, monkeypatch):
        """Force the decision pipeline to its lag bound (summaries 'never'
        land): keyframes insert from STASHED poses several frames late,
        the min-gap guard prevents duplicate bursts, and accuracy holds —
        the high-latency-link operating mode (RuntimeConfig.max_decision_lag)."""
        from slam_rgbd_tpu.core.config import RuntimeConfig
        from slam_rgbd_tpu.runtime import session as sess_mod

        monkeypatch.setattr(sess_mod._PendingFrame, "ready", lambda self: False)
        cfg = small_config().replace(runtime=RuntimeConfig(max_decision_lag=4))
        seq = SyntheticSequence(25, CAM, step_t=0.015, step_r=0.012)
        sess = SLAMSession(cfg)
        for ts, d, c in seq:
            sess.process_frame(ts, d, c)
            assert len(sess._pending) <= 4
        _, est = sess.poses()
        assert all(s.tracking_ok for s in sess.stats)
        # keyframes land ~4 frames late (16% of this short clip), which
        # coarsens the BA anchoring — a modest, expected accuracy cost,
        # still far inside the 5 cm BASELINE envelope
        rmse, _, _ = ate_rmse(est, seq.groundtruth())
        assert rmse < 0.03, f"lag-4 session ATE {rmse:.4f}"
        assert sess.state.keyframes >= 3
        # min-gap guard: no two keyframes closer than the configured gap
        kf_frames = [i for i, s in enumerate(sess.stats) if s.is_keyframe]
        gaps = np.diff(kf_frames)
        assert (gaps >= cfg.keyframes.kf_min_gap_frames).all(), kf_frames

    def test_noisy_sensor_ate_gate(self):
        """Kinect-class sensor noise (axial z^2 noise, silhouette dropout,
        brightness flicker — `io.synthetic.NoiseSpec`): the tracker must
        stay within the BASELINE.md 5 cm ATE envelope instead of only
        enjoying noiseless raycasts."""
        from slam_rgbd_tpu.io.synthetic import NoiseSpec

        cfg = small_config()
        seq = SyntheticSequence(25, CAM, step_t=0.015, step_r=0.012,
                                noise=NoiseSpec())
        sess = SLAMSession(cfg)
        for ts, d, c in seq:
            sess.process_frame(ts, d, c)
        _, est = sess.poses()  # flushes the decision pipeline
        n_ok = sum(s.tracking_ok for s in sess.stats)
        assert n_ok >= len(seq) - 2, f"tracking lost on {len(seq) - n_ok} frames"
        rmse, _, _ = ate_rmse(est, seq.groundtruth())
        assert rmse < 0.05, f"noisy-session ATE {rmse:.4f}"
        assert sess.state.keyframes >= 3

    def test_noise_model_statistics(self):
        """The noise model actually corrupts: dropout holes, depth std
        grows with range, brightness shifts."""
        from slam_rgbd_tpu.io.synthetic import NoiseSpec

        clean = SyntheticSequence(2, CAM)
        noisy = SyntheticSequence(2, CAM, noise=NoiseSpec())
        _, d0, c0 = clean.frame(0)
        _, d1, c1 = noisy.frame(0)
        both = (d0 > 0) & (d1 > 0)
        holes = float(((d0 > 0) & (d1 == 0)).mean())
        assert 0.001 < holes < 0.5, holes  # silhouette + random dropout
        dz = np.abs(d1[both].astype(np.float32) - d0[both].astype(np.float32))
        z = d0[both].astype(np.float32) / CAM.depth_scale
        near, far = dz[z < 2.0], dz[z > 3.0]
        assert far.mean() > 1.5 * near.mean()  # axial noise grows with z
        assert not np.array_equal(c0, c1)
        # per-frame keys differ: frame 1 noise != frame 0 noise
        _, d1b, _ = noisy.frame(1)
        _, d0b, _ = clean.frame(1)
        assert not np.array_equal(d1 ^ d0, d1b ^ d0b)

    def test_trajectory_export(self, tmp_path):
        cfg = small_config()
        seq = SyntheticSequence(8, CAM)
        sess = SLAMSession(cfg)
        for ts, d, c in seq:
            sess.process_frame(ts, d, c)
        p1 = str(tmp_path / "traj.txt")
        p2 = str(tmp_path / "kf.txt")
        sess.save_trajectory(p1)
        sess.save_keyframe_trajectory(p2)
        ts1, T1 = load_trajectory_tum(p1)
        assert len(ts1) == 8
        ts2, T2 = load_trajectory_tum(p2)
        assert len(ts2) == sess.state.keyframes

    def test_async_backend_split(self):
        """BA/loop closure on the worker thread: backend jobs are
        dispatched (not run inline), corrections land, and the ATE gate
        still holds (VERDICT round-1 item #2)."""
        cfg = small_config()
        seq = SyntheticSequence(25, CAM, step_t=0.015, step_r=0.012)
        sess = SLAMSession(cfg, async_backend=True)
        try:
            for ts, d, c in seq:
                sess.process_frame(ts, d, c)
            ts_, est = sess.poses()  # flushes pipeline + syncs the backend
            # every keyframe after the window warm-up dispatched a backend
            # job: submitted = completed + skipped-while-busy
            dispatched = sess.worker.completed + sess.worker.skipped
            assert sess.state.keyframes >= 3
            assert dispatched >= sess.state.keyframes - 1
            assert sess.worker.completed >= 1
            assert all(s.tracking_ok for s in sess.stats)
            rmse, _, _ = ate_rmse(est, seq.groundtruth())
            assert rmse < 0.02, f"async-session ATE {rmse:.4f}"
            # keyframe frames no longer stall on BA: their latency stays
            # within a small factor of plain tracking frames (they still
            # run detection + insertion inline)
            kf_ms = sorted(s.track_ms for s in sess.stats[3:] if s.is_keyframe)
            nk_ms = sorted(s.track_ms for s in sess.stats[3:] if not s.is_keyframe)
            if kf_ms and nk_ms:
                med_kf = kf_ms[len(kf_ms) // 2]
                med_nk = nk_ms[len(nk_ms) // 2]
                assert med_kf < 6 * med_nk, (med_kf, med_nk)
        finally:
            sess.close()

    def test_interactive_control_menu(self, tmp_path):
        """Scripted-stdin session through `ControlMenu` (`main.c:57-159`
        parity): status query, record start/stop, quit — quit is the ONLY
        thing that ends the endless source, so shutdown is proven."""
        import io
        import itertools

        cfg = small_config()
        seq = SyntheticSequence(2, CAM)
        f0, f1 = seq.frame(0), seq.frame(1)

        def endless():
            for i in itertools.count():
                ts, d, c = (f0, f1)[i % 2]
                yield (i / 30.0, d, c)

        runner = PipelineRunner(cfg, st.paced(endless(), 30.0))
        rec_path = str(tmp_path / "menu_clip.rgbd")
        r_fd, w_fd = os.pipe()
        infile = os.fdopen(r_fd, "r")
        out = io.StringIO()
        menu = ControlMenu(runner, infile=infile, outfile=out)
        menu.start()

        def script():
            with os.fdopen(w_fd, "w") as w:
                for cmd, delay in (
                    ("s", 0.8), (f"1 {rec_path}", 0.8), ("2", 0.3),
                    ("bogus", 0.1), ("q", 0.0),
                ):
                    w.write(cmd + "\n")
                    w.flush()
                    time.sleep(delay)

        writer = threading.Thread(target=script, daemon=True)
        writer.start()
        sess = runner.run(threads=True)  # returns ONLY because of 'q'
        writer.join(timeout=10)
        infile.close()

        text = out.getvalue()
        assert "status: frames=" in text
        assert "shutting down" in text
        assert "menu:" in text.lower()  # bogus input re-prints the menu
        assert sess.state.frames > 0
        # the record window captured at least one frame, readable back
        clip = list(st.StreamReader(rec_path))
        assert len(clip) >= 1
        assert clip[0][1].shape == (CAM.height, CAM.width)

    def test_reset(self):
        cfg = small_config()
        seq = SyntheticSequence(4, CAM)
        sess = SLAMSession(cfg)
        for ts, d, c in seq:
            sess.process_frame(ts, d, c)
        assert sess.state.frames == 4
        sess.reset()
        assert sess.state.frames == 0
        assert int(sess.map.n_kf) == 0
        # still usable after reset
        sess.process_frame(*seq.frame(0))
        assert sess.state.frames == 1


class TestLoopClosureEndToEnd:
    def test_drift_revisit_closes_loops_and_recovers_ate(self):
        """The FULL loop pipeline on the timed path (VERDICT r4 item 3):
        miscalibrated odometry (`ICPConfig.drift_xi`) accumulates real
        drift over an out-and-back sweep, the revisit fails map
        association, and the candidate -> verify -> consistency -> pose
        graph -> landmark fusion chain must engage and measurably recover
        trajectory accuracy vs the same run with loop closure disabled."""
        import dataclasses

        from slam_rgbd_tpu.core.config import BAConfig as _BA

        drift = (0.006, 0.0, 0.003, 0.0, 0.003, 0.0)

        def cfg_with(loop_on):
            base = small_config()
            return base.replace(
                icp=dataclasses.replace(base.icp, drift_xi=drift),
                keyframes=dataclasses.replace(
                    base.keyframes, max_keyframes=64, max_map_points=8192,
                    kf_min_trans=0.02, kf_min_rot_deg=2.0),
                ba=_BA(window=4, iters=4, loop_min_interval=4,
                       loop_cooldown_kf=2,
                       loop_min_score=(0.20 if loop_on else 2.0)),
            )

        seq = SyntheticSequence(100, CAM, step_t=0.015, step_r=0.012,
                                sweep=True)
        gt = seq.groundtruth()
        frames = [seq.frame(i) for i in range(len(seq))]
        ate = {}
        loops = {}
        for loop_on in (False, True):
            sess = SLAMSession(cfg_with(loop_on))
            for ts, d, c in frames:
                sess.process_frame(ts, d, c)
            sess.sync_backend(final_pass=True)
            _, est = sess.poses()
            rmse, _, _ = ate_rmse(est, gt[: len(est)])
            ate[loop_on] = rmse
            loops[loop_on] = sess.state.loops
        assert loops[False] == 0
        assert loops[True] >= 1, "no loop closed under injected drift"
        assert ate[False] > 0.06, (
            f"drift injection too weak to matter ({ate[False]:.3f} m)")
        assert ate[True] < 0.7 * ate[False], (
            f"loop closure did not recover accuracy: "
            f"{ate[False]:.3f} m -> {ate[True]:.3f} m")


class TestCheckpoint:
    def test_save_restore_continue(self, tmp_path):
        cfg = small_config()
        seq = SyntheticSequence(16, CAM, step_t=0.015)
        sess = SLAMSession(cfg)
        for i in range(10):
            sess.process_frame(*seq.frame(i))
        ckpt = str(tmp_path / "ckpt")
        checkpoint.save(sess, ckpt)

        sess2 = checkpoint.restore(SLAMSession(cfg), ckpt)
        assert sess2.state.frames == sess.state.frames
        assert int(sess2.map.n_kf) == int(sess.map.n_kf)
        np.testing.assert_allclose(np.asarray(sess2.T_world), np.asarray(sess.T_world))
        # continue processing from the checkpoint
        for i in range(10, 16):
            stt = sess2.process_frame(*seq.frame(i))
        ts, est = sess2.poses()
        assert len(ts) == 16
        rmse, _, _ = ate_rmse(est, seq.groundtruth())
        assert rmse < 0.03

    def test_v1_layout_migrates(self, tmp_path):
        """A round-3-era checkpoint (positional map_{i} keys, no kf_sig
        leaf) restores: leaves map by OLD field order and kf_sig is
        backfilled from the descriptor store."""
        import dataclasses
        import json

        from slam_rgbd_tpu.backend.loop import place_signatures

        cfg = small_config()
        seq = SyntheticSequence(8, CAM, step_t=0.015)
        sess = SLAMSession(cfg)
        for i in range(8):
            sess.process_frame(*seq.frame(i))
        ckpt = str(tmp_path / "ckpt")
        checkpoint.save(sess, ckpt)

        # rewrite the archive to the v1 layout
        data = dict(np.load(ckpt + "/state.npz"))
        old_fields = [
            f.name for f in dataclasses.fields(sess.map)
            if f.name != "kf_sig"
        ]
        v1 = {k: v for k, v in data.items() if not k.startswith("map.")}
        for i, name in enumerate(old_fields):
            v1[f"map_{i}"] = data[f"map.{name}"]
        np.savez_compressed(ckpt + "/state.npz", **v1)
        with open(ckpt + "/meta.json") as f:
            meta = json.load(f)
        meta["format_version"] = 1
        with open(ckpt + "/meta.json", "w") as f:
            json.dump(meta, f)

        sess2 = checkpoint.restore(SLAMSession(cfg), ckpt)
        assert int(sess2.map.n_kf) == int(sess.map.n_kf)
        np.testing.assert_allclose(
            np.asarray(sess2.map.kf_pose), np.asarray(sess.map.kf_pose)
        )
        np.testing.assert_allclose(
            np.asarray(sess2.map.kf_sig),
            np.asarray(place_signatures(sess2.map)),
            atol=1e-6,
        )

    def test_capacity_mismatch_rejected(self, tmp_path):
        cfg = small_config()
        sess = SLAMSession(cfg)
        sess.process_frame(*SyntheticSequence(1, CAM).frame(0))
        ckpt = str(tmp_path / "ckpt")
        checkpoint.save(sess, ckpt)
        other = SLAMSession(cfg.replace(
            keyframes=KeyframeConfig(max_keyframes=8, max_map_points=128)))
        with pytest.raises(ValueError):
            checkpoint.restore(other, ckpt)


class TestRunner:
    def test_threaded_pipeline(self, tmp_path):
        cfg = small_config()
        seq = SyntheticSequence(12, CAM)
        runner = PipelineRunner(cfg, iter(seq))
        sess = runner.run(threads=True)
        assert sess.state.frames + runner.queue.dropped == 12
        assert sess.state.frames >= 6
        assert not sess.state.running

    def test_record_tee_and_playback(self, tmp_path):
        cfg = small_config()
        rec_path = str(tmp_path / "run.rgbd")
        seq = SyntheticSequence(6, CAM)
        runner = PipelineRunner(cfg, iter(seq))
        runner.control.send(st.ControlCommand.START_RECORD, rec_path)
        runner.run(threads=True)
        runner.control.send(st.ControlCommand.STOP_RECORD)
        # file was closed by stop(); replay it through a fresh runner
        frames = list(st.StreamReader(rec_path))
        assert len(frames) == 6
        runner2 = PipelineRunner(cfg, iter(frames))
        sess2 = runner2.run(threads=False)
        assert sess2.state.frames == 6

    def test_shutdown_command(self):
        cfg = small_config()

        def endless():
            seq = SyntheticSequence(2, CAM)
            i = 0
            while True:
                yield seq.frame(i % 2)
                i += 1
                time.sleep(0.01)

        runner = PipelineRunner(cfg, endless())
        t = threading.Thread(target=runner.run)
        t.start()
        time.sleep(2.0)
        runner.control.send(st.ControlCommand.SHUTDOWN)
        t.join(timeout=15)
        assert not t.is_alive()
        assert runner.session.state.frames > 0


class TestWatchdog:
    def test_detects_stall(self):
        beat = {"t": time.monotonic()}
        stalls = []
        wd = Watchdog(lambda: beat["t"], stall_timeout_s=0.2, period_s=0.05,
                      on_stall=lambda age: stalls.append(age)).start()
        time.sleep(0.5)
        wd.stop()
        assert wd.stalls >= 1 and stalls

    def test_no_false_stall(self):
        beat = {"t": time.monotonic()}
        stop = threading.Event()

        def beater():
            while not stop.is_set():
                beat["t"] = time.monotonic()
                time.sleep(0.02)

        t = threading.Thread(target=beater)
        t.start()
        wd = Watchdog(lambda: beat["t"], stall_timeout_s=0.2, period_s=0.05).start()
        time.sleep(0.5)
        wd.stop()
        stop.set()
        t.join()
        assert wd.stalls == 0

    def test_graceful_shutdown_forces(self):
        ev = threading.Event()
        t = threading.Thread(target=lambda: ev.wait(5.0), name="stuck")
        t.start()
        gs = GracefulShutdown(timeout_s=0.3)
        clean = gs.request([t])
        assert not clean and gs.forced
        ev.set()
        t.join()
