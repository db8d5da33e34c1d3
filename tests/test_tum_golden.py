"""Real-data path: golden TUM-layout sequence with REAL PNG files.

`tests/data/tum_golden/` is a miniature TUM RGB-D directory (rgb.txt /
depth.txt / groundtruth.txt, 16-bit depth PNGs at DepthMapFactor 5000,
8-bit RGB PNGs — the on-disk format of the fr1/fr2 sequences the
BASELINE.json configs target). The frames are synthetic renders with
Kinect-class sensor noise, but the FILES are real PNGs written by
Pillow's encoder (adaptive per-row filters), so these tests exercise the
actual dataset ingest path end-to-end: association, PNG decode (both the
PIL path and the built-in pure-python decoder), metric depth recovery,
and a live SLAM session step on the decoded frames.

Reference bar: the dataset-facing intent of the wrapper API
(`/root/reference/Youth.Source/AlgorithmModule/SLAM.h:11-38`,
`SaveTrajectoryTUM` consumers).
"""

import glob
import os

import numpy as np
import pytest

from slam_rgbd_tpu.core.config import tum_fr1_config
from slam_rgbd_tpu.io.tum import TUMSequence, _read_png, _read_png_builtin

GOLDEN = os.path.join(os.path.dirname(__file__), "data", "tum_golden")


class TestGoldenDecode:
    def test_sequence_association(self):
        cfg = tum_fr1_config()
        seq = TUMSequence(GOLDEN, cfg.camera)
        assert len(seq) == 3
        assert seq.groundtruth() is not None
        assert seq.groundtruth().shape == (3, 4, 4)
        # depth/rgb stamps differ by 3 ms; association must pair them all
        ts = seq.timestamps
        assert np.all(np.diff(ts) > 0)

    def test_frame_decodes_real_pngs(self):
        cfg = tum_fr1_config()
        seq = TUMSequence(GOLDEN, cfg.camera)
        ts, depth, rgb = seq.frame(0)
        assert depth.dtype == np.uint16 and depth.shape == (480, 640)
        assert rgb.dtype == np.uint8 and rgb.shape == (480, 640, 3)
        # metric depth at DepthMapFactor 5000: the rendered room is 0.2-9 m
        z = depth[depth > 0].astype(np.float32) / cfg.camera.depth_scale
        assert 0.15 < z.min() and z.max() < 12.0
        assert 1.0 < np.median(z) < 6.0
        # noise model leaves some zero-return (dropout) pixels
        assert 0 < (depth == 0).sum() < depth.size // 4

    def test_builtin_decoder_matches_pil(self):
        """The no-dependency PNG decoder must be bit-identical to PIL on
        real encoder output (adaptive sub/up/average/paeth rows)."""
        PIL = pytest.importorskip("PIL.Image")
        files = sorted(glob.glob(os.path.join(GOLDEN, "depth", "*.png")))
        files += sorted(glob.glob(os.path.join(GOLDEN, "rgb", "*.png")))[:1]
        assert files
        for f in files:
            ref = np.asarray(PIL.open(f)).squeeze()
            got = _read_png_builtin(f).squeeze()
            assert got.dtype.itemsize == ref.dtype.itemsize
            assert np.array_equal(ref, got), f"builtin != PIL for {f}"

    def test_read_png_dispatch(self):
        f = sorted(glob.glob(os.path.join(GOLDEN, "depth", "*.png")))[0]
        img = _read_png(f)
        assert img.squeeze().shape == (480, 640)


@pytest.mark.slow
class TestGoldenSession:
    def test_session_steps_on_decoded_frames(self):
        """The documented real-data recipe end-to-end at dataset scale:
        `TUMSequence` -> `SLAMSession.process_frame` -> TUM trajectory.

        640x480 at the fr1 intrinsics — the same shapes `slam-rgbd-tpu
        run <tum_dir>` compiles (slow on 2-vCPU CI, hence the marker)."""
        from slam_rgbd_tpu.runtime.session import SLAMSession

        cfg = tum_fr1_config()
        seq = TUMSequence(GOLDEN, cfg.camera)
        sess = SLAMSession(cfg)
        for ts, depth, rgb in seq:
            st = sess.process_frame(ts, depth, rgb)
        sess.flush_pipeline()
        assert sess.state.frames == 3
        assert sess.state.keyframes >= 1
        assert sess.map_point_count() > 100
        ts_out, est = sess.poses()
        assert est.shape == (3, 4, 4)
        assert np.all(np.isfinite(est))
        # absolute stamps must round-trip into the TUM export
        import tempfile

        with tempfile.TemporaryDirectory() as td:
            path = os.path.join(td, "traj.txt")
            sess.save_trajectory(path)
            lines = [
                ln for ln in open(path).read().splitlines()
                if ln and not ln.startswith("#")
            ]
            assert len(lines) == 3
            assert abs(float(lines[0].split()[0]) - seq.timestamps[0]) < 1e-3
