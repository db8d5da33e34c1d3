"""Feature layer tests: FAST detection, ORB description, Hamming matching,
3D-3D pose — against oracles and synthetic-scene ground truth."""

import jax.numpy as jnp
import numpy as np

from slam_rgbd_tpu.core import camera, se3
from slam_rgbd_tpu.core.config import CameraIntrinsics
from slam_rgbd_tpu.features import detect, match, orb, pose3d
from slam_rgbd_tpu.io.synthetic import SceneSpec, SyntheticSequence, render_frame

CAM = CameraIntrinsics(fx=120.0, fy=120.0, cx=79.5, cy=59.5, width=160, height=120)


def checkerboard(h, w, sq=8):
    v, u = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return (((v // sq) + (u // sq)) % 2).astype(np.float32)


class TestFAST:
    def test_detects_square_corners(self):
        """Bright squares on dark background: L-corners (FAST's target).

        Note an ideal checkerboard X-crossing does NOT fire FAST-16 (the
        ring alternates in ~4-pixel arcs, never 9 contiguous) — that is
        correct segment-test behavior, so squares are used here.
        """
        img = np.full((96, 128), 0.1, np.float32)
        corners = []
        for v0, u0 in [(20, 20), (20, 70), (60, 40), (55, 95)]:
            img[v0 : v0 + 18, u0 : u0 + 18] = 0.9
            corners += [(u0, v0), (u0 + 17, v0), (u0, v0 + 17), (u0 + 17, v0 + 17)]
        uv, resp, valid = detect.detect_level(jnp.asarray(img), k=64, threshold=20.0,
                                              min_threshold=7.0)
        uv = np.asarray(uv)[np.asarray(valid)]
        assert len(uv) >= 12
        # every detection should be within 2 px of a true square corner
        d = np.min(
            np.linalg.norm(uv[:, None, :] - np.asarray(corners, np.float32)[None], axis=-1),
            axis=1,
        )
        assert np.percentile(d, 90) <= 2.0

    def test_flat_image_no_corners(self):
        img = jnp.full((96, 128), 0.5)
        _, _, valid = detect.detect_level(img, k=32, threshold=20.0, min_threshold=7.0)
        assert not bool(np.any(np.asarray(valid)))

    def test_fast_score_oracle(self):
        """A synthetic ideal corner passes; an edge does not."""
        img = np.full((32, 32), 100.0, np.float32)
        img[:16, :16] = 200.0  # bright quadrant => corner at (16,16)-ish
        is_c, _ = detect.fast_score(jnp.asarray(img), 20.0)
        is_c = np.asarray(is_c)
        assert is_c[15, 15]
        # middle of a straight edge: exactly half the circle differs -> no
        # arc of 9 on the bright side... edge pixels can still fire FAST if
        # 9 contiguous darker exist; check a pixel deep inside flat region
        assert not is_c[8, 8] and not is_c[24, 24]

    def test_pyramid_budget_and_coords(self):
        seq = SyntheticSequence(1, CAM)
        _, depth, rgb = seq.frame(0)
        intensity = camera.rgb_to_intensity(jnp.asarray(rgb)) / 255.0
        kp, pyr = detect.detect_pyramid(intensity, n_features=512, n_levels=4)
        assert kp.uv.shape[0] >= 512  # budget rounding may add a few
        assert len(pyr) == 4
        uv = np.asarray(kp.uv)[np.asarray(kp.valid)]
        assert np.all(uv[:, 0] >= 0) and np.all(uv[:, 0] < CAM.width)
        assert np.all(uv[:, 1] >= 0) and np.all(uv[:, 1] < CAM.height)
        # the smooth procedural texture yields O(150) true corners at this
        # resolution — just require a healthy population
        assert int(np.asarray(kp.valid).sum()) > 100


class TestORB:
    def _frame_features(self, frame_idx=0, seq=None, n=256):
        seq = seq or SyntheticSequence(max(frame_idx + 1, 1), CAM)
        _, depth, rgb = seq.frame(frame_idx)
        intensity = camera.rgb_to_intensity(jnp.asarray(rgb)) / 255.0
        kp, pyr = detect.detect_pyramid(intensity, n_features=n, n_levels=4)
        desc = orb.describe(kp, pyr)
        return seq, depth, kp, desc

    def test_descriptor_shapes_and_packing(self):
        _, _, kp, desc = self._frame_features()
        K = kp.uv.shape[0]
        assert desc.packed.shape == (K, 8) and desc.packed.dtype == jnp.uint32
        assert desc.signs.shape == (K, 256) and desc.signs.dtype == jnp.int8
        # packing consistency: unpack == signs
        signs2 = match.pack_to_signs(desc.packed)
        np.testing.assert_array_equal(np.asarray(signs2), np.asarray(desc.signs))

    def test_rotation_invariance(self):
        """Descriptors of the same keypoint under image rotation stay close."""
        img = np.zeros((128, 128), np.float32)
        rng = np.random.default_rng(0)
        img += rng.uniform(0, 1, (128, 128)).astype(np.float32)
        img = np.asarray(orb.smooth(orb.smooth(jnp.asarray(img))))
        # rotate image by 30 deg around center with bilinear sampling
        ang = np.deg2rad(30)
        c, s = np.cos(ang), np.sin(ang)
        v, u = np.meshgrid(np.arange(128, dtype=np.float32), np.arange(128, dtype=np.float32), indexing="ij")
        uc, vc = u - 63.5, v - 63.5
        us = c * uc + s * vc + 63.5
        vs = -s * uc + c * vc + 63.5
        rot = np.asarray(camera.bilinear_sample(jnp.asarray(img), jnp.asarray(us), jnp.asarray(vs), jnp.ones((128, 128), bool))[0])

        kp0 = detect.Keypoints(
            uv=jnp.asarray([[63.5, 63.5]]), response=jnp.ones(1),
            angle=jnp.zeros(1), level=jnp.zeros(1, jnp.int32), valid=jnp.ones(1, bool),
        )
        d0 = orb.describe(kp0, (jnp.asarray(img),))
        d1 = orb.describe(kp0, (jnp.asarray(rot),))
        ham = float(match.hamming_packed(d0.packed, d1.packed)[0, 0])
        assert ham < 60, f"rotated descriptor Hamming {ham} too high"
        # sanity: a random descriptor pair is ~128 away
        rand_kp = detect.Keypoints(
            uv=jnp.asarray([[32.0, 90.0]]), response=jnp.ones(1),
            angle=jnp.zeros(1), level=jnp.zeros(1, jnp.int32), valid=jnp.ones(1, bool),
        )
        d2 = orb.describe(rand_kp, (jnp.asarray(img),))
        assert float(match.hamming_packed(d0.packed, d2.packed)[0, 0]) > 80

    def test_keypoint_depth(self):
        seq, depth, kp, _ = self._frame_features()
        dm = camera.depth_to_metres(jnp.asarray(depth), CAM)
        pts, ok = orb.keypoint_depth(kp, dm, CAM)
        pts, ok = np.asarray(pts), np.asarray(ok)
        assert ok.sum() > 100
        z = pts[ok][:, 2]
        assert np.all(z > CAM.min_depth) and np.all(z < CAM.max_depth)


class TestMatching:
    def test_mxu_equals_popcount(self, rng):
        p1 = rng.integers(0, 2**32, size=(64, 8), dtype=np.uint32)
        p2 = rng.integers(0, 2**32, size=(48, 8), dtype=np.uint32)
        s1 = match.pack_to_signs(jnp.asarray(p1))
        s2 = match.pack_to_signs(jnp.asarray(p2))
        d_mxu = np.asarray(match.hamming_matrix(s1, s2))
        d_ref = np.asarray(match.hamming_packed(jnp.asarray(p1), jnp.asarray(p2)))
        np.testing.assert_array_equal(d_mxu, d_ref)

    def test_self_match_identity(self, rng):
        signs = jnp.asarray(rng.choice([-1, 1], size=(32, 256)).astype(np.int8))
        valid = jnp.ones(32, bool)
        m = match.match(signs, valid, signs, valid, max_distance=64.0, ratio=0.99)
        assert bool(np.all(np.asarray(m.valid)))
        np.testing.assert_array_equal(np.asarray(m.idx2), np.arange(32))
        np.testing.assert_allclose(np.asarray(m.distance), 0.0)

    def test_cross_frame_matching_on_synthetic(self):
        """Features from two nearby synthetic frames match at their
        ground-truth reprojections."""
        seq = SyntheticSequence(4, CAM, step_t=0.008, step_r=0.006)
        feats = []
        for i in (0, 3):
            _, depth, rgb = seq.frame(i)
            intensity = camera.rgb_to_intensity(jnp.asarray(rgb)) / 255.0
            kp, pyr = detect.detect_pyramid(intensity, n_features=384, n_levels=4)
            desc = orb.describe(kp, pyr)
            dm = camera.depth_to_metres(jnp.asarray(depth), CAM)
            pts, ok = orb.keypoint_depth(kp, dm, CAM)
            feats.append((kp, desc, pts, ok & kp.valid))
        (kp1, d1, pts1, ok1), (kp2, d2, pts2, ok2) = feats
        m = match.match(d1.signs, ok1, d2.signs, ok2)
        mv = np.asarray(m.valid)
        assert mv.sum() >= 50, f"only {mv.sum()} matches"
        # verify matches geometrically via ground truth
        T_21 = np.linalg.inv(seq.poses[3]) @ seq.poses[0]  # frame0 cam -> frame3 cam
        p1w = np.asarray(pts1)[mv] @ T_21[:3, :3].T + T_21[:3, 3]
        p2 = np.asarray(pts2)[np.asarray(m.idx2)[mv]]
        d3 = np.linalg.norm(p1w - p2, axis=1)
        assert np.median(d3) < 0.05, f"median 3D match dist {np.median(d3):.3f}"


class TestPose3D:
    def test_exact_recovery(self, rng):
        xi = np.array([0.1, -0.2, 0.15, 0.2, 0.1, -0.3], np.float32)
        T_true = np.asarray(se3.exp(jnp.asarray(xi)))
        p1 = rng.uniform(-2, 2, size=(128, 3)).astype(np.float32)
        p2 = p1 @ T_true[:3, :3].T + T_true[:3, 3]
        res = pose3d.solve_pose3d(jnp.asarray(p1), jnp.asarray(p2), jnp.ones(128, bool))
        assert bool(res.ok)
        np.testing.assert_allclose(np.asarray(res.T), T_true, atol=1e-5)

    def test_robust_to_outliers(self, rng):
        xi = np.array([0.05, 0.1, -0.08, 0.1, -0.15, 0.05], np.float32)
        T_true = np.asarray(se3.exp(jnp.asarray(xi)))
        p1 = rng.uniform(-2, 2, size=(128, 3)).astype(np.float32)
        p2 = p1 @ T_true[:3, :3].T + T_true[:3, 3]
        p2[:30] += rng.uniform(-1.5, 1.5, size=(30, 3))  # 23% outliers
        res = pose3d.solve_pose3d(jnp.asarray(p1), jnp.asarray(p2), jnp.ones(128, bool), iters=10)
        assert bool(res.ok)
        err = np.asarray(se3.log(jnp.asarray(np.linalg.inv(T_true) @ np.asarray(res.T))))
        assert np.linalg.norm(err) < 0.02

    def test_degenerate_rejected(self):
        p = jnp.zeros((64, 3))
        res = pose3d.solve_pose3d(p, p, jnp.zeros(64, bool))
        assert not bool(res.ok)
