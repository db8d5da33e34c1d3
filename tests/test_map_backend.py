"""Map store, local BA, pose graph, loop closure tests with exact oracles."""

import jax
import jax.numpy as jnp
import numpy as np

from slam_rgbd_tpu.backend import ba, loop, pose_graph
from slam_rgbd_tpu.core import se3
from slam_rgbd_tpu.core.config import BAConfig, CameraIntrinsics, KeyframeConfig
from slam_rgbd_tpu.mapping import map as smap

CAM = CameraIntrinsics(fx=120.0, fy=120.0, cx=79.5, cy=59.5, width=160, height=120)
KCFG = KeyframeConfig(max_keyframes=16, max_map_points=512)
K = 64  # keypoints per KF in tests


def _make_world(rng, n_pts=100):
    """Random world points in front of a small trajectory."""
    pts = np.stack([
        rng.uniform(-1.5, 1.5, n_pts),
        rng.uniform(-1.0, 1.0, n_pts),
        rng.uniform(2.0, 4.0, n_pts),
    ], axis=1).astype(np.float32)
    return pts


def _observe(T_wc, pts_w, noise=0.0, rng=None):
    """Project world pts into camera T_wc -> (uv, pts_cam, ok)."""
    T_cw = np.linalg.inv(T_wc)
    pc = pts_w @ T_cw[:3, :3].T + T_cw[:3, 3]
    z = pc[:, 2]
    u = CAM.fx * pc[:, 0] / z + CAM.cx
    v = CAM.fy * pc[:, 1] / z + CAM.cy
    if noise and rng is not None:
        u = u + rng.normal(0, noise, u.shape)
        v = v + rng.normal(0, noise, v.shape)
    ok = (z > 0.3) & (u >= 0) & (u < CAM.width) & (v >= 0) & (v < CAM.height)
    return np.stack([u, v], 1).astype(np.float32), pc.astype(np.float32), ok


class TestMapState:
    def _kp_arrays(self, rng, uv, pts, ok, n=K):
        signs = rng.choice([-1, 1], size=(n, 256)).astype(np.int8)
        return (jnp.asarray(uv[:n]), jnp.asarray(pts[:n]), jnp.asarray(ok[:n]),
                jnp.asarray(signs))

    def test_insert_and_spawn(self, rng):
        m = smap.empty_map(KCFG, K)
        pts_w = _make_world(rng, K)
        T0 = np.eye(4, dtype=np.float32)
        uv, pc, ok = _observe(T0, pts_w)
        uvj, pcj, okj, signs = self._kp_arrays(rng, uv, pc, ok)
        m = smap.insert_keyframe(m, jnp.asarray(T0), 0.0, uvj, pcj, okj, signs,
                                 jnp.full((K,), -1, jnp.int32))
        assert int(m.n_kf) == 1
        assert int(m.n_pt) == int(ok.sum())
        assert int(smap.map_point_count(m)) == int(ok.sum())
        # world positions of spawned points match
        pid = np.asarray(m.point_id[0])
        for j in range(K):
            if ok[j]:
                np.testing.assert_allclose(
                    np.asarray(m.pt_xyz[pid[j]]), pts_w[j], atol=1e-5)

    def test_observation_and_covis(self, rng):
        m = smap.empty_map(KCFG, K)
        pts_w = _make_world(rng, K)
        T0 = np.eye(4, dtype=np.float32)
        T1 = np.asarray(se3.exp(jnp.asarray([0.05, 0, 0, 0, 0.02, 0], dtype=jnp.float32)))
        uv0, pc0, ok0 = _observe(T0, pts_w)
        uvj, pcj, okj, signs = self._kp_arrays(rng, uv0, pc0, ok0)
        m = smap.insert_keyframe(m, jnp.asarray(T0), 0.0, uvj, pcj, okj, signs,
                                 jnp.full((K,), -1, jnp.int32))
        # second KF observes the SAME points (same descriptor order)
        uv1, pc1, ok1 = _observe(T1, pts_w)
        pid0 = m.point_id[0]
        match_pid = jnp.where(jnp.asarray(ok1) & (pid0 >= 0), pid0, -1)
        uvj1, pcj1, okj1, _ = self._kp_arrays(rng, uv1, pc1, ok1)
        m = smap.insert_keyframe(m, jnp.asarray(T1), 0.1, uvj1, pcj1, okj1, signs, match_pid)
        shared = int(np.asarray(m.covis[0, 1]))
        assert shared == int(np.asarray((match_pid >= 0)).sum())
        assert shared > 20
        # nobs incremented for shared points
        assert int(np.asarray(m.pt_nobs).max()) == 2

    def test_capacity_guard(self, rng):
        cfg = KeyframeConfig(max_keyframes=2, max_map_points=64)
        m = smap.empty_map(cfg, K)
        pts_w = _make_world(rng, K)
        T0 = np.eye(4, dtype=np.float32)
        uv, pc, ok = _observe(T0, pts_w)
        uvj, pcj, okj, signs = self._kp_arrays(rng, uv, pc, ok)
        for _ in range(4):
            m = smap.insert_keyframe(m, jnp.asarray(T0), 0.0, uvj, pcj, okj, signs,
                                     jnp.full((K,), -1, jnp.int32))
        assert int(m.n_kf) == 2  # extra inserts dropped
        assert int(m.n_pt) <= 64

    def test_local_window(self):
        m = smap.empty_map(KCFG, K)
        m = m.replace(n_kf=jnp.int32(5))
        idx, valid = smap.local_window(m, 8)
        assert list(np.asarray(valid)) == [False] * 3 + [True] * 5
        assert list(np.asarray(idx)[3:]) == [0, 1, 2, 3, 4]


class TestMapMaintenance:
    """Point culling, slot recycling, duplicate merge, pressure counters."""

    def _insert(self, m, rng, pts_w, T=None, signs=None, match_pid=None, ts=0.0):
        T = np.eye(4, dtype=np.float32) if T is None else T
        uv, pc, ok = _observe(T, pts_w)
        if signs is None:
            signs = rng.choice([-1, 1], size=(K, 256)).astype(np.int8)
        if match_pid is None:
            match_pid = jnp.full((K,), -1, jnp.int32)
        return smap.insert_keyframe(
            m, jnp.asarray(T), ts, jnp.asarray(uv[:K]), jnp.asarray(pc[:K]),
            jnp.asarray(ok[:K]), jnp.asarray(signs), match_pid,
        ), ok[:K]

    def test_cull_under_observed(self, rng):
        m = smap.empty_map(KCFG, K)
        pts_w = _make_world(rng, K)
        m, ok = self._insert(m, rng, pts_w)
        n0 = int(m.n_pt)
        assert n0 == int(ok.sum())
        # 4 more keyframes observing NOTHING from KF0 (fresh spawns)
        for i in range(1, 5):
            m, _ = self._insert(m, rng, pts_w + 100.0, ts=float(i))
        m2, n_culled = smap.cull_points(m, m.n_kf - 1, min_obs=2, max_age_kf=3)
        # every point from KF0 (nobs=1, age>=4) must be culled
        assert int(n_culled) >= n0
        pid0 = np.asarray(m2.point_id[0])
        assert (pid0 == -1).all(), "culled points must vanish from the obs graph"
        assert int(m2.n_pt) == int(np.asarray(m2.pt_valid).sum())

    def test_reobserved_points_survive(self, rng):
        m = smap.empty_map(KCFG, K)
        pts_w = _make_world(rng, K)
        m, ok0 = self._insert(m, rng, pts_w)
        # KF1 REOBSERVES KF0's points (match_pid = pid from KF0)
        pid0 = m.point_id[0]
        T1 = np.asarray(se3.exp(jnp.asarray([0.05, 0, 0, 0, 0.02, 0], dtype=jnp.float32)))
        uv1, pc1, ok1 = _observe(T1, pts_w)
        match = jnp.where(jnp.asarray(ok1[:K]) & (pid0 >= 0), pid0, -1)
        m, _ = self._insert(m, rng, pts_w, T=T1, match_pid=match, ts=1.0)
        for i in range(2, 6):
            m, _ = self._insert(m, rng, pts_w + 100.0, ts=float(i))
        n_before = int(m.n_pt)
        m2, n_culled = smap.cull_points(m, m.n_kf - 1, min_obs=2, max_age_kf=3)
        survivors = np.asarray(m2.pt_valid)
        nobs = np.asarray(m.pt_nobs)
        # exactly the twice-observed points survive the nobs test
        assert (nobs[survivors] >= 2).all()
        assert int(n_culled) == n_before - int(survivors.sum())

    def test_slot_recycling(self, rng):
        cfg = KeyframeConfig(max_keyframes=16, max_map_points=128)
        m = smap.empty_map(cfg, K)
        pts_w = _make_world(rng, K)
        m, ok = self._insert(m, rng, pts_w)
        slots_kf0 = set(int(p) for p in np.asarray(m.point_id[0]) if p >= 0)
        # cull everything (min_obs high, age 0)
        m, n_culled = smap.cull_points(m, m.n_kf - 1, min_obs=5, max_age_kf=0)
        assert int(n_culled) == len(slots_kf0)
        assert int(m.n_pt) == 0
        # next insert must REUSE the freed low slots, not append past them
        m, ok1 = self._insert(m, rng, _make_world(rng, K), ts=1.0)
        slots_kf1 = set(int(p) for p in np.asarray(m.point_id[1]) if p >= 0)
        assert slots_kf1 and slots_kf1 <= set(range(len(slots_kf0) + K))
        assert min(slots_kf1) == 0, "freed slot 0 must be recycled first"
        # recycled slots restart their observation count at 1
        nobs = np.asarray(m.pt_nobs)
        assert (nobs[sorted(slots_kf1)] == 1).all()

    def test_capacity_pressure_counters(self, rng):
        cfg = KeyframeConfig(max_keyframes=2, max_map_points=64)
        m = smap.empty_map(cfg, K)
        pts_w = _make_world(rng, K)
        m, ok = self._insert(m, rng, pts_w)  # K valid spawns into 64 slots
        if int(ok.sum()) > 64:
            assert int(m.pt_dropped) == int(ok.sum()) - 64
        m, _ = self._insert(m, rng, pts_w + 100.0, ts=1.0)
        assert int(m.n_kf) == 2
        m, _ = self._insert(m, rng, pts_w + 200.0, ts=2.0)  # beyond KF capacity
        assert int(m.kf_dropped) == 1
        assert int(m.n_kf) == 2

    def test_bounded_map_under_culling(self, rng):
        """Steady spawn + cull keeps n_pt bounded far below total spawns."""
        cfg = KeyframeConfig(max_keyframes=64, max_map_points=512)
        m = smap.empty_map(cfg, K)
        total_spawned = 0
        for i in range(12):
            # fresh in-view world points + fresh descriptors each KF: all
            # spawn as new map points and are never re-observed
            m, ok = self._insert(m, rng, _make_world(rng, K), ts=float(i))
            total_spawned += int(ok.sum())
            m, _ = smap.cull_points(m, m.n_kf - 1, min_obs=2, max_age_kf=3)
        assert int(m.pt_dropped) == 0, "culling must prevent capacity pressure"
        assert int(m.n_pt) <= 4 * K < total_spawned

    def test_merge_tier_suppresses_duplicates(self, rng):
        """A keypoint 3D-on-top of an existing point with a near-identical
        descriptor reuses its id even when the pixel gate fails."""
        m = smap.empty_map(KCFG, K)
        # close-range points so a 4 cm offset is >6 px in the image
        pts_w = np.stack([
            rng.uniform(-0.2, 0.2, K), rng.uniform(-0.15, 0.15, K),
            rng.uniform(0.45, 0.55, K)], axis=1).astype(np.float32)
        T0 = np.eye(4, dtype=np.float32)
        uv, pc, ok = _observe(T0, pts_w)
        signs = rng.choice([-1, 1], size=(K, 256)).astype(np.int8)
        m = smap.insert_keyframe(m, jnp.asarray(T0), 0.0, jnp.asarray(uv),
                                 jnp.asarray(pc), jnp.asarray(ok),
                                 jnp.asarray(signs), jnp.full((K,), -1, jnp.int32))
        # query: same points displaced 4 cm laterally (>= 9 px at z=0.5)
        pc_q = pc + np.array([0.04, 0, 0], np.float32)
        z_q = pc_q[:, 2]
        u_q = CAM.fx * pc_q[:, 0] / z_q + CAM.cx
        v_q = CAM.fy * pc_q[:, 1] / z_q + CAM.cy
        uv_q = np.stack([u_q, v_q], 1).astype(np.float32)
        pid_nomerge = smap.match_against_map(
            m, jnp.asarray(signs), jnp.asarray(ok), jnp.asarray(uv_q),
            jnp.asarray(z_q), jnp.asarray(T0), cam=CAM, px_radius=6.0)
        pid_merge = smap.match_against_map(
            m, jnp.asarray(signs), jnp.asarray(ok), jnp.asarray(uv_q),
            jnp.asarray(z_q), jnp.asarray(T0), cam=CAM, px_radius=6.0,
            kp_pts=jnp.asarray(pc_q), merge_radius=0.05)
        pid0 = np.asarray(m.point_id[0])
        got_nm = np.asarray(pid_nomerge)
        got_m = np.asarray(pid_merge)
        valid = ok & (pid0 >= 0)
        # pixel tier alone misses the displaced reobservations...
        assert (got_nm[valid] == -1).mean() > 0.8
        # ...the merge tier recovers them, mapping to the original ids
        recovered = (got_m[valid] == pid0[valid])
        assert recovered.mean() > 0.8, f"merge recovered {recovered.mean():.2f}"


class TestLocalBA:
    def test_recovers_perturbed_poses_and_points(self, rng):
        """Noisy init, exact observations -> BA returns to ground truth."""
        W = 4
        n_pts = 128
        pts_w = _make_world(rng, n_pts)
        poses_gt = []
        T = np.eye(4, dtype=np.float32)
        for i in range(W):
            poses_gt.append(T.copy())
            T = T @ np.asarray(se3.exp(jnp.asarray(
                np.array([0.08, 0.01, 0.02, 0.01, 0.03, 0.005], np.float32))))
        poses_gt = np.stack(poses_gt)

        obs_uv = np.zeros((W, n_pts, 2), np.float32)
        obs_z = np.zeros((W, n_pts), np.float32)
        obs_ok = np.zeros((W, n_pts), bool)
        for w in range(W):
            uv, pc, ok = _observe(poses_gt[w], pts_w)
            obs_uv[w], obs_z[w], obs_ok[w] = uv, pc[:, 2], ok
        obs_pid = np.tile(np.arange(n_pts, dtype=np.int32), (W, 1))

        # perturb everything except the gauge KF
        poses_init = poses_gt.copy()
        for w in range(1, W):
            xi = rng.normal(size=6).astype(np.float32) * np.array(
                [0.02, 0.02, 0.02, 0.01, 0.01, 0.01], np.float32)
            poses_init[w] = poses_gt[w] @ np.asarray(se3.exp(jnp.asarray(xi)))
        pts_init = pts_w + rng.normal(size=pts_w.shape).astype(np.float32) * 0.02

        res = ba.local_ba(
            jnp.asarray(poses_init), jnp.ones(W, bool), jnp.asarray(pts_init),
            jnp.asarray(obs_uv), jnp.asarray(obs_z), jnp.asarray(obs_pid),
            jnp.asarray(obs_ok), CAM, BAConfig(iters=8),
        )
        assert int(res.n_obs) > 300  # guard against vacuous pass (all masked)
        assert float(res.rmse_px) < 0.1, f"BA rmse {float(res.rmse_px)}"
        for w in range(W):
            e = np.asarray(se3.log(jnp.asarray(
                (np.linalg.inv(poses_gt[w]) @ np.asarray(res.kf_pose[w])).astype(np.float32))))
            assert np.linalg.norm(e[:3]) < 2e-3, f"KF{w} trans err {np.linalg.norm(e[:3])}"
            assert np.linalg.norm(e[3:]) < 2e-3

    def test_noise_reduction(self, rng):
        """With pixel noise, BA reduces reprojection error vs. init."""
        W = 4
        n_pts = 128
        pts_w = _make_world(rng, n_pts)
        poses_gt = np.stack([np.eye(4, dtype=np.float32)] * W)
        for w in range(1, W):
            poses_gt[w] = poses_gt[w - 1] @ np.asarray(
                se3.exp(jnp.asarray(np.array([0.1, 0, 0, 0, 0.02, 0], np.float32))))
        obs_uv = np.zeros((W, n_pts, 2), np.float32)
        obs_z = np.zeros((W, n_pts), np.float32)
        obs_ok = np.zeros((W, n_pts), bool)
        for w in range(W):
            uv, pc, ok = _observe(poses_gt[w], pts_w, noise=0.5, rng=rng)
            obs_uv[w], obs_z[w], obs_ok[w] = uv, pc[:, 2], ok
        obs_pid = np.tile(np.arange(n_pts, dtype=np.int32), (W, 1))
        pts_init = pts_w + rng.normal(size=pts_w.shape).astype(np.float32) * 0.03
        res = ba.local_ba(
            jnp.asarray(poses_gt), jnp.ones(W, bool), jnp.asarray(pts_init),
            jnp.asarray(obs_uv), jnp.asarray(obs_z), jnp.asarray(obs_pid),
            jnp.asarray(obs_ok), CAM, BAConfig(iters=8),
        )
        # optimal residual ~ the injected 0.5 px noise
        assert 0.2 < float(res.rmse_px) < 0.9

    def test_gauge_fixed(self, rng):
        W = 3
        n_pts = 64
        pts_w = _make_world(rng, n_pts)
        poses = np.stack([np.eye(4, dtype=np.float32)] * W)
        obs_uv = np.zeros((W, n_pts, 2), np.float32)
        obs_z = np.zeros((W, n_pts), np.float32)
        obs_ok = np.zeros((W, n_pts), bool)
        for w in range(W):
            uv, pc, ok = _observe(poses[w], pts_w)
            obs_uv[w], obs_z[w], obs_ok[w] = uv, pc[:, 2], ok
        obs_pid = np.tile(np.arange(n_pts, dtype=np.int32), (W, 1))
        res = ba.local_ba(
            jnp.asarray(poses), jnp.ones(W, bool), jnp.asarray(pts_w),
            jnp.asarray(obs_uv), jnp.asarray(obs_z), jnp.asarray(obs_pid),
            jnp.asarray(obs_ok), CAM, BAConfig(iters=3),
        )
        np.testing.assert_allclose(np.asarray(res.kf_pose[0]), poses[0], atol=1e-6)


class TestWindowedLocalBA:
    """The compacted product path (backend/worker.py) vs. the full-table
    solver: identical math on arrays sized to the observed set."""

    def _problem(self, rng, W=4, n_pts=128, P=1024):
        pts_w = _make_world(rng, n_pts)
        poses_gt = []
        T = np.eye(4, dtype=np.float32)
        for _ in range(W):
            poses_gt.append(T.copy())
            T = T @ np.asarray(se3.exp(jnp.asarray(
                np.array([0.08, 0.01, 0.02, 0.01, 0.03, 0.005], np.float32))))
        poses_gt = np.stack(poses_gt)
        obs_uv = np.zeros((W, n_pts, 2), np.float32)
        obs_z = np.zeros((W, n_pts), np.float32)
        obs_ok = np.zeros((W, n_pts), bool)
        for w in range(W):
            uv, pc, ok = _observe(poses_gt[w], pts_w)
            obs_uv[w], obs_z[w], obs_ok[w] = uv, pc[:, 2], ok
        # scatter the observed points through a sparse full table so the
        # compaction remap (non-contiguous ids) is actually exercised
        ids = np.sort(rng.choice(P, n_pts, replace=False)).astype(np.int32)
        table = rng.normal(size=(P, 3)).astype(np.float32) + np.array(
            [0, 0, 10], np.float32)
        pts_init = pts_w + rng.normal(size=pts_w.shape).astype(np.float32) * 0.02
        table[ids] = pts_init
        obs_pid = np.tile(ids, (W, 1))
        poses_init = poses_gt.copy()
        for w in range(1, W):
            xi = rng.normal(size=6).astype(np.float32) * 0.015
            poses_init[w] = poses_gt[w] @ np.asarray(se3.exp(jnp.asarray(xi)))
        return poses_init, table, obs_uv, obs_z, obs_pid, obs_ok, ids

    def test_matches_full_table(self, rng):
        poses, table, uv, z, pid, ok, ids = self._problem(rng)
        W = poses.shape[0]
        cfg = BAConfig(iters=5)
        args = (jnp.asarray(poses), jnp.ones(W, bool), jnp.asarray(table),
                jnp.asarray(uv), jnp.asarray(z), jnp.asarray(pid),
                jnp.asarray(ok))
        full = ba.local_ba(*args, CAM, cfg)
        win = ba.windowed_local_ba(*args, CAM, cfg)
        assert int(win.n_obs) == int(full.n_obs) > 0
        np.testing.assert_allclose(
            np.asarray(win.kf_pose), np.asarray(full.kf_pose), atol=1e-4)
        np.testing.assert_allclose(
            np.asarray(win.pt_xyz)[ids], np.asarray(full.pt_xyz)[ids], atol=1e-3)
        # unobserved table rows must be untouched
        mask = np.ones(table.shape[0], bool)
        mask[ids] = False
        np.testing.assert_array_equal(np.asarray(win.pt_xyz)[mask], table[mask])

    def test_chunked_dispatch_matches_single(self, rng):
        """dispatch_iters splits the solve across device programs with LM
        state carried — results must match the one-dispatch path."""
        poses, table, uv, z, pid, ok, ids = self._problem(rng)
        W = poses.shape[0]
        cfg = BAConfig(iters=5, max_points_per_window=256)
        args = (jnp.asarray(poses), jnp.ones(W, bool), jnp.asarray(table),
                jnp.asarray(uv), jnp.asarray(z), jnp.asarray(pid),
                jnp.asarray(ok), CAM, cfg)
        one = ba.windowed_local_ba(*args)
        for k in (1, 2, 3):
            chk = ba.windowed_local_ba(*args, dispatch_iters=k)
            np.testing.assert_allclose(
                np.asarray(chk.kf_pose), np.asarray(one.kf_pose),
                rtol=0, atol=2e-5)
            np.testing.assert_allclose(
                np.asarray(chk.pt_xyz), np.asarray(one.pt_xyz),
                rtol=0, atol=2e-4)
            np.testing.assert_allclose(
                float(chk.rmse_px), float(one.rmse_px), rtol=1e-3)

    def test_overflow_masks_excess_points(self, rng):
        """More observed points than the compact budget: the solve drops the
        overflow's observations instead of corrupting state."""
        poses, table, uv, z, pid, ok, ids = self._problem(rng)
        W = poses.shape[0]
        cfg = BAConfig(iters=3, max_points_per_window=64)
        win = ba.windowed_local_ba(
            jnp.asarray(poses), jnp.ones(W, bool), jnp.asarray(table),
            jnp.asarray(uv), jnp.asarray(z), jnp.asarray(pid),
            jnp.asarray(ok), CAM, cfg)
        out = np.asarray(win.pt_xyz)
        assert np.all(np.isfinite(np.asarray(win.kf_pose)))
        # the compact budget keeps the BEST-CONSTRAINED 64 observed ids
        # (most window observations, ties to higher/newer ids); everything
        # else stays put, and the overflow is REPORTED, not silent
        obs_ids = np.unique(pid[ok])
        counts = np.zeros(table.shape[0], np.int64)
        np.add.at(counts, pid[ok].ravel(), 1)
        order = sorted(obs_ids.tolist(), key=lambda i: (-counts[i], -i))
        budget = set(order[:64])
        solved = np.asarray(win.pt_solved)
        assert set(np.nonzero(solved)[0].tolist()) == budget
        moved = ~np.isclose(out, table, atol=0).all(axis=1)
        assert not moved[~solved].any()
        assert int(win.n_dropped) == len(obs_ids) - 64
        assert np.all(np.isfinite(out))


class TestPoseGraph:
    def _chain(self, rng, n, drift=0.0):
        """Ground-truth chain + odometry edges (optionally drifted)."""
        gt = [np.eye(4, dtype=np.float32)]
        edges_T = []
        for i in range(n - 1):
            xi = np.array([0.1, 0.02 * np.sin(i), 0, 0, 0.08, 0], np.float32)
            D = np.asarray(se3.exp(jnp.asarray(xi)))
            gt.append((gt[-1] @ D).astype(np.float32))
            edges_T.append(D)
        return np.stack(gt), edges_T

    def test_consistent_chain_unchanged(self, rng):
        M = 8
        gt, edges_T = self._chain(rng, M)
        e = pose_graph.EdgeList.empty(32)
        n_e = jnp.int32(0)
        for i, D in enumerate(edges_T):
            e, n_e = e.add(n_e, i, i + 1, jnp.asarray(D))
        res = pose_graph.optimize_pose_graph(jnp.asarray(gt), jnp.ones(M, bool), e, iters=5)
        assert float(res.rmse) < 1e-5
        np.testing.assert_allclose(np.asarray(res.poses), gt, atol=1e-4)

    def test_loop_corrects_drift(self, rng):
        """Drifted odometry + one exact loop edge -> drift distributed."""
        M = 10
        gt, edges_T = self._chain(rng, M)
        # odometry with small consistent bias => estimated chain drifts
        drift_xi = np.array([0.004, 0, 0.002, 0, 0.003, 0], np.float32)
        Dd = np.asarray(se3.exp(jnp.asarray(drift_xi)))
        est = [gt[0]]
        for D in edges_T:
            est.append((est[-1] @ D @ Dd).astype(np.float32))
        est = np.stack(est)
        drift0 = np.linalg.norm(est[-1][:3, 3] - gt[-1][:3, 3])

        e = pose_graph.EdgeList.empty(32)
        n_e = jnp.int32(0)
        for i, D in enumerate(edges_T):
            e, n_e = e.add(n_e, i, i + 1, jnp.asarray(D @ Dd))  # drifted odo
        # exact loop constraint first -> last
        T_loop = np.linalg.inv(gt[0]) @ gt[-1]
        e, n_e = e.add(n_e, 0, M - 1, jnp.asarray(T_loop.astype(np.float32)), weight=10.0)

        res = pose_graph.optimize_pose_graph(jnp.asarray(est), jnp.ones(M, bool), e, iters=15)
        drift1 = np.linalg.norm(np.asarray(res.poses[-1])[:3, 3] - gt[-1][:3, 3])
        assert drift1 < 0.25 * drift0, f"drift {drift0:.4f} -> {drift1:.4f}"

    def test_invalid_nodes_untouched(self, rng):
        M = 6
        poses = np.stack([np.eye(4, dtype=np.float32)] * M)
        valid = np.array([True] * 4 + [False] * 2)
        e = pose_graph.EdgeList.empty(8)
        n_e = jnp.int32(0)
        D = np.asarray(se3.exp(jnp.asarray([0.1, 0, 0, 0, 0, 0], dtype=jnp.float32)))
        for i in range(3):
            e, n_e = e.add(n_e, i, i + 1, jnp.asarray(D))
        res = pose_graph.optimize_pose_graph(jnp.asarray(poses), jnp.asarray(valid), e, iters=3)
        np.testing.assert_allclose(np.asarray(res.poses[4:]), poses[4:], atol=1e-7)


class TestLoopClosure:
    def _map_with_revisit(self, rng):
        """Keyframes 0..7 where KF7 revisits KF0's viewpoint."""
        m = smap.empty_map(KeyframeConfig(max_keyframes=16, max_map_points=2048), K)
        pts_w = _make_world(rng, K)
        signs0 = rng.choice([-1, 1], size=(K, 256)).astype(np.int8)
        poses = []
        T = np.eye(4, dtype=np.float32)
        for i in range(8):
            if i == 7:
                T = poses[0] @ np.asarray(se3.exp(jnp.asarray(
                    np.array([0.02, 0, 0.01, 0, 0.01, 0], np.float32))))
            poses.append(T.copy())
            uv, pc, ok = _observe(T, pts_w)
            # distant views don't see the points
            if 2 <= i <= 5:
                T = T @ np.asarray(se3.exp(jnp.asarray(
                    np.array([0.4, 0, 0, 0, 0.5, 0], np.float32))))
                signs = rng.choice([-1, 1], size=(K, 256)).astype(np.int8)
                ok = ok & False
            else:
                T = T @ np.asarray(se3.exp(jnp.asarray(
                    np.array([0.05, 0, 0, 0, 0.02, 0], np.float32))))
                signs = signs0 + 0
            m = smap.insert_keyframe(
                m, jnp.asarray(poses[-1]), float(i), jnp.asarray(uv),
                jnp.asarray(pc), jnp.asarray(ok | (i in (2, 3, 4, 5))),
                jnp.asarray(signs), jnp.full((K,), -1, jnp.int32))
        return m, poses

    def test_find_and_verify(self, rng):
        m, poses = self._map_with_revisit(rng)
        cand = loop.find_loop_candidate(m, jnp.int32(7), min_interval=3, min_score=0.15)
        assert bool(cand.ok)
        assert int(cand.kf_idx) in (0, 1)
        ver = loop.verify_loop(m, jnp.int32(7), cand.kf_idx)
        assert bool(ver.ok)
        # T_rel maps query(7)-camera points into cand-camera coordinates:
        # ground truth = T_cand^-1 T_7
        T_want = np.linalg.inv(poses[int(cand.kf_idx)]) @ poses[7]
        e = np.asarray(se3.log(jnp.asarray(
            (np.linalg.inv(T_want) @ np.asarray(ver.T_rel)).astype(np.float32))))
        assert np.linalg.norm(e) < 0.01

    def test_no_candidate_when_recent(self, rng):
        m, _ = self._map_with_revisit(rng)
        cand = loop.find_loop_candidate(m, jnp.int32(3), min_interval=20)
        assert not bool(cand.ok)


class TestLoopFusionAndGlobalBA:
    """Landmark fusion across an accepted loop + the post-loop global BA
    (the CorrectLoop/Fuse -> GlobalBundleAdjustment chain ORB-SLAM3 runs
    behind `SLAM.cpp:54`)."""

    def _cfg(self, **ba_kw):
        from slam_rgbd_tpu.core.config import ORBConfig, SLAMConfig

        return SLAMConfig(
            camera=CAM, orb=ORBConfig(n_features=K, n_levels=2),
            keyframes=KCFG,
            ba=BAConfig(window=4, iters=4, global_ba_iters=8,
                        global_ba_points=512, **ba_kw),
        )

    def _rich_map(self, rng, n_kf=6):
        """Map where every keyframe re-observes the SAME point set (rich
        covisibility — the well-conditioned case for a global solve)."""
        m = smap.empty_map(KCFG, K)
        pts_w = _make_world(rng, K)
        signs = rng.choice([-1, 1], size=(K, 256)).astype(np.int8)
        poses = []
        T = np.eye(4, dtype=np.float32)
        pid0 = None
        for i in range(n_kf):
            poses.append(T.copy())
            uv, pc, ok = _observe(T, pts_w)
            match = (np.full((K,), -1, np.int32) if pid0 is None
                     else np.where(ok, pid0, -1).astype(np.int32))
            m = smap.insert_keyframe(
                m, jnp.asarray(poses[-1]), float(i), jnp.asarray(uv),
                jnp.asarray(pc), jnp.asarray(ok), jnp.asarray(signs),
                jnp.asarray(match))
            if pid0 is None:
                pid0 = np.asarray(m.point_id[0])
            T = T @ np.asarray(se3.exp(jnp.asarray(
                np.array([0.06, 0.01, 0.02, 0.008, 0.025, 0.004], np.float32))))
        return m, np.stack(poses), pts_w

    def test_global_ba_refines_well_constrained(self, rng):
        """With rich covisibility, the global solve is ACCEPTED by the
        trust-region gate and lowers both reprojection RMSE and pose
        error vs its (perturbed) init — VERDICT r4 item 4's 'global BA
        lowers reprojection RMSE and ATE' evidence."""
        from slam_rgbd_tpu.backend import worker as bworker

        m, poses_gt, pts_w = self._rich_map(rng)
        cfg = self._cfg()
        kf_init = np.asarray(m.kf_pose).copy()
        for w in range(1, 6):
            xi = rng.normal(size=6).astype(np.float32) * np.array(
                [0.02, 0.02, 0.02, 0.008, 0.008, 0.008], np.float32)
            kf_init[w] = kf_init[w] @ np.asarray(se3.exp(jnp.asarray(xi)))
        pt_init = np.asarray(m.pt_xyz) + rng.normal(
            size=(m.capacity_pt, 3)).astype(np.float32) * 0.02

        kf_out, pt_out, solved, rmse, ok, dmax = bworker._global_ba_program(
            jnp.asarray(kf_init), jnp.asarray(pt_init), m.point_id, m, cfg)
        assert bool(ok), f"global BA rejected (move {float(dmax):.3f} m)"
        assert float(rmse) < 0.5, f"global BA rmse {float(rmse):.2f} px"
        err0 = [np.linalg.norm((np.linalg.inv(poses_gt[w]) @ kf_init[w])[:3, 3])
                for w in range(1, 6)]
        err1 = [np.linalg.norm(
                    (np.linalg.inv(poses_gt[w]) @ np.asarray(kf_out[w]))[:3, 3])
                for w in range(1, 6)]
        assert np.mean(err1) < 0.25 * np.mean(err0), (err0, err1)

    def test_global_ba_trust_region_rejects_relocation(self, rng):
        """A solve that tries to move keyframes beyond the trust region is
        rejected and the init poses pass through untouched."""
        from slam_rgbd_tpu.backend import worker as bworker

        m, poses_gt, pts_w = self._rich_map(rng)
        cfg = self._cfg(global_ba_max_move=1e-6)  # everything rejects
        kf_init = np.asarray(m.kf_pose).copy()
        kf_init[3] = kf_init[3] @ np.asarray(se3.exp(jnp.asarray(
            np.array([0.05, 0, 0, 0, 0, 0], np.float32))))
        kf_out, pt_out, solved, rmse, ok, dmax = bworker._global_ba_program(
            jnp.asarray(kf_init), m.pt_xyz, m.point_id, m, cfg)
        assert not bool(ok)
        np.testing.assert_allclose(np.asarray(kf_out), kf_init, atol=0)
        assert not bool(jnp.any(solved))

    def _dup_map(self, rng):
        """Candidate KF0 then (after filler KFs) query KF3 observing the
        SAME world points from a revisited pose — but associated as
        brand-new duplicates (match_pid = -1), the association-failure
        state an accepted loop finds itself in."""
        m = smap.empty_map(KCFG, K)
        pts_w = _make_world(rng, K)
        signs = rng.choice([-1, 1], size=(K, 256)).astype(np.int8)
        T0 = np.eye(4, dtype=np.float32)
        uv, pc, ok0 = _observe(T0, pts_w)
        m = smap.insert_keyframe(m, jnp.asarray(T0), 0.0, jnp.asarray(uv),
                                 jnp.asarray(pc), jnp.asarray(ok0),
                                 jnp.asarray(signs),
                                 jnp.full((K,), -1, jnp.int32))
        # two filler keyframes far away (different texture)
        T = T0.copy()
        for i in (1, 2):
            T = T @ np.asarray(se3.exp(jnp.asarray(
                np.array([0.5, 0, 0, 0, 0.6, 0], np.float32))))
            fsig = rng.choice([-1, 1], size=(K, 256)).astype(np.int8)
            uvf, pcf, okf = _observe(T, pts_w)
            m = smap.insert_keyframe(m, jnp.asarray(T), float(i),
                                     jnp.asarray(uvf), jnp.asarray(pcf),
                                     jnp.asarray(okf), jnp.asarray(fsig),
                                     jnp.full((K,), -1, jnp.int32))
        # query: revisit T0 slightly offset, same descriptors, but spawn
        # duplicates (association failed)
        Tq = T0 @ np.asarray(se3.exp(jnp.asarray(
            np.array([0.02, 0, 0.01, 0, 0.008, 0], np.float32))))
        uvq, pcq, okq = _observe(Tq, pts_w)
        m = smap.insert_keyframe(m, jnp.asarray(Tq), 3.0, jnp.asarray(uvq),
                                 jnp.asarray(pcq), jnp.asarray(okq),
                                 jnp.asarray(signs),
                                 jnp.full((K,), -1, jnp.int32))
        T_rel = np.linalg.inv(T0) @ Tq  # query-cam -> cand-cam
        return m, jnp.asarray(T_rel.astype(np.float32)), ok0, okq

    def test_loop_fusion_repoints_and_kills_ghosts(self, rng):
        from slam_rgbd_tpu.backend import worker as bworker
        from slam_rgbd_tpu.runtime.session import _fuse_merge

        m, T_rel, ok0, okq = self._dup_map(rng)
        n_pt_before = int(m.n_pt)
        pid_q_before = np.asarray(m.point_id[3])
        pid_c = np.asarray(m.point_id[0])
        pidf, fuse_row, ghost, delta, n_fused = bworker._loop_fuse_program(
            m, jnp.int32(3), jnp.int32(0), T_rel)
        n_fused = int(n_fused)
        both = ok0 & okq
        assert n_fused >= 0.8 * both.sum(), (n_fused, both.sum())
        fr = np.asarray(fuse_row)
        fused_mask = fr != pid_q_before
        # re-pointed entries point at the CANDIDATE's landmark ids
        assert np.array_equal(fr[fused_mask], pid_c[fused_mask])
        # every displaced duplicate (spawned by the query, now unobserved)
        # is flagged as a ghost
        gh = np.asarray(ghost)
        assert gh.sum() == n_fused
        assert np.all(np.asarray(m.pt_first_kf)[gh] == 3)
        # the snapshot graph used by global BA has the query row re-pointed
        assert np.array_equal(np.asarray(pidf[3]), fr)

        # merge into the live map: ghosts invalidated + references cleared,
        # observation counts moved, loop pair recorded covisible
        m2 = _fuse_merge(m, jnp.int32(3), jnp.int32(0), fuse_row, ghost,
                         delta, jnp.int32(n_fused))
        assert int(m2.n_pt) == n_pt_before - n_fused
        assert not bool(jnp.any(m2.pt_valid & ghost))
        live_ref = np.asarray(m2.point_id)
        assert not np.any(gh[live_ref[live_ref >= 0]])
        assert int(m2.covis[3, 0]) >= n_fused
        assert int(m2.covis[0, 3]) >= n_fused
        # fused landmarks gained the re-pointed observation
        gained = np.asarray(m2.pt_nobs)[pid_c[fused_mask]]
        before = np.asarray(m.pt_nobs)[pid_c[fused_mask]]
        assert np.all(gained == before + 1)
