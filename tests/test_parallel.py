"""Parallel layer tests on the 8-virtual-device CPU mesh.

Validates mesh construction, sharded-BA equivalence with the single-device
path, data-parallel batched tracking, and sharded matching equivalence —
the multi-chip design runs here exactly as it would across real chips.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from slam_rgbd_tpu.backend import ba
from slam_rgbd_tpu.core import camera, se3
from slam_rgbd_tpu.core.config import BAConfig, CameraIntrinsics, ICPConfig, MeshConfig
from slam_rgbd_tpu.features import match as fmatch
from slam_rgbd_tpu.io.synthetic import SceneSpec, render_frame
from slam_rgbd_tpu.parallel import dist, mesh as pmesh

CAM = CameraIntrinsics(fx=120.0, fy=120.0, cx=79.5, cy=59.5, width=160, height=120)


class TestMesh:
    def test_infer_axes(self):
        m = pmesh.make_mesh(MeshConfig())
        assert m.shape["data"] * m.shape["model"] == len(jax.devices())

    def test_explicit_axes(self):
        m = pmesh.make_mesh(MeshConfig(data=4, model=2))
        assert m.shape["data"] == 4 and m.shape["model"] == 2

    def test_bad_factorization(self):
        with pytest.raises(ValueError):
            pmesh.make_mesh(MeshConfig(data=3, model=3))

    def test_shardings(self):
        m = pmesh.make_mesh(MeshConfig(data=8, model=1))
        x = jnp.zeros((16, 4))
        xs = jax.device_put(x, pmesh.data_sharding(m))
        assert xs.sharding.spec == P("data")


def _ba_problem(rng, W=4, n_pts=128):
    pts_w = np.stack([
        rng.uniform(-1.5, 1.5, n_pts), rng.uniform(-1, 1, n_pts),
        rng.uniform(2, 4, n_pts)], 1).astype(np.float32)
    poses = [np.eye(4, dtype=np.float32)]
    for _ in range(W - 1):
        poses.append(poses[-1] @ np.asarray(se3.exp(jnp.asarray(
            np.array([0.06, 0.01, 0.02, 0.01, 0.02, 0.0], np.float32)))))
    poses = np.stack(poses)
    obs_uv = np.zeros((W, n_pts, 2), np.float32)
    obs_z = np.zeros((W, n_pts), np.float32)
    obs_ok = np.zeros((W, n_pts), bool)
    for w in range(W):
        T_cw = np.linalg.inv(poses[w])
        pc = pts_w @ T_cw[:3, :3].T + T_cw[:3, 3]
        u = CAM.fx * pc[:, 0] / pc[:, 2] + CAM.cx
        v = CAM.fy * pc[:, 1] / pc[:, 2] + CAM.cy
        obs_uv[w] = np.stack([u + rng.normal(0, 0.3, n_pts),
                              v + rng.normal(0, 0.3, n_pts)], 1)
        obs_z[w] = pc[:, 2]
        obs_ok[w] = (u > 0) & (u < 160) & (v > 0) & (v < 120)
    obs_pid = np.tile(np.arange(n_pts, dtype=np.int32), (W, 1))
    poses_init = poses.copy()
    for w in range(1, W):
        xi = rng.normal(size=6).astype(np.float32) * 0.01
        poses_init[w] = poses[w] @ np.asarray(se3.exp(jnp.asarray(xi)))
    pts_init = pts_w + rng.normal(size=pts_w.shape).astype(np.float32) * 0.01
    return poses, poses_init, pts_init, obs_uv, obs_z, obs_pid, obs_ok


class TestShardedBA:
    def test_matches_single_device(self, rng):
        W, n_pts = 4, 128
        _, poses_init, pts_init, obs_uv, obs_z, obs_pid, obs_ok = _ba_problem(rng, W, n_pts)
        cfg = BAConfig(iters=4)
        args = (jnp.asarray(poses_init), jnp.ones(W, bool), jnp.asarray(pts_init),
                jnp.asarray(obs_uv), jnp.asarray(obs_z), jnp.asarray(obs_pid),
                jnp.asarray(obs_ok))
        res_single = ba.local_ba(*args, CAM, cfg)
        m = pmesh.make_mesh(MeshConfig(data=1, model=8))
        res_shard = dist.sharded_local_ba(m, *args, CAM, cfg)
        np.testing.assert_allclose(
            np.asarray(res_shard.kf_pose), np.asarray(res_single.kf_pose), atol=5e-5)
        np.testing.assert_allclose(
            np.asarray(res_shard.pt_xyz), np.asarray(res_single.pt_xyz), atol=5e-4)
        assert int(res_shard.n_obs) == int(res_single.n_obs)

    def test_improves_solution(self, rng):
        W, n_pts = 4, 128
        poses_gt, poses_init, pts_init, obs_uv, obs_z, obs_pid, obs_ok = _ba_problem(rng, W, n_pts)
        m = pmesh.make_mesh(MeshConfig(data=1, model=8))
        res = dist.sharded_local_ba(
            m, jnp.asarray(poses_init), jnp.ones(W, bool), jnp.asarray(pts_init),
            jnp.asarray(obs_uv), jnp.asarray(obs_z), jnp.asarray(obs_pid),
            jnp.asarray(obs_ok), CAM, BAConfig(iters=6))
        for w in range(W):
            e = np.asarray(se3.log(jnp.asarray(
                (np.linalg.inv(poses_gt[w]) @ np.asarray(res.kf_pose[w])).astype(np.float32))))
            assert np.linalg.norm(e[:3]) < 5e-3


class TestBatchTrack:
    def test_data_parallel_sequences(self, rng):
        """8 sequences tracked concurrently over the data axis, each
        recovering its own ground-truth transform."""
        B = 8
        m = pmesh.make_mesh(MeshConfig(data=8, model=1))
        spec = SceneSpec()
        T_a = np.eye(4, dtype=np.float32)
        T_a[:3, 3] = (0.1, -0.1, -0.6)
        xis = (rng.normal(size=(B, 6)) * 0.01).astype(np.float32)
        src_list, tgt_list = [], []
        for b in range(B):
            T_delta = np.asarray(se3.exp(jnp.asarray(xis[b])))
            d_a, _ = render_frame(jnp.asarray(T_a), CAM, spec)
            d_b, _ = render_frame(jnp.asarray(T_a @ T_delta), CAM, spec)
            tgt_list.append(camera.build_frame_pyramid(jnp.asarray(d_a), CAM, levels=3))
            src_list.append(camera.build_frame_pyramid(jnp.asarray(d_b), CAM, levels=3))
        stack = lambda lst: jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *lst)
        src = stack(src_list)
        tgt = stack(tgt_list)
        T0 = jnp.tile(jnp.eye(4), (B, 1, 1))
        T_out, inl, rmse, vf = dist.batch_track(m, src, tgt, T0, CAM, ICPConfig())
        for b in range(B):
            want = np.asarray(se3.exp(jnp.asarray(xis[b])))
            e = np.asarray(se3.log(jnp.asarray(
                (np.linalg.inv(want) @ np.asarray(T_out[b])).astype(np.float32))))
            assert np.linalg.norm(e[:3]) < 5e-3, f"seq {b}: {np.linalg.norm(e[:3])}"


class TestShardedMapAssociation:
    """Map-block sharding: points distributed over `model`, winners
    halo-exchanged — must equal the single-device gated association."""

    def _scene(self, rng, K=64, cap=512):
        from slam_rgbd_tpu.core.config import KeyframeConfig
        from slam_rgbd_tpu.mapping import map as smap

        kcfg = KeyframeConfig(max_keyframes=8, max_map_points=cap)
        m = smap.empty_map(kcfg, K)
        pts_w = np.stack([
            rng.uniform(-1.5, 1.5, K), rng.uniform(-1.0, 1.0, K),
            rng.uniform(2.0, 4.0, K)], axis=1).astype(np.float32)
        z = pts_w[:, 2]
        u = CAM.fx * pts_w[:, 0] / z + CAM.cx
        v = CAM.fy * pts_w[:, 1] / z + CAM.cy
        ok = (u >= 0) & (u < CAM.width) & (v >= 0) & (v < CAM.height)
        uv = np.stack([u, v], 1).astype(np.float32)
        signs = rng.choice([-1, 1], size=(K, 256)).astype(np.int8)
        m = smap.insert_keyframe(
            m, jnp.eye(4), 0.0, jnp.asarray(uv), jnp.asarray(pts_w),
            jnp.asarray(ok), jnp.asarray(signs),
            jnp.full((K,), -1, jnp.int32),
        )
        return smap, m, uv, pts_w, ok, signs

    def test_matches_single_device(self, rng):
        smap, m, uv, pc, ok, signs = self._scene(rng)
        uv_q = (uv + rng.normal(0, 2.0, uv.shape)).astype(np.float32)
        z_q = (pc[:, 2] * (1 + rng.normal(0, 0.02, len(pc)))).astype(np.float32)
        ref = smap.match_against_map(
            m, jnp.asarray(signs), jnp.asarray(ok), jnp.asarray(uv_q),
            jnp.asarray(z_q), jnp.eye(4), cam=CAM, backend="xla",
            kp_pts=jnp.asarray(pc), merge_radius=0.08)
        mesh = pmesh.make_mesh(MeshConfig(data=1, model=8))
        got = dist.sharded_map_association(
            mesh, jnp.asarray(signs), jnp.asarray(ok), jnp.asarray(uv_q),
            jnp.asarray(z_q), jnp.eye(4),
            m.pt_xyz, m.pt_signs, m.pt_valid, CAM,
            kp_pts=jnp.asarray(pc), merge_radius=0.08)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))
        assert (np.asarray(got) >= 0).sum() > 0.5 * ok.sum()

    def test_no_merge_tier(self, rng):
        smap, m, uv, pc, ok, signs = self._scene(rng)
        ref = smap.match_against_map(
            m, jnp.asarray(signs), jnp.asarray(ok), jnp.asarray(uv),
            jnp.asarray(pc[:, 2]), jnp.eye(4), cam=CAM, backend="xla")
        mesh = pmesh.make_mesh(MeshConfig(data=1, model=8))
        got = dist.sharded_map_association(
            mesh, jnp.asarray(signs), jnp.asarray(ok), jnp.asarray(uv),
            jnp.asarray(pc[:, 2]), jnp.eye(4),
            m.pt_xyz, m.pt_signs, m.pt_valid, CAM)
        np.testing.assert_array_equal(np.asarray(got), np.asarray(ref))


class TestShardedMatch:
    def test_matches_single_device(self, rng):
        K1, K2 = 256, 192
        p1 = rng.integers(0, 2**32, size=(K1, 8), dtype=np.uint32)
        p2 = rng.integers(0, 2**32, size=(K2, 8), dtype=np.uint32)
        s1 = fmatch.pack_to_signs(jnp.asarray(p1))
        s2 = fmatch.pack_to_signs(jnp.asarray(p2))
        v1 = jnp.ones(K1, bool)
        v2 = jnp.ones(K2, bool)
        m = pmesh.make_mesh(MeshConfig(data=1, model=8))
        idx2, best, ok = dist.sharded_hamming_match(m, s1, v1, s2, v2, ratio=0.99)
        ref = fmatch.match(s1, v1, s2, v2, ratio=0.99, cross_check=False)
        np.testing.assert_array_equal(np.asarray(idx2), np.asarray(ref.idx2))
        np.testing.assert_allclose(np.asarray(best), np.asarray(ref.distance))
        np.testing.assert_array_equal(np.asarray(ok), np.asarray(ref.valid))


class TestShardedPoseGraph:
    def _graph(self, rng, M=12, E=32):
        """Drifted odometry chain + a loop edge, padded to E slots."""
        from slam_rgbd_tpu.backend import pose_graph as pg

        gt = [np.eye(4, dtype=np.float32)]
        for k in range(M - 1):
            xi = np.array([0.1, 0.02 * np.sin(k), 0, 0, 0.09, 0], np.float32)
            gt.append(gt[-1] @ np.asarray(se3.exp(jnp.asarray(xi))))
        gt = np.stack(gt)

        edges = pg.EdgeList.empty(E)
        n_e = jnp.int32(0)
        drift = np.asarray(se3.exp(jnp.asarray(
            np.array([0.004, 0.001, 0, 0, 0.003, 0], np.float32))))
        poses = [gt[0]]
        for k in range(M - 1):
            T_rel = np.linalg.inv(gt[k]) @ gt[k + 1]
            edges, n_e = edges.add(n_e, k, k + 1, jnp.asarray(T_rel))
            poses.append(poses[-1] @ T_rel @ drift)  # integrate WITH drift
        # loop edge: measured relative pose from ground truth
        T_loop = np.linalg.inv(gt[0]) @ gt[M - 1]
        edges, n_e = edges.add(n_e, 0, M - 1, jnp.asarray(T_loop), weight=5.0)
        return jnp.asarray(np.stack(poses)), gt, edges

    def test_matches_single_device(self, rng):
        from slam_rgbd_tpu.backend import pose_graph as pg

        poses, gt, edges = self._graph(rng)
        M = poses.shape[0]
        valid = jnp.ones(M, bool)
        ref = pg.optimize_pose_graph(poses, valid, edges, iters=8)
        mesh = pmesh.make_mesh(MeshConfig(data=1, model=8))
        got = dist.sharded_pose_graph(mesh, poses, valid, edges, iters=8)
        np.testing.assert_allclose(
            np.asarray(got.poses), np.asarray(ref.poses), rtol=0, atol=1e-5)
        assert int(got.n_edges) == int(ref.n_edges)
        # and the optimization actually pulled drift toward ground truth
        err_before = np.linalg.norm(np.asarray(poses)[:, :3, 3] - gt[:, :3, 3], axis=1).max()
        err_after = np.linalg.norm(
            np.asarray(got.poses)[:, :3, 3] - gt[:, :3, 3], axis=1).max()
        assert err_after < 0.5 * err_before
