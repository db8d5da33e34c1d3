"""SLAM session — the orchestrator (reference `main.c` + SLAM.cpp analogue).

Host-side control loop around jitted device programs:

    frame -> pyramid -> ICP track (dense, every frame)
          -> keyframe decision -> [features -> map match -> insert
          -> local BA -> loop detect/verify -> pose graph]    (on KF only)

Capability parity with the reference orchestration:
  * lifecycle + health gates + watchdog heartbeat (`main.c:247-342`),
  * bounded ingest with drop policy (`SLAM.cpp:162-168`) via
    `io.stream.BoundedFrameQueue` when run threaded,
  * reset (`SLAM.cpp:220-228` -> `reset()`),
  * trajectory + keyframe-trajectory export in TUM format
    (`SLAM.cpp:177-198` -> `save_trajectory*`),
  * map-point count (`SLAM.cpp:204-218` -> `map_point_count`).

Tracking quality is monitored through ICP inlier fraction; a lost track
triggers relocalization against the map (descriptor matching + 3D-3D
solve), mirroring the recovery behavior the reference's sensor layer has
for device errors (`sensorModule.c:216-239`).
"""

from __future__ import annotations

import functools
import logging
import time
from dataclasses import dataclass, field
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from slam_rgbd_tpu.backend import pose_graph as pg_mod
from slam_rgbd_tpu.backend import worker as bworker
from slam_rgbd_tpu.core import camera, se3
from slam_rgbd_tpu.core.config import SLAMConfig
from slam_rgbd_tpu.eval.trajectory import save_trajectory_tum
from slam_rgbd_tpu.features import detect as fdetect
from slam_rgbd_tpu.features import match as fmatch
from slam_rgbd_tpu.features import orb as forb
from slam_rgbd_tpu.mapping import map as smap
from slam_rgbd_tpu.odometry.icp import track_frame

log = logging.getLogger("slam_rgbd_tpu.session")


@functools.partial(jax.jit, static_argnames=("orb", "cam"))
def _features_jit(depth_raw, rgb, orb, cam):
    """Whole feature stage as ONE compiled program (detect + describe +
    keypoint depth): a single device dispatch per keyframe instead of
    three jit calls plus ~20 eager ops — eager dispatch is expensive on a
    remote-tunneled TPU and serializes the async backend."""
    intensity = camera.rgb_to_intensity(rgb) / 255.0
    kp, pyr = fdetect.detect_pyramid(
        intensity,
        n_features=orb.n_features,
        n_levels=orb.n_levels,
        scale_factor=orb.scale_factor,
        threshold=orb.fast_threshold,
        min_threshold=orb.fast_min_threshold,
    )
    desc = forb.describe(kp, pyr, orb.scale_factor)
    depth_m = camera.depth_to_metres(depth_raw, cam)
    pts, ok = forb.keypoint_depth(kp, depth_m, cam)
    return kp, desc, pts, ok & kp.valid


@functools.partial(jax.jit, static_argnames=("kcfg",))
def _frame_summary(T_world, last_kf_T, valid_fraction, rmse, kcfg):
    """All per-frame host-control scalars in one (4,) array: inlier
    fraction, ICP rmse, pose finiteness, keyframe decision."""
    finite = jnp.all(jnp.isfinite(T_world))
    should = smap.should_insert_keyframe(T_world, last_kf_T, valid_fraction, kcfg)
    return jnp.stack([
        valid_fraction, rmse,
        finite.astype(jnp.float32), should.astype(jnp.float32),
    ])


@dataclass
class FrameStats:
    timestamp: float
    track_ms: float
    inlier_fraction: float
    icp_rmse: float
    is_keyframe: bool
    tracking_ok: bool
    ba_rmse_px: float = 0.0
    loop_closed: bool = False


@dataclass
class SessionState:
    """Host-visible session status (watchdog reads this)."""

    frames: int = 0
    keyframes: int = 0
    loops: int = 0
    lost: int = 0
    relocalized: int = 0
    last_heartbeat: float = field(default_factory=time.monotonic)
    running: bool = True


class SLAMSession:
    """Single-device RGB-D SLAM session.

    Call `process_frame(ts, depth_raw, rgb)` per frame; read `poses()` /
    `keyframe_poses()` / `stats` afterward. All device programs are jitted
    once — shapes are fixed by the config.
    """

    def __init__(self, config: SLAMConfig, metrics=None,
                 async_backend: bool = False):
        from slam_rgbd_tpu.runtime.profiling import StageTimer

        self.cfg = config
        self.metrics = metrics  # optional profiling.MetricsLog
        self.timer = StageTimer()
        cam = config.camera
        self.n_kp = config.orb.n_features
        self.map = smap.empty_map(config.keyframes, self._kp_capacity())
        self.edges = pg_mod.EdgeList.empty(4 * config.keyframes.max_keyframes)
        self.n_edges = jnp.int32(0)
        self.state = SessionState()
        # BA/loop-closure execution: inline (synchronous, deterministic) or
        # on the backend worker thread (`backend/worker.py` — the decoupled
        # processing thread of `SLAM.cpp:32-63`, TPU-style). Same math both
        # ways; async merges corrections at the next frame boundary.
        self.async_backend = async_backend
        self.worker = bworker.BackendWorker(config) if async_backend else None

        self.T_world = jnp.eye(4)
        self.motion = jnp.eye(4)
        self.prev_pyr = None
        self.last_kf_T = None
        self.last_kf_idx = -1
        self.tracking_ok = True

        self._traj_ts: list[float] = []
        self._traj_T: list[np.ndarray] = []
        self._frame_kf_idx: list[int] = []  # last KF index per frame
        self._kf_T_at_frame: list[np.ndarray] = []  # that KF's pose when logged
        self.stats: list[FrameStats] = []

    # ------------------------------------------------------------------ utils
    def _kp_capacity(self) -> int:
        """Total keypoint slots after per-level budget rounding."""
        budgets = fdetect._per_level_budget(
            self.cfg.orb.n_features, self.cfg.orb.n_levels, self.cfg.orb.scale_factor
        )
        return sum(budgets)

    def _pyramid(self, depth_raw, rgb):
        return camera.build_frame_pyramid(
            jnp.asarray(depth_raw), self.cfg.camera, levels=self.cfg.icp.levels,
            rgb=jnp.asarray(rgb),
        )

    def _features(self, depth_raw, rgb):
        return _features_jit(
            jnp.asarray(depth_raw), jnp.asarray(rgb), self.cfg.orb, self.cfg.camera
        )

    # ------------------------------------------------------------- main loop
    def process_frame(self, ts: float, depth_raw: np.ndarray, rgb: np.ndarray) -> FrameStats:
        t0 = time.monotonic()
        # merge any finished backend work FIRST: the snapshot discipline
        # (worker.py docstring) relies on corrections landing before the
        # next keyframe can be inserted.
        if self.worker is not None:
            self._apply_backend(self.worker.poll())
        pyr = self._pyramid(depth_raw, rgb)

        if self.prev_pyr is None:
            # first frame: bootstrap a keyframe at the origin — unless we
            # restored from a checkpoint, where only the tracking reference
            # needs re-anchoring.
            st = FrameStats(ts, 0.0, 1.0, 0.0, True, True)
            if int(self.map.n_kf) == 0:
                self._insert_keyframe(ts, depth_raw, rgb)
            self.prev_pyr = pyr
            self._log_pose(ts)
            self._finish(st, t0)
            return st

        self.T_world, self.motion, res = track_frame(
            self.prev_pyr, pyr, self.T_world, self.motion,
            self.cfg.camera, self.cfg.icp,
        )
        # ONE small device->host transfer for every per-frame control
        # decision (inlier fraction, finiteness, keyframe policy) — per-
        # frame syncs are what serialize the async backend split.
        vf, rmse, finite, should = (
            float(x) for x in np.asarray(_frame_summary(
                self.T_world, self.last_kf_T, res.valid_fraction, res.rmse,
                self.cfg.keyframes,
            ))
        )
        tracking_ok = vf > 0.25 and finite > 0.5
        st = FrameStats(ts, 0.0, vf, rmse, False, tracking_ok)

        if not tracking_ok:
            self.state.lost += 1
            log.warning("tracking lost at t=%.3f (inliers %.2f) — relocalizing", ts, vf)
            if self._relocalize(depth_raw, rgb):
                self.state.relocalized += 1
                st.tracking_ok = True
                self.motion = jnp.eye(4)
                should = 1.0 if self._should_insert(vf) else 0.0
            # on failed reloc we keep integrating (odometry-only fallback)

        if st.tracking_ok and should > 0.5:
            st.is_keyframe = True
            kf_stats = self._insert_keyframe(ts, depth_raw, rgb)
            st.ba_rmse_px = kf_stats.get("ba_rmse", 0.0)
            st.loop_closed = kf_stats.get("loop", False)

        self.prev_pyr = pyr
        self._log_pose(ts)
        self._finish(st, t0)
        return st

    def _finish(self, st: FrameStats, t0: float):
        st.track_ms = (time.monotonic() - t0) * 1e3
        self.timer.add("frame", st.track_ms / 1e3)
        self.state.frames += 1
        self.state.last_heartbeat = time.monotonic()
        self.stats.append(st)
        every = self.cfg.runtime.metrics_every_frames
        if self.metrics is not None and every and self.state.frames % every == 0:
            recent = self.stats[-every:]
            mean_ms = sum(s.track_ms for s in recent) / len(recent)
            self.metrics.log(
                "frame_window",
                frames=self.state.frames,
                fps=round(1e3 / max(mean_ms, 1e-6), 2),
                mean_track_ms=round(mean_ms, 3),
                inlier_fraction=round(
                    sum(s.inlier_fraction for s in recent) / len(recent), 4
                ),
                keyframes=self.state.keyframes,
                map_points=self.map_point_count(),
                loops=self.state.loops,
                lost=self.state.lost,
            )

    def _log_pose(self, ts: float):
        self._traj_ts.append(ts)
        self._traj_T.append(np.asarray(self.T_world))
        self._frame_kf_idx.append(self.last_kf_idx)
        self._kf_T_at_frame.append(
            np.asarray(self.map.kf_pose[self.last_kf_idx])
            if self.last_kf_idx >= 0 else np.eye(4, dtype=np.float32)
        )

    def _should_insert(self, inlier_ratio: float) -> bool:
        return bool(
            smap.should_insert_keyframe(
                self.T_world, self.last_kf_T, jnp.float32(inlier_ratio),
                self.cfg.keyframes,
            )
        )

    # -------------------------------------------------------------- keyframe
    def _insert_keyframe(self, ts, depth_raw, rgb) -> dict:
        out: dict = {}
        kp, desc, pts, ok = self._features(depth_raw, rgb)

        # associate against the map (reprojection + depth gates, plus the
        # 3D merge tier that suppresses duplicate-point spawns)
        if int(self.map.n_kf) > 0:
            match_pid = smap.match_against_map(
                self.map, desc.signs, ok, kp.uv, pts[:, 2], self.T_world,
                cam=self.cfg.camera,
                max_distance=float(self.cfg.orb.match_threshold),
                kp_pts=pts,
                merge_radius=self.cfg.keyframes.merge_radius,
            )
        else:
            match_pid = jnp.full((pts.shape[0],), -1, jnp.int32)

        prev_kf_idx = self.last_kf_idx
        self.map = smap.insert_keyframe(
            self.map, self.T_world, jnp.float32(ts), kp.uv, pts, ok,
            desc.signs, match_pid,
        )
        kf_idx = int(self.map.n_kf) - 1
        self.last_kf_idx = kf_idx
        self.last_kf_T = self.map.kf_pose[kf_idx]
        self.state.keyframes += 1

        # odometry edge between consecutive keyframes
        if prev_kf_idx >= 0:
            T_rel = se3.inverse(self.map.kf_pose[prev_kf_idx]) @ self.T_world
            self.edges, self.n_edges = self.edges.add(
                self.n_edges, prev_kf_idx, kf_idx, T_rel, weight=1.0
            )

        # map maintenance: cull never-reobserved points; slots recycle on
        # the next insert (`mapping.map.cull_points`). Runs BEFORE the
        # backend snapshot so BA never optimizes doomed points.
        kcfg = self.cfg.keyframes
        if kcfg.cull_min_obs > 0:
            self.map, n_culled = smap.cull_points(
                self.map, jnp.int32(kf_idx),
                min_obs=kcfg.cull_min_obs, max_age_kf=kcfg.cull_max_age_kf,
            )
            out["culled"] = n_culled

        # backend: local BA + loop closure + pose graph — inline, or
        # handed to the worker thread (snapshot of the immutable map).
        job = bworker.BackendJob(
            map=self.map, edges=self.edges, n_edges=self.n_edges, kf_idx=kf_idx
        )
        if self.worker is not None:
            self.worker.submit(job)  # busy => recorded skip, never blocks
        else:
            res = bworker.backend_pass(
                job.map, job.edges, job.n_edges, job.kf_idx, self.cfg
            )
            self._apply_backend(res)
            out["ba_rmse"] = res.ba_rmse
            out["loop"] = res.loop_closed

        return out

    def _apply_backend(self, r: Optional[bworker.BackendResult]):
        """Merge a finished backend pass into the live state.

        Keyframe slots up to the snapshot take the backend's optimized
        poses verbatim; everything anchored after the snapshot — the live
        pose, any newer keyframes, points spawned since — gets the rigid
        correction of the snapshot's newest keyframe. (Under the worker's
        merge-before-insert discipline nothing newer can exist; the
        correction path also makes the merge safe standalone.)
        """
        if r is None:
            return
        snap = r.snap_kf_idx
        T_old = self.map.kf_pose[snap]
        T_new = r.kf_pose[snap]
        C = se3.normalize_rotation(T_new @ se3.inverse(T_old))

        slot = jnp.arange(self.map.capacity_kf)
        kf_pose = jnp.where(
            (slot <= snap)[:, None, None],
            r.kf_pose,
            jnp.einsum("ij,mjk->mik", C, self.map.kf_pose),
        )
        existed = self.map.pt_first_kf <= snap
        use_ba = r.pt_adjusted & self.map.pt_valid & existed
        pt_xyz = jnp.where(use_ba[:, None], r.pt_xyz, self.map.pt_xyz)
        spawned_after = self.map.pt_valid & ~existed
        pt_xyz = jnp.where(
            spawned_after[:, None], pt_xyz @ C[:3, :3].T + C[:3, 3], pt_xyz
        )
        self.map = self.map.replace(kf_pose=kf_pose, pt_xyz=pt_xyz)

        if r.loop_edge is not None:
            i, j, T_rel, weight = r.loop_edge
            self.edges, self.n_edges = self.edges.add(
                self.n_edges, i, j, T_rel, weight=weight
            )
            self.state.loops += 1
        self.T_world = se3.normalize_rotation(C @ self.T_world)
        if self.last_kf_idx >= 0:
            self.last_kf_T = self.map.kf_pose[self.last_kf_idx]
        if self.metrics is not None:
            self.metrics.log(
                "backend", kf=snap, ba_rmse=round(r.ba_rmse, 3),
                backend_ms=round(r.backend_ms, 2), loop=r.loop_closed,
            )

    def sync_backend(self, timeout: float = 30.0):
        """Drain the backend worker and merge its result (no-op inline)."""
        if self.worker is not None:
            self._apply_backend(self.worker.poll())
            self._apply_backend(self.worker.flush(timeout))

    def close(self):
        """Stop the backend worker (drains the in-flight job first)."""
        if self.worker is not None:
            self.sync_backend()
            self.worker.stop()
            self.worker = None

    # ---------------------------------------------------------- reloc/reset
    def _relocalize(self, depth_raw, rgb) -> bool:
        """Match current features against all map points; solve 3D-3D."""
        if int(self.map.n_kf) == 0:
            return False
        kp, desc, pts, ok = self._features(depth_raw, rgb)
        m = fmatch.match(
            desc.signs, ok, self.map.pt_signs.astype(jnp.int8), self.map.pt_valid,
            max_distance=float(self.cfg.orb.match_threshold),
        )
        from slam_rgbd_tpu.features.pose3d import solve_pose3d

        target = self.map.pt_xyz[m.idx2]
        res = solve_pose3d(pts, target, m.valid & ok, iters=8)
        if bool(res.ok):
            # res.T maps camera-frame pts onto world points => T_world_cam
            self.T_world = se3.normalize_rotation(res.T)
            log.info("relocalized with %d inliers", int(res.inliers))
            return True
        return False

    def reset(self):
        """Full system reset (`resetSlam` parity, `SLAM.cpp:220-228`)."""
        was_async = self.async_backend
        self.close()
        self.__init__(self.cfg, metrics=self.metrics, async_backend=was_async)

    # -------------------------------------------------------------- outputs
    def poses(self) -> tuple[np.ndarray, np.ndarray]:
        """(timestamps (n,), camera trajectory (n, 4, 4)) — loop-corrected.

        Each frame pose is re-anchored to its reference keyframe's CURRENT
        (optimized) pose: T = T_kf_now @ (T_kf_then^-1 @ T_frame_then).
        """
        self.sync_backend()
        ts = np.asarray(self._traj_ts)
        out = []
        kf_pose_now = np.asarray(self.map.kf_pose)
        for T, kf_i, T_kf_then in zip(self._traj_T, self._frame_kf_idx, self._kf_T_at_frame):
            if kf_i >= 0:
                out.append(kf_pose_now[kf_i] @ np.linalg.inv(T_kf_then) @ T)
            else:
                out.append(T)
        return ts, np.stack(out) if out else np.zeros((0, 4, 4))

    def keyframe_poses(self) -> tuple[np.ndarray, np.ndarray]:
        self.sync_backend()
        n = int(self.map.n_kf)
        return (np.asarray(self.map.kf_time[:n]), np.asarray(self.map.kf_pose[:n]))

    def map_point_count(self) -> int:
        return int(smap.map_point_count(self.map))

    def save_trajectory(self, path: str):
        """TUM-format full trajectory (`SaveTrajectoryTUM` parity)."""
        ts, T = self.poses()
        save_trajectory_tum(path, ts, T)

    def save_keyframe_trajectory(self, path: str):
        """TUM-format keyframe trajectory (`SaveKeyFrameTrajectoryTUM`)."""
        ts, T = self.keyframe_poses()
        save_trajectory_tum(path, ts, T)
