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


@functools.partial(
    jax.jit,
    static_argnames=("cam", "icp_cfg", "kcfg"),
    donate_argnums=(6, 7),
)
def _steady_step(
    prev_pyr, depth_raw, rgb, T_world, motion, last_kf_T,
    buf_T, buf_kfT, traj_i, cam, icp_cfg, kcfg,
):
    """The ENTIRE steady-state frame as one device program: pyramid build,
    coarse-to-fine track, control summary, trajectory-ring scatter.

    One dispatch per frame instead of four — host dispatch overhead is
    ~0.2-0.4 ms each on a remote-tunneled chip, and fewer program
    boundaries also give XLA the pyramid->track fusion. Trajectory buffers
    are donated so the scatter is in-place."""
    pyr = camera.build_frame_pyramid(
        depth_raw, cam, levels=icp_cfg.levels, rgb=rgb
    )
    T_world, motion, res = track_frame(
        prev_pyr, pyr, T_world, motion, cam, icp_cfg
    )
    summary = _frame_summary(
        T_world, last_kf_T, res.valid_fraction, res.rmse, kcfg
    )
    buf_T = buf_T.at[traj_i].set(T_world)
    buf_kfT = buf_kfT.at[traj_i].set(last_kf_T)
    return pyr, T_world, motion, summary, buf_T, buf_kfT


@functools.partial(jax.jit, static_argnames=("cfg", "match_backend"))
def _kf_insert_jit(
    m, edges, n_edges, kp_uv, signs, pts, ok, T_pose, ts,
    prev_kf_idx, kf_idx, cfg, match_backend="auto",
):
    """The whole keyframe-insert device stage as ONE program: map
    association (two-tier gated match), keyframe/point insertion, the
    odometry edge, and point culling. The host path used to dispatch
    these as 3 jit calls plus ~12 eager ops (edge math, pose gathers) —
    each eager dispatch costs ~0.2-0.5 ms on a remote-tunneled chip and
    serializes against the async backend's programs.

    `prev_kf_idx < 0` (bootstrap keyframe) skips the association and the
    odometry edge via `jnp.where` — one compiled variant for both cases.
    """
    kcfg = cfg.keyframes
    has_map = prev_kf_idx >= 0
    match_pid = smap.match_against_map(
        m, signs, ok, kp_uv, pts[:, 2], T_pose,
        cam=cfg.camera,
        max_distance=float(cfg.orb.match_threshold),
        kp_pts=pts,
        merge_radius=kcfg.merge_radius,
        backend=match_backend,
    )
    match_pid = jnp.where(has_map, match_pid, -1)
    m = smap.insert_keyframe(m, T_pose, ts, kp_uv, pts, ok, signs, match_pid)
    last_kf_T = jnp.take(m.kf_pose, kf_idx, axis=0)

    # odometry edge between consecutive keyframes
    T_prev = jnp.take(m.kf_pose, jnp.maximum(prev_kf_idx, 0), axis=0)
    T_rel = se3.inverse(T_prev) @ T_pose
    edges2, n_edges2 = edges.add(n_edges, prev_kf_idx, kf_idx, T_rel, 1.0)
    edges = jax.tree_util.tree_map(
        lambda a, b: jnp.where(has_map, a, b), edges2, edges
    )
    n_edges = jnp.where(has_map, n_edges2, n_edges)

    # map maintenance BEFORE the backend snapshot, so BA never optimizes
    # doomed points
    n_culled = jnp.int32(0)
    if kcfg.cull_min_obs > 0:
        m, n_culled = smap.cull_points(
            m, kf_idx,
            min_obs=kcfg.cull_min_obs, max_age_kf=kcfg.cull_max_age_kf,
        )
    return m, edges, n_edges, last_kf_T, n_culled


@functools.partial(jax.jit, static_argnames=("cfg", "match_backend"))
def _reloc_jit(m, signs, ok, pts, T_est, cfg, match_backend="auto"):
    """Relocalization solve as one program: map-wide descriptor match,
    3D-3D IRLS solve, consensus gate, and the implied rigid correction
    C = T_fixed T_est^-1 — the host reads back ONE (4,) stats vector
    [accept, inliers, n_valid, |t(C)|] instead of three separate scalars."""
    from slam_rgbd_tpu.features.pose3d import solve_pose3d

    mt = fmatch.match(
        signs, ok, m.pt_signs.astype(jnp.int8), m.pt_valid,
        max_distance=float(cfg.orb.match_threshold),
        backend=match_backend,
    )
    target = m.pt_xyz[mt.idx2]
    res = solve_pose3d(pts, target, mt.valid & ok, iters=8)
    # consensus gate, like loop verification: a relocalization that
    # explains under half of its own matches is an aliased solution
    # (repeated texture), and accepting it teleports the trajectory
    accept = res.ok & (res.inliers >= 0.5 * res.n_valid.astype(jnp.float32))
    T_fixed = se3.normalize_rotation(res.T)
    C = T_fixed @ se3.inverse(T_est)
    stats = jnp.stack([
        accept.astype(jnp.float32),
        res.inliers.astype(jnp.float32),
        res.n_valid.astype(jnp.float32),
        jnp.linalg.norm(C[:3, 3]),
    ])
    return T_fixed, C, stats


@jax.jit
def _fuse_merge(m, snap, cand, fuse_row, ghost, delta, n_fused):
    """Merge a loop's landmark fusion (`worker._loop_fuse_program`) into
    the live map: re-point the query keyframe's observation row, clear
    ALL references to ghost duplicates (keyframes inserted after the
    snapshot may have re-observed them — the live-wide flag pass handles
    those rows too), update observation counts, and record the loop pair
    as covisible — which also retires the pair from future loop
    candidacy via `find_loop_candidate`'s covis gate."""
    P = m.capacity_pt
    pid = m.point_id.at[snap].set(fuse_row)
    flag = jnp.concatenate([ghost, jnp.zeros((1,), bool)])
    ref = flag[jnp.where(pid >= 0, pid, P)]
    pid = jnp.where(ref, -1, pid)
    pt_valid = m.pt_valid & ~ghost
    nobs = jnp.where(ghost, 0, jnp.maximum(m.pt_nobs + delta, 0))
    covis = m.covis.at[snap, cand].add(n_fused).at[cand, snap].add(n_fused)
    return m.replace(
        point_id=pid, pt_valid=pt_valid, pt_nobs=nobs,
        n_pt=jnp.sum(pt_valid).astype(jnp.int32), covis=covis,
    )


@functools.partial(jax.jit, donate_argnums=(0, 1))
def _traj_append(buf_T, buf_kfT, i, T, kfT):
    """Scatter one frame's (pose, reference-KF pose) into the device-side
    trajectory ring — an enqueued op, never a host sync. Buffers are
    donated so the scatter is in-place."""
    return buf_T.at[i].set(T), buf_kfT.at[i].set(kfT)


@functools.partial(jax.jit, donate_argnums=(0,))
def _traj_correct(buf_T, start, C):
    """Left-multiply the rigid correction C onto ring entries [start:)
    (relocalization rewrites the pose estimates logged since the lost
    frame)."""
    idx = jnp.arange(buf_T.shape[0])
    corrected = jnp.einsum("ij,njk->nik", C, buf_T)
    return jnp.where((idx >= start)[:, None, None], corrected, buf_T)


@dataclass
class _PendingFrame:
    """A frame whose control decisions are still in flight (see
    `SLAMSession.process_frame` docstring)."""

    summary: jax.Array  # (4,) device scalars, async host copy started
    st: FrameStats  # filled in when the summary lands
    ts: float
    depth_raw: object
    rgb: object
    traj_i: int  # ring slot of this frame's logged pose
    frame_i: int  # session frame index
    T: jax.Array  # (4, 4) this frame's pose estimate (device ref);
    # backend merges / relocalizations compose corrections onto it

    def ready(self) -> bool:
        fn = getattr(self.summary, "is_ready", None)
        return True if fn is None else bool(fn())


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
    # frame index at which each loop-closure result MERGED into the live
    # state (async path: the process_frame call that polled it) — lets the
    # bench report the merge's frame-time spike on the timed path
    loop_merge_frames: list = field(default_factory=list)


class SLAMSession:
    """RGB-D SLAM session (one sequence).

    Call `process_frame(ts, depth_raw, rgb)` per frame; read `poses()` /
    `keyframe_poses()` / `stats` afterward. All device programs are jitted
    once — shapes are fixed by the config.

    `mesh`: optional `jax.sharding.Mesh`. With a `model` axis >1, the
    session runs in map-block sharded mode — the per-point map arrays are
    placed block-sharded over `model` and GSPMD partitions the
    association/BA programs across the mesh (the map is the state that
    outgrows one device; SURVEY.md §5's long-context analogue as a
    product mode). For N CONCURRENT sequences over the `data` axis use
    `runtime.batch_session.BatchSession` instead.
    """

    def __init__(self, config: SLAMConfig, metrics=None,
                 async_backend: bool = False, mesh=None):
        from slam_rgbd_tpu.runtime.profiling import StageTimer

        self.cfg = config
        self.metrics = metrics  # optional profiling.MetricsLog
        self.timer = StageTimer()
        cam = config.camera
        self.n_kp = config.orb.n_features
        self.map = smap.empty_map(config.keyframes, self._kp_capacity())
        # Map-block sharded mode (the long-context analogue, SURVEY.md §5):
        # with a mesh whose `model` axis is >1, the map's per-POINT arrays
        # are placed block-sharded over `model` (the map is the state that
        # outgrows one device; keyframe arrays are small and replicated).
        # The session's programs are unchanged — the scaling-book recipe:
        # annotate shardings, let GSPMD partition the matmuls/scatters and
        # insert the collectives (the Hamming association matmul becomes
        # column-sharded with an all-reduce'd argmin, exactly the layout
        # `dist.sharded_map_association` spells out with shard_map).
        # Pallas kernels are single-device programs, so the sharded mode
        # pins the XLA matching path.
        self._mesh = mesh
        self._match_backend = "auto"
        # a mesh without a `model` axis (e.g. a data-only BatchSession
        # mesh) cleanly selects the unsharded path instead of KeyError
        if (mesh is not None
                and dict(mesh.shape).get(config.mesh.model_axis, 1) > 1):
            import dataclasses as _dc

            from jax.sharding import NamedSharding, PartitionSpec as P

            axis = config.mesh.model_axis
            blocked = NamedSharding(mesh, P(axis))
            replicated = NamedSharding(mesh, P())
            self.map = smap.MapState(**{
                f.name: jax.device_put(
                    getattr(self.map, f.name),
                    blocked
                    if (f.name.startswith("pt_")
                        and getattr(self.map, f.name).ndim >= 1)
                    else replicated,  # scalars/counters and kf_* arrays
                )
                for f in _dc.fields(smap.MapState)
            })
            self._match_backend = "xla"
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
        # Host mirror of the map's keyframe count: insertion is
        # deterministic (drop-at-capacity), so the host never has to read
        # `map.n_kf` back from the device — each read is a blocking
        # round-trip that serializes the pipeline.
        self._n_kf_host = 0

        # Ready-polled decision pipeline: per-frame control scalars are
        # async-copied to the host and resolved as soon as they LAND —
        # steady-state tracking never blocks on the device. The lag
        # self-tunes: ~1 frame on a local TPU, up to
        # `runtime.max_decision_lag` over a high-latency link.
        import collections

        self._pending: "collections.deque[_PendingFrame]" = collections.deque()
        self._frame_i = 0
        self._last_kf_frame_i = -(10 ** 9)
        self._last_loop_kf = -(10 ** 9)
        # Frames DISPATCHED before the newest keyframe insert resolved
        # carry a keyframe decision computed against the pre-insert
        # reference pose — acting on it re-triggers the same
        # motion-threshold crossing and churns a keyframe every
        # `kf_min_gap_frames` (the round-3 bench inserted 84 KFs in 240
        # frames this way). Their stale decisions are suppressed; the
        # criterion re-fires on the first post-insert frame if motion
        # genuinely warrants it.
        self._kf_ref_fresh_from = 0
        # Keyframe-burst splitting: the backend job created by an insert
        # is submitted at the START of the next frame, so the insert's
        # device programs (features + association + scatter) and the
        # backend pass (BA + loop attempt) occupy different frame slots —
        # the decision-pipeline block behind a keyframe then waits for
        # half the burst instead of all of it.
        self._deferred_job = None
        # Consecutive low-quality frames; relocalization is attempted on
        # the 1st and then every 4th (a reloc is features + map-wide match
        # + a blocking fetch — per-frame attempts during a degraded streak
        # stack ~100 ms stalls that MAKE the streak, and the odometry
        # fallback is usually within centimetres anyway).
        self._lost_streak = 0
        # Loop-merge generation: bumped when a loop-closure result merges
        # (the pose graph rewrites every keyframe). Backend jobs are
        # stamped with it at submit; a job or result from an older
        # generation is dropped — its verbatim pose merge would revert the
        # loop correction (see BackendWorker docstring).
        self._loop_gen = 0

        self._traj_ts: list[float] = []
        self._frame_kf_idx: list[int] = []  # last KF index per frame
        # Device-side trajectory ring (pose + reference-KF pose per frame);
        # fetched once in `poses()` instead of one transfer per frame.
        self._traj_cap = 4096
        self._traj_T_dev = jnp.zeros((self._traj_cap, 4, 4), jnp.float32)
        self._traj_kfT_dev = jnp.zeros((self._traj_cap, 4, 4), jnp.float32)
        self.stats: list[FrameStats] = []

    # ---------------------------------------------------------------- warmup
    def warmup(self):
        """Compile EVERY device program this session can dispatch, up front.

        Keyframe-path and backend programs otherwise compile lazily on
        first use — and the pose-graph solve only compiles when the first
        loop candidate VERIFIES, which is data-dependent. On a
        remote-compile TPU each late compile injects a multi-second stall
        at an unpredictable point of a live run (the round-3 profile
        showed a 3.7 s backend pass and 380 ms frontend stalls from
        exactly this). One call compiles the closed set at the session's
        static shapes. Must run on a FRESH session; ends with `reset()`,
        so the session comes out pristine.
        """
        cfg = self.cfg
        cam = cfg.camera

        # ---- backend program first: the async worker would otherwise race
        # a duplicate compile of the same executables during the frontend
        # warmup below. ONE call to the fused `_backend_program` compiles
        # the full closed set — BA, candidate search, verification, the
        # consistency gate, pose graph, and the per-anchor point
        # correction all live under `lax.cond`, whose branches compile
        # regardless of the runtime predicate (the round-3 bench hit an
        # 18.8 s first-loop compile stall because the correction only
        # traced when a loop first VERIFIED, mid-timed-run).
        P = cfg.keyframes.max_map_points
        r0 = bworker.backend_pass(
            self.map, self.edges, self.n_edges, 0, cfg, n_kf=0,
            allow_loop=True,
        )
        r1 = bworker.backend_pass(
            self.map, self.edges, self.n_edges, 0, cfg, n_kf=3,
            allow_loop=True,
        )
        jax.block_until_ready((r0.kf_pose, r1.kf_pose))
        # loop-fusion + global-BA-after-loop programs (host-gated on an
        # actual closure, so the fused pass above never traces them)
        pidf, frow, gh, dl, _nf = bworker._loop_fuse_program(
            self.map, jnp.int32(0), jnp.int32(0), jnp.eye(4)
        )
        fm = _fuse_merge(
            self.map, jnp.int32(0), jnp.int32(0), frow, gh, dl,
            jnp.int32(0),
        )
        jax.block_until_ready(fm.point_id)
        if cfg.ba.global_ba_iters > 0:
            gk, _gp, _gs, _gr, _gok, _gmv = bworker._global_ba_program(
                self.map.kf_pose, self.map.pt_xyz, pidf, self.map, cfg
            )
            jax.block_until_ready(gk)
        # loop-edge append at merge time (weight-5 edge, traced indices)
        e2, _n2 = self.edges.add(self.n_edges, 0, 1, jnp.eye(4), 5.0)
        jax.block_until_ready(e2.T_meas)

        # ---- frontend on a textured sloped plane: valid geometry + FAST
        # corners without rendering (no extra raycast compile).
        yy, xx = np.meshgrid(
            np.arange(cam.height), np.arange(cam.width), indexing="ij"
        )
        depth = (1800.0 + 2.0 * xx + 1.5 * yy).astype(np.uint16)
        rgb = np.broadcast_to(
            (((xx // 8 + yy // 8) % 2) * 160 + 48).astype(np.uint8)[..., None],
            (cam.height, cam.width, 3),
        ).copy()
        self.process_frame(0.0, depth, rgb)  # bootstrap KF + features/insert
        self.process_frame(1.0 / 30, depth, rgb)  # fused steady step
        self.flush_pipeline()  # summary fetch/resolve
        # keyframe against an existing map: association + merge tiers; the
        # 3rd insert makes backend_pass run its full BA stage (n_kf >= 3).
        self._insert_keyframe(2.0 / 30, depth, rgb, self.T_world)
        self.sync_backend()
        self._insert_keyframe(3.0 / 30, depth, rgb, self.T_world)
        self.sync_backend()
        # relocalization (map-wide Hamming match + 3D-3D solve)
        self._relocalize(depth, rgb)
        # trajectory-ring rigid correction
        self._traj_T_dev = _traj_correct(
            self._traj_T_dev, np.int32(0), jnp.eye(4)
        )
        # backend merge math (snapshot poses == live poses -> C == I)
        self._apply_backend(bworker.BackendResult(
            snap_kf_idx=self.last_kf_idx,
            kf_pose=self.map.kf_pose,
            pt_xyz=self.map.pt_xyz,
            pt_adjusted=jnp.zeros((P,), bool),
        ))
        jax.block_until_ready(self.T_world)
        self.reset()

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
        """One frame: resolve the previous frame's decisions, then track.

        Decision pipelining (the TPU-native shape of this loop): frame t
        enqueues tracking + a (4,) control summary and starts an ASYNC
        device->host copy of it; the copy completes while frame t+1's
        work is being submitted, so the host never blocks on the device
        in steady state. Frame t's decisions — relocalize on loss, insert
        a keyframe — are applied at the START of frame t+1, before t+1's
        tracking, which preserves the decision ordering exactly (T_world
        has not advanced yet) at the cost of stats for the newest frame
        being final only after the next call (or `flush_pipeline()`).
        """
        t0 = time.monotonic()
        # merge any finished backend work FIRST: the snapshot discipline
        # (worker.py docstring) relies on corrections landing before the
        # next keyframe can be inserted. `advance` then promotes any
        # waiting job — after the merge, so the generation gate sees the
        # post-merge state.
        if self.worker is not None:
            self._apply_backend(self.worker.poll())
            self.worker.advance(self._loop_gen, self._allow_loop)
            # deferred backend submit (see _insert_keyframe): the insert's
            # device programs and the backend pass land in DIFFERENT frame
            # slots, so no single frame waits behind the whole burst
            if self._deferred_job is not None:
                job, self._deferred_job = self._deferred_job, None
                self.worker.submit(job)
        # resolve every in-flight frame whose summary has landed; force
        # (block on) the oldest only at the lag bound
        self._drain_pending(block=len(self._pending) >= self.cfg.runtime.max_decision_lag)

        if self.prev_pyr is None:
            # first frame: bootstrap a keyframe at the origin — unless we
            # restored from a checkpoint, where only the tracking reference
            # needs re-anchoring.
            pyr = self._pyramid(depth_raw, rgb)
            st = FrameStats(ts, 0.0, 1.0, 0.0, True, True)
            if self._n_kf_host == 0:
                st.is_keyframe = True
                self._last_kf_frame_i = self._frame_i
                self._insert_keyframe(ts, depth_raw, rgb, self.T_world)
            self.prev_pyr = pyr
            self._log_pose(ts)
            self._frame_i += 1
            self._finish(st, t0)
            return st

        # steady state: ONE fused device dispatch (pyramid + track +
        # summary + trajectory scatter) — see `_steady_step`
        traj_i = len(self._traj_ts)
        if traj_i >= self._traj_cap:
            self._grow_traj_ring()
        kfT = self.last_kf_T if self.last_kf_idx >= 0 else jnp.eye(4)
        (pyr, self.T_world, self.motion, summary,
         self._traj_T_dev, self._traj_kfT_dev) = _steady_step(
            self.prev_pyr, jnp.asarray(depth_raw), jnp.asarray(rgb),
            self.T_world, self.motion, kfT,
            self._traj_T_dev, self._traj_kfT_dev, np.int32(traj_i),
            self.cfg.camera, self.cfg.icp, self.cfg.keyframes,
        )
        self._traj_ts.append(ts)
        self._frame_kf_idx.append(self.last_kf_idx)
        try:
            summary.copy_to_host_async()
        except Exception:  # noqa: BLE001 — backends without async copy:
            pass  # the resolve-time fetch then pays one blocking round-trip
        # stats carry placeholders until the summary lands
        st = FrameStats(ts, 0.0, -1.0, -1.0, False, True)
        self._pending.append(_PendingFrame(
            summary=summary, st=st, ts=ts, depth_raw=depth_raw, rgb=rgb,
            traj_i=traj_i, frame_i=self._frame_i, T=self.T_world,
        ))

        self.prev_pyr = pyr
        self._frame_i += 1
        self._finish(st, t0)
        return st

    def _drain_pending(self, block: bool = False):
        """Resolve in-flight frames: all whose summaries have landed, plus
        (when `block`) the oldest one unconditionally."""
        while self._pending:
            if not block and not self._pending[0].ready():
                return
            block = False  # only ever force the oldest
            self._resolve_entry(self._pending.popleft())

    def _resolve_entry(self, e: _PendingFrame):
        """Apply one frame's control decisions (pipeline stage 2)."""
        vf, rmse, finite, should = (float(x) for x in np.asarray(e.summary))
        e.st.inlier_fraction = vf
        e.st.icp_rmse = rmse
        e.st.tracking_ok = vf > 0.25 and finite > 0.5

        force_insert = False
        if not e.st.tracking_ok:
            self.state.lost += 1
            self._lost_streak += 1
            if self._lost_streak != 1 and self._lost_streak % 4 != 0:
                # odometry-only fallback between rate-limited reloc tries
                log.warning(
                    "tracking degraded at t=%.3f (inliers %.2f) — "
                    "integrating odometry", e.ts, vf,
                )
                return
            log.warning(
                "tracking lost at t=%.3f (inliers %.2f) — relocalizing", e.ts, vf
            )
            T_fixed, C = self._relocalize(e.depth_raw, e.rgb, T_est=e.T)
            if T_fixed is not None:
                self.state.relocalized += 1
                e.st.tracking_ok = True
                self._lost_streak = 0
                self.motion = jnp.eye(4)
                # rigid correction from the lost frame's estimate; applies
                # to the live pose, every frame logged since, and every
                # still-pending estimate (they all inherited the bad pose)
                e.T = T_fixed
                self.T_world = se3.normalize_rotation(C @ self.T_world)
                self._traj_T_dev = _traj_correct(
                    self._traj_T_dev, np.int32(e.traj_i), C
                )
                for later in self._pending:
                    later.T = C @ later.T
                should = 1.0 if self._should_insert(vf) else 0.0
                force_insert = should > 0.5  # decision is already fresh
            # on failed reloc we keep integrating (odometry-only fallback)
        else:
            self._lost_streak = 0

        gap_ok = (
            e.frame_i - self._last_kf_frame_i
            >= self.cfg.keyframes.kf_min_gap_frames
        )
        # suppress keyframe decisions computed against a stale reference
        # pose (dispatched before the newest insert resolved) — see
        # `_kf_ref_fresh_from` in __init__
        fresh = e.frame_i >= self._kf_ref_fresh_from or force_insert
        if e.st.tracking_ok and should > 0.5 and gap_ok and fresh:
            e.st.is_keyframe = True
            self._last_kf_frame_i = e.frame_i
            kf_stats = self._insert_keyframe(e.ts, e.depth_raw, e.rgb, e.T)
            e.st.ba_rmse_px = kf_stats.get("ba_rmse", 0.0)
            e.st.loop_closed = kf_stats.get("loop", False)

    def flush_pipeline(self):
        """Finalize every pending frame's decisions and stats."""
        while self._pending:
            self._resolve_entry(self._pending.popleft())

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
            # the newest frame's inlier fraction may still be in flight
            # (pipeline placeholder -1) — average the resolved ones
            inl = [s.inlier_fraction for s in recent if s.inlier_fraction >= 0]
            self.metrics.log(
                "frame_window",
                frames=self.state.frames,
                fps=round(1e3 / max(mean_ms, 1e-6), 2),
                mean_track_ms=round(mean_ms, 3),
                inlier_fraction=round(sum(inl) / max(len(inl), 1), 4),
                keyframes=self.state.keyframes,
                map_points=self.map_point_count(),
                loops=self.state.loops,
                lost=self.state.lost,
            )

    def _grow_traj_ring(self):
        """Double the device trajectory ring (rare, re-jits once)."""
        pad = jnp.zeros((self._traj_cap, 4, 4), jnp.float32)
        self._traj_T_dev = jnp.concatenate([self._traj_T_dev, pad])
        self._traj_kfT_dev = jnp.concatenate([self._traj_kfT_dev, pad])
        self._traj_cap *= 2

    def _log_pose(self, ts: float):
        i = len(self._traj_ts)
        if i >= self._traj_cap:
            self._grow_traj_ring()
        self._traj_ts.append(ts)
        self._frame_kf_idx.append(self.last_kf_idx)
        kfT = self.last_kf_T if self.last_kf_idx >= 0 else jnp.eye(4)
        self._traj_T_dev, self._traj_kfT_dev = _traj_append(
            self._traj_T_dev, self._traj_kfT_dev, np.int32(i), self.T_world, kfT
        )

    def _should_insert(self, inlier_ratio: float) -> bool:
        return bool(
            smap.should_insert_keyframe(
                self.T_world, self.last_kf_T, jnp.float32(inlier_ratio),
                self.cfg.keyframes,
            )
        )

    # -------------------------------------------------------------- keyframe
    def _insert_keyframe(self, ts, depth_raw, rgb, T_pose=None) -> dict:
        """Insert a keyframe observed at pose `T_pose` (the frame's own
        pose estimate — under decision pipelining the live `T_world` has
        already advanced past it)."""
        if T_pose is None:
            T_pose = self.T_world
        out: dict = {}
        # Host mirror of the capacity check: `insert_keyframe` drops at
        # capacity deterministically, so the host knows the new slot
        # without reading `map.n_kf` back (a blocking device round-trip).
        M = self.cfg.keyframes.max_keyframes
        if self._n_kf_host >= M:
            log.warning("keyframe capacity %d reached — insert dropped", M)
            return out
        kp, desc, pts, ok = self._features(depth_raw, rgb)

        # The rest of the device stage — map association (two-tier gated
        # match at T_pose, the KEYFRAME's own pose estimate — NOT the
        # lag-advanced live T_world), insertion, the odometry edge, and
        # culling — is ONE fused dispatch (`_kf_insert_jit`).
        prev_kf_idx = self.last_kf_idx
        kf_idx = self._n_kf_host
        (self.map, self.edges, self.n_edges, self.last_kf_T,
         _n_culled) = _kf_insert_jit(
            self.map, self.edges, self.n_edges, kp.uv, desc.signs, pts, ok,
            T_pose, jnp.float32(ts), np.int32(prev_kf_idx),
            np.int32(kf_idx), self.cfg, self._match_backend,
        )
        self._n_kf_host += 1
        self.last_kf_idx = kf_idx
        # frames already dispatched used the previous reference keyframe —
        # their (in-flight) keyframe decisions are stale from here on
        self._kf_ref_fresh_from = self._frame_i
        self.state.keyframes += 1

        # backend: local BA + loop closure + pose graph — inline, or
        # handed to the worker thread (snapshot of the immutable map).
        job = bworker.BackendJob(
            map=self.map, edges=self.edges, n_edges=self.n_edges,
            kf_idx=kf_idx, n_kf=self._n_kf_host,
            allow_loop=self._allow_loop(kf_idx),
            generation=self._loop_gen,
        )
        if self.worker is not None:
            # deferred to the next frame's merge step (burst splitting —
            # see __init__); a job already waiting there is superseded
            if self._deferred_job is not None:
                self.worker.skipped += 1
            self._deferred_job = job
        else:
            res = bworker.backend_pass(
                job.map, job.edges, job.n_edges, job.kf_idx, self.cfg,
                n_kf=job.n_kf, allow_loop=job.allow_loop,
            )
            # inline results are never stale — stamp the current
            # generation or the post-loop-closure gate in _apply_backend
            # would silently drop every later inline merge
            res.generation = job.generation
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
        if r.generation < self._loop_gen:
            # the result was computed from a snapshot that predates a
            # merged loop closure: its poses would revert the pose-graph
            # correction for every old keyframe. Drop it whole.
            log.info(
                "stale backend result (KF%d) dropped: snapshot predates "
                "loop merge (gen %d < %d)",
                r.snap_kf_idx, r.generation, self._loop_gen,
            )
            if self.worker is not None:
                self.worker.skipped += 1
            return
        snap = jnp.int32(r.snap_kf_idx)  # array index: no per-slot recompile
        T_old = jnp.take(self.map.kf_pose, snap, axis=0)
        T_new = jnp.take(r.kf_pose, snap, axis=0)
        C = se3.normalize_rotation(T_new @ se3.inverse(T_old))
        # Bounded-merge guard: a backend result must never be able to
        # destroy the live session. Non-finite output or a rigid
        # correction far beyond plausible drift (backend math gone wrong,
        # e.g. an aliased loop edge slipping through the gates) is dropped
        # with an error — the next pass runs on an intact map.
        C_np = np.asarray(C)
        if (
            not np.isfinite(C_np).all()
            or np.linalg.norm(C_np[:3, 3]) > 2.0
            or not np.isfinite(np.asarray(r.kf_pose)).all()
        ):
            log.error(
                "backend result rejected: poses non-finite or correction "
                "implausible (|t|=%.2f m) — dropping merge",
                float(np.linalg.norm(C_np[:3, 3])) if np.isfinite(C_np).all() else float("nan"),
            )
            return

        slot = jnp.arange(self.map.capacity_kf)
        kf_pose = jnp.where(
            (slot <= snap)[:, None, None],
            r.kf_pose,
            jnp.einsum("ij,mjk->mik", C, self.map.kf_pose),
        )
        existed = self.map.pt_first_kf <= snap
        # guard point output too: finite poses with NaN/Inf point rows
        # (e.g. a degenerate landmark solve) must not poison the live map
        pt_finite = jnp.all(jnp.isfinite(r.pt_xyz), axis=-1)
        use_ba = r.pt_adjusted & self.map.pt_valid & existed & pt_finite
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
            if r.fuse_row is not None:
                self.map = _fuse_merge(
                    self.map, jnp.int32(r.snap_kf_idx), jnp.int32(i),
                    r.fuse_row, r.pt_invalidate, r.pt_nobs_delta,
                    jnp.int32(r.n_fused),
                )
            self.state.loops += 1
            self.state.loop_merge_frames.append(self.state.frames)
            self._last_loop_kf = max(self._last_loop_kf, r.snap_kf_idx)
            self._loop_gen += 1  # older snapshots can no longer merge
        self.T_world = se3.normalize_rotation(C @ self.T_world)
        # still-pending frame estimates inherited the pre-merge anchor; a
        # keyframe inserted from one must land in the corrected frame
        for e in self._pending:
            e.T = C @ e.T
        if self.last_kf_idx >= 0:
            self.last_kf_T = jnp.take(
                self.map.kf_pose, jnp.int32(self.last_kf_idx), axis=0
            )
        if self.metrics is not None:
            self.metrics.log(
                "backend", kf=snap, ba_rmse=round(r.ba_rmse, 3),
                backend_ms=round(r.backend_ms, 2), loop=r.loop_closed,
            )

    def _allow_loop(self, kf_idx: int) -> bool:
        """Loop-closure cooldown gate, evaluated against the CURRENT
        `_last_loop_kf` (re-checked when a waiting job is promoted)."""
        return kf_idx - self._last_loop_kf >= self.cfg.ba.loop_cooldown_kf

    def sync_backend(self, timeout: float = 30.0, final_pass: bool = False):
        """Drain the pipeline and the backend worker, merging results.

        `final_pass=True` additionally runs one inline backend pass over
        the drained map — end-of-sequence coverage: under the worker's
        replace-with-newest policy the last keyframes of a burst may
        otherwise never get a BA/loop pass (the reference's shutdown path
        likewise saves through one last optimization, `SLAM.cpp:177-198`).
        """
        self.flush_pipeline()
        if self.worker is not None:
            if self._deferred_job is not None:  # burst-split leftover
                job, self._deferred_job = self._deferred_job, None
                self.worker.submit(job)
            deadline = time.monotonic() + timeout
            self._apply_backend(self.worker.poll())
            self.worker.advance(self._loop_gen, self._allow_loop)
            while self.worker.busy():
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    log.error("sync_backend drain timed out")
                    break
                self._apply_backend(self.worker.flush(remaining))
                self.worker.advance(self._loop_gen, self._allow_loop)
        if final_pass and self._n_kf_host >= 3:
            res = bworker.backend_pass(
                self.map, self.edges, self.n_edges, self.last_kf_idx,
                self.cfg, n_kf=self._n_kf_host,
                allow_loop=self._allow_loop(self.last_kf_idx),
            )
            res.generation = self._loop_gen
            self._apply_backend(res)

    def close(self):
        """Stop the backend worker (drains the in-flight job first)."""
        if self.worker is not None:
            self.sync_backend()
            self.worker.stop()
            self.worker = None

    # ---------------------------------------------------------- reloc/reset
    def _relocalize(self, depth_raw, rgb, T_est=None):
        """Match the frame's features against all map points; solve 3D-3D.

        Returns `(T_fixed, C)` — the relocalized camera-to-world pose and
        the rigid correction `C = T_fixed @ T_est^-1` — or `(None, None)`
        on failure. One fused solve program (`_reloc_jit`) and ONE host
        fetch of its packed gate scalars; the caller applies C (under
        decision pipelining the live pose has advanced past the lost
        frame). The plausibility bound lives here: a single lost frame can
        only be centimetres off, so a relocalization demanding a
        metre-scale jump is an aliased solve — safer to keep integrating
        odometry than to teleport."""
        if self._n_kf_host == 0:
            return None, None
        if T_est is None:
            T_est = self.T_world
        kp, desc, pts, ok = self._features(depth_raw, rgb)
        T_fixed, C, stats = _reloc_jit(
            self.map, desc.signs, ok, pts, T_est, self.cfg,
            self._match_backend,
        )
        s = np.asarray(stats)  # the one blocking fetch
        if s[0] < 0.5:
            return None, None
        if s[3] > 1.0:
            log.warning("relocalization rejected: implied %.2f m jump", s[3])
            return None, None
        # res.T maps camera-frame pts onto world points => T_world_cam
        log.info("relocalized with %d/%d inliers", int(s[1]), int(s[2]))
        return T_fixed, C

    def reset(self):
        """Full system reset (`resetSlam` parity, `SLAM.cpp:220-228`)."""
        was_async = self.async_backend
        mesh = self._mesh
        self.close()
        self.__init__(self.cfg, metrics=self.metrics,
                      async_backend=was_async, mesh=mesh)

    # -------------------------------------------------------------- outputs
    def _traj_arrays(self) -> tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
        """(ts, frame poses, frame kf indices, kf-pose-at-frame) — the raw
        trajectory log, fetched from the device ring in ONE transfer."""
        n = len(self._traj_ts)
        return (
            np.asarray(self._traj_ts),
            np.asarray(self._traj_T_dev[:n]),
            np.asarray(self._frame_kf_idx, dtype=np.int32),
            np.asarray(self._traj_kfT_dev[:n]),
        )

    def _restore_traj(self, ts, T, kf_idx, kfT):
        """Inverse of `_traj_arrays` (checkpoint restore)."""
        n = len(ts)
        while self._traj_cap < n:
            self._traj_cap *= 2
        self._traj_ts = list(ts)
        self._frame_kf_idx = [int(i) for i in kf_idx]
        pad = np.zeros((self._traj_cap - n, 4, 4), np.float32)
        self._traj_T_dev = jnp.asarray(np.concatenate([T, pad]) if n else pad)
        self._traj_kfT_dev = jnp.asarray(np.concatenate([kfT, pad]) if n else pad)

    def poses(self) -> tuple[np.ndarray, np.ndarray]:
        """(timestamps (n,), camera trajectory (n, 4, 4)) — loop-corrected.

        Each frame pose is re-anchored to its reference keyframe's CURRENT
        (optimized) pose: T = T_kf_now @ (T_kf_then^-1 @ T_frame_then).
        """
        self.sync_backend()
        ts, traj_T, kf_idx, kf_T_then = self._traj_arrays()
        if len(ts) == 0:
            return ts, np.zeros((0, 4, 4), np.float32)
        # batched rigid inverse of the reference-KF poses (a per-frame
        # np.linalg.inv loop here cost ~1 ms/frame at fetch time)
        R = kf_T_then[:, :3, :3]
        t = kf_T_then[:, :3, 3]
        inv = np.tile(np.eye(4, dtype=np.float32), (len(ts), 1, 1))
        inv[:, :3, :3] = R.transpose(0, 2, 1)
        inv[:, :3, 3] = -np.einsum("nji,nj->ni", R, t)
        kf_pose_now = np.asarray(self.map.kf_pose)
        anchor = kf_pose_now[np.maximum(kf_idx, 0)]
        out = np.einsum("nij,njk,nkl->nil", anchor, inv, traj_T)
        out = np.where((kf_idx >= 0)[:, None, None], out, traj_T)
        return ts, out

    def keyframe_poses(self) -> tuple[np.ndarray, np.ndarray]:
        self.sync_backend()
        n = self._n_kf_host
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
