"""Multi-sequence SLAM: N sequences tracked concurrently over a device mesh.

This is the PRODUCT surface of the `parallel/` layer (SURVEY.md §7 layer 7;
BASELINE.json configs[4]'s multi-sequence batch mode): the state of N
independent SLAM sessions lives as batched arrays with the leading
sequence axis sharded over the mesh's `data` axis, and every step is one
jitted program that XLA partitions across devices — each device tracks,
keyframes, and bundle-adjusts its own sequence shard with ZERO cross-device
traffic in steady state (multi-sequence odometry is embarrassingly
parallel; the scaling-efficiency claim of BASELINE.md:32 is measured on
exactly this workload).

Relationship to `SLAMSession` (one sequence, latency-oriented):

  * tracking    — the same `icp_align` coarse-to-fine GN, vmapped over the
    sequence axis (the `dist.batch_track` program shape).
  * keyframes   — the same `should_insert_keyframe` policy and
    `mapping.map.insert_keyframe` scatter, vmapped over per-sequence
    `MapState`s; insertion is MASKED per sequence (static shapes — a
    sequence that doesn't want a keyframe this step runs the same program
    and keeps its old map).
  * association — the same two-tier `match_against_map`, vmapped, on the
    XLA matching path (the fused Pallas kernel is single-problem; batching
    rides the MXU through the batched matmul instead).
  * backend     — the same compacted `windowed_local_ba`, vmapped, merged
    with the same rigid-correction discipline.
  * loop closure — per-sequence odometry edges are maintained on insert,
    and keyframe steps run a vmapped candidate search (one cheap
    signature matmul per sequence). The EXPENSIVE closure program
    (verify + consistency gate + pose graph + per-anchor point
    correction, vmapped and masked per sequence) is host-gated: it
    dispatches only when some sequence actually has a candidate — the
    same rare-path discipline as `SLAMSession`'s backend.
  * relocalization — lost sequences (masked, host-gated, rate-limited
    like the single session) run a vmapped features + map-wide match +
    3D-3D solve with the same consensus/plausibility gates.

Landmark fusion + post-loop global BA remain single-session features
(`backend.worker`): they refine a closure, while batch mode's job is
bounded per-step cost across N sequences.

The host keeps only per-sequence scalars (keyframe counts, frame indices);
all array state stays device-resident and sharded. Checkpointing N
sequences = checkpointing one pytree.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass, field

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from slam_rgbd_tpu.backend import ba as ba_mod
from slam_rgbd_tpu.backend import loop as loop_mod
from slam_rgbd_tpu.backend import pose_graph as pg_mod
from slam_rgbd_tpu.core import camera, se3
from slam_rgbd_tpu.core.config import SLAMConfig
from slam_rgbd_tpu.features import detect as fdetect
from slam_rgbd_tpu.features import orb as forb
from slam_rgbd_tpu.mapping import map as smap
from slam_rgbd_tpu.odometry.icp import track_frame_batched
from slam_rgbd_tpu.parallel.mesh import make_mesh


@functools.partial(jax.jit, static_argnames=("cam", "icp_cfg", "kcfg"))
def _batch_steady(prev_pyr, depth, rgb, T_world, motion, last_kf_T,
                  cam, icp_cfg, kcfg):
    """One tracking step for every sequence: pyramid + coarse-to-fine GN +
    keyframe-decision summary, vmapped over the (sharded) sequence axis."""

    pyr = jax.vmap(
        lambda d, c: camera.build_frame_pyramid(
            d, cam, levels=icp_cfg.levels, rgb=c
        )
    )(depth, rgb)
    # tracking runs the BATCHED fused Pallas path (one (B, n_tiles)-grid
    # dispatch for all sequences) — not a vmapped XLA fallback
    T2, m2, res = track_frame_batched(
        prev_pyr, pyr, T_world, motion, cam, icp_cfg
    )

    def summarize(T2b, kfT, vf, rmse):
        should = smap.should_insert_keyframe(T2b, kfT, vf, kcfg)
        return jnp.stack([
            vf, rmse,
            jnp.all(jnp.isfinite(T2b)).astype(jnp.float32),
            should.astype(jnp.float32),
        ])

    summary = jax.vmap(summarize)(
        T2, last_kf_T, res.valid_fraction, res.rmse
    )
    return pyr, T2, m2, summary


@functools.partial(jax.jit, static_argnames=("cam", "orb"))
def _batch_features(depth, rgb, cam, orb):
    """Vmapped feature stage (detect + describe + keypoint depth)."""

    def one(d, c):
        intensity = camera.rgb_to_intensity(c) / 255.0
        kp, pyr = fdetect.detect_pyramid(
            intensity, n_features=orb.n_features, n_levels=orb.n_levels,
            scale_factor=orb.scale_factor, threshold=orb.fast_threshold,
            min_threshold=orb.fast_min_threshold,
        )
        desc = forb.describe(kp, pyr, orb.scale_factor)
        depth_m = camera.depth_to_metres(d, cam)
        pts, ok = forb.keypoint_depth(kp, depth_m, cam)
        return kp.uv, desc.signs, pts, ok & kp.valid

    return jax.vmap(one)(depth, rgb)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _batch_insert(maps, edges, n_edges, kp_uv, signs, pts, ok, T_pose, ts,
                  kf_idx, do_insert, cfg):
    """Masked keyframe insert for every sequence (vmapped scatter; a
    sequence with do_insert=False keeps its map unchanged). Appends the
    odometry edge prev->new per inserting sequence (the pose-graph
    chain loop closure later optimizes)."""
    kcfg = cfg.keyframes

    def one(m, e, n, uv, sg, p3, okk, T, t, ki, do):
        has_map = ki > 0
        pid = smap.match_against_map(
            m, sg, okk, uv, p3[:, 2], T, cam=cfg.camera,
            max_distance=float(cfg.orb.match_threshold), kp_pts=p3,
            merge_radius=kcfg.merge_radius, backend="xla",
        )
        pid = jnp.where(has_map, pid, -1)
        m2 = smap.insert_keyframe(m, T, t, uv, p3, okk, sg, pid)
        if kcfg.cull_min_obs > 0:
            m2, _ = smap.cull_points(
                m2, jnp.maximum(ki, 0),
                min_obs=kcfg.cull_min_obs, max_age_kf=kcfg.cull_max_age_kf,
            )
        m_out = jax.tree_util.tree_map(
            lambda a, b: jnp.where(do, a, b), m2, m
        )
        # reference keyframe: the newly-filled slot for inserting
        # sequences, the PREVIOUS one for masked-out sequences (their
        # slot `ki` is still empty)
        ref = jnp.maximum(jnp.where(do, ki, ki - 1), 0)
        last_kf_T = jnp.take(m_out.kf_pose, ref, axis=0)
        # odometry edge prev -> new (same convention as the single
        # session's `_kf_insert_jit`: T_meas = T_prev^-1 T_new)
        prev = jnp.maximum(ki - 1, 0)
        T_prev = jnp.take(m_out.kf_pose, prev, axis=0)
        e2, n2 = e.add(n, prev, ki, se3.inverse(T_prev) @ T, 1.0)
        edge_ok = do & (ki >= 1)
        e_out = jax.tree_util.tree_map(
            lambda a_, b_: jnp.where(edge_ok, a_, b_), e2, e
        )
        n_out = jnp.where(edge_ok, n2, n)
        return m_out, e_out, n_out, last_kf_T

    return jax.vmap(one)(maps, edges, n_edges, kp_uv, signs, pts, ok,
                         T_pose, ts, kf_idx, do_insert)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _batch_ba(maps, T_world, do_ba, cfg):
    """Vmapped compacted windowed BA + masked rigid-correction merge —
    the backend pass of the batch path (no loop closure; see module
    docstring)."""
    w = cfg.ba.window

    def one(m, Tw, do):
        idx, valid = smap.local_window(m, 2 * w)
        free = jnp.arange(2 * w) >= w
        res = ba_mod._windowed_single(
            m.kf_pose[idx], valid, m.pt_xyz, m.kp_uv[idx],
            m.kp_pts[idx][..., 2], m.point_id[idx],
            m.kp_ok[idx] & valid[:, None], cfg.camera, cfg.ba, free,
        )
        poses = m.kf_pose.at[idx].set(
            jnp.where(valid[:, None, None], res.kf_pose, m.kf_pose[idx])
        )
        snap = jnp.maximum(m.n_kf - 1, 0)
        C = se3.normalize_rotation(
            jnp.take(poses, snap, axis=0)
            @ se3.inverse(jnp.take(m.kf_pose, snap, axis=0))
        )
        pt_finite = jnp.all(jnp.isfinite(res.pt_xyz), axis=-1)
        sane = (
            jnp.all(jnp.isfinite(poses))
            & jnp.all(jnp.isfinite(C))
            & (jnp.linalg.norm(C[:3, 3]) < 2.0)
        )
        use = do & sane
        pt = jnp.where(
            (res.pt_solved & m.pt_valid & pt_finite)[:, None],
            res.pt_xyz, m.pt_xyz,
        )
        m2 = m.replace(
            kf_pose=jnp.where(use, poses, m.kf_pose),
            pt_xyz=jnp.where(use, pt, m.pt_xyz),
        )
        Tw2 = jnp.where(use, se3.normalize_rotation(C @ Tw), Tw)
        return m2, Tw2, jnp.where(use, res.rmse_px, 0.0)

    return jax.vmap(one)(maps, T_world, do_ba)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _batch_loop_candidates(maps, kf_idx, cfg):
    """Vmapped loop-candidate search: one signature matmul per sequence.
    Returns (B, 3) [ok, cand_idx, score] — the cheap always-on stage."""

    def one(m, ki):
        cand = loop_mod.find_loop_candidate(
            m, ki, min_interval=cfg.ba.loop_min_interval,
            min_score=cfg.ba.loop_min_score,
        )
        return jnp.stack([
            cand.ok.astype(jnp.float32),
            cand.kf_idx.astype(jnp.float32), cand.score,
        ])

    return jax.vmap(one)(maps, kf_idx)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _batch_loop_close(maps, edges, n_edges, T_world, kf_idx, cand_idx, do,
                      cfg):
    """Vmapped masked loop closure: geometric verification, the
    consistency gate, weight-5 edge append, pose-graph solve, per-anchor
    point correction, and the live-pose rigid correction — the
    `_backend_program.with_loop` stage of the single session, batched.
    Host-gated to keyframe steps where some sequence has a candidate, so
    its (heavy) cost never touches the steady path. Returns
    (maps, edges, n_edges, T_world, closed (B,) bool)."""

    def one(m, e, n, Tw, ki, ci, d):
        ver = loop_mod.verify_loop(m, ki, ci)
        Ti = jnp.take(m.kf_pose, ci, axis=0)
        Tj = jnp.take(m.kf_pose, ki, axis=0)
        resid = se3.log(se3.inverse(ver.T_rel) @ se3.inverse(Ti) @ Tj)
        t_err = jnp.linalg.norm(resid[:3])
        r_err = jnp.linalg.norm(resid[3:])
        consistent = (
            jnp.all(jnp.isfinite(resid))
            & (t_err <= cfg.ba.loop_max_residual_t)
            & (r_err <= jnp.deg2rad(cfg.ba.loop_max_residual_deg))
        )
        closed = ver.ok & consistent & d
        e2, n2 = e.add(n, ci, ki, ver.T_rel, weight=5.0)
        pg = pg_mod.optimize_pose_graph(
            m.kf_pose, m.kf_valid, e2,
            iters=cfg.ba.pg_iters, damping=cfg.ba.pg_damping,
        )
        anchor = jnp.clip(m.pt_first_kf, 0, m.capacity_kf - 1)
        delta = jnp.einsum(
            "pij,pjk->pik", pg.poses[anchor],
            jax.vmap(se3.inverse)(m.kf_pose[anchor]),
        )
        pt_new = (
            jnp.einsum("pij,pj->pi", delta[:, :3, :3], m.pt_xyz)
            + delta[:, :3, 3]
        )
        C = se3.normalize_rotation(
            jnp.take(pg.poses, ki, axis=0) @ se3.inverse(Tj)
        )
        sane = (
            jnp.all(jnp.isfinite(pg.poses))
            & jnp.all(jnp.isfinite(C))
            & (jnp.linalg.norm(C[:3, 3]) < 2.0)
        )
        use = closed & sane
        m2 = m.replace(
            kf_pose=jnp.where(use, pg.poses, m.kf_pose),
            pt_xyz=jnp.where(
                use,
                jnp.where(m.pt_valid[:, None], pt_new, m.pt_xyz),
                m.pt_xyz,
            ),
        )
        e_out = jax.tree_util.tree_map(
            lambda a_, b_: jnp.where(use, a_, b_), e2, e
        )
        n_out = jnp.where(use, n2, n)
        Tw2 = jnp.where(use, se3.normalize_rotation(C @ Tw), Tw)
        return m2, e_out, n_out, Tw2, use

    return jax.vmap(one)(maps, edges, n_edges, T_world, kf_idx, cand_idx,
                         do)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _batch_reloc(maps, depth, rgb, T_est, do, cfg):
    """Vmapped masked relocalization: features + map-wide match + 3D-3D
    IRLS solve with the single session's consensus + plausibility gates
    (`session._reloc_jit` semantics). Host-gated to steps where some
    sequence is lost. Returns (T_world (B,4,4), accepted (B,) bool)."""
    from slam_rgbd_tpu.features import match as fmatch
    from slam_rgbd_tpu.features.pose3d import solve_pose3d

    orb = cfg.orb

    def one(m, d, c, T, dd):
        intensity = camera.rgb_to_intensity(c) / 255.0
        kp, pyr = fdetect.detect_pyramid(
            intensity, n_features=orb.n_features, n_levels=orb.n_levels,
            scale_factor=orb.scale_factor, threshold=orb.fast_threshold,
            min_threshold=orb.fast_min_threshold,
        )
        desc = forb.describe(kp, pyr, orb.scale_factor)
        depth_m = camera.depth_to_metres(d, cfg.camera)
        pts, ok = forb.keypoint_depth(kp, depth_m, cfg.camera)
        ok = ok & kp.valid
        mt = fmatch.match(
            desc.signs, ok, m.pt_signs.astype(jnp.int8), m.pt_valid,
            max_distance=float(orb.match_threshold), backend="xla",
        )
        res = solve_pose3d(pts, m.pt_xyz[mt.idx2], mt.valid & ok, iters=8)
        accept = res.ok & (
            res.inliers >= 0.5 * res.n_valid.astype(jnp.float32)
        )
        T_fixed = se3.normalize_rotation(res.T)
        C = T_fixed @ se3.inverse(T)
        accept = accept & (jnp.linalg.norm(C[:3, 3]) <= 1.0) & dd
        return jnp.where(accept, T_fixed, T), accept

    return jax.vmap(one)(maps, depth, rgb, T_est, do)


@functools.partial(jax.jit, donate_argnums=(0,))
def _batch_traj_append(buf, i, T):
    """In-place scatter (buffer donated — a copy per frame would move the
    whole (B, cap, 4, 4) log through HBM every step)."""
    return buf.at[:, i].set(T)


@dataclass
class BatchState:
    frames: int = 0
    lost: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))
    loops: np.ndarray = field(default_factory=lambda: np.zeros(0, np.int64))
    relocalized: np.ndarray = field(
        default_factory=lambda: np.zeros(0, np.int64)
    )


class BatchSession:
    """N concurrent SLAM sequences over a `data`-axis mesh.

    Feed one synchronized frame per sequence with
    `process_frames(ts, depth (B,H,W) u16, rgb (B,H,W,3) u8)`; read
    per-sequence results with `poses()` / `keyframe_counts`. `mesh=None`
    builds a data-only mesh over all visible devices (a single chip gives
    a 1-device mesh and the same program runs unchanged — this class IS
    the single-program multi-chip execution path).
    """

    def __init__(self, cfg: SLAMConfig, n_seq: int, mesh=None):
        # Tracking runs the BATCHED fused Pallas GN kernel (grid
        # (B, n_tiles), `ops.icp_pallas.gn_reduce_batched`) — each
        # sequence keeps the single-problem kernel's speed; association/
        # BA batch onto the MXU through the vmapped matmuls.
        self.cfg = cfg
        self.B = n_seq
        self.mesh = mesh if mesh is not None else make_mesh(cfg.mesh)
        ndev = self.mesh.shape[cfg.mesh.data_axis]
        if n_seq % ndev:
            raise ValueError(f"n_seq={n_seq} not divisible by data axis {ndev}")
        self._shard = NamedSharding(self.mesh, P(cfg.mesh.data_axis))
        self._rep = NamedSharding(self.mesh, P())

        budgets = fdetect._per_level_budget(
            cfg.orb.n_features, cfg.orb.n_levels, cfg.orb.scale_factor
        )
        n_kp = sum(budgets)
        one_map = smap.empty_map(cfg.keyframes, n_kp)
        self.maps = jax.device_put(
            jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (n_seq,) + x.shape), one_map
            ),
            self._shard,
        )
        eye = jnp.broadcast_to(jnp.eye(4), (n_seq, 4, 4))
        self.T_world = jax.device_put(eye, self._shard)
        self.motion = jax.device_put(eye, self._shard)
        self.last_kf_T = jax.device_put(eye, self._shard)
        one_edges = pg_mod.EdgeList.empty(4 * cfg.keyframes.max_keyframes)
        self.edges = jax.device_put(
            jax.tree_util.tree_map(
                lambda x: jnp.broadcast_to(x, (n_seq,) + x.shape), one_edges
            ),
            self._shard,
        )
        self.n_edges = jax.device_put(
            jnp.zeros((n_seq,), jnp.int32), self._shard
        )
        self.prev_pyr = None
        self._traj_cap = 1024
        self._traj = jax.device_put(
            jnp.zeros((n_seq, self._traj_cap, 4, 4)), self._shard
        )
        # reference-keyframe log (pose-at-log-time ring + host slot ids):
        # `poses()` re-anchors each frame to its reference keyframe's
        # CURRENT pose, so loop-closure / BA corrections apply to the
        # whole logged history exactly like `SLAMSession.poses()`
        self._traj_kfT = jax.device_put(
            jnp.zeros((n_seq, self._traj_cap, 4, 4)), self._shard
        )
        self._frame_kf: list[np.ndarray] = []  # per frame: (B,) kf slot
        self._traj_ts: list[float] = []
        self._n_kf = np.zeros(n_seq, np.int64)
        self._last_kf_frame = np.full(n_seq, -(10 ** 9))
        self._last_loop_kf = np.full(n_seq, -(10 ** 9))
        self._lost_streak = np.zeros(n_seq, np.int64)
        self._frame_i = 0
        self.state = BatchState(
            lost=np.zeros(n_seq, np.int64),
            loops=np.zeros(n_seq, np.int64),
            relocalized=np.zeros(n_seq, np.int64),
        )

    # ------------------------------------------------------------------ step
    def _insert(self, ts, depth, rgb, do_insert: np.ndarray):
        kp_uv, signs, pts, ok = _batch_features(
            depth, rgb, cam=self.cfg.camera, orb=self.cfg.orb
        )
        kf_idx = jnp.asarray(self._n_kf.astype(np.int32))
        self.maps, self.edges, self.n_edges, self.last_kf_T = _batch_insert(
            self.maps, self.edges, self.n_edges, kp_uv, signs, pts, ok,
            self.T_world, jnp.full((self.B,), np.float32(ts)), kf_idx,
            jnp.asarray(do_insert), cfg=self.cfg,
        )
        self._n_kf += do_insert.astype(np.int64)
        self._last_kf_frame = np.where(
            do_insert, self._frame_i, self._last_kf_frame
        )
        # backend: windowed BA for sequences with enough keyframes
        do_ba = do_insert & (self._n_kf >= 3)
        if do_ba.any():
            self.maps, self.T_world, _ = _batch_ba(
                self.maps, self.T_world, jnp.asarray(do_ba), cfg=self.cfg
            )
        # loop closure: cheap vmapped candidate search on inserting
        # sequences past cooldown; the heavy closure program dispatches
        # only when a candidate actually exists (host gate)
        new_kf = np.maximum(self._n_kf - 1, 0).astype(np.int32)
        allow = (
            do_insert
            & (new_kf - self._last_loop_kf >= self.cfg.ba.loop_cooldown_kf)
            & (self._n_kf >= 3)
        )
        if allow.any():
            cand = np.asarray(_batch_loop_candidates(
                self.maps, jnp.asarray(new_kf), cfg=self.cfg
            ))
            do_loop = allow & (cand[:, 0] > 0.5)
            if do_loop.any():
                (self.maps, self.edges, self.n_edges, self.T_world,
                 closed) = _batch_loop_close(
                    self.maps, self.edges, self.n_edges, self.T_world,
                    jnp.asarray(new_kf),
                    jnp.asarray(cand[:, 1].astype(np.int32)),
                    jnp.asarray(do_loop), cfg=self.cfg,
                )
                closed = np.asarray(closed)
                self.state.loops += closed.astype(np.int64)
                self._last_loop_kf = np.where(
                    closed, new_kf, self._last_loop_kf
                )
        if do_ba.any() or allow.any():
            self.last_kf_T = jax.vmap(
                lambda m, i: jnp.take(m.kf_pose, i, axis=0)
            )(self.maps, jnp.asarray(new_kf))

    def process_frames(self, ts: float, depth: np.ndarray, rgb: np.ndarray):
        """One synchronized frame for every sequence."""
        depth = jax.device_put(jnp.asarray(depth), self._shard)
        rgb = jax.device_put(jnp.asarray(rgb), self._shard)
        traj_i = len(self._traj_ts)
        if traj_i >= self._traj_cap:
            # double the log (rare: once per 1024 frames, re-jits once)
            pad = jax.device_put(
                jnp.zeros((self.B, self._traj_cap, 4, 4)), self._shard
            )
            self._traj = jnp.concatenate([self._traj, pad], axis=1)
            self._traj_kfT = jnp.concatenate([self._traj_kfT, pad], axis=1)
            self._traj_cap *= 2

        if self.prev_pyr is None:  # bootstrap: keyframe 0 for every sequence
            self.prev_pyr = jax.vmap(
                lambda d, c: camera.build_frame_pyramid(
                    d, self.cfg.camera, levels=self.cfg.icp.levels, rgb=c
                )
            )(depth, rgb)
            self._insert(ts, depth, rgb, np.ones(self.B, bool))
            self._last_kf_frame[:] = 0
        else:
            (self.prev_pyr, self.T_world, self.motion,
             summaries) = _batch_steady(
                self.prev_pyr, depth, rgb, self.T_world, self.motion,
                self.last_kf_T, cam=self.cfg.camera, icp_cfg=self.cfg.icp,
                kcfg=self.cfg.keyframes,
            )
            s = np.asarray(summaries)  # (B, 4)
            ok = (s[:, 0] > 0.25) & (s[:, 2] > 0.5)
            self.state.lost += (~ok).astype(np.int64)
            self._lost_streak = np.where(ok, 0, self._lost_streak + 1)
            # relocalization for lost sequences — rate-limited like the
            # single session (1st streak frame, then every 4th), and
            # host-gated so the program only dispatches when needed
            attempt = (
                ~ok
                & ((self._lost_streak == 1) | (self._lost_streak % 4 == 0))
                & (self._n_kf >= 1)
            )
            if attempt.any():
                self.T_world, accepted = _batch_reloc(
                    self.maps, depth, rgb, self.T_world,
                    jnp.asarray(attempt), cfg=self.cfg,
                )
                accepted = np.asarray(accepted)
                self.state.relocalized += accepted.astype(np.int64)
                self._lost_streak = np.where(accepted, 0, self._lost_streak)
                # motion prior resets for relocalized sequences (the bad
                # pre-loss velocity must not seed the next track)
                self.motion = jnp.where(
                    jnp.asarray(accepted)[:, None, None],
                    jnp.broadcast_to(jnp.eye(4), self.motion.shape),
                    self.motion,
                )
                ok = ok | accepted
            gap_ok = (
                self._frame_i - self._last_kf_frame
                >= self.cfg.keyframes.kf_min_gap_frames
            )
            room = self._n_kf < self.cfg.keyframes.max_keyframes
            do = ok & (s[:, 3] > 0.5) & gap_ok & room
            if do.any():
                self._insert(ts, depth, rgb, do)

        self._traj = _batch_traj_append(
            self._traj, np.int32(traj_i), self.T_world
        )
        self._traj_kfT = _batch_traj_append(
            self._traj_kfT, np.int32(traj_i), self.last_kf_T
        )
        self._frame_kf.append(np.maximum(self._n_kf - 1, 0).astype(np.int32))
        self._traj_ts.append(ts)
        self._frame_i += 1
        self.state.frames += 1

    # --------------------------------------------------------------- outputs
    def poses(self):
        """(ts (n,), trajectories (B, n, 4, 4)) — loop/BA-corrected.

        Each logged frame pose is re-anchored to its reference
        keyframe's CURRENT (optimized) pose, exactly like
        `SLAMSession.poses()`: T = T_kf_now @ T_kf_then^-1 @ T_then —
        so pose-graph rewrites and BA corrections apply to the whole
        logged history, not just frames after the merge."""
        n = len(self._traj_ts)
        ts = np.asarray(self._traj_ts)
        T_then = np.asarray(self._traj[:, :n])  # (B, n, 4, 4)
        if n == 0:
            return ts, T_then
        kfT_then = np.asarray(self._traj_kfT[:, :n])
        kf_idx = np.stack(self._frame_kf, axis=1)  # (B, n)
        kf_now = np.asarray(
            jax.vmap(lambda m: m.kf_pose)(self.maps)
        )  # (B, M, 4, 4)
        anchor = np.take_along_axis(
            kf_now, kf_idx[:, :, None, None].repeat(4, 2).repeat(4, 3), 1
        )
        R = kfT_then[..., :3, :3]
        t = kfT_then[..., :3, 3]
        inv = np.tile(np.eye(4, dtype=np.float32), (self.B, n, 1, 1))
        inv[..., :3, :3] = np.swapaxes(R, -1, -2)
        inv[..., :3, 3] = -np.einsum("bnji,bnj->bni", R, t)
        out = np.einsum("bnij,bnjk,bnkl->bnil", anchor, inv, T_then)
        return ts, out.astype(np.float32)

    def ate_per_sequence(self, gt: np.ndarray) -> np.ndarray:
        """ATE RMSE (metres) per sequence vs (B, n, 4, 4) ground truth."""
        from slam_rgbd_tpu.eval.trajectory import ate_rmse

        _, est = self.poses()
        out = []
        for b in range(self.B):
            rmse, _, _ = ate_rmse(est[b], gt[b][: est.shape[1]])
            out.append(rmse)
        return np.asarray(out)

    @property
    def keyframe_counts(self) -> np.ndarray:
        return self._n_kf.copy()

    def map_point_counts(self) -> np.ndarray:
        return np.asarray(jax.vmap(smap.map_point_count)(self.maps))
