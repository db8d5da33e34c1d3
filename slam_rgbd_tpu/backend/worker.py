"""Asynchronous SLAM backend: BA + loop closure off the tracking thread.

The reference decouples SLAM processing from ingest with a dedicated
thread and a bounded queue with a drop policy
(`Youth.Source/AlgorithmModule/SLAM.cpp:32-63,158-169`). Here the split is
between the *frontend* (per-frame dense tracking + keyframe insertion,
latency-critical) and the *backend* (sliding-window local BA, loop
detection/verification, pose graph — heavy, only correctness-critical),
done the TPU way: `MapState` is an immutable pytree, so a "snapshot" for
the backend is free (a reference), and the backend's output is a pure
function of that snapshot — no locks around the map, ever.

Queue discipline (the part that makes merging trivial AND bounded):

  * at most ONE job in flight; submitting while busy is a recorded skip
    (the drop policy of `SLAM.cpp:162-168` — sliding windows overlap, so
    the next keyframe's BA covers the skipped one's observations);
  * the frontend merges any finished result BEFORE inserting the next
    keyframe, so a snapshot always contains every prior correction, and
    between snapshot and merge the frontend only *tracks* — it never
    moves keyframes or culls points. Merging is therefore exact: old
    keyframe slots take the backend's optimized poses verbatim, and the
    live pose is re-anchored with one rigid correction.

Both the inline (synchronous) and threaded paths run the same
`backend_pass`, so `async` changes latency, never the math.
"""

from __future__ import annotations

import functools
import logging
import threading
import time
from dataclasses import dataclass
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from slam_rgbd_tpu.backend import ba as ba_mod
from slam_rgbd_tpu.backend import loop as loop_mod
from slam_rgbd_tpu.backend import pose_graph as pg_mod
from slam_rgbd_tpu.core import se3
from slam_rgbd_tpu.core.config import SLAMConfig
from slam_rgbd_tpu.features import match as fmatch
from slam_rgbd_tpu.mapping import map as smap

log = logging.getLogger("slam_rgbd_tpu.backend")


@dataclass
class BackendJob:
    map: smap.MapState  # immutable snapshot
    edges: pg_mod.EdgeList
    n_edges: jax.Array
    kf_idx: int  # newest keyframe slot at snapshot time
    n_kf: int = -1  # host-mirrored keyframe count (-1 = read from device)
    allow_loop: bool = True  # session-side loop cooldown gate
    # Loop-merge generation at snapshot time. A pose-graph merge rewrites
    # EVERY keyframe pose in the live map; a job snapshotted before that
    # merge would, via the verbatim slot<=snap pose overwrite, revert the
    # loop correction when its result lands. The session bumps its
    # generation on each loop merge and stale jobs/results are dropped.
    generation: int = 0


@dataclass
class BackendResult:
    snap_kf_idx: int
    kf_pose: jax.Array  # (M, 4, 4) snapshot poses after BA (+ pose graph)
    pt_xyz: jax.Array  # (P, 3)
    pt_adjusted: jax.Array  # (P,) bool — points BA actually re-estimated
    loop_edge: Optional[tuple] = None  # (i, j, T_rel, weight) to append
    loop_closed: bool = False
    ba_rmse: float = 0.0
    backend_ms: float = 0.0
    generation: int = 0  # copied from the job that produced it
    # global-BA refinement after an accepted loop (reprojection RMSE px
    # before/after; -1 = did not run)
    global_ba_rmse: float = -1.0
    # landmark fusion across the accepted loop (`_loop_fuse_program`):
    # the query keyframe's re-pointed observation row, ghost duplicates to
    # invalidate, and the observation-count delta — merged into the live
    # map by `SLAMSession._apply_backend`. None when no loop closed.
    fuse_row: Optional[jax.Array] = None  # (K,) int32
    pt_invalidate: Optional[jax.Array] = None  # (P,) bool
    pt_nobs_delta: Optional[jax.Array] = None  # (P,) int32
    n_fused: int = 0


@functools.partial(jax.jit, static_argnames=("cfg", "run_ba"))
def _backend_program(
    m: smap.MapState,
    edges: pg_mod.EdgeList,
    n_edges: jax.Array,
    kf_idx: jax.Array,  # () int32
    allow_loop: jax.Array,  # () bool
    cfg: SLAMConfig,
    run_ba: bool,
):
    """The WHOLE backend pass as one device program.

    Local BA, loop-candidate search, geometric verification, the edge
    consistency gate, the pose graph, and the per-anchor point correction
    all run inside a single dispatch, with verification/pose-graph under
    `lax.cond` (executed only when a candidate passes, but COMPILED
    unconditionally — so one warmup call covers the full closed set; the
    round-3 bench hit an 18.8 s first-loop compile because the correction
    ran as ~10 eager ops that only traced when a loop first verified).
    The host reads back ONE packed (12,) stats vector — the previous
    host-orchestrated pass paid 3-5 blocking device round-trips per job
    (~100-250 ms over a tunneled chip) for its `float()`/`bool()` gates.

    Returns (kf_pose, pt_xyz, pt_adjusted, T_rel, stats) with stats =
    [ba_rmse, ba_nobs, n_dropped, cand_ok, cand_idx, cand_score,
     closed, ver_inliers, ver_nmatches, ver_ok, t_err_m, r_err_rad].
    """
    P = m.capacity_pt
    if run_ba:
        w = cfg.ba.window
        idx, valid = smap.local_window(m, 2 * w)
        free = jnp.arange(2 * w) >= w
        # the windowed solve compacts to the window's observed points
        # (~8x less scatter/HBM than the full 16k table)
        res = ba_mod._windowed_single(
            m.kf_pose[idx], valid, m.pt_xyz,
            m.kp_uv[idx], m.kp_pts[idx][..., 2],
            m.point_id[idx],
            m.kp_ok[idx] & valid[:, None],
            cfg.camera, cfg.ba, free,
        )
        poses = m.kf_pose.at[idx].set(
            jnp.where(valid[:, None, None], res.kf_pose, m.kf_pose[idx])
        )
        # pt_solved is the solve's own compact selection (NOT the raw
        # observation grid: overflow points beyond the window budget are
        # excluded and must not be merged back as "adjusted")
        pt_adjusted = res.pt_solved
        ba_stats = (res.rmse_px, res.n_obs.astype(jnp.float32),
                    res.n_dropped.astype(jnp.float32))
        m = m.replace(kf_pose=poses, pt_xyz=res.pt_xyz)
    else:
        pt_adjusted = jnp.zeros((P,), bool)
        ba_stats = (jnp.float32(0), jnp.float32(0), jnp.float32(0))

    cand = loop_mod.find_loop_candidate(
        m, kf_idx,
        min_interval=cfg.ba.loop_min_interval,
        min_score=cfg.ba.loop_min_score,
    )
    do_verify = cand.ok & allow_loop

    def with_loop(mm):
        ver = loop_mod.verify_loop(mm, kf_idx, cand.kf_idx)
        # consistency gate: accept a verified edge only if its discrepancy
        # against the current pose estimates is within plausible
        # accumulated drift — geometric verification can pass aliased
        # match sets in self-similar scenes, and one inconsistent edge
        # with pose-graph weight 5 destroys the whole trajectory.
        Ti = jnp.take(mm.kf_pose, cand.kf_idx, axis=0)
        Tj = jnp.take(mm.kf_pose, kf_idx, axis=0)
        resid = se3.log(se3.inverse(ver.T_rel) @ se3.inverse(Ti) @ Tj)
        t_err = jnp.linalg.norm(resid[:3])
        r_err = jnp.linalg.norm(resid[3:])
        consistent = (
            jnp.all(jnp.isfinite(resid))
            & (t_err <= cfg.ba.loop_max_residual_t)
            & (r_err <= jnp.deg2rad(cfg.ba.loop_max_residual_deg))
        )
        closed = ver.ok & consistent

        def run_pg(mm2):
            edges2, _ = edges.add(
                n_edges, cand.kf_idx, kf_idx, ver.T_rel, weight=5.0
            )
            pg = pg_mod.optimize_pose_graph(
                mm2.kf_pose, mm2.kf_valid, edges2,
                iters=cfg.ba.pg_iters, damping=cfg.ba.pg_damping,
            )
            # Map points ride with their anchor (first-observing)
            # keyframe: X -> T_new[a] T_old[a]^-1 X. Correcting only the
            # keyframe poses leaves the structure where the PRE-loop
            # trajectory put it, and every later association and BA pass
            # then fights the bent trajectory (measured as WORSE ATE with
            # more loop closures).
            anchor = jnp.clip(mm2.pt_first_kf, 0, mm2.capacity_kf - 1)
            T_old_a = mm2.kf_pose[anchor]  # (P, 4, 4)
            delta = jnp.einsum(
                "pij,pjk->pik", pg.poses[anchor],
                jax.vmap(se3.inverse)(T_old_a),
            )
            pt_new = (
                jnp.einsum("pij,pj->pi", delta[:, :3, :3], mm2.pt_xyz)
                + delta[:, :3, 3]
            )
            pt_out = jnp.where(mm2.pt_valid[:, None], pt_new, mm2.pt_xyz)
            return pg.poses, pt_out

        kf_pose2, pt2 = jax.lax.cond(
            closed, run_pg, lambda mm2: (mm2.kf_pose, mm2.pt_xyz), mm
        )
        vstat = jnp.stack([
            closed.astype(jnp.float32), ver.inliers.astype(jnp.float32),
            ver.n_matches.astype(jnp.float32), ver.ok.astype(jnp.float32),
            t_err, r_err,
        ])
        return kf_pose2, pt2, ver.T_rel, vstat

    def without_loop(mm):
        return (mm.kf_pose, mm.pt_xyz, jnp.eye(4, dtype=mm.kf_pose.dtype),
                jnp.zeros((6,), jnp.float32))

    kf_pose, pt_xyz, T_rel, vstat = jax.lax.cond(
        do_verify, with_loop, without_loop, m
    )
    pt_adjusted = pt_adjusted | ((vstat[0] > 0.5) & m.pt_valid)
    stats = jnp.concatenate([
        jnp.stack([
            ba_stats[0], ba_stats[1], ba_stats[2],
            cand.ok.astype(jnp.float32), cand.kf_idx.astype(jnp.float32),
            cand.score,
        ]),
        vstat,
    ])
    return kf_pose, pt_xyz, pt_adjusted, T_rel, stats


@jax.jit
def _loop_fuse_program(
    m: smap.MapState,
    query_idx: jax.Array,  # () int32 — the loop's query keyframe (= snap)
    cand_idx: jax.Array,  # () int32 — the matched old keyframe
    T_rel: jax.Array,  # (4, 4) verified query-cam -> cand-cam transform
):
    """Landmark fusion across an accepted loop — the `CorrectLoop`/`Fuse`
    step ORB-SLAM3 runs before its post-loop GlobalBundleAdjustment
    (capability delegated at `SLAM.cpp:54`).

    The loop fired precisely BECAUSE map association failed on the
    revisit: the query keyframe spawned fresh duplicate landmarks instead
    of re-observing the candidate's. Without fusing them, the observation
    graph contains no cross-loop constraint, and a subsequent global BA —
    reprojection-only — relaxes the pose-graph correction straight back
    toward drifted odometry (measured: it cancelled the entire ATE gain).
    Fusion re-points the query keyframe's verified matches at the
    candidate's map points, so the two ends of the loop share
    observations and global BA *refines* the closure instead of undoing
    it.

    Returns (point_id_fused (M, K) — the snapshot's observation graph
    with the query row re-pointed and ghost references cleared, for the
    global-BA pass; fuse_row (K,); ghost (P,) bool — duplicate points
    spawned by the query whose only observation was just re-pointed;
    nobs_delta (P,) int32; n_fused ()).
    """
    s1 = m.kp_signs[query_idx]
    ok1 = m.kp_ok[query_idx]
    s2 = m.kp_signs[cand_idx]
    ok2 = m.kp_ok[cand_idx]
    mt = fmatch.match(s1, ok1, s2, ok2, max_distance=64.0, ratio=0.9)
    p1 = m.kp_pts[query_idx]
    p2 = m.kp_pts[cand_idx][mt.idx2]
    # inlier gate consistent with verification's rmse bound: the match
    # must agree with the verified loop transform to 6 cm
    pred = p1 @ T_rel[:3, :3].T + T_rel[:3, 3]
    inl = mt.valid & (jnp.linalg.norm(pred - p2, axis=-1) < 0.06)
    q_row = m.point_id[query_idx]  # (K,)
    cand_pid = m.point_id[cand_idx][mt.idx2]  # (K,)
    fuse = inl & (cand_pid >= 0) & (q_row != cand_pid)
    fuse_row = jnp.where(fuse, cand_pid, q_row)

    P = m.capacity_pt
    gain = jnp.zeros((P,), jnp.int32).at[
        jnp.where(fuse, cand_pid, P)
    ].add(1, mode="drop")
    lose = jnp.zeros((P,), jnp.int32).at[
        jnp.where(fuse & (q_row >= 0), q_row, P)
    ].add(1, mode="drop")
    delta = gain - lose
    # ghost duplicates: spawned by the query keyframe itself (the newest
    # snapshot keyframe — nothing later can have observed them inside the
    # snapshot) and now unobserved
    ghost = (
        m.pt_valid
        & (m.pt_first_kf == query_idx)
        & (lose > 0)
        & (m.pt_nobs + delta <= 0)
    )
    pid = m.point_id.at[query_idx].set(fuse_row)
    flag = jnp.concatenate([ghost, jnp.zeros((1,), bool)])
    ref_ghost = flag[jnp.where(pid >= 0, pid, P)]
    pid = jnp.where(ref_ghost, -1, pid)
    return pid, fuse_row, ghost, delta, jnp.sum(fuse)


@functools.partial(jax.jit, static_argnames=("cfg",))
def _global_ba_program(
    kf_pose: jax.Array,  # (M, 4, 4) post-pose-graph poses
    pt_xyz: jax.Array,  # (P, 3) post-correction points
    point_id: jax.Array,  # (M, K) observation graph (loop-FUSED — see
    # `_loop_fuse_program`: without the fused cross-loop observations this
    # solve has no constraint across the closure and relaxes it away)
    m: smap.MapState,  # snapshot (feature arrays + validity)
    cfg: SLAMConfig,
):
    """Full-map BA after an accepted loop — the GlobalBundleAdjustment
    the reference delegates to ORB-SLAM3 (`SLAM.cpp:54` semantics).

    The solve is COMPACTED to the newest `global_ba_window` valid
    keyframes (gauge = the oldest in-window keyframe; anything older
    stays fixed — for maps within the window this IS every keyframe,
    matching ORB-SLAM3's all-free-but-first; beyond it, a bounded
    wide-window refinement). Solving over the raw slot capacity cost
    2.5 s per closure at 256 slots with ~11 live keyframes — all
    critical-path. It runs over the pose-graph-corrected state so it
    refines — rather than re-discovers — the loop correction, with the
    same compacted Schur machinery as the local window
    (`ba._windowed_single`) and the larger `global_ba_points` budget.
    A non-finite outcome is rejected ON DEVICE (falls back to the
    pose-graph state) so a degenerate global solve can never cost the
    merge its loop closure.

    Returns (kf_pose, pt_xyz, pt_solved, rmse_px, applied, max_move_m).
    """
    import dataclasses

    M = m.capacity_kf
    W = min(cfg.ba.global_ba_window, M)
    idx, wvalid = smap.local_window(m, W)
    gauge = jnp.argmax(wvalid)  # oldest valid position in the window
    free = wvalid & (jnp.arange(W) != gauge)
    gcfg = dataclasses.replace(
        cfg.ba,
        iters=cfg.ba.global_ba_iters,
        max_points_per_window=cfg.ba.global_ba_points,
    )
    res = ba_mod._windowed_single(
        kf_pose[idx], wvalid, pt_xyz, m.kp_uv[idx],
        m.kp_pts[idx][..., 2], point_id[idx],
        m.kp_ok[idx] & wvalid[:, None], cfg.camera, gcfg, free,
    )
    pt_finite = jnp.all(jnp.isfinite(res.pt_xyz), axis=-1)
    # trust-region acceptance: the solve must REFINE the pose-graph
    # state, not relocate it (see BAConfig.global_ba_max_move)
    move = jnp.linalg.norm(
        res.kf_pose[:, :3, 3] - kf_pose[idx][:, :3, 3], axis=-1
    )
    dmax = jnp.max(jnp.where(wvalid, move, 0.0))
    ok = (
        jnp.all(jnp.isfinite(res.kf_pose))
        & (res.rmse_px < 1e3)
        & (dmax <= cfg.ba.global_ba_max_move)
    )
    kf_win = jnp.where(
        (ok & wvalid)[:, None, None], res.kf_pose, kf_pose[idx]
    )
    kf_out = kf_pose.at[idx].set(kf_win)
    pt_out = jnp.where(
        (ok & res.pt_solved & pt_finite)[:, None], res.pt_xyz, pt_xyz
    )
    solved = ok & res.pt_solved & pt_finite
    return kf_out, pt_out, solved, res.rmse_px, ok, dmax


def backend_pass(
    m: smap.MapState,
    edges: pg_mod.EdgeList,
    n_edges: jax.Array,
    kf_idx: int,
    cfg: SLAMConfig,
    n_kf: int = -1,
    allow_loop: bool = True,
) -> BackendResult:
    """One backend iteration on a map snapshot: local BA, then a loop
    attempt (candidate -> geometric verification -> pose graph). Pure in
    the snapshot; the caller merges the result (`SLAMSession._apply_backend`).

    One fused device dispatch (`_backend_program`) + one host fetch of the
    packed stats vector. `n_kf` is the host-mirrored keyframe count; -1
    falls back to a device read (a blocking round-trip — callers on the
    hot path pass it).
    """
    t0 = time.monotonic()
    if n_kf < 0:
        n_kf = int(m.n_kf)
    kf_pose, pt_xyz, pt_adjusted, T_rel, stats = _backend_program(
        m, edges, n_edges, jnp.int32(kf_idx),
        jnp.asarray(allow_loop, bool), cfg=cfg, run_ba=n_kf >= 3,
    )
    s = np.asarray(stats)  # the ONE blocking device->host fetch
    global_rmse = -1.0
    fuse_row = pt_invalidate = nobs_delta = None
    n_fused = 0
    if s[6] > 0.5:
        # landmark fusion across the accepted loop BEFORE any global
        # refinement: the closure exists because association failed, so
        # the two ends share no observations until the query keyframe's
        # verified matches are re-pointed at the candidate's landmarks
        pid_fused, fuse_row, pt_invalidate, nobs_delta, nf = (
            _loop_fuse_program(
                m, jnp.int32(kf_idx), jnp.int32(int(s[4])), T_rel
            )
        )
        n_fused = int(nf)
        if cfg.ba.global_ba_iters > 0 and n_kf >= 3:
            # global map refinement over the pose-graph-corrected state
            # with the fused observation graph (loop closures are rare —
            # the extra dispatch + fetch is off the steady-state path;
            # compiled at warmup)
            kf_pose, pt_xyz, g_solved, g_rmse, g_ok, g_move = (
                _global_ba_program(kf_pose, pt_xyz, pid_fused, m, cfg)
            )
            pt_adjusted = pt_adjusted | g_solved
            gs = np.asarray(jnp.stack(
                [g_rmse, g_ok.astype(jnp.float32), g_move]
            ))
            global_rmse = float(gs[0]) if gs[1] > 0.5 else -1.0
            if gs[1] < 0.5:
                log.info(
                    "global BA rejected (max keyframe move %.2f m, rmse "
                    "%.2f px) — keeping the pose-graph state",
                    float(gs[2]), float(gs[0]),
                )
    out = BackendResult(
        snap_kf_idx=kf_idx, kf_pose=kf_pose, pt_xyz=pt_xyz,
        pt_adjusted=pt_adjusted, ba_rmse=float(s[0]),
        global_ba_rmse=global_rmse, fuse_row=fuse_row,
        pt_invalidate=pt_invalidate, pt_nobs_delta=nobs_delta,
        n_fused=n_fused,
    )
    if int(s[2]):
        log.info("BA window point budget overflow: %d points excluded", int(s[2]))
    if s[6] > 0.5:  # closed
        out.loop_edge = (int(s[4]), kf_idx, T_rel, 5.0)
        out.loop_closed = True
        log.info(
            "loop closed: KF%d -> KF%d (%d inliers, %d landmarks fused); "
            "global BA rmse %.2f px",
            kf_idx, int(s[4]), int(s[7]), n_fused, global_rmse,
        )
    elif s[9] > 0.5:  # verified but rejected by the consistency gate
        log.warning(
            "loop edge KF%d -> KF%d rejected by consistency gate "
            "(t %.2f m, rot %.1f deg)",
            int(s[4]), kf_idx, float(s[10]), float(np.rad2deg(s[11])),
        )
    out.backend_ms = (time.monotonic() - t0) * 1e3
    return out


class BackendWorker:
    """One backend thread, one in-flight job, one LATEST-pending job, one
    pending result.

    `submit` is non-blocking and uses a replace-with-newest policy: while a
    job is in flight (or a result is unconsumed), the newly submitted job
    REPLACES any still-waiting one — the displaced job is the recorded
    skip. During keyframe bursts this guarantees the burst's NEWEST
    snapshot gets a backend pass as soon as the worker frees up (sliding
    windows overlap, so the newest window covers the burst), where the old
    drop-on-busy policy processed only the burst's first keyframe and
    starved BA/loop-closure coverage (35/45 jobs dropped in the round-3
    bench, and the accuracy cost was visible: 22.9 cm vs 8.8 cm ATE
    against the inline backend on the same sequence). Bounded memory and
    zero frontend blocking are preserved (`SLAM.cpp:162-168` semantics —
    the reference also drops the OLDEST queued frames, keeping new ones).

    A waiting job's snapshot may predate the merge of the in-flight job's
    result; for BA-only results that is safe — each BA pass re-solves its
    window from the snapshot, and `SLAMSession._apply_backend` anchors
    merges with a rigid correction computed against the CURRENT map. It is
    NOT safe across a loop-closure merge (the pose graph rewrites every
    keyframe, which no single rigid correction can represent), so
    promotion is generation-gated: the frontend consumes results with
    `poll()`/`flush()` and then calls `advance(min_generation)` AFTER its
    merge completes — a waiting job stamped before the last loop merge is
    dropped there instead of promoted, and the session likewise drops a
    stale RESULT before merging it. Promotion living in `advance` (not in
    the consume path) also means a job that died with an exception can
    never strand the waiting job: the frontend's next advance picks it up.
    """

    def __init__(self, cfg: SLAMConfig):
        self.cfg = cfg
        self._cv = threading.Condition()
        self._job: Optional[BackendJob] = None  # in flight on the thread
        self._next_job: Optional[BackendJob] = None  # latest waiting
        self._result: Optional[BackendResult] = None
        self._stop = False
        self.skipped = 0
        self.completed = 0
        self._thread = threading.Thread(
            target=self._run, daemon=True, name="slam-backend"
        )
        self._thread.start()

    # ------------------------------------------------------------- frontend
    def submit(self, job: BackendJob) -> bool:
        with self._cv:
            if self._job is None and self._result is None:
                if self._next_job is not None:
                    self.skipped += 1  # superseded by the newer snapshot
                    self._next_job = None
                self._job = job
                self._cv.notify_all()
                return True
            if self._next_job is not None:
                self.skipped += 1  # displaced by the newer snapshot
            self._next_job = job
            return False

    def poll(self) -> Optional[BackendResult]:
        """Take the pending result (non-blocking; never promotes — call
        `advance` after merging)."""
        with self._cv:
            r, self._result = self._result, None
            return r

    def advance(self, min_generation: int = 0, allow_loop=None):
        """Promote the latest waiting job, if any and the worker is idle.

        Called by the frontend AFTER merging (or dropping) a consumed
        result, so a job never starts against state its snapshot cannot
        represent. A waiting job stamped before the last loop-closure
        merge (`generation < min_generation`) is dropped as a skip.
        `allow_loop(kf_idx) -> bool` re-evaluates the session's loop
        cooldown at START time — the cooldown may have engaged since the
        job was submitted.
        """
        with self._cv:
            if self._job is not None or self._result is not None:
                return
            if self._next_job is None:
                return
            job, self._next_job = self._next_job, None
            if job.generation < min_generation:
                self.skipped += 1
                log.info(
                    "waiting backend job (KF%d) dropped: snapshot predates "
                    "loop merge (gen %d < %d)",
                    job.kf_idx, job.generation, min_generation,
                )
                return
            if allow_loop is not None:
                job.allow_loop = bool(allow_loop(job.kf_idx))
            self._job = job
            self._cv.notify_all()

    def busy(self) -> bool:
        """True while a job is in flight, waiting, or unconsumed."""
        with self._cv:
            return (
                self._job is not None
                or self._next_job is not None
                or self._result is not None
            )

    def flush(self, timeout: float = 30.0) -> Optional[BackendResult]:
        """Wait for the in-flight job (if any) and return its result.

        Callers draining the worker completely loop `flush` + merge +
        `advance` while `busy()` — advance promotes the waiting job."""
        deadline = time.monotonic() + timeout
        with self._cv:
            while self._job is not None and not self._stop:
                remaining = deadline - time.monotonic()
                if remaining <= 0:
                    log.error("backend flush timed out")
                    return None
                self._cv.wait(timeout=min(remaining, 0.5))
            r, self._result = self._result, None
            return r

    def stop(self, timeout: float = 10.0):
        with self._cv:
            self._stop = True
            self._cv.notify_all()
        self._thread.join(timeout=timeout)

    # -------------------------------------------------------------- backend
    def _run(self):
        while True:
            with self._cv:
                while self._job is None and not self._stop:
                    self._cv.wait(timeout=0.5)
                if self._stop:
                    return
                job = self._job
            try:
                result = backend_pass(
                    job.map, job.edges, job.n_edges, job.kf_idx, self.cfg,
                    n_kf=job.n_kf, allow_loop=job.allow_loop,
                )
                result.generation = job.generation
            except Exception:  # noqa: BLE001 — surfaced via log + liveness
                log.exception("backend pass failed; dropping job")
                result = None
            with self._cv:
                self._result = result
                self._job = None
                self.completed += 1
                self._cv.notify_all()
