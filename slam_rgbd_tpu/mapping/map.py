"""Keyframe map: fixed-capacity, masked, pure-functional state.

The map state ORB-SLAM3 keeps in dynamic C++ containers (KeyFrames,
MapPoints, covisibility graph — the capability surface behind
`getSlamMapPoints` / `saveSlamMap`, `Youth.Source/AlgorithmModule/SLAM.h:11-38`)
becomes here a single immutable pytree of fixed-capacity arrays with
validity masks — the central TPU idiom (SURVEY.md §7 "hard parts"): no
allocation, no pointers, every update a functional scatter, so the whole
map state can live on device, be checkpointed with orbax, and be sharded
across hosts by slicing keyframe/point ranges.

Layout:
  * Keyframes: poses (M,4,4) camera-to-world + per-KF feature arrays
    (K keypoints each: pixel coords, camera-frame 3D, descriptors).
  * Map points: world positions (P,3) + a representative descriptor.
  * Observations: `point_id[m, j]` — which map point keyframe m's keypoint
    j observes (-1 = none). This one array IS the bipartite observation
    graph; BA gathers from it directly.
  * Covisibility: (M, M) shared-observation counts, maintained
    incrementally on insertion.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import jax.numpy as jnp
from flax import struct

from slam_rgbd_tpu.core import se3
from slam_rgbd_tpu.core.config import KeyframeConfig


@struct.dataclass
class MapState:
    # --- keyframes ---------------------------------------------------------
    kf_pose: jax.Array  # (M, 4, 4) T_world_cam
    kf_time: jax.Array  # (M,) float64-as-float32 seconds
    kf_valid: jax.Array  # (M,) bool
    n_kf: jax.Array  # () int32 — slots used (append-only)
    # --- per-keyframe features --------------------------------------------
    kp_uv: jax.Array  # (M, K, 2) float32
    kp_pts: jax.Array  # (M, K, 3) camera-frame 3D
    kp_ok: jax.Array  # (M, K) bool — has valid depth + detection
    kp_signs: jax.Array  # (M, K, 256) int8 descriptors
    # (M, 256) L2-normalized mean-of-signs place signature per keyframe,
    # maintained incrementally on insert: recomputing it from kp_signs on
    # every loop-candidate query streams the whole (M, K, 256) descriptor
    # store (~100 MB as f32) per backend pass; one row per insert is free.
    kf_sig: jax.Array
    # --- map points --------------------------------------------------------
    pt_xyz: jax.Array  # (P, 3) world positions
    pt_signs: jax.Array  # (P, 256) int8 representative descriptor
    pt_nobs: jax.Array  # (P,) int32 observation count
    pt_valid: jax.Array  # (P,) bool
    pt_first_kf: jax.Array  # (P,) int32 KF slot at spawn (-1 = never)
    pt_last_kf: jax.Array  # (P,) int32 KF slot of last observation
    n_pt: jax.Array  # () int32 — number of VALID points (slots recycle)
    # --- capacity-pressure counters (SURVEY.md §5 observability) ------------
    pt_dropped: jax.Array  # () int32 — spawns dropped for lack of capacity
    kf_dropped: jax.Array  # () int32 — keyframes dropped at capacity
    # --- observation graph -------------------------------------------------
    point_id: jax.Array  # (M, K) int32 — map-point index or -1
    covis: jax.Array  # (M, M) int32 shared-point counts

    @property
    def capacity_kf(self) -> int:
        return self.kf_pose.shape[0]

    @property
    def capacity_pt(self) -> int:
        return self.pt_xyz.shape[0]


def empty_map(cfg: KeyframeConfig, n_keypoints: int) -> MapState:
    M, P, K = cfg.max_keyframes, cfg.max_map_points, n_keypoints
    return MapState(
        kf_pose=jnp.tile(jnp.eye(4, dtype=jnp.float32), (M, 1, 1)),
        kf_time=jnp.zeros((M,), jnp.float32),
        kf_valid=jnp.zeros((M,), bool),
        n_kf=jnp.int32(0),
        kp_uv=jnp.zeros((M, K, 2), jnp.float32),
        kp_pts=jnp.zeros((M, K, 3), jnp.float32),
        kp_ok=jnp.zeros((M, K), bool),
        kp_signs=jnp.zeros((M, K, 256), jnp.int8),
        kf_sig=jnp.zeros((M, 256), jnp.float32),
        pt_xyz=jnp.zeros((P, 3), jnp.float32),
        pt_signs=jnp.zeros((P, 256), jnp.int8),
        pt_nobs=jnp.zeros((P,), jnp.int32),
        pt_valid=jnp.zeros((P,), bool),
        pt_first_kf=jnp.full((P,), -1, jnp.int32),
        pt_last_kf=jnp.full((P,), -1, jnp.int32),
        n_pt=jnp.int32(0),
        pt_dropped=jnp.int32(0),
        kf_dropped=jnp.int32(0),
        point_id=jnp.full((M, K), -1, jnp.int32),
        covis=jnp.zeros((M, M), jnp.int32),
    )


def should_insert_keyframe(
    T_world_cam: jax.Array,
    T_world_last_kf: jax.Array,
    inlier_ratio: jax.Array,
    cfg: KeyframeConfig,
) -> jax.Array:
    """Keyframe decision: enough motion since the last KF, or tracking
    quality dropping (ORB-SLAM-style policy, thresholds from config)."""
    D = se3.inverse(T_world_last_kf) @ T_world_cam
    trans = jnp.linalg.norm(D[:3, 3])
    cos_r = jnp.clip((D[0, 0] + D[1, 1] + D[2, 2] - 1.0) * 0.5, -1.0, 1.0)
    rot = jnp.arccos(cos_r)
    return (
        (trans > cfg.kf_min_trans)
        | (rot > jnp.deg2rad(cfg.kf_min_rot_deg))
        | (inlier_ratio < cfg.kf_min_inlier_ratio)
    )


@jax.jit
def insert_keyframe(
    m: MapState,
    T_world_cam: jax.Array,
    timestamp: jax.Array,
    kp_uv: jax.Array,  # (K, 2)
    kp_pts: jax.Array,  # (K, 3) camera-frame
    kp_ok: jax.Array,  # (K,)
    kp_signs: jax.Array,  # (K, 256) int8
    match_pid: jax.Array,  # (K,) int32 — map-point id each keypoint matched
    #                         to (-1 => spawn a new map point)
) -> MapState:
    """Append a keyframe; register observations; spawn new map points.

    All scatters are static-shaped. Freed point slots (from `cull_points`)
    are RECYCLED: new points go into invalid slots in ascending-index order.
    When capacity is genuinely exhausted the excess is dropped and counted
    in `pt_dropped` / `kf_dropped` so callers can surface the pressure
    instead of silently losing map coverage.
    """
    M, K, P = m.capacity_kf, m.kp_uv.shape[1], m.capacity_pt
    idx = jnp.minimum(m.n_kf, M - 1)
    room = m.n_kf < M

    # ---- new map points for unmatched valid keypoints ---------------------
    is_new = kp_ok & (match_pid < 0)
    rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1  # rank among new points
    # Free-slot recycling: stable argsort of the validity mask puts invalid
    # slots first in ascending index order; new point r takes free slot r.
    free_slots = jnp.argsort(m.pt_valid, stable=True).astype(jnp.int32)
    n_free = jnp.int32(P) - jnp.sum(m.pt_valid).astype(jnp.int32)
    can_spawn = is_new & (rank < n_free)
    new_slot = free_slots[jnp.clip(rank, 0, P - 1)]
    pid = jnp.where(can_spawn, new_slot, match_pid)  # (K,) final ids
    pid = jnp.where(kp_ok & (pid >= 0) & (pid < P), pid, -1)
    n_spawn_dropped = jnp.sum(is_new & ~can_spawn).astype(jnp.int32)

    # world position of this KF's keypoints
    R = T_world_cam[:3, :3]
    t = T_world_cam[:3, 3]
    pts_world = kp_pts @ R.T + t

    # scatter new points (only where can_spawn); index P = dump slot
    scatter_idx = jnp.where(can_spawn, pid, P)
    obs_idx = jnp.where(pid >= 0, pid, P)  # every observed pid (new+matched)
    dump3 = jnp.zeros((1, 3), m.pt_xyz.dtype)
    pt_xyz = jnp.concatenate([m.pt_xyz, dump3]).at[scatter_idx].set(pts_world)[:P]
    # Representative descriptor refreshes on EVERY observation (newest wins),
    # so long-lived points stay matchable under viewpoint change.
    pt_signs = jnp.concatenate([m.pt_signs, jnp.zeros((1, 256), jnp.int8)]).at[
        obs_idx
    ].set(kp_signs)[:P]
    pt_valid = jnp.concatenate([m.pt_valid, jnp.zeros((1,), bool)]).at[scatter_idx].set(
        True
    )[:P]
    pt_first_kf = jnp.concatenate([m.pt_first_kf, jnp.zeros((1,), jnp.int32)]).at[
        scatter_idx
    ].set(idx)[:P]
    pt_last_kf = jnp.concatenate([m.pt_last_kf, jnp.zeros((1,), jnp.int32)]).at[
        obs_idx
    ].set(idx)[:P]

    # observation counts: recycled slots restart at zero, then +1 per obs
    pt_nobs = jnp.concatenate([m.pt_nobs, jnp.zeros((1,), jnp.int32)])
    pt_nobs = pt_nobs.at[scatter_idx].set(0)
    pt_nobs = pt_nobs.at[obs_idx].add(1)[:P]

    # ---- covisibility with existing KFs -----------------------------------
    # shared[m'] = |{j : point_id[m', j] observed by the new KF}| via an
    # indicator over point slots + one gather — O(M*K), not O(M*K^2).
    ind = jnp.zeros((P + 1,), jnp.int32).at[jnp.where(pid >= 0, pid, P)].set(1)
    ind = ind.at[P].set(0)
    gathered = ind[jnp.where(m.point_id >= 0, m.point_id, P)]  # (M, K)
    shared = jnp.sum(gathered, axis=1).astype(jnp.int32)  # (M,)
    shared = jnp.where(m.kf_valid, shared, 0)
    covis = m.covis.at[idx, :].set(shared).at[:, idx].set(shared)

    # place signature of this keyframe (see MapState.kf_sig)
    sig_w = kp_ok.astype(jnp.float32)[:, None]
    sig_mean = jnp.sum(kp_signs.astype(jnp.float32) * sig_w, axis=0) / jnp.maximum(
        jnp.sum(sig_w), 1.0
    )
    sig_norm = jnp.linalg.norm(sig_mean)
    kf_sig_row = jnp.where(
        sig_norm > 1e-6, sig_mean / jnp.maximum(sig_norm, 1e-6), 0.0
    )

    def write(mst: MapState) -> MapState:
        return mst.replace(
            kf_pose=mst.kf_pose.at[idx].set(T_world_cam),
            kf_time=mst.kf_time.at[idx].set(timestamp),
            kf_valid=mst.kf_valid.at[idx].set(True),
            n_kf=mst.n_kf + 1,
            kp_uv=mst.kp_uv.at[idx].set(kp_uv),
            kp_pts=mst.kp_pts.at[idx].set(kp_pts),
            kp_ok=mst.kp_ok.at[idx].set(kp_ok),
            kp_signs=mst.kp_signs.at[idx].set(kp_signs),
            kf_sig=mst.kf_sig.at[idx].set(kf_sig_row),
            pt_xyz=pt_xyz,
            pt_signs=pt_signs,
            pt_valid=pt_valid,
            pt_nobs=pt_nobs,
            pt_first_kf=pt_first_kf,
            pt_last_kf=pt_last_kf,
            n_pt=jnp.sum(pt_valid).astype(jnp.int32),
            pt_dropped=mst.pt_dropped + n_spawn_dropped,
            point_id=mst.point_id.at[idx].set(pid),
            covis=covis,
        )

    return jax.lax.cond(
        room, write, lambda s: s.replace(kf_dropped=s.kf_dropped + 1), m
    )


def _use_matching_pallas(backend: str, k: int, p: int) -> bool:
    if backend == "xla":
        return False
    if backend == "auto" and jax.default_backend() != "tpu":
        return False
    return k % 128 == 0 and p % 128 == 0


@functools.partial(
    jax.jit,
    static_argnames=(
        "cam", "backend", "px_radius", "z_rel_tol", "max_distance",
        "merge_radius", "merge_max_distance",
    ),
)
def match_against_map(
    m: MapState,
    signs: jax.Array,  # (K, 256) int8 query descriptors
    ok: jax.Array,  # (K,) bool
    kp_uv: jax.Array,  # (K, 2) query keypoint pixels
    kp_z: jax.Array,  # (K,) query keypoint depths (camera frame)
    T_world_cam: jax.Array,  # (4, 4) current pose estimate
    cam=None,  # CameraIntrinsics (static)
    px_radius: float = 6.0,
    z_rel_tol: float = 0.08,
    max_distance: float = 64.0,
    kp_pts: jax.Array | None = None,  # (K, 3) camera-frame 3D (merge tier)
    merge_radius: float = 0.05,
    merge_max_distance: float = 40.0,
    backend: str = "auto",
) -> jax.Array:
    """Associate query keypoints to existing map points.

    Two tiers over ONE Hamming matmul against all P map points:

      1. *Tight* (the BA-observation gate): reprojection pixel distance
         < px_radius plus relative depth agreement. (A metric 3D-radius
         gate is far looser than a pixel gate at range and let aliased
         corners of repetitive texture poison BA.)
      2. *Merge / spawn-suppression* (only when `kp_pts` is given): a
         stricter descriptor threshold (`merge_max_distance`) plus a tight
         3D world-distance gate (`merge_radius`). A keypoint that fails
         the pixel gate but sits on top of an existing point in 3D with a
         near-identical descriptor is a REOBSERVATION of that point —
         reusing its id merges would-be duplicates instead of spawning
         them (the map-maintenance behavior behind ORB-SLAM3's point
         fusion, capability surface of `SLAM.cpp:204-218`).

    `backend="auto"` routes both tiers through the fused Pallas kernel
    (`ops.hamming_pallas.gated_match`) on TPU — the (K, P) distance and
    gate matrices never reach HBM; "xla" / "pallas" force a path. Results
    are identical.

    Returns (K,) int32 map-point ids, -1 if unmatched.
    """
    from slam_rgbd_tpu.features.match import hamming_matrix

    K, P = signs.shape[0], m.capacity_pt
    # project all map points into the query camera
    T_cw = se3.inverse(T_world_cam)
    p_c = m.pt_xyz @ T_cw[:3, :3].T + T_cw[:3, 3]  # (P, 3)
    z = p_c[:, 2]
    z_safe = jnp.maximum(z, 1e-6)
    pu = cam.fx * p_c[:, 0] / z_safe + cam.cx
    pv = cam.fy * p_c[:, 1] / z_safe + cam.cy
    proj_ok = m.pt_valid & (z > cam.min_depth) & (z < cam.max_depth)

    if kp_pts is not None:
        pts_w = kp_pts @ T_world_cam[:3, :3].T + T_world_cam[:3, 3]  # (K, 3)
    else:
        pts_w = jnp.zeros((K, 3), jnp.float32)

    if _use_matching_pallas(backend, K, P):
        from slam_rgbd_tpu.ops.hamming_pallas import gated_match

        q_meta = jnp.concatenate(
            [
                kp_uv.astype(jnp.float32),
                kp_z[:, None].astype(jnp.float32),
                ok[:, None].astype(jnp.float32),
                pts_w,
                jnp.sum(pts_w * pts_w, axis=1, keepdims=True),
            ],
            axis=1,
        )
        p_meta = jnp.concatenate(
            [
                pu[:, None], pv[:, None], z[:, None],
                proj_ok[:, None].astype(jnp.float32),
                m.pt_xyz,
                jnp.sum(m.pt_xyz * m.pt_xyz, axis=1, keepdims=True),
            ],
            axis=1,
        )
        d1, i1, d2, i2 = gated_match(
            signs, q_meta, m.pt_signs, p_meta,
            px_radius=px_radius, z_rel_tol=z_rel_tol,
            merge_radius=(merge_radius if kp_pts is not None else -1.0),
            interpret=jax.default_backend() != "tpu",
        )
        pid = jnp.where(d1 < max_distance, i1, -1)
        if kp_pts is not None:
            merge_pid = jnp.where(d2 < merge_max_distance, i2, -1)
            pid = jnp.where(pid >= 0, pid, merge_pid)
        return pid

    d0 = hamming_matrix(signs, m.pt_signs)  # (K, P)
    big = jnp.float32(1e9)
    d0 = jnp.where(ok[:, None] & proj_ok[None, :], d0, big)
    # pixel gate
    du = kp_uv[:, 0:1] - pu[None, :]
    dv = kp_uv[:, 1:2] - pv[None, :]
    d = jnp.where(du * du + dv * dv < px_radius * px_radius, d0, big)
    # depth-consistency gate
    z_ok = jnp.abs(kp_z[:, None] - z[None, :]) < z_rel_tol * jnp.maximum(
        kp_z[:, None], 0.3
    )
    d = jnp.where(z_ok, d, big)

    best = jnp.argmin(d, axis=1)
    best_d = jnp.take_along_axis(d, best[:, None], axis=1)[:, 0]
    pid = jnp.where(best_d < max_distance, best.astype(jnp.int32), -1)

    if kp_pts is not None:
        # 3D world distance^2 via the matmul identity (no (K, P, 3) blowup)
        dist2 = (
            jnp.sum(pts_w * pts_w, axis=1)[:, None]
            + jnp.sum(m.pt_xyz * m.pt_xyz, axis=1)[None, :]
            - 2.0 * (pts_w @ m.pt_xyz.T)
        )
        dm = jnp.where(dist2 < merge_radius * merge_radius, d0, big)
        mbest = jnp.argmin(dm, axis=1)
        mbest_d = jnp.take_along_axis(dm, mbest[:, None], axis=1)[:, 0]
        merge_pid = jnp.where(
            mbest_d < merge_max_distance, mbest.astype(jnp.int32), -1
        )
        pid = jnp.where(pid >= 0, pid, merge_pid)
    return pid


@functools.partial(jax.jit, static_argnames=("min_obs", "max_age_kf"))
def cull_points(
    m: MapState,
    current_kf_slot: jax.Array,  # () int32 — the newest keyframe's slot
    min_obs: int = 2,
    max_age_kf: int = 3,
):
    """Cull under-observed map points; freed slots are recycled on insert.

    Policy (ORB-SLAM-style recent-point test, the maintenance behind the
    map ORB-SLAM3 keeps for `getSlamMapPoints`, `SLAM.cpp:204-218`): a
    point observed fewer than `min_obs` times that has not been
    re-observed within `max_age_kf` keyframes of its last observation is
    dropped. KF slots are chronological (append-only), so slot distance ==
    keyframe-count distance.

    Clears `point_id` references to culled points so BA never gathers
    them. `covis` keeps its (now slightly stale) shared counts — it is
    only used as a conservative NOT-covisible gate for loop closure, where
    stale-high is safe. Returns (new_map, n_culled).
    """
    P = m.capacity_pt
    cull = (
        m.pt_valid
        & (m.pt_nobs < min_obs)
        & (current_kf_slot - m.pt_last_kf >= max_age_kf)
    )
    n_culled = jnp.sum(cull).astype(jnp.int32)
    pt_valid = m.pt_valid & ~cull
    # drop observation-graph references to culled points
    flag = jnp.concatenate([cull, jnp.zeros((1,), bool)])
    ref_culled = flag[jnp.where(m.point_id >= 0, m.point_id, P)]
    point_id = jnp.where(ref_culled, -1, m.point_id)
    new = m.replace(
        pt_valid=pt_valid,
        pt_nobs=jnp.where(cull, 0, m.pt_nobs),
        point_id=point_id,
        n_pt=jnp.sum(pt_valid).astype(jnp.int32),
    )
    return new, n_culled


def local_window(m: MapState, window: int):
    """Indices of the most recent `window` keyframes (static shape).

    Returns (idx (window,) int32, valid (window,) bool) — the sliding
    window over which local BA runs.
    """
    last = m.n_kf - 1
    offs = jnp.arange(window, dtype=jnp.int32)
    idx = last - (window - 1) + offs
    valid = (idx >= 0) & (idx < m.n_kf)
    return jnp.clip(idx, 0, m.capacity_kf - 1), valid


def map_point_count(m: MapState) -> jax.Array:
    """`getSlamMapPoints` parity (`SLAM.cpp:204-218`)."""
    return jnp.sum(m.pt_valid)
