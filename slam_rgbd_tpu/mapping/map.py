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
    # --- map points --------------------------------------------------------
    pt_xyz: jax.Array  # (P, 3) world positions
    pt_signs: jax.Array  # (P, 256) int8 representative descriptor
    pt_nobs: jax.Array  # (P,) int32 observation count
    pt_valid: jax.Array  # (P,) bool
    n_pt: jax.Array  # () int32 — slots used
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
        pt_xyz=jnp.zeros((P, 3), jnp.float32),
        pt_signs=jnp.zeros((P, 256), jnp.int8),
        pt_nobs=jnp.zeros((P,), jnp.int32),
        pt_valid=jnp.zeros((P,), bool),
        n_pt=jnp.int32(0),
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
    D = jnp.linalg.inv(T_world_last_kf) @ T_world_cam
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

    All scatters are static-shaped; when keyframe or point capacity is
    exhausted, the excess is dropped (masked out) rather than erroring —
    callers watch `n_kf` / `n_pt` for culling policy.
    """
    M, K, P = m.capacity_kf, m.kp_uv.shape[1], m.capacity_pt
    idx = jnp.minimum(m.n_kf, M - 1)
    room = m.n_kf < M

    # ---- new map points for unmatched valid keypoints ---------------------
    is_new = kp_ok & (match_pid < 0)
    # slot for each new point: n_pt + rank among new points
    rank = jnp.cumsum(is_new.astype(jnp.int32)) - 1
    new_slot = m.n_pt + rank
    can_spawn = is_new & (new_slot < P)
    pid = jnp.where(can_spawn, new_slot, match_pid)  # (K,) final ids
    pid = jnp.where(kp_ok & (pid >= 0) & (pid < P), pid, -1)

    # world position of this KF's keypoints
    R = T_world_cam[:3, :3]
    t = T_world_cam[:3, 3]
    pts_world = kp_pts @ R.T + t

    # scatter new points (only where can_spawn)
    scatter_idx = jnp.where(can_spawn, pid, P)  # P = dump slot
    pt_xyz = m.pt_xyz
    pt_signs = m.pt_signs
    pt_valid = m.pt_valid
    dump3 = jnp.zeros((1, 3), m.pt_xyz.dtype)
    pt_xyz = jnp.concatenate([pt_xyz, dump3]).at[scatter_idx].set(pts_world)[:P]
    pt_signs = jnp.concatenate([pt_signs, jnp.zeros((1, 256), jnp.int8)]).at[
        scatter_idx
    ].set(kp_signs)[:P]
    pt_valid = jnp.concatenate([pt_valid, jnp.zeros((1,), bool)]).at[scatter_idx].set(
        True
    )[:P]

    # observation counts for every observed pid (new and matched)
    obs_idx = jnp.where(pid >= 0, pid, P)
    pt_nobs = jnp.concatenate([m.pt_nobs, jnp.zeros((1,), jnp.int32)]).at[obs_idx].add(
        1
    )[:P]

    # ---- covisibility with existing KFs -----------------------------------
    # shared[m'] = |{j : point_id[m', j] observed by the new KF}| via an
    # indicator over point slots + one gather — O(M*K), not O(M*K^2).
    ind = jnp.zeros((P + 1,), jnp.int32).at[jnp.where(pid >= 0, pid, P)].set(1)
    ind = ind.at[P].set(0)
    gathered = ind[jnp.where(m.point_id >= 0, m.point_id, P)]  # (M, K)
    shared = jnp.sum(gathered, axis=1).astype(jnp.int32)  # (M,)
    shared = jnp.where(m.kf_valid, shared, 0)
    covis = m.covis.at[idx, :].set(shared).at[:, idx].set(shared)

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
            pt_xyz=pt_xyz,
            pt_signs=pt_signs,
            pt_valid=pt_valid,
            pt_nobs=pt_nobs,
            n_pt=jnp.minimum(m.n_pt + jnp.sum(can_spawn), P),
            point_id=mst.point_id.at[idx].set(pid),
            covis=covis,
        )

    return jax.lax.cond(room, write, lambda s: s, m)


@functools.partial(jax.jit, static_argnames=("cam",))
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
) -> jax.Array:
    """Associate query keypoints to existing map points.

    Hamming matching (one MXU matmul against ALL P map points) gated by
    REPROJECTION distance: each map point is projected into the query frame
    with the current pose, and a match requires pixel distance < px_radius
    plus relative depth agreement. (A metric 3D-radius gate is far looser
    than a pixel gate at range and let aliased corners of repetitive
    texture poison BA.) Returns (K,) int32 map-point ids, -1 if unmatched.
    """
    from slam_rgbd_tpu.features.match import hamming_matrix

    # project all map points into the query camera
    T_cw = jnp.linalg.inv(T_world_cam)
    p_c = m.pt_xyz @ T_cw[:3, :3].T + T_cw[:3, 3]  # (P, 3)
    z = p_c[:, 2]
    z_safe = jnp.maximum(z, 1e-6)
    pu = cam.fx * p_c[:, 0] / z_safe + cam.cx
    pv = cam.fy * p_c[:, 1] / z_safe + cam.cy
    proj_ok = m.pt_valid & (z > cam.min_depth) & (z < cam.max_depth)

    d = hamming_matrix(signs, m.pt_signs)  # (K, P)
    big = jnp.float32(1e9)
    d = jnp.where(ok[:, None] & proj_ok[None, :], d, big)
    # pixel gate
    du = kp_uv[:, 0:1] - pu[None, :]
    dv = kp_uv[:, 1:2] - pv[None, :]
    d = jnp.where(du * du + dv * dv < px_radius * px_radius, d, big)
    # depth-consistency gate
    z_ok = jnp.abs(kp_z[:, None] - z[None, :]) < z_rel_tol * jnp.maximum(
        kp_z[:, None], 0.3
    )
    d = jnp.where(z_ok, d, big)

    best = jnp.argmin(d, axis=1)
    best_d = jnp.take_along_axis(d, best[:, None], axis=1)[:, 0]
    return jnp.where(best_d < max_distance, best.astype(jnp.int32), -1)


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
