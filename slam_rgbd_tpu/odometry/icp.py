"""Dense projective-association ICP (point-to-plane) — the odometry frontend.

This is the native replacement for the tracking capability the reference
delegates to ORB-SLAM3's `TrackRGBD` (`Youth.Source/AlgorithmModule/SLAM.cpp:54`),
re-designed for TPU:

  * Association is *projective*: every source pixel is transformed by the
    current pose estimate, projected into the target image, and matched to
    the target vertex at that pixel — a dense gather, not a KD-tree. The
    per-pixel map over 307k pixels is the TPU-shaped replacement for the
    reference's hottest loop (`viewerModule.c:336-357`, SURVEY.md §3.2).
  * The energy is point-to-plane with a Huber robust kernel; each
    Gauss-Newton step reduces per-pixel (J, r) into a 6x6 normal-equations
    system — one fused XLA reduction (Pallas kernel in `ops/icp_pallas.py`
    accumulates JtJ/Jtr in-register without HBM round trips).
  * Everything is static-shaped and jitted ONCE: a fixed pyramid schedule,
    fixed iteration counts (`lax.fori_loop`), masks instead of early exits —
    no recompilation across frames (the gate in BASELINE.md config[0]).

Math: left-multiplicative update T <- exp(delta) @ T with twist delta=(v, w).
For source point y = T p_s associated to target point q with target normal n:

    r = n . (y - q)
    dr/dv = n          dr/dw = y x n

Solving (J^T W J + lambda I) delta = -J^T W r and composing.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_rgbd_tpu.core import se3
from slam_rgbd_tpu.core.camera import bilinear_sample, project
from slam_rgbd_tpu.core.config import CameraIntrinsics, ICPConfig


class ICPResult(NamedTuple):
    """Pose + diagnostics from one ICP solve (all device scalars)."""

    T: jax.Array  # (4, 4) refined transform source->target camera frame
    inliers: jax.Array  # () int32 — associated pixels at finest level
    rmse: jax.Array  # () float32 — robust residual RMSE at finest level
    valid_fraction: jax.Array  # () float32 — inliers / valid source pixels


def _normal_equations(T: jax.Array, level: dict, cam: CameraIntrinsics, cfg: ICPConfig):
    """Build (H 6x6, g 6, inliers, sq_res_sum) for one GN iteration.

    Combines two residual blocks over the same dense association:
      * geometric point-to-plane (as in KinectFusion), and
      * photometric intensity difference (as in DVO), weighted by
        `cfg.rgb_weight` — texture constrains the translation directions a
        flat wall leaves unobservable.

    `level` holds flattened source arrays and 2-D target maps (see
    `icp_align`). Pure jnp reference implementation; `ops.icp_pallas`
    provides the fused TPU kernel with identical semantics.
    """
    src_verts = level["src_verts"]  # (N, 3)
    has_rgb = "src_intensity" in level

    # Transform source into target frame and project.
    y = se3.transform_points(T, src_verts)  # (N, 3)
    n_src = se3.rotate_vectors(T, level["src_normals"])
    uv, in_img = project(y, cam)
    u, v = uv[..., 0], uv[..., 1]

    # Bilinear association: sub-pixel gather of target vertex + normal.
    # (Nearest-neighbour leaves a systematic mm-scale pose bias.)
    tgt_valid = level["tgt_valid"]
    q, q_valid = bilinear_sample(level["tgt_verts"], u, v, tgt_valid)
    n, _ = bilinear_sample(level["tgt_normals"], u, v, tgt_valid)
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)

    # Association gates (distance / normal agreement / validity).
    diff = y - q
    dist_ok = jnp.sum(diff * diff, axis=-1) < cfg.max_dist * cfg.max_dist
    cos_thresh = jnp.cos(jnp.deg2rad(cfg.max_normal_angle_deg))
    angle_ok = jnp.sum(n * n_src, axis=-1) > cos_thresh
    mask = level["src_valid"] & in_img & q_valid & dist_ok & angle_ok

    # Geometric point-to-plane residual and Jacobian.
    r = jnp.sum(n * diff, axis=-1)  # (N,)
    J = jnp.concatenate([n, jnp.cross(y, n)], axis=-1)  # (N, 6)

    abs_r = jnp.abs(r)
    w = jnp.where(abs_r <= cfg.huber_delta, 1.0, cfg.huber_delta / jnp.maximum(abs_r, 1e-12))
    w = jnp.where(mask, w, 0.0)

    Jw = J * w[:, None]
    H = Jw.T @ J  # (6, 6) — MXU-friendly contraction
    g = Jw.T @ r  # (6,)
    inliers = jnp.sum(mask)
    sq_sum = jnp.sum(w * r * r)

    if has_rgb and cfg.rgb_weight > 0.0:
        # Photometric block: r_I = I_tgt(pi(y)) - I_src(x).
        i_tgt, _ = bilinear_sample(level["tgt_intensity"], u, v, tgt_valid)
        grad, _ = bilinear_sample(level["tgt_grad"], u, v, tgt_valid)
        r_i = i_tgt - level["src_intensity"]
        # d u / d y (pinhole), then chain with dy/ddelta = [I | -hat(y)].
        z = jnp.maximum(y[..., 2], 1e-6)
        gx, gy = grad[..., 0], grad[..., 1]
        a = gx * cam.fx / z
        b = gy * cam.fy / z
        c = -(a * y[..., 0] + b * y[..., 1]) / z
        # J_i = [a, b, c,  -b*y_z + c*y_y? ...] — build via cross structure:
        # dr/dv = (a, b, c); dr/dw = y x (a, b, c)  (same form as the
        # geometric block with "normal" replaced by the image-plane vector).
        gvec = jnp.stack([a, b, c], axis=-1)
        J_i = jnp.concatenate([gvec, jnp.cross(y, gvec)], axis=-1)
        abs_ri = jnp.abs(r_i)
        w_i = jnp.where(abs_ri <= cfg.rgb_huber, 1.0, cfg.rgb_huber / jnp.maximum(abs_ri, 1e-12))
        w_i = jnp.where(mask, w_i * cfg.rgb_weight, 0.0)
        Jw_i = J_i * w_i[:, None]
        H = H + Jw_i.T @ J_i
        g = g + Jw_i.T @ r_i

    return H, g, inliers, sq_sum


def _gn_step(T, level, cam, cfg: ICPConfig):
    H, g, inliers, sq_sum = _normal_equations(T, level, cam, cfg)
    # Levenberg damping scaled to the diagonal for float32 conditioning.
    diag = jnp.diagonal(H)
    Hd = H + jnp.diag(cfg.damping * jnp.maximum(diag, 1.0))
    # 6x6 solve via Cholesky; fall back to identity step when degenerate.
    delta = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(Hd), -g)
    ok = jnp.all(jnp.isfinite(delta)) & (inliers > 6)
    delta = jnp.where(ok, delta, 0.0)
    T_new = se3.normalize_rotation(se3.exp(delta) @ T)
    return T_new, inliers, sq_sum


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def icp_align(
    src_pyr: tuple,
    tgt_pyr: tuple,
    T_init: jax.Array,
    cam: CameraIntrinsics,
    cfg: ICPConfig,
) -> ICPResult:
    """Coarse-to-fine point-to-plane ICP between two frame pyramids.

    `src_pyr` / `tgt_pyr` are `build_frame_pyramid` outputs (finest level
    first). Returns T mapping source-camera coordinates into target-camera
    coordinates (i.e. the relative pose of source expressed in target).
    """
    T = T_init
    levels = len(src_pyr)
    inliers = jnp.int32(0)
    sq_sum = jnp.float32(0.0)
    for k in range(levels - 1, -1, -1):  # coarse -> fine (static unroll)
        level_cam = cam.scaled(2.0**k)
        src = src_pyr[k]
        tgt = tgt_pyr[k]
        level = {
            "src_verts": src["vertices"].reshape(-1, 3),
            "src_normals": src["normals"].reshape(-1, 3),
            "src_valid": src["valid"].reshape(-1),
            "tgt_verts": tgt["vertices"],
            "tgt_normals": tgt["normals"],
            "tgt_valid": tgt["valid"],
        }
        if "intensity" in src:
            level["src_intensity"] = src["intensity"].reshape(-1)
            level["tgt_intensity"] = tgt["intensity"]
            level["tgt_grad"] = tgt["grad"]
        # iters tuple is coarse -> fine: index 0 = coarsest level.
        n_iters = cfg.iters[min(levels - 1 - k, len(cfg.iters) - 1)]

        def body(_, carry):
            T, _, _ = carry
            T_new, inl, ss = _gn_step(T, level, level_cam, cfg)
            return (T_new, inl, ss)

        T, inliers, sq_sum = jax.lax.fori_loop(0, n_iters, body, (T, inliers, sq_sum))

    valid_src = jnp.sum(src_pyr[0]["valid"])
    rmse = jnp.sqrt(sq_sum / jnp.maximum(inliers, 1))
    return ICPResult(
        T=T,
        inliers=inliers,
        rmse=rmse,
        valid_fraction=inliers / jnp.maximum(valid_src, 1),
    )


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def track_frame(
    prev_pyr: tuple,
    curr_pyr: tuple,
    T_world_prev: jax.Array,
    T_motion_prior: jax.Array,
    cam: CameraIntrinsics,
    cfg: ICPConfig,
):
    """One odometry step: align current frame against the previous one.

    Uses a constant-velocity motion prior (T_motion_prior = previous
    frame-to-frame delta) as initialization. Returns
    (T_world_curr, T_motion, ICPResult).

    Convention: T_world_frame maps frame-camera coords -> world. ICP gives
    T_prev_curr (current-camera -> previous-camera), so
    T_world_curr = T_world_prev @ T_prev_curr.
    """
    res = icp_align(curr_pyr, prev_pyr, T_motion_prior, cam, cfg)
    T_world_curr = se3.normalize_rotation(T_world_prev @ res.T)
    return T_world_curr, res.T, res
