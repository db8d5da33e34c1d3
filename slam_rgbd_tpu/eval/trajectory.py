"""Trajectory export + accuracy metrics (ATE / RPE).

Capability parity with the reference's result-export surface:
`SaveTrajectoryTUM` / `SaveKeyFrameTrajectoryTUM`
(`Youth.Source/AlgorithmModule/SLAM.cpp:187-188`) — TUM format is
`timestamp tx ty tz qx qy qz qw`, one line per pose, camera-to-world.

The evaluation half (absent in the reference — it never ran its SLAM
module) implements the standard TUM RGB-D benchmark metrics:
  * ATE: Horn/Umeyama SE(3) alignment of estimate to ground truth, then
    RMSE over translation residuals.
  * RPE: relative pose error over a fixed frame delta.
Both are plain NumPy (host-side, small) — evaluation is not a hot path.
"""

from __future__ import annotations

import numpy as np

from slam_rgbd_tpu.io.tum import matrix_to_quat, quat_to_matrix


def save_trajectory_tum(path: str, timestamps, poses) -> None:
    """Write camera-to-world poses in TUM format."""
    with open(path, "w") as f:
        f.write("# timestamp tx ty tz qx qy qz qw\n")
        for ts, T in zip(timestamps, poses):
            t = T[:3, 3]
            qx, qy, qz, qw = matrix_to_quat(np.asarray(T[:3, :3], dtype=np.float64))
            f.write(
                f"{ts:.6f} {t[0]:.6f} {t[1]:.6f} {t[2]:.6f} "
                f"{qx:.6f} {qy:.6f} {qz:.6f} {qw:.6f}\n"
            )


def load_trajectory_tum(path: str):
    """Read a TUM trajectory -> (timestamps (n,), poses (n, 4, 4))."""
    ts, poses = [], []
    with open(path) as f:
        for line in f:
            line = line.strip()
            if not line or line.startswith("#"):
                continue
            vals = [float(x) for x in line.split()]
            T = np.eye(4, dtype=np.float32)
            T[:3, 3] = vals[1:4]
            T[:3, :3] = quat_to_matrix(*vals[4:8])
            ts.append(vals[0])
            poses.append(T)
    return np.asarray(ts), np.stack(poses)


def horn_align(src: np.ndarray, dst: np.ndarray):
    """Least-squares SE(3) alignment: find T with T @ src ~= dst.

    src/dst: (n, 3) corresponding points. Returns (4, 4) transform.
    Closed-form Horn/Umeyama (rotation via SVD of the cross-covariance).
    """
    mu_s = src.mean(axis=0)
    mu_d = dst.mean(axis=0)
    cs = src - mu_s
    cd = dst - mu_d
    W = cd.T @ cs
    U, _, Vt = np.linalg.svd(W.astype(np.float64))
    S = np.eye(3)
    if np.linalg.det(U @ Vt) < 0:
        S[2, 2] = -1
    R = U @ S @ Vt
    t = mu_d - R @ mu_s
    T = np.eye(4)
    T[:3, :3] = R
    T[:3, 3] = t
    return T


def ate_rmse(est_poses: np.ndarray, gt_poses: np.ndarray, align: bool = True):
    """Absolute trajectory error RMSE (metres) after optional SE(3) alignment.

    est_poses/gt_poses: (n, 4, 4) camera-to-world, frame-associated.
    Returns (rmse, aligned_est_translations, gt_translations).
    """
    p_est = np.asarray(est_poses)[:, :3, 3]
    p_gt = np.asarray(gt_poses)[:, :3, 3]
    if align:
        T = horn_align(p_est, p_gt)
        p_est = p_est @ T[:3, :3].T + T[:3, 3]
    err = p_est - p_gt
    rmse = float(np.sqrt(np.mean(np.sum(err * err, axis=1))))
    return rmse, p_est, p_gt


def rpe(est_poses: np.ndarray, gt_poses: np.ndarray, delta: int = 1):
    """Relative pose error over frame gap `delta`.

    Returns (trans_rmse_m, rot_rmse_rad).
    """
    est = np.asarray(est_poses, dtype=np.float64)
    gt = np.asarray(gt_poses, dtype=np.float64)
    n = len(est) - delta
    terrs, rerrs = [], []
    for i in range(n):
        d_est = np.linalg.inv(est[i]) @ est[i + delta]
        d_gt = np.linalg.inv(gt[i]) @ gt[i + delta]
        e = np.linalg.inv(d_gt) @ d_est
        terrs.append(np.linalg.norm(e[:3, 3]))
        cos = np.clip((np.trace(e[:3, :3]) - 1) / 2, -1, 1)
        rerrs.append(np.arccos(cos))
    return float(np.sqrt(np.mean(np.square(terrs)))), float(np.sqrt(np.mean(np.square(rerrs))))
