"""Robust SE(3) from matched 3D-3D correspondences (Kabsch + IRLS).

Used for feature-based relocalization and loop-closure geometric
verification (the capability ORB-SLAM3 provides the reference via its
place-recognition + Sim3 solver; here RGB-D depth gives metric scale so a
rigid 3D-3D solve suffices). Static-shape IRLS with Huber weights replaces
RANSAC's data-dependent loop: each iteration solves weighted Kabsch in
closed form and reweights, which under jit is a fixed unrolled program.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp


class Pose3DResult(NamedTuple):
    T: jax.Array  # (4, 4): maps frame-1 points onto frame-2 points
    inliers: jax.Array  # () int32 under `inlier_thresh`
    rmse: jax.Array  # () float32 over inliers
    ok: jax.Array  # () bool — enough inliers and finite solution


def _weighted_kabsch(p: jax.Array, q: jax.Array, w: jax.Array) -> jax.Array:
    """Closed-form weighted rigid alignment T with T@p ~= q.

    p, q: (N, 3); w: (N,) nonnegative weights.
    """
    wsum = jnp.maximum(jnp.sum(w), 1e-9)
    mu_p = jnp.sum(p * w[:, None], axis=0) / wsum
    mu_q = jnp.sum(q * w[:, None], axis=0) / wsum
    pc = p - mu_p
    qc = q - mu_q
    C = (qc * w[:, None]).T @ pc  # (3, 3) cross-covariance
    U, _, Vt = jnp.linalg.svd(C)
    det = jnp.linalg.det(U @ Vt)
    S = jnp.diag(jnp.array([1.0, 1.0, 1.0])).at[2, 2].set(jnp.sign(det))
    R = U @ S @ Vt
    t = mu_q - R @ mu_p
    T = jnp.eye(4, dtype=p.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    return T


@functools.partial(jax.jit, static_argnames=("iters",))
def solve_pose3d(
    pts1: jax.Array,  # (N, 3) points in frame 1
    pts2: jax.Array,  # (N, 3) corresponding points in frame 2
    valid: jax.Array,  # (N,) bool correspondence validity
    huber: float = 0.05,
    inlier_thresh: float = 0.10,
    min_inliers: int = 12,
    iters: int = 6,
) -> Pose3DResult:
    """IRLS rigid alignment: returns T with T @ pts1 ~= pts2."""
    w = valid.astype(jnp.float32)

    def body(_, carry):
        w, _ = carry
        T = _weighted_kabsch(pts1, pts2, w)
        r = jnp.linalg.norm(
            pts1 @ T[:3, :3].T + T[:3, 3] - pts2, axis=-1
        )
        w_new = jnp.where(
            r <= huber, 1.0, huber / jnp.maximum(r, 1e-12)
        ) * valid.astype(jnp.float32)
        return (w_new, T)

    w, T = jax.lax.fori_loop(0, iters, body, (w, jnp.eye(4, dtype=pts1.dtype)))
    r = jnp.linalg.norm(pts1 @ T[:3, :3].T + T[:3, 3] - pts2, axis=-1)
    inl = valid & (r < inlier_thresh)
    n_inl = jnp.sum(inl)
    rmse = jnp.sqrt(jnp.sum(jnp.where(inl, r * r, 0.0)) / jnp.maximum(n_inl, 1))
    ok = (n_inl >= min_inliers) & jnp.all(jnp.isfinite(T))
    return Pose3DResult(T=T, inliers=n_inl, rmse=rmse, ok=ok)
