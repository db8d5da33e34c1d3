"""Robust SE(3) from matched 3D-3D correspondences (hypothesize + IRLS).

Used for feature-based relocalization and loop-closure geometric
verification (the capability ORB-SLAM3 provides the reference via its
place-recognition + Sim3 solver; here RGB-D depth gives metric scale so a
rigid 3D-3D solve suffices).

RANSAC, TPU-shaped: instead of a data-dependent sampling loop, a FIXED
batch of minimal (3-point) hypotheses is fitted with vmapped closed-form
Kabsch, every hypothesis is scored against all correspondences at once
(one (H, N) distance evaluation), and the best is polished with
static-shape Huber IRLS. Plain IRLS from identity — the round-1 design —
is NOT robust to *structured* outliers: repeating texture produces
aliased match sets that are mutually consistent, and IRLS happily
converges to the wrong consensus (observed as a verified-but-2.7 m-wrong
loop edge on the sweep benchmark). Minimal-hypothesis sampling breaks
that: some hypothesis is fitted purely from correct matches, and the
inlier count picks it.
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
    n_valid: jax.Array = jnp.int32(0)  # () candidate correspondences


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


def _residuals(T: jax.Array, pts1: jax.Array, pts2: jax.Array) -> jax.Array:
    return jnp.linalg.norm(pts1 @ T[:3, :3].T + T[:3, 3] - pts2, axis=-1)


@functools.partial(jax.jit, static_argnames=("iters", "n_hypotheses"))
def solve_pose3d(
    pts1: jax.Array,  # (N, 3) points in frame 1
    pts2: jax.Array,  # (N, 3) corresponding points in frame 2
    valid: jax.Array,  # (N,) bool correspondence validity
    huber: float = 0.05,
    inlier_thresh: float = 0.10,
    min_inliers: int = 12,
    iters: int = 6,
    n_hypotheses: int = 64,
    seed: int = 0,
) -> Pose3DResult:
    """Robust rigid alignment: returns T with T @ pts1 ~= pts2.

    Batched minimal-hypothesis search (vmapped 3-point Kabsch, one (H, N)
    scoring pass) followed by Huber IRLS polish seeded from the best
    hypothesis' inlier set. Fully static shapes; deterministic (fixed
    sampling seed).
    """
    n = pts1.shape[0]
    valid_f = valid.astype(jnp.float32)

    # ---- minimal hypotheses: (H, 3) DISTINCT valid indices via Gumbel
    # top-k (a fixed-shape "sample without replacement" per hypothesis)
    key = jax.random.PRNGKey(seed)
    logits = jnp.where(valid, 0.0, -1e9)
    g = jax.random.gumbel(key, (n_hypotheses, n)) + logits[None, :]
    _, idx = jax.lax.top_k(g, 3)  # (H, 3)
    tri1 = pts1[idx]  # (H, 3, 3)
    tri2 = pts2[idx]
    ones3 = jnp.ones((3,), pts1.dtype)
    T_h = jax.vmap(lambda a, b: _weighted_kabsch(a, b, ones3))(tri1, tri2)

    # ---- score every hypothesis against every correspondence ----------
    p1h = jnp.einsum("hij,nj->hni", T_h[:, :3, :3], pts1) + T_h[:, None, :3, 3]
    r_h = jnp.linalg.norm(p1h - pts2[None], axis=-1)  # (H, N)
    inl_h = (r_h < inlier_thresh) & valid[None, :]
    score = jnp.sum(inl_h, axis=1)
    # non-finite hypotheses (degenerate triples) score 0 by construction
    score = jnp.where(
        jnp.all(jnp.isfinite(T_h.reshape(n_hypotheses, -1)), axis=1),
        score, 0,
    )
    best = jnp.argmax(score)
    T0 = T_h[best]

    # ---- IRLS polish seeded from the best hypothesis' inliers ---------
    w0 = inl_h[best].astype(jnp.float32)
    # fall back to all-valid seeding if the hypothesis search found
    # nothing (keeps the old behavior for clean small-motion cases)
    w0 = jnp.where(score[best] >= 3, w0, valid_f)

    def body(_, carry):
        w, T = carry
        T = _weighted_kabsch(pts1, pts2, w)
        r = _residuals(T, pts1, pts2)
        w_new = jnp.where(
            r <= huber, 1.0, huber / jnp.maximum(r, 1e-12)
        ) * valid_f
        return (w_new, T)

    w, T = jax.lax.fori_loop(0, iters, body, (w0, T0))
    r = _residuals(T, pts1, pts2)
    inl = valid & (r < inlier_thresh)
    n_inl = jnp.sum(inl)
    rmse = jnp.sqrt(jnp.sum(jnp.where(inl, r * r, 0.0)) / jnp.maximum(n_inl, 1))
    ok = (n_inl >= min_inliers) & jnp.all(jnp.isfinite(T))
    return Pose3DResult(
        T=T, inliers=n_inl, rmse=rmse, ok=ok,
        n_valid=jnp.sum(valid).astype(jnp.int32),
    )
