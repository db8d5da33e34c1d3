"""SE(3) Lie-group operations — pure jax.numpy, float32, vmap-first.

The reference delegates all pose math to ORB-SLAM3 (SURVEY.md §2 C7); this
module is the native replacement used by odometry, BA and the pose graph.

Conventions:
  * Poses are 4x4 homogeneous matrices T = [[R, t], [0, 1]], float32.
  * Twists are 6-vectors xi = (v, w): translation part first, rotation last —
    matching the Jacobian layout used by the ICP/BA kernels.
  * `exp`/`log` use closed-form Rodrigues with Taylor fallbacks near 0 so
    they are safe under jit/grad in float32 (no float64 on TPU — the
    conditioning strategy called out in SURVEY.md §7 "hard parts").

All functions work on single elements; wrap in `jax.vmap` for batches.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_EPS = 1e-8


def hat(w: jax.Array) -> jax.Array:
    """3-vector -> 3x3 skew-symmetric matrix."""
    wx, wy, wz = w[0], w[1], w[2]
    z = jnp.zeros_like(wx)
    return jnp.stack(
        [
            jnp.stack([z, -wz, wy]),
            jnp.stack([wz, z, -wx]),
            jnp.stack([-wy, wx, z]),
        ]
    )


def vee(W: jax.Array) -> jax.Array:
    """3x3 skew-symmetric matrix -> 3-vector."""
    return jnp.stack([W[2, 1], W[0, 2], W[1, 0]])


def _sinc_terms(theta_sq: jax.Array):
    """(A, B, C) = (sin t/t, (1-cos t)/t^2, (t - sin t)/t^3), Taylor-safe.

    Accepts theta^2 to avoid a sqrt of 0 in the backward pass.
    """
    # Clamp BEFORE any division so the unselected `where` branch never holds
    # inf/NaN — an unselected-branch inf turns the backward pass into NaN
    # (the classic jnp.where autodiff trap).
    ts = jnp.maximum(theta_sq, _EPS)
    theta = jnp.sqrt(ts)
    small = theta_sq < 1e-8
    a = jnp.where(small, 1.0 - theta_sq / 6.0, jnp.sin(theta) / theta)
    b = jnp.where(small, 0.5 - theta_sq / 24.0, (1.0 - jnp.cos(theta)) / ts)
    c = jnp.where(small, 1.0 / 6.0 - theta_sq / 120.0, (theta - jnp.sin(theta)) / (ts * theta))
    return a, b, c


def so3_exp(w: jax.Array) -> jax.Array:
    """Rotation vector -> rotation matrix (Rodrigues)."""
    theta_sq = jnp.dot(w, w)
    a, b, _ = _sinc_terms(theta_sq)
    W = hat(w)
    return jnp.eye(3, dtype=w.dtype) + a * W + b * (W @ W)


def so3_log(R: jax.Array) -> jax.Array:
    """Rotation matrix -> rotation vector.

    Handles the theta ~ pi branch via the symmetric-part formula, and
    theta ~ 0 via Taylor. Good to ~1e-6 in float32 away from exactly pi.
    """
    trace = jnp.clip(R[0, 0] + R[1, 1] + R[2, 2], -1.0, 3.0)
    cos_theta = jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0)
    theta = jnp.arccos(cos_theta)
    sin_theta = jnp.sin(theta)

    # Generic branch: w = theta / (2 sin theta) * vee(R - R^T)
    w_generic = vee(R - R.T) * jnp.where(
        jnp.abs(sin_theta) < 1e-6, 0.5, theta / (2.0 * jnp.maximum(sin_theta, 1e-20))
    )
    # Small-angle: vee(R - R^T)/2 * (1 + theta^2/6)
    w_small = vee(R - R.T) * 0.5 * (1.0 + theta * theta / 6.0)

    # Near pi: |w_i| from diagonal, signs from off-diagonals.
    # R ~ I + (2/pi^2) W^2 => diag gives w_i^2.
    diag = jnp.stack([R[0, 0], R[1, 1], R[2, 2]])
    w_sq = jnp.maximum((diag - cos_theta) / jnp.maximum(1.0 - cos_theta, 1e-12), 0.0)
    w_abs = theta * jnp.sqrt(w_sq)
    # Pick the largest-magnitude axis k; fix its sign as +, derive others from
    # off-diagonal sums S_ij = w_i w_j * (1-cos)/theta^2 (symmetric part).
    S = 0.5 * (R + R.T)
    k = jnp.argmax(w_abs)
    signs_all = jnp.stack(
        [
            jnp.stack([jnp.ones_like(theta), jnp.sign(S[0, 1]), jnp.sign(S[0, 2])]),
            jnp.stack([jnp.sign(S[0, 1]), jnp.ones_like(theta), jnp.sign(S[1, 2])]),
            jnp.stack([jnp.sign(S[0, 2]), jnp.sign(S[1, 2]), jnp.ones_like(theta)]),
        ]
    )
    signs = signs_all[k]
    signs = jnp.where(signs == 0.0, 1.0, signs)
    w_pi = w_abs * signs

    near_pi = theta > 3.0
    small = theta < 1e-4
    return jnp.where(small, w_small, jnp.where(near_pi, w_pi, w_generic))


def left_jacobian(w: jax.Array) -> jax.Array:
    """SO(3) left Jacobian J_l(w) (used by the SE(3) exp translation part)."""
    theta_sq = jnp.dot(w, w)
    _, b, c = _sinc_terms(theta_sq)
    W = hat(w)
    return jnp.eye(3, dtype=w.dtype) + b * W + c * (W @ W)


def left_jacobian_inv(w: jax.Array) -> jax.Array:
    """Inverse SO(3) left Jacobian (used by `log`)."""
    theta_sq = jnp.dot(w, w)
    theta = jnp.sqrt(jnp.maximum(theta_sq, _EPS))
    W = hat(w)
    small = theta_sq < 1e-8
    half_theta = 0.5 * theta
    cot_term = jnp.where(
        small,
        1.0 / 12.0 + theta_sq / 720.0,
        (1.0 - half_theta * jnp.cos(half_theta) / jnp.maximum(jnp.sin(half_theta), 1e-20))
        / jnp.maximum(theta_sq, _EPS),
    )
    return jnp.eye(3, dtype=w.dtype) - 0.5 * W + cot_term * (W @ W)


def exp(xi: jax.Array) -> jax.Array:
    """Twist (v, w) -> 4x4 transform. T = [[exp(w), J_l(w) v], [0, 1]]."""
    v, w = xi[:3], xi[3:]
    R = so3_exp(w)
    t = left_jacobian(w) @ v
    T = jnp.eye(4, dtype=xi.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(t)
    return T


def log(T: jax.Array) -> jax.Array:
    """4x4 transform -> twist (v, w)."""
    w = so3_log(T[:3, :3])
    v = left_jacobian_inv(w) @ T[:3, 3]
    return jnp.concatenate([v, w])


def inverse(T: jax.Array) -> jax.Array:
    R = T[:3, :3]
    t = T[:3, 3]
    Ti = jnp.eye(4, dtype=T.dtype)
    Ti = Ti.at[:3, :3].set(R.T)
    Ti = Ti.at[:3, 3].set(-R.T @ t)
    return Ti


def compose(A: jax.Array, B: jax.Array) -> jax.Array:
    return A @ B


def transform_points(T: jax.Array, pts: jax.Array) -> jax.Array:
    """Apply T to an (..., 3) array of points."""
    return pts @ T[:3, :3].T + T[:3, 3]


def rotate_vectors(T: jax.Array, vecs: jax.Array) -> jax.Array:
    """Apply only the rotation of T to (..., 3) vectors (for normals)."""
    return vecs @ T[:3, :3].T


def adjoint(T: jax.Array) -> jax.Array:
    """6x6 adjoint of T for twist transport: Ad_T xi^ = T xi^ T^-1.

    With the (v, w) ordering: Ad = [[R, hat(t) R], [0, R]].
    """
    R = T[:3, :3]
    t = T[:3, 3]
    top = jnp.concatenate([R, hat(t) @ R], axis=1)
    bot = jnp.concatenate([jnp.zeros((3, 3), dtype=T.dtype), R], axis=1)
    return jnp.concatenate([top, bot], axis=0)


def normalize_rotation(T: jax.Array) -> jax.Array:
    """Re-orthonormalize the rotation block (float32 drift control).

    Uses one step of the SVD-free Gram-Schmidt-like projection
    R <- R (3I - R^T R)/2 iterated twice — cheap and jit-friendly.
    """
    R = T[:3, :3]
    for _ in range(2):
        R = R @ (1.5 * jnp.eye(3, dtype=T.dtype) - 0.5 * (R.T @ R))
    return T.at[:3, :3].set(R)


def identity(dtype=jnp.float32) -> jax.Array:
    return jnp.eye(4, dtype=dtype)


# Batched conveniences -------------------------------------------------------

exp_batch = jax.vmap(exp)
log_batch = jax.vmap(log)
inverse_batch = jax.vmap(inverse)


def geodesic_distance(A: jax.Array, B: jax.Array):
    """(trans_err_m, rot_err_rad) between two poses."""
    D = inverse(A) @ B
    trans = jnp.linalg.norm(D[:3, 3])
    cos_theta = jnp.clip((D[0, 0] + D[1, 1] + D[2, 2] - 1.0) * 0.5, -1.0, 1.0)
    return trans, jnp.arccos(cos_theta)
