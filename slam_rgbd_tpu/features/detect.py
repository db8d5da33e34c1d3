"""FAST corner detection + Harris ranking + NMS + static top-K.

Native replacement for the ORB feature budget the reference configures for
ORB-SLAM3 (`astra_orb_slam3_rgbd.yaml:41-52`: 1000 features, 8 levels, scale
1.2, FAST thresholds 20/7) — re-designed for TPU:

  * The FAST segment test (>= 9 contiguous of 16 circle pixels all brighter
    or all darker than center +/- t) is evaluated for EVERY pixel as 16
    rolled image diffs + a 16x9 boolean contiguity reduction — pure VPU
    elementwise work XLA fuses into one pass, no branching per pixel.
  * Ranking uses a Harris response (as ORB does) computed densely with
    separable box filters.
  * Non-max suppression is a 3x3 max-pool comparison; selection is
    `jax.lax.top_k` over the masked response — fixed K outputs with a
    validity mask instead of dynamic keypoint lists (the central
    static-shape idiom replacing ORB-SLAM3's dynamic containers).

Two-threshold semantics: detection uses `fast_threshold`; if fewer than K
corners pass, the mask ranking naturally falls back to weaker corners gated
by `fast_min_threshold` (ORB-SLAM3's iniThFAST/minThFAST fallback).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

# Bresenham circle of radius 3 (the FAST-16 ring), clockwise from 12
# o'clock, as (dv, du) image offsets.
_CIRCLE = (
    (-3, 0), (-3, 1), (-2, 2), (-1, 3), (0, 3), (1, 3), (2, 2), (3, 1),
    (3, 0), (3, -1), (2, -2), (1, -3), (0, -3), (-1, -3), (-2, -2), (-3, -1),
)


class Keypoints(NamedTuple):
    """Fixed-capacity keypoint set (struct-of-arrays, masked)."""

    uv: jax.Array  # (K, 2) float32 — level-0 pixel coords (u, v)
    response: jax.Array  # (K,) float32
    angle: jax.Array  # (K,) float32 radians (filled by orb.describe)
    level: jax.Array  # (K,) int32 pyramid level
    valid: jax.Array  # (K,) bool


def _ring_diffs(img: jax.Array) -> jax.Array:
    """(16, H, W) of I(circle_i) - I(center)."""
    return jnp.stack(
        [jnp.roll(img, (-dv, -du), axis=(0, 1)) - img for dv, du in _CIRCLE]
    )


def fast_score(img: jax.Array, threshold: float):
    """FAST-16 segment test + continuity.

    Returns (is_corner (H, W) bool, sad_score (H, W) float32). The score is
    the sum of |diff| over circle pixels exceeding the threshold (the
    classic FAST score used for NMS ranking).
    """
    d = _ring_diffs(img)  # (16, H, W)
    bright = d > threshold
    dark = d < -threshold
    # contiguity: any arc of 9 consecutive (cyclic) all-bright or all-dark
    def has_arc(m):
        acc = jnp.zeros(img.shape, dtype=bool)
        for s in range(16):
            arc = m[s]
            for j in range(1, 9):
                arc = arc & m[(s + j) % 16]
            acc = acc | arc
        return acc

    is_corner = has_arc(bright) | has_arc(dark)
    score = jnp.sum(jnp.where(bright | dark, jnp.abs(d), 0.0), axis=0)
    return is_corner, score


def harris_response(img: jax.Array, k: float = 0.04, window: int = 3) -> jax.Array:
    """Dense Harris corner response with a box window (separable sums)."""
    gx = 0.5 * (jnp.roll(img, -1, axis=1) - jnp.roll(img, 1, axis=1))
    gy = 0.5 * (jnp.roll(img, -1, axis=0) - jnp.roll(img, 1, axis=0))

    def box(x):
        for ax in (0, 1):
            acc = x
            for s in range(1, window + 1):
                acc = acc + jnp.roll(x, s, axis=ax) + jnp.roll(x, -s, axis=ax)
            x = acc
        return x

    sxx = box(gx * gx)
    syy = box(gy * gy)
    sxy = box(gx * gy)
    det = sxx * syy - sxy * sxy
    tr = sxx + syy
    return det - k * tr * tr


def nms_mask(score: jax.Array, radius: int = 1) -> jax.Array:
    """True where score is >= every neighbour in its (2r+1)^2 window.

    Ties survive (both pixels fire) — exact plateaus happen on synthetic
    imagery, and duplicates are preferable to dropping a whole plateau.
    """
    neigh = jnp.full_like(score, -jnp.inf)
    for dv in range(-radius, radius + 1):
        for du in range(-radius, radius + 1):
            if dv == 0 and du == 0:
                continue
            neigh = jnp.maximum(neigh, jnp.roll(score, (dv, du), axis=(0, 1)))
    return score >= neigh


def detect_level(
    img: jax.Array,
    k: int,
    threshold: float,
    min_threshold: float,
    border: int = 16,
):
    """Detect up to `k` FAST corners on one intensity image (H, W) in [0,1].

    Thresholds are in 0..255 intensity units (matching the reference config's
    FAST thresholds); the image is scaled internally. Returns
    (uv (k, 2) f32, response (k,), valid (k,)).
    """
    x = img * 255.0
    h, w = x.shape
    is_strong, _ = fast_score(x, threshold)
    is_weak, sad = fast_score(x, min_threshold)

    # NMS on the FAST SAD score restricted to corner pixels (Harris is NOT a
    # local max at FAST corners — it peaks inside blobs — so ORB's order is
    # FAST-detect, FAST-score NMS, then Harris *ranking*).
    sad_masked = jnp.where(is_weak, sad, -jnp.inf)
    survives = is_weak & nms_mask(sad_masked)

    u, v = jnp.meshgrid(jnp.arange(w), jnp.arange(h), indexing="xy")
    interior = (u >= border) & (u < w - border) & (v >= border) & (v < h - border)

    # Rank: any strong corner outranks every weak-only corner; within a
    # class, higher Harris wins.
    harris = harris_response(x)
    resp = jnp.where(is_strong, 1e6, 0.0) + harris
    resp = jnp.where(survives & interior, resp, -jnp.inf)

    flat = resp.reshape(-1)
    top_resp, idx = jax.lax.top_k(flat, k)
    uu = (idx % w).astype(jnp.float32)
    vv = (idx // w).astype(jnp.float32)
    valid = jnp.isfinite(top_resp)
    harris_at = harris.reshape(-1)[idx]
    return jnp.stack([uu, vv], axis=-1), jnp.where(valid, harris_at, 0.0), valid


def _level_shapes(height: int, width: int, n_levels: int, scale: float):
    shapes = []
    for l in range(n_levels):
        s = scale**l
        shapes.append((max(int(round(height / s)), 32), max(int(round(width / s)), 32)))
    return tuple(shapes)


def _per_level_budget(k_total: int, n_levels: int, scale: float):
    """Split the feature budget across levels proportional to image area
    (geometric decay, like ORB's per-level distribution)."""
    weights = [(1.0 / scale**2) ** l for l in range(n_levels)]
    total = sum(weights)
    ks = [max(int(round(k_total * w / total)), 8) for w in weights]
    # pad/trim to exactly k_total
    ks[0] += k_total - sum(ks)
    return tuple(ks)


@functools.partial(jax.jit, static_argnames=("n_features", "n_levels", "scale_factor",
                                             "threshold", "min_threshold"))
def detect_pyramid(
    intensity: jax.Array,
    n_features: int = 1024,
    n_levels: int = 8,
    scale_factor: float = 1.2,
    threshold: float = 20.0,
    min_threshold: float = 7.0,
) -> tuple[Keypoints, tuple]:
    """Multi-scale FAST detection over a 1.2x scale pyramid.

    Returns (Keypoints with uv in level-0 coordinates, the intensity pyramid
    as a tuple of per-level images for the descriptor stage).
    """
    h, w = intensity.shape
    shapes = _level_shapes(h, w, n_levels, scale_factor)
    budgets = _per_level_budget(n_features, n_levels, scale_factor)

    pyr = []
    img = intensity
    for l, (lh, lw) in enumerate(shapes):
        if (lh, lw) != img.shape:
            img = jax.image.resize(img, (lh, lw), method="linear")
        pyr.append(img)

    uvs, resps, angles, levels, valids = [], [], [], [], []
    for l, img in enumerate(pyr):
        uv, resp, valid = detect_level(img, budgets[l], threshold, min_threshold)
        s = scale_factor**l
        # pixel-center convention: u0 = (u_l + 0.5) * s - 0.5
        uvs.append((uv + 0.5) * s - 0.5)
        resps.append(resp)
        angles.append(jnp.zeros(budgets[l], jnp.float32))
        levels.append(jnp.full(budgets[l], l, jnp.int32))
        valids.append(valid)

    kp = Keypoints(
        uv=jnp.concatenate(uvs),
        response=jnp.concatenate(resps),
        angle=jnp.concatenate(angles),
        level=jnp.concatenate(levels),
        valid=jnp.concatenate(valids),
    )
    return kp, tuple(pyr)
