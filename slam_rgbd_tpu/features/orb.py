"""ORB-class descriptors: intensity-centroid orientation + steered BRIEF-256.

Replaces the descriptor half of the capability the reference delegates to
ORB-SLAM3 (`astra_orb_slam3_rgbd.yaml:41-52` budget). TPU design choices:

  * Patches for all K keypoints are gathered with one batched bilinear
    gather from the (smoothed) pyramid level of each keypoint — a (K, P, P)
    tensor, static shapes, no per-keypoint loops.
  * The BRIEF point-pair pattern is generated once from a fixed seed
    (isotropic Gaussian, sigma = patch/5, the original BRIEF construction —
    generated, not copied from any library table) and rotated per keypoint
    by its orientation (steered BRIEF).
  * Descriptors are produced BOTH bit-packed ((K, 8) uint32, for storage /
    hashing) and as a sign matrix ((K, 256) int8 in {-1, +1}) whose matmul
    against another frame's sign matrix computes all-pairs Hamming distances
    on the MXU (see `features/match.py`).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from slam_rgbd_tpu.features.detect import Keypoints

PATCH = 31  # ORB patch diameter
_HALF = PATCH // 2
N_BITS = 256


@functools.lru_cache()
def brief_pattern(seed: int = 1234) -> np.ndarray:
    """(256, 4) float32: (x1, y1, x2, y2) sample offsets, sigma = PATCH/5.

    Deterministic Gaussian point pairs clipped to the patch — the original
    BRIEF-II construction.
    """
    rng = np.random.default_rng(seed)
    sigma = PATCH / 5.0
    pts = rng.normal(0.0, sigma, size=(N_BITS, 4))
    return np.clip(pts, -_HALF + 1, _HALF - 1).astype(np.float32)


def smooth(img: jax.Array) -> jax.Array:
    """5-tap binomial blur (separable) — BRIEF needs a smoothed image."""
    k = jnp.array([1.0, 4.0, 6.0, 4.0, 1.0]) / 16.0
    for ax in (0, 1):
        acc = jnp.zeros_like(img)
        for i, w in enumerate(k):
            acc = acc + w * jnp.roll(img, i - 2, axis=ax)
        img = acc
    return img


def _gather_bilinear(img: jax.Array, u: jax.Array, v: jax.Array) -> jax.Array:
    """Sample img (H, W) at float coords; clamps to border.

    NOTE: this lowers to an XLA gather — fine for small index sets, but
    ~40x slower than the one-hot-matmul extraction used by `describe`
    (gathers serialize on TPU; matmuls ride the MXU). Kept for oracles
    and small offline paths only.
    """
    h, w = img.shape
    u = jnp.clip(u, 0.0, w - 1.001)
    v = jnp.clip(v, 0.0, h - 1.001)
    u0 = jnp.floor(u).astype(jnp.int32)
    v0 = jnp.floor(v).astype(jnp.int32)
    fu = u - u0
    fv = v - v0
    return (
        (1 - fu) * (1 - fv) * img[v0, u0]
        + fu * (1 - fv) * img[v0, u0 + 1]
        + (1 - fu) * fv * img[v0 + 1, u0]
        + fu * fv * img[v0 + 1, u0 + 1]
    )


def _axis_onehot(x0: jax.Array, frac: jax.Array, taps: int, length: int) -> jax.Array:
    """Separable-bilinear weight matrix (K, taps, length).

    Row p carries weight (1-frac) at column x0+p and frac at x0+p+1 — so
    `W @ signal` samples `signal` bilinearly at positions x0+frac+p for
    p in [0, taps). Out-of-range positions produce all-zero rows (instead
    of the gather path's clamp), which only ever happens for invalid
    (masked) keypoints.
    """
    i = jax.lax.broadcasted_iota(jnp.int32, (1, 1, length), 2)
    base = x0[:, None, None] + jnp.arange(taps, dtype=jnp.int32)[None, :, None]
    f = frac[:, None, None]
    return (i == base) * (1.0 - f) + (i == base + 1) * f


def extract_patches(
    img: jax.Array, uv: jax.Array, patch: int = PATCH
) -> jax.Array:
    """Bilinear (K, patch, patch) patch extraction around `uv` — as two
    one-hot matmuls (rows then columns) so the work lands on the MXU.

    The per-keypoint sample grid is `uv + offs` with integer offsets, so
    the bilinear fractional part is constant per keypoint and the 2D
    interpolation separates exactly into row weights x image x column
    weights. Replaces an 8M-element XLA gather (~330 ms on v5e) with two
    matmuls (~0.2 ms).
    """
    h, w = img.shape
    half = patch // 2
    u0f = jnp.floor(uv[:, 0] - half)
    v0f = jnp.floor(uv[:, 1] - half)
    fu = uv[:, 0] - half - u0f
    fv = uv[:, 1] - half - v0f
    rows = _axis_onehot(v0f.astype(jnp.int32), fv, patch, h)  # (K, P, H)
    cols = _axis_onehot(u0f.astype(jnp.int32), fu, patch, w)  # (K, P, W)
    k = uv.shape[0]
    tmp = (rows.reshape(k * patch, h) @ img).reshape(k, patch, w)
    return jnp.einsum("kpw,kqw->kpq", tmp, cols)


class Descriptors(NamedTuple):
    packed: jax.Array  # (K, 8) uint32 bit-packed
    signs: jax.Array  # (K, 256) int8 in {-1, +1} — MXU matching operand
    angle: jax.Array  # (K,) float32 orientation used


def orientation(patches: jax.Array) -> jax.Array:
    """Intensity-centroid orientation per patch (K, P, P) -> (K,) radians.

    theta = atan2(m01, m10) over a circular mask of radius PATCH/2.
    """
    p = patches.shape[-1]
    c = (p - 1) / 2.0
    ys = jnp.arange(p, dtype=jnp.float32) - c
    xs = jnp.arange(p, dtype=jnp.float32) - c
    yy, xx = jnp.meshgrid(ys, xs, indexing="ij")
    disk = (xx * xx + yy * yy) <= c * c
    w = jnp.where(disk, 1.0, 0.0)
    m10 = jnp.sum(patches * (xx * w), axis=(-2, -1))
    m01 = jnp.sum(patches * (yy * w), axis=(-2, -1))
    return jnp.arctan2(m01, m10)


@functools.partial(jax.jit, static_argnames=("scale_factor",))
def describe(
    kp: Keypoints,
    pyramid: tuple,
    scale_factor: float = 1.2,
) -> Descriptors:
    """Compute oriented BRIEF-256 descriptors for fixed-K keypoints.

    `pyramid` is the per-level intensity tuple from `detect_pyramid`. Each
    keypoint samples its own level (static unroll over levels with masked
    accumulation — levels are few and small).
    """
    from slam_rgbd_tpu.features.detect import _per_level_budget

    K = kp.uv.shape[0]
    pat = jnp.asarray(brief_pattern())  # (256, 4)

    # Keypoints are level-contiguous in `detect_pyramid`'s static budget
    # order, so each level extracts ONLY its own slice (the masked
    # every-level gather this replaces did 8x the work and, being an XLA
    # gather, ran ~1500x slower than these one-hot matmuls).
    budgets = _per_level_budget(K, len(pyramid), scale_factor)
    chunks, off = [], 0
    for l, img in enumerate(pyramid):
        k_l = budgets[l]
        s = scale_factor**l
        # keypoint position in this level's pixel coords (pixel-center conv.)
        uv_l = (kp.uv[off : off + k_l] + 0.5) / s - 0.5
        chunks.append(extract_patches(smooth(img), uv_l))
        off += k_l
    patches = jnp.concatenate(chunks, axis=0)  # (K, P, P)

    theta = orientation(patches)
    ct, st = jnp.cos(theta), jnp.sin(theta)

    # Rotate pattern offsets per keypoint and sample within the patch
    # (patch center at (_HALF, _HALF), axis-aligned in level coords).
    def rot(x, y):
        return ct[:, None] * x[None] - st[:, None] * y[None], st[:, None] * x[None] + ct[:, None] * y[None]

    x1, y1 = rot(pat[:, 0], pat[:, 1])  # (K, 256)
    x2, y2 = rot(pat[:, 2], pat[:, 3])

    def sample_patch(x, y):
        """Bilinear in-patch sampling at (K, B) rotated positions — the 2D
        interpolation separates per sample into row x patch x column
        one-hot contractions (batched matmuls, not gathers)."""
        u = jnp.clip(x + _HALF, 0.0, PATCH - 1.001)
        v = jnp.clip(y + _HALF, 0.0, PATCH - 1.001)
        u0 = jnp.floor(u)
        v0 = jnp.floor(v)
        i = jnp.arange(PATCH, dtype=jnp.float32)
        rw = jnp.where(i == v0[..., None], (1.0 - (v - v0))[..., None], 0.0) + \
            jnp.where(i == v0[..., None] + 1, (v - v0)[..., None], 0.0)  # (K, B, P)
        cw = jnp.where(i == u0[..., None], (1.0 - (u - u0))[..., None], 0.0) + \
            jnp.where(i == u0[..., None] + 1, (u - u0)[..., None], 0.0)
        t = jnp.einsum("kbp,kpq->kbq", rw, patches)
        return jnp.sum(t * cw, axis=-1)

    i1 = sample_patch(x1, y1)
    i2 = sample_patch(x2, y2)
    bits = i1 < i2  # (K, 256) bool

    signs = jnp.where(bits, jnp.int8(1), jnp.int8(-1))
    # pack into 8 uint32 words
    bits_u32 = bits.reshape(K, 8, 32).astype(jnp.uint32)
    weights = (jnp.uint32(1) << jnp.arange(32, dtype=jnp.uint32))[None, None, :]
    packed = jnp.sum(bits_u32 * weights, axis=-1, dtype=jnp.uint32)
    return Descriptors(packed=packed, signs=signs, angle=theta)


def keypoint_depth(
    kp: Keypoints, depth_m: jax.Array, cam, edge_rel_tol: float = 0.06
) -> tuple[jax.Array, jax.Array]:
    """3D camera-frame points for keypoints from the depth map.

    Returns ((K, 3) points, (K,) valid). Corners frequently sit ON depth
    discontinuities (object silhouettes), where the depth pixel may belong
    to either surface — such keypoints would spawn garbage map points, so
    any keypoint whose 3x3 depth window spans more than `edge_rel_tol * z`
    (or contains invalid depth) is rejected.
    """
    h, w = depth_m.shape
    u = jnp.clip(jnp.round(kp.uv[:, 0]).astype(jnp.int32), 1, w - 2)
    v = jnp.clip(jnp.round(kp.uv[:, 1]).astype(jnp.int32), 1, h - 2)
    z = depth_m[v, u]
    zmin = jnp.full_like(z, jnp.inf)
    zmax = jnp.zeros_like(z)
    for dv in (-1, 0, 1):
        for du in (-1, 0, 1):
            zn = depth_m[v + dv, u + du]
            zmin = jnp.minimum(zmin, zn)
            zmax = jnp.maximum(zmax, zn)
    flat = (zmin > 0) & ((zmax - zmin) < edge_rel_tol * jnp.maximum(z, 0.3))
    ok = kp.valid & (z > cam.min_depth) & (z < cam.max_depth) & flat
    x = (kp.uv[:, 0] - cam.cx) * z / cam.fx
    y = (kp.uv[:, 1] - cam.cy) * z / cam.fy
    pts = jnp.stack([x, y, z], axis=-1)
    return jnp.where(ok[:, None], pts, 0.0), ok
