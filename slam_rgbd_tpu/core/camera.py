"""Pinhole camera ops: project / back-project, vertex & normal maps, pyramids.

TPU-native replacement for the reference's hottest loop — the per-pixel
back-projection in the viewer (`Youth.Source/ViewerModule/viewerModule.c:336-357`:
z = depth_mm/1000, x = (u - cx) z / f, y = (v - cy) z / f over 307k pixels) and
the depth mm->m conversion in the SLAM wrapper
(`Youth.Source/AlgorithmModule/SLAM.cpp:153-155`).  Here each of those is one
fused vectorized XLA op over the whole image.

Everything is float32, static-shaped, and differentiable.  Invalid depth is
represented by 0 in raw maps and tracked with explicit boolean masks.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from slam_rgbd_tpu.core.config import CameraIntrinsics


def depth_to_metres(depth_raw: jax.Array, cam: CameraIntrinsics) -> jax.Array:
    """uint16 depth image (sensor units) -> float32 metres; 0 stays 0 (invalid).

    Mirrors DepthMapFactor semantics (`astra_orb_slam3_rgbd.yaml:35`,
    `SLAM.cpp:153-155`).
    """
    return depth_raw.astype(jnp.float32) / jnp.float32(cam.depth_scale)


def valid_depth_mask(depth_m: jax.Array, cam: CameraIntrinsics) -> jax.Array:
    return (depth_m > cam.min_depth) & (depth_m < cam.max_depth)


def pixel_grid(height: int, width: int, dtype=jnp.float32):
    """(u, v) coordinate grids, shape (H, W) each."""
    v = jax.lax.broadcasted_iota(dtype, (height, width), 0)
    u = jax.lax.broadcasted_iota(dtype, (height, width), 1)
    return u, v


def backproject(depth_m: jax.Array, cam: CameraIntrinsics) -> jax.Array:
    """Depth (H, W) metres -> vertex map (H, W, 3) in camera coordinates.

    Invalid pixels (depth <= 0 or out of range) produce (0, 0, 0).
    """
    h, w = depth_m.shape
    u, v = pixel_grid(h, w, depth_m.dtype)
    valid = valid_depth_mask(depth_m, cam)
    z = jnp.where(valid, depth_m, 0.0)
    x = (u - cam.cx) * z / cam.fx
    y = (v - cam.cy) * z / cam.fy
    return jnp.stack([x, y, z], axis=-1)


def project(points: jax.Array, cam: CameraIntrinsics):
    """Camera-frame points (..., 3) -> (uv (..., 2), valid (...,)).

    valid = in front of camera and inside the image bounds.
    """
    x, y, z = points[..., 0], points[..., 1], points[..., 2]
    z_safe = jnp.where(z > 1e-6, z, 1.0)
    u = cam.fx * x / z_safe + cam.cx
    v = cam.fy * y / z_safe + cam.cy
    in_front = z > cam.min_depth
    # Pixel-area convention: u in (-0.5, W-0.5) rounds to a valid column —
    # strict <= W-1 drops boundary pixels to float error.
    in_bounds = (
        (u > -0.5) & (u < cam.width - 0.5) & (v > -0.5) & (v < cam.height - 0.5)
    )
    return jnp.stack([u, v], axis=-1), in_front & in_bounds


def bilinear_sample(img: jax.Array, u: jax.Array, v: jax.Array,
                    valid_map: jax.Array):
    """Bilinearly sample `img` (H, W[, C]) at float coords (u, v).

    Returns (values, all_corners_valid). Out-of-range coordinates clamp to
    the last interior cell; callers gate on their own bounds check. Used by
    ICP association (sub-pixel accuracy: nearest-neighbour gather leaves a
    mm-scale bias in the pose) and by feature sampling.
    """
    h, w = img.shape[:2]
    u0 = jnp.clip(jnp.floor(u).astype(jnp.int32), 0, w - 2)
    v0 = jnp.clip(jnp.floor(v).astype(jnp.int32), 0, h - 2)
    fu = jnp.clip(u - u0, 0.0, 1.0)
    fv = jnp.clip(v - v0, 0.0, 1.0)
    w00 = (1 - fu) * (1 - fv)
    w01 = fu * (1 - fv)
    w10 = (1 - fu) * fv
    w11 = fu * fv
    if img.ndim == 3:
        w00, w01, w10, w11 = (x[..., None] for x in (w00, w01, w10, w11))
    val = (
        w00 * img[v0, u0] + w01 * img[v0, u0 + 1]
        + w10 * img[v0 + 1, u0] + w11 * img[v0 + 1, u0 + 1]
    )
    ok = (
        valid_map[v0, u0] & valid_map[v0, u0 + 1]
        & valid_map[v0 + 1, u0] & valid_map[v0 + 1, u0 + 1]
    )
    return val, ok


def normal_map(vertices: jax.Array) -> jax.Array:
    """Central-difference surface normals from a vertex map (H, W, 3).

    Normals point toward the camera (negative z hemisphere), unit length;
    invalid where any stencil vertex is invalid (z == 0).
    """
    vz = vertices[..., 2]
    right = jnp.roll(vertices, -1, axis=1)
    left = jnp.roll(vertices, 1, axis=1)
    down = jnp.roll(vertices, -1, axis=0)
    up = jnp.roll(vertices, 1, axis=0)
    du = right - left
    dv = down - up
    n = jnp.cross(du, dv)
    norm = jnp.linalg.norm(n, axis=-1, keepdims=True)
    n = n / jnp.maximum(norm, 1e-12)
    # orient toward camera: camera looks down +z, so normals face -z
    flip = jnp.where(n[..., 2:3] > 0, -1.0, 1.0)
    n = n * flip
    valid = (
        (vz > 0)
        & (right[..., 2] > 0)
        & (left[..., 2] > 0)
        & (down[..., 2] > 0)
        & (up[..., 2] > 0)
        & (norm[..., 0] > 1e-12)
    )
    # zero-out borders (roll wraps around) and invalid stencils
    h, w = vz.shape
    u, v = pixel_grid(h, w, vz.dtype)
    interior = (u > 0) & (u < w - 1) & (v > 0) & (v < h - 1)
    valid = valid & interior
    return jnp.where(valid[..., None], n, 0.0)


def downsample_depth(depth_m: jax.Array) -> jax.Array:
    """2x halve a depth map, validity-aware (mean of valid pixels in 2x2).

    Plain average pooling would smear invalid (0) depth into neighbours; this
    averages only valid samples, keeping 0 where the whole block is invalid.
    """
    h, w = depth_m.shape
    d = depth_m.reshape(h // 2, 2, w // 2, 2)
    valid = (d > 0).astype(depth_m.dtype)
    s = jnp.sum(d * valid, axis=(1, 3))
    c = jnp.sum(valid, axis=(1, 3))
    return jnp.where(c > 0, s / jnp.maximum(c, 1.0), 0.0)


def downsample_intensity(img: jax.Array) -> jax.Array:
    """2x average-pool an intensity image (H, W)."""
    h, w = img.shape
    return img.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))


def bilateral_depth_filter(
    depth_m: jax.Array,
    radius: int = 2,
    sigma_space: float = 1.5,
    sigma_depth: float = 0.05,
) -> jax.Array:
    """Edge-preserving depth smoothing (KinectFusion-style preprocessing).

    A small fixed-window bilateral filter expressed as a static stencil sum —
    XLA fuses the (2r+1)^2 shifted adds into one pass. Invalid (0) depth
    neither contributes nor gets filled.
    """
    acc = jnp.zeros_like(depth_m)
    wacc = jnp.zeros_like(depth_m)
    center_valid = depth_m > 0
    for dy in range(-radius, radius + 1):
        for dx in range(-radius, radius + 1):
            shifted = jnp.roll(depth_m, (dy, dx), axis=(0, 1))
            valid = shifted > 0
            w_s = jnp.exp(-(dx * dx + dy * dy) / (2.0 * sigma_space * sigma_space))
            diff = shifted - depth_m
            w_d = jnp.exp(-(diff * diff) / (2.0 * sigma_depth * sigma_depth))
            w = jnp.where(valid & center_valid, w_s * w_d, 0.0)
            acc = acc + w * shifted
            wacc = wacc + w
    return jnp.where(wacc > 1e-12, acc / jnp.maximum(wacc, 1e-12), 0.0)


def image_gradients(img: jax.Array) -> jax.Array:
    """Central-difference gradients (H, W, 2) = (d/du, d/dv); zero at borders."""
    gx = 0.5 * (jnp.roll(img, -1, axis=1) - jnp.roll(img, 1, axis=1))
    gy = 0.5 * (jnp.roll(img, -1, axis=0) - jnp.roll(img, 1, axis=0))
    h, w = img.shape
    u, v = pixel_grid(h, w, img.dtype)
    interior = (u > 0) & (u < w - 1) & (v > 0) & (v < h - 1)
    return jnp.where(interior[..., None], jnp.stack([gx, gy], axis=-1), 0.0)


@functools.partial(jax.jit, static_argnames=("cam", "levels", "filter_depth"))
def build_frame_pyramid(
    depth_raw: jax.Array,
    cam: CameraIntrinsics,
    levels: int = 3,
    filter_depth: bool = True,
    rgb: jax.Array | None = None,
):
    """Depth (+ optional RGB) image -> per-level frame pyramid.

    Each level dict has: depth (m), vertices, normals, valid — and, when
    `rgb` is given, intensity in [0, 1] plus its (du, dv) gradients for the
    photometric odometry term. Finest level first; level k is (H/2^k, W/2^k).
    """
    depth_m = depth_to_metres(depth_raw, cam)
    if filter_depth:
        depth_m = bilateral_depth_filter(depth_m)
    intensity = None if rgb is None else rgb_to_intensity(rgb) / 255.0
    pyr = []
    d = depth_m
    level_cam = cam
    for k in range(levels):
        verts = backproject(d, level_cam)
        norms = normal_map(verts)
        valid = (verts[..., 2] > 0) & (jnp.sum(norms * norms, axis=-1) > 0.5)
        level = {
            "depth": d,
            "vertices": verts,
            "normals": norms,
            "valid": valid,
        }
        if intensity is not None:
            level["intensity"] = intensity
            level["grad"] = image_gradients(intensity)
        pyr.append(level)
        if k + 1 < levels:
            d = downsample_depth(d)
            if intensity is not None:
                intensity = downsample_intensity(intensity)
            level_cam = cam.scaled(2.0 ** (k + 1))
    return tuple(pyr)


def rgb_to_intensity(rgb: jax.Array) -> jax.Array:
    """RGB888 (H, W, 3) uint8 -> float32 grayscale in [0, 255].

    Replaces the reference's per-pixel RGB->BGR loop (`SLAM.cpp:138-148`)
    with one fused op; we keep RGB order throughout (no BGR anywhere).
    """
    r = rgb[..., 0].astype(jnp.float32)
    g = rgb[..., 1].astype(jnp.float32)
    b = rgb[..., 2].astype(jnp.float32)
    return 0.299 * r + 0.587 * g + 0.114 * b
