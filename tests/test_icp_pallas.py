"""Fused ICP GN Pallas kernel vs the XLA roll-stencil reference.

Runs in interpret mode on CPU (conftest forces the CPU backend); the same
kernel is compiled by Mosaic on TPU, where `bench.py` exercises it at the
full 640x480 operating point.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from slam_rgbd_tpu.core import camera
from slam_rgbd_tpu.core.config import CameraIntrinsics, ICPConfig
from slam_rgbd_tpu.odometry import icp
from slam_rgbd_tpu.ops import icp_pallas as ip


def _scene(cam, shift=(0, 0), seed=0, holes=True):
    rng = np.random.default_rng(seed)
    h, w = cam.height, cam.width
    u, v = np.meshgrid(np.arange(w), np.arange(h))
    depth = (1400 + 320 * np.sin(u / 15.0) + 240 * np.cos(v / 11.0)).astype(
        np.uint16
    )
    if holes:
        depth[h // 4 : h // 4 + 6, w // 3 : w // 3 + 20] = 0
    rgb = (
        (128 + 90 * np.sin(u / 5.0) * np.cos(v / 7.0))
        .clip(0, 255)
        .astype(np.uint8)[..., None]
        .repeat(3, -1)
    )
    depth2 = np.roll(depth, shift, (0, 1))
    rgb2 = np.roll(rgb, shift, (0, 1))
    pyr_t = camera.build_frame_pyramid(
        jnp.asarray(depth), cam, levels=1, rgb=jnp.asarray(rgb)
    )
    pyr_s = camera.build_frame_pyramid(
        jnp.asarray(depth2), cam, levels=1, rgb=jnp.asarray(rgb2)
    )
    return pyr_s[0], pyr_t[0]


def _compare(cam, cfg, radius, T, src, tgt):
    h, w = cam.height, cam.width
    level = icp._pack_level(src, tgt)
    _, up, vp, _ = icp._project_level(T, level["src_verts"], cam)
    mu_u, mu_v = icp.flow_shift(up, vp, h, w)
    H0, g0, inl0, sq0 = icp._normal_equations(
        T, level, cam, cfg, radius, shift=(mu_u, mu_v)
    )
    th, n_tiles, w_pad = ip.plan_tiles(h, w, radius)
    srcp = ip.build_source_planes(src, th, n_tiles, w_pad)
    tgtp = ip.build_target_planes(tgt, mu_u, mu_v, radius, th, n_tiles, w_pad)
    scal = ip.pack_scalars(T, mu_u, mu_v)
    H1, g1, inl1, sq1 = ip.gn_reduce(
        scal, srcp, tgtp, cam, cfg, radius, (h, w), interpret=True
    )
    assert int(inl0) == int(inl1), "inlier sets must match exactly"
    # float32 reduction order differs (row-tiled vs full-image): compare
    # relative to the block scale, not entry-wise.
    h_scale = max(1.0, float(jnp.max(jnp.abs(H0))))
    np.testing.assert_allclose(
        np.asarray(H1) / h_scale, np.asarray(H0) / h_scale, atol=2e-6
    )
    scale = max(1.0, float(jnp.max(jnp.abs(g0))))
    np.testing.assert_allclose(
        np.asarray(g1) / scale, np.asarray(g0) / scale, atol=5e-5
    )
    np.testing.assert_allclose(float(sq1), float(sq0), rtol=1e-4)
    return n_tiles


def test_gn_reduce_matches_xla_single_tile():
    cam = CameraIntrinsics(fx=80.0, fy=80.0, cx=63.5, cy=31.5, width=128, height=64)
    cfg = ICPConfig(levels=1, iters=(2,), window_px=(2,))
    src, tgt = _scene(cam, shift=(1, 2))
    T = jnp.eye(4).at[0, 3].set(0.01).at[1, 3].set(-0.004)
    n_tiles = _compare(cam, cfg, 2, T, src, tgt)
    assert n_tiles == 1


def test_gn_reduce_matches_xla_multi_tile_padded():
    # 512 wide / 200 tall: multiple row tiles, last tile padded; the
    # double-buffered DMA and the grid accumulation both get exercised.
    cam = CameraIntrinsics(
        fx=120.0, fy=120.0, cx=255.5, cy=99.5, width=512, height=200
    )
    cfg = ICPConfig(levels=1, iters=(2,), window_px=(2,))
    src, tgt = _scene(cam, shift=(-2, 3), seed=1)
    T = jnp.eye(4).at[1, 3].set(0.008)
    n_tiles = _compare(cam, cfg, 2, T, src, tgt)
    assert n_tiles >= 2


def test_gn_reduce_radius4_unaligned_width():
    # width 192 pads to 256 lanes; radius-4 stencil (100 terms).
    cam = CameraIntrinsics(fx=90.0, fy=90.0, cx=95.5, cy=47.5, width=192, height=96)
    cfg = ICPConfig(levels=1, iters=(2,), window_px=(4,))
    src, tgt = _scene(cam, shift=(2, -3), seed=2)
    _compare(cam, cfg, 4, jnp.eye(4), src, tgt)


def test_gn_reduce_batched_matches_single():
    """Grid-(B, n_tiles) batched kernel == B single-problem dispatches,
    bit-for-bit (same tile schedule; different scenes AND poses per
    problem so the batch axis carries real variation)."""
    cam = CameraIntrinsics(
        fx=120.0, fy=120.0, cx=127.5, cy=63.5, width=256, height=128
    )
    cfg = ICPConfig(levels=1, iters=(2,), window_px=(2,))
    radius = 2
    h, w = cam.height, cam.width
    th, n_tiles, w_pad = ip.plan_tiles(h, w, radius)
    Ts = [
        jnp.eye(4).at[0, 3].set(0.01),
        jnp.eye(4).at[1, 3].set(-0.008).at[2, 3].set(0.004),
    ]
    srcs, tgts, scals, singles = [], [], [], []
    for i, T in enumerate(Ts):
        src, tgt = _scene(cam, shift=(i + 1, 2 - i), seed=10 + i)
        srcs.append(ip.build_source_planes(src, th, n_tiles, w_pad))
        tgts.append(
            ip.build_target_planes(
                tgt, jnp.int32(0), jnp.int32(0), radius, th, n_tiles, w_pad
            )
        )
        scals.append(ip.pack_scalars(T, jnp.float32(0), jnp.float32(0)))
        singles.append(
            ip.gn_reduce(
                scals[-1], srcs[-1], tgts[-1], cam, cfg, radius, (h, w),
                interpret=True,
            )
        )
    Hb, gb, ib, sb = ip.gn_reduce_batched(
        jnp.concatenate(scals), jnp.stack(srcs), jnp.stack(tgts),
        cam, cfg, radius, (h, w), interpret=True,
    )
    for i, (H, g, inl, sq) in enumerate(singles):
        assert int(inl) == int(ib[i])
        np.testing.assert_array_equal(np.asarray(H), np.asarray(Hb[i]))
        np.testing.assert_array_equal(np.asarray(g), np.asarray(gb[i]))
        np.testing.assert_array_equal(float(sq), float(sb[i]))


@pytest.mark.parametrize("backend", ["xla", "pallas"])
def test_icp_align_batched_matches_per_item(backend):
    """`icp_align_batched` == per-item `icp_align` on both GN backends
    (the batched program is what `batch_track`/`BatchSession` run)."""
    cam = CameraIntrinsics(
        fx=90.0, fy=90.0, cx=63.5, cy=47.5, width=128, height=96
    )
    cfg = ICPConfig(
        levels=2, iters=(3, 2), window_px=(4, 2), backend=backend
    )
    import jax as _jax

    srcs, tgts = [], []
    for i in range(2):
        rng_shift = [(1, 2), (-2, 1)][i]
        h, w = cam.height, cam.width
        u, v = np.meshgrid(np.arange(w), np.arange(h))
        depth = (
            1300 + 350 * np.sin(u / 12.0 + i) * np.cos(v / 9.0)
        ).astype(np.uint16)
        rgb = (
            (128 + 100 * np.cos(u / 4.0) * np.sin(v / 6.0 + i))
            .clip(0, 255).astype(np.uint8)[..., None].repeat(3, -1)
        )
        tgts.append(camera.build_frame_pyramid(
            jnp.asarray(depth), cam, levels=2, rgb=jnp.asarray(rgb)
        ))
        srcs.append(camera.build_frame_pyramid(
            jnp.asarray(np.roll(depth, rng_shift, (0, 1))), cam, levels=2,
            rgb=jnp.asarray(np.roll(rgb, rng_shift, (0, 1))),
        ))
    T0s = [jnp.eye(4), jnp.eye(4).at[0, 3].set(0.005)]
    singles = [
        icp.icp_align(srcs[i], tgts[i], T0s[i], cam, cfg) for i in range(2)
    ]
    src_b = _jax.tree.map(lambda *xs: jnp.stack(xs), *srcs)
    tgt_b = _jax.tree.map(lambda *xs: jnp.stack(xs), *tgts)
    rb = icp.icp_align_batched(src_b, tgt_b, jnp.stack(T0s), cam, cfg)
    for i, r in enumerate(singles):
        np.testing.assert_allclose(
            np.asarray(rb.T[i]), np.asarray(r.T), atol=1e-5
        )
        assert abs(int(rb.inliers[i]) - int(r.inliers)) <= max(
            2, 0.02 * int(r.inliers)
        )


def test_icp_align_pallas_matches_xla_pose():
    cam = CameraIntrinsics(fx=90.0, fy=90.0, cx=63.5, cy=47.5, width=128, height=96)
    common = dict(levels=2, iters=(4, 3), window_px=(4, 2))
    rng = np.random.default_rng(3)
    h, w = cam.height, cam.width
    u, v = np.meshgrid(np.arange(w), np.arange(h))
    depth = (1300 + 350 * np.sin(u / 12.0) * np.cos(v / 9.0)).astype(np.uint16)
    rgb = (
        (128 + 100 * np.cos(u / 4.0) * np.sin(v / 6.0))
        .clip(0, 255)
        .astype(np.uint8)[..., None]
        .repeat(3, -1)
    )
    pyr_t = camera.build_frame_pyramid(
        jnp.asarray(depth), cam, levels=2, rgb=jnp.asarray(rgb)
    )
    depth2 = np.roll(depth, (1, 2), (0, 1))
    rgb2 = np.roll(rgb, (1, 2), (0, 1))
    pyr_s = camera.build_frame_pyramid(
        jnp.asarray(depth2), cam, levels=2, rgb=jnp.asarray(rgb2)
    )
    rx = icp.icp_align(
        pyr_s, pyr_t, jnp.eye(4), cam, ICPConfig(backend="xla", **common)
    )
    rp = icp.icp_align(
        pyr_s, pyr_t, jnp.eye(4), cam, ICPConfig(backend="pallas", **common)
    )
    # Same estimator, slightly different dominant-flow schedule (per-level
    # vs per-iteration): poses agree tightly but not bit-for-bit.
    np.testing.assert_allclose(np.asarray(rp.T), np.asarray(rx.T), atol=5e-4)
    assert int(rp.inliers) > 0.8 * int(rx.inliers)
