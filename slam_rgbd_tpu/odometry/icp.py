"""Dense projective-association ICP (point-to-plane + photometric) odometry.

This is the native replacement for the tracking capability the reference
delegates to ORB-SLAM3's `TrackRGBD` (`Youth.Source/AlgorithmModule/SLAM.cpp:54`),
re-designed for TPU:

  * Association is *projective*: every source pixel is transformed by the
    current pose estimate and matched to the target surface at its
    projected location. The per-pixel map over 307k pixels is the
    TPU-shaped replacement for the reference's hottest loop
    (`viewerModule.c:336-357`, SURVEY.md §3.2).
  * **No random gathers.** XLA/TPU gathers over image-sized index sets run
    ~100x below streaming bandwidth (measured: 76 ms/iteration at 640x480).
    Instead, sub-pixel bilinear sampling is evaluated as a
    bounded-displacement *weighted roll stencil*: after coarse-to-fine
    initialization the projective flow is a few pixels, so

        bilinear(img, u+du_f, v+dv_f)
          = sum_{dv, du in window} hat(dv_f - dv) hat(du_f - du)
                                   * img shifted by (dv, du)

    which is exact (hat = bilinear weights) and runs as (2D+2)^2 fused
    shift-FMA passes on the VPU — pure streaming, HBM-bound. Displacement
    beyond the per-level window (`ICPConfig.window_px`) gates the pixel out
    (association failure), which coarse-to-fine + the motion prior makes
    rare. The Pallas kernel in `ops/` keeps the window resident in VMEM to
    remove the per-term HBM re-reads.
  * The energy combines point-to-plane geometry with a DVO-style intensity
    term in one 6x6 Gauss-Newton system; Huber weights; fixed iteration
    counts (`lax.fori_loop`); everything static-shaped and jitted once.

Math: left-multiplicative update T <- exp(delta) @ T with twist delta=(v, w).
For source point y = T p_s associated to target point q with target normal n:

    r_geo = n . (y - q)        J_geo = [n, y x n]
    r_pho = I_t(pi(y)) - i_s   J_pho = [g, y x g],  g = dI/du * du/dy

Solving (J^T W J + lambda I) delta = -J^T W r and composing.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_rgbd_tpu.core import se3
from slam_rgbd_tpu.core.camera import pixel_grid
from slam_rgbd_tpu.core.config import CameraIntrinsics, ICPConfig


class ICPResult(NamedTuple):
    """Pose + diagnostics from one ICP solve (all device scalars)."""

    T: jax.Array  # (4, 4) refined transform source->target camera frame
    inliers: jax.Array  # () int32 — associated pixels at finest level
    rmse: jax.Array  # () float32 — robust residual RMSE at finest level
    valid_fraction: jax.Array  # () float32 — inliers / valid source pixels


def flow_shift(up: jax.Array, vp: jax.Array, h: int, w: int):
    """Dominant-flow estimate: rounded masked mean of the projective flow.

    Shared by the XLA roll-stencil and the fused Pallas kernel so both
    paths shift the target by the identical (mu_u, mu_v).
    """
    u_grid, v_grid = pixel_grid(h, w, up.dtype)
    mm = ((up > 0) & (up < w - 1) & (vp > 0) & (vp < h - 1)).astype(up.dtype)
    msum = jnp.maximum(jnp.sum(mm), 1.0)
    mu_u = jnp.round(jnp.sum((up - u_grid) * mm) / msum).astype(jnp.int32)
    mu_v = jnp.round(jnp.sum((vp - v_grid) * mm) / msum).astype(jnp.int32)
    return mu_u, mu_v


def _project_level(T: jax.Array, src_verts: jax.Array, cam: CameraIntrinsics):
    """Transform + pinhole-project source vertices under pose T."""
    y = se3.transform_points(T, src_verts)
    z_safe = jnp.maximum(y[..., 2], 1e-6)
    up = cam.fx * y[..., 0] / z_safe + cam.cx
    vp = cam.fy * y[..., 1] / z_safe + cam.cy
    return y, up, vp, z_safe


def windowed_bilinear(
    channels: jax.Array,  # (H, W, C) packed target maps
    valid: jax.Array,  # (H, W) target validity
    up: jax.Array,  # (H, W) absolute target u coord per source pixel
    vp: jax.Array,  # (H, W) absolute target v coord per source pixel
    radius: int,
    mean_mask: jax.Array | None = None,  # (H, W) pixels to estimate flow on
    shift: tuple | None = None,  # fixed (mu_u, mu_v) override
):
    """Exact bilinear sampling via a mean-shift + bounded roll stencil.

    The association displacement equals the full inter-frame optical flow
    (it does NOT shrink as the pose converges), so a fixed stencil window
    would cap the trackable motion. The *dominant* flow is removed first
    with one dynamically-shifted roll (jnp.roll takes traced shifts); the
    stencil then only has to cover flow *variation* across the image
    (parallax + rotation gradients), which is small and level-bounded.

    Returns (values (H, W, C), ok (H, W)): `ok` requires full bilinear
    support inside the window and image and all four corners valid.
    Residual displacement beyond `radius` yields ok=False (association
    failure), never a wrong sample.
    """
    h, w = valid.shape
    u_grid, v_grid = pixel_grid(h, w, up.dtype)
    du_f = up - u_grid
    dv_f = vp - v_grid

    if shift is not None:
        mu_u, mu_v = shift
    elif mean_mask is not None:
        mm = mean_mask.astype(up.dtype)
        msum = jnp.maximum(jnp.sum(mm), 1.0)
        mu_u = jnp.round(jnp.sum(du_f * mm) / msum).astype(jnp.int32)
        mu_v = jnp.round(jnp.sum(dv_f * mm) / msum).astype(jnp.int32)
    else:
        mu_u, mu_v = flow_shift(up, vp, h, w)
    # validity rides as an extra CHANNEL: one rolled array per stencil
    # term instead of two (the validity sum is just its accumulator row)
    chan_v = jnp.concatenate(
        [channels, valid.astype(channels.dtype)[..., None]], axis=-1
    )
    chan_v = jnp.roll(chan_v, (-mu_v, -mu_u), axis=(0, 1))
    du_f = du_f - mu_u
    dv_f = dv_f - mu_v
    # absolute target coords for the in-bounds checks (roll wrap = OOB)
    u_abs = u_grid + mu_u
    v_abs = v_grid + mu_v

    # Effective 1-D weights with the bounds checks folded in (the
    # bilinear weight is separable: wgt = wu_eff[du] * wv_eff[dv]) — the
    # (2R+2)^2-term loop then does one multiply + (C+1) FMAs per term,
    # and the weight sum is the product of the two 1-D sums. Same
    # restructuring as the fused Pallas kernel (`ops/icp_pallas.py`).
    offs = list(range(-radius, radius + 2))
    wu_eff = [
        jnp.where(
            (u_abs + du >= 0) & (u_abs + du < w),
            jnp.maximum(0.0, 1.0 - jnp.abs(du_f - du)), 0.0,
        )
        for du in offs
    ]
    wv_eff = [
        jnp.where(
            (v_abs + dv >= 0) & (v_abs + dv < h),
            jnp.maximum(0.0, 1.0 - jnp.abs(dv_f - dv)), 0.0,
        )
        for dv in offs
    ]
    wsum = sum(wu_eff) * sum(wv_eff)

    acc = jnp.zeros_like(chan_v)
    for idv, dv in enumerate(offs):
        for idu, du in enumerate(offs):
            wgt = wu_eff[idu] * wv_eff[idv]
            shifted = jnp.roll(chan_v, (-dv, -du), axis=(0, 1))
            acc = acc + wgt[..., None] * shifted
    ok = (wsum > 0.999) & (acc[..., -1] > 0.999)
    return acc[..., :-1], ok


def _pack_level(src: dict, tgt: dict):
    """Precompute the per-level arrays the GN iterations consume.

    Target channels are packed into one (H, W, C) array so every stencil
    term is a single fused shift-FMA: verts(3) + normals(3) [+ intensity(1)
    + grad(2)].
    """
    has_rgb = "intensity" in src
    tgt_parts = [tgt["vertices"], tgt["normals"]]
    if has_rgb:
        tgt_parts += [tgt["intensity"][..., None], tgt["grad"]]
    level = {
        "src_verts": src["vertices"],
        "src_normals": src["normals"],
        "src_valid": src["valid"],
        "tgt_channels": jnp.concatenate(tgt_parts, axis=-1),
        "tgt_valid": tgt["valid"],
    }
    if has_rgb:
        level["src_intensity"] = src["intensity"]
    return level


def _normal_equations(T: jax.Array, level: dict, cam: CameraIntrinsics,
                      cfg: ICPConfig, radius: int, shift: tuple | None = None):
    """Build (H 6x6, g 6, inliers, sq_res_sum) for one GN iteration."""
    src_verts = level["src_verts"]  # (H, W, 3)
    has_rgb = "src_intensity" in level

    # Transform source into target frame and project.
    y, up, vp, z_safe = _project_level(T, src_verts, cam)
    n_src = se3.rotate_vectors(T, level["src_normals"])
    x_c, y_c, z_c = y[..., 0], y[..., 1], y[..., 2]
    in_front = z_c > cam.min_depth

    sampled, samp_ok = windowed_bilinear(
        level["tgt_channels"], level["tgt_valid"], up, vp, radius, shift=shift
    )
    q = sampled[..., 0:3]
    n = sampled[..., 3:6]
    n = n / jnp.maximum(jnp.linalg.norm(n, axis=-1, keepdims=True), 1e-9)

    # Association gates (distance / normal agreement / validity).
    diff = y - q
    dist_ok = jnp.sum(diff * diff, axis=-1) < cfg.max_dist * cfg.max_dist
    cos_thresh = jnp.cos(jnp.deg2rad(cfg.max_normal_angle_deg))
    angle_ok = jnp.sum(n * n_src, axis=-1) > cos_thresh
    mask = level["src_valid"] & in_front & samp_ok & dist_ok & angle_ok

    # Geometric point-to-plane residual and Jacobian.
    r = jnp.sum(n * diff, axis=-1)  # (H, W)
    J = jnp.concatenate([n, jnp.cross(y, n)], axis=-1)  # (H, W, 6)

    abs_r = jnp.abs(r)
    wgt = jnp.where(abs_r <= cfg.huber_delta, 1.0, cfg.huber_delta / jnp.maximum(abs_r, 1e-12))
    wgt = jnp.where(mask, wgt, 0.0)

    Jf = J.reshape(-1, 6)
    wf = wgt.reshape(-1)
    rf = r.reshape(-1)
    Jw = Jf * wf[:, None]
    H = Jw.T @ Jf  # (6, 6) — MXU-friendly contraction
    g = Jw.T @ rf  # (6,)
    inliers = jnp.sum(mask)
    sq_sum = jnp.sum(wgt * r * r)

    if has_rgb and cfg.rgb_weight > 0.0:
        # Photometric block: r_I = I_tgt(pi(y)) - I_src(x).
        i_tgt = sampled[..., 6]
        grad = sampled[..., 7:9]
        r_i = i_tgt - level["src_intensity"]
        gx, gy = grad[..., 0], grad[..., 1]
        a = gx * cam.fx / z_safe
        b = gy * cam.fy / z_safe
        c = -(a * x_c + b * y_c) / z_safe
        gvec = jnp.stack([a, b, c], axis=-1)
        J_i = jnp.concatenate([gvec, jnp.cross(y, gvec)], axis=-1)
        abs_ri = jnp.abs(r_i)
        w_i = jnp.where(abs_ri <= cfg.rgb_huber, 1.0, cfg.rgb_huber / jnp.maximum(abs_ri, 1e-12))
        w_i = jnp.where(mask, w_i * cfg.rgb_weight, 0.0)
        Jif = J_i.reshape(-1, 6)
        wif = w_i.reshape(-1)
        rif = r_i.reshape(-1)
        Jw_i = Jif * wif[:, None]
        H = H + Jw_i.T @ Jif
        g = g + Jw_i.T @ rif

    return H, g, inliers, sq_sum


def _apply_update(T, H, g, inliers, cfg: ICPConfig):
    """Damped 6x6 GN solve and left-multiplicative pose update."""
    # Levenberg damping scaled to the diagonal for float32 conditioning.
    diag = jnp.diagonal(H)
    Hd = H + jnp.diag(cfg.damping * jnp.maximum(diag, 1.0))
    # 6x6 solve via Cholesky; fall back to identity step when degenerate.
    delta = jax.scipy.linalg.cho_solve(jax.scipy.linalg.cho_factor(Hd), -g)
    ok = jnp.all(jnp.isfinite(delta)) & (inliers > 6)
    delta = jnp.where(ok, delta, 0.0)
    return se3.normalize_rotation(se3.exp(delta) @ T)


def _gn_step(T, level, cam, cfg: ICPConfig, radius: int):
    H, g, inliers, sq_sum = _normal_equations(T, level, cam, cfg, radius)
    T_new = _apply_update(T, H, g, inliers, cfg)
    return T_new, inliers, sq_sum


def _pallas_level(cfg: ICPConfig, radius: int, h: int, w: int) -> bool:
    """Run this pyramid level through the fused Pallas GN kernel?

    The kernel statically unrolls the (2R+2)^2 association stencil, so it
    is reserved for the post-coarse levels where the dominant-flow shift
    leaves only a small residual window; the coarsest level keeps the XLA
    path with its per-iteration flow re-estimate.
    """
    if cfg.backend == "xla":
        return False
    if cfg.backend == "auto" and jax.default_backend() != "tpu":
        return False
    return radius <= 8 and min(h, w) >= 32


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def icp_align(
    src_pyr: tuple,
    tgt_pyr: tuple,
    T_init: jax.Array,
    cam: CameraIntrinsics,
    cfg: ICPConfig,
) -> ICPResult:
    """Coarse-to-fine point-to-plane + photometric alignment.

    `src_pyr` / `tgt_pyr` are `build_frame_pyramid` outputs (finest level
    first). Returns T mapping source-camera coordinates into target-camera
    coordinates (i.e. the relative pose of source expressed in target).
    """
    levels = len(src_pyr)

    def run_level(T, inliers, sq_sum, k):
        """All GN iterations of pyramid level k (static unroll per level)."""
        level_cam = cam.scaled(2.0**k)
        level = _pack_level(src_pyr[k], tgt_pyr[k])
        # iters/window tuples are coarse -> fine: index 0 = coarsest level.
        ci = min(levels - 1 - k, len(cfg.iters) - 1)
        n_iters = cfg.iters[ci]
        radius = cfg.window_px[min(ci, len(cfg.window_px) - 1)]
        h, w = level["tgt_valid"].shape

        if _pallas_level(cfg, radius, h, w):
            from slam_rgbd_tpu.ops import icp_pallas as ip

            th, n_tiles, w_pad = ip.plan_tiles(h, w, radius)
            srcp = ip.build_source_planes(src_pyr[k], th, n_tiles, w_pad)
            interp = jax.default_backend() != "tpu"
            # The coarsest level runs before any alignment, so its dominant
            # flow moves across GN iterations: re-estimate mu and re-roll
            # the target every iteration (cheap at 1/4^k resolution —
            # identical association semantics to the XLA path). Finer
            # levels start near-converged: shift once per level and let the
            # stencil window absorb the within-level drift.
            per_iter_mu = k == levels - 1
            if per_iter_mu:
                tgt_level = tgt_pyr[k]
                src_verts = level["src_verts"]

                def body(_, carry, src_verts=src_verts, srcp=srcp,
                         tgt_level=tgt_level, level_cam=level_cam,
                         radius=radius, th=th, n_tiles=n_tiles, w_pad=w_pad,
                         h=h, w=w, interp=interp):
                    T, _, _ = carry
                    _, up, vp, _ = _project_level(T, src_verts, level_cam)
                    mu_u, mu_v = flow_shift(up, vp, h, w)
                    tgtp = ip.build_target_planes(
                        tgt_level, mu_u, mu_v, radius, th, n_tiles, w_pad
                    )
                    scal = ip.pack_scalars(T, mu_u, mu_v)
                    H, g, inl, ss = ip.gn_reduce(
                        scal, srcp, tgtp, level_cam, cfg, radius, (h, w),
                        interpret=interp,
                    )
                    return (_apply_update(T, H, g, inl, cfg), inl, ss)
            else:
                _, up, vp, _ = _project_level(T, level["src_verts"], level_cam)
                mu_u, mu_v = flow_shift(up, vp, h, w)
                tgtp = ip.build_target_planes(
                    tgt_pyr[k], mu_u, mu_v, radius, th, n_tiles, w_pad
                )

                def body(_, carry, srcp=srcp, tgtp=tgtp, mu_u=mu_u,
                         mu_v=mu_v, level_cam=level_cam, radius=radius,
                         h=h, w=w, interp=interp):
                    T, _, _ = carry
                    scal = ip.pack_scalars(T, mu_u, mu_v)
                    H, g, inl, ss = ip.gn_reduce(
                        scal, srcp, tgtp, level_cam, cfg, radius, (h, w),
                        interpret=interp,
                    )
                    return (_apply_update(T, H, g, inl, cfg), inl, ss)
        else:

            def body(_, carry, level=level, level_cam=level_cam, radius=radius):
                T, _, _ = carry
                T_new, inl, ss = _gn_step(T, level, level_cam, cfg, radius)
                return (T_new, inl, ss)

        return jax.lax.fori_loop(0, n_iters, body, (T, inliers, sq_sum))

    # Coarsest level: multi-hypothesis initialization (see
    # `ICPConfig.hypotheses`). Each candidate runs the full coarse solve;
    # the one with most inliers seeds the finer levels. The identity
    # hypothesis bounds the damage of a wrong prior (sweep turnaround,
    # post-divergence garbage) to ONE level's extra work instead of a
    # multi-frame tracking cascade.
    k0 = levels - 1
    n_hyp = min(max(cfg.hypotheses, 1), 3)
    if n_hyp > 1:
        cands = [
            T_init,
            jnp.eye(4, dtype=T_init.dtype),
            se3.normalize_rotation(se3.inverse(T_init)),
        ][:n_hyp]
        outs = [run_level(c, jnp.int32(0), jnp.float32(0.0), k0) for c in cands]
        inl_stack = jnp.stack([o[1] for o in outs])
        best = jnp.argmax(inl_stack)
        T = jnp.take(jnp.stack([o[0] for o in outs]), best, axis=0)
        inliers = jnp.take(inl_stack, best)
        sq_sum = jnp.take(jnp.stack([o[2] for o in outs]), best)
    else:
        T, inliers, sq_sum = run_level(
            T_init, jnp.int32(0), jnp.float32(0.0), k0
        )
    for k in range(levels - 2, -1, -1):  # remaining levels coarse -> fine
        T, inliers, sq_sum = run_level(T, inliers, sq_sum, k)

    valid_src = jnp.sum(src_pyr[0]["valid"])
    rmse = jnp.sqrt(sq_sum / jnp.maximum(inliers, 1))
    return ICPResult(
        T=T,
        inliers=inliers,
        rmse=rmse,
        valid_fraction=inliers / jnp.maximum(valid_src, 1),
    )


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def icp_align_batched(
    src_pyr: tuple,
    tgt_pyr: tuple,
    T_init: jax.Array,  # (B, 4, 4)
    cam: CameraIntrinsics,
    cfg: ICPConfig,
) -> ICPResult:
    """Coarse-to-fine alignment for B independent problems in one program.

    Same math as `icp_align` with a leading batch axis on every pyramid
    leaf; the fused Pallas kernel runs BATCHED (`ops.icp_pallas.
    gn_reduce_batched`, grid (B, n_tiles)) instead of falling back to the
    XLA stencil — round 4's batched paths forfeited the kernel and
    collapsed to 6.5% efficiency at B=8; the batched grid holds ~1.0.
    The surrounding math (projection, flow shift, damped solve) is
    vmapped jnp code. This is the compute core of `dist.batch_track` and
    `runtime.batch_session.BatchSession` (multi-sequence throughput, the
    scaling workload of BASELINE.md:32).
    """
    levels = len(src_pyr)
    B = T_init.shape[0]

    def run_level(T, inliers, sq_sum, k):
        level_cam = cam.scaled(2.0**k)
        ci = min(levels - 1 - k, len(cfg.iters) - 1)
        n_iters = cfg.iters[ci]
        radius = cfg.window_px[min(ci, len(cfg.window_px) - 1)]
        h, w = src_pyr[k]["valid"].shape[-2:]

        if _pallas_level(cfg, radius, h, w):
            from slam_rgbd_tpu.ops import icp_pallas as ip

            th, n_tiles, w_pad = ip.plan_tiles(h, w, radius)
            srcp = jax.vmap(
                lambda s: ip.build_source_planes(s, th, n_tiles, w_pad)
            )(src_pyr[k])
            interp = jax.default_backend() != "tpu"
            src_verts = src_pyr[k]["vertices"]

            def mu_of(Tb, sv):
                _, up, vp, _ = _project_level(Tb, sv, level_cam)
                return flow_shift(up, vp, h, w)

            def solve(T, H, g, inl):
                return jax.vmap(
                    lambda t_, h_, g_, i_: _apply_update(t_, h_, g_, i_, cfg)
                )(T, H, g, inl)

            if k == levels - 1:
                # coarsest level: per-iteration flow re-estimate + re-roll
                # (same rationale as `icp_align`)
                def body(_, carry):
                    T, _, _ = carry
                    mu_u, mu_v = jax.vmap(mu_of)(T, src_verts)
                    tgtp = jax.vmap(
                        lambda tl, uu, vv: ip.build_target_planes(
                            tl, uu, vv, radius, th, n_tiles, w_pad
                        )
                    )(tgt_pyr[k], mu_u, mu_v)
                    scal = jax.vmap(
                        lambda t_, uu, vv: ip.pack_scalars(t_, uu, vv)[0]
                    )(T, mu_u, mu_v)
                    H, g, inl, ss = ip.gn_reduce_batched(
                        scal, srcp, tgtp, level_cam, cfg, radius, (h, w),
                        interpret=interp,
                    )
                    return (solve(T, H, g, inl), inl, ss)
            else:
                mu_u, mu_v = jax.vmap(mu_of)(T, src_verts)
                tgtp = jax.vmap(
                    lambda tl, uu, vv: ip.build_target_planes(
                        tl, uu, vv, radius, th, n_tiles, w_pad
                    )
                )(tgt_pyr[k], mu_u, mu_v)

                def body(_, carry, tgtp=tgtp, mu_u=mu_u, mu_v=mu_v):
                    T, _, _ = carry
                    scal = jax.vmap(
                        lambda t_, uu, vv: ip.pack_scalars(t_, uu, vv)[0]
                    )(T, mu_u, mu_v)
                    H, g, inl, ss = ip.gn_reduce_batched(
                        scal, srcp, tgtp, level_cam, cfg, radius, (h, w),
                        interpret=interp,
                    )
                    return (solve(T, H, g, inl), inl, ss)
        else:
            level = jax.vmap(lambda s, t: _pack_level(s, t))(
                src_pyr[k], tgt_pyr[k]
            )

            def body(_, carry, level=level):
                T, _, _ = carry
                return jax.vmap(
                    lambda t_, lv: _gn_step(t_, lv, level_cam, cfg, radius)
                )(T, level)

        return jax.lax.fori_loop(0, n_iters, body, (T, inliers, sq_sum))

    k0 = levels - 1
    zi = jnp.zeros((B,), jnp.int32)
    zf = jnp.zeros((B,), jnp.float32)
    n_hyp = min(max(cfg.hypotheses, 1), 3)
    if n_hyp > 1:
        eye = jnp.broadcast_to(jnp.eye(4, dtype=T_init.dtype), T_init.shape)
        cands = [
            T_init,
            eye,
            jax.vmap(lambda t: se3.normalize_rotation(se3.inverse(t)))(T_init),
        ][:n_hyp]
        outs = [run_level(c, zi, zf, k0) for c in cands]
        inl_stack = jnp.stack([o[1] for o in outs])  # (n_hyp, B)
        best = jnp.argmax(inl_stack, axis=0)  # (B,)
        bsel = best[None, :]
        T = jnp.take_along_axis(
            jnp.stack([o[0] for o in outs]), best[None, :, None, None], axis=0
        )[0]
        inliers = jnp.take_along_axis(inl_stack, bsel, axis=0)[0]
        sq_sum = jnp.take_along_axis(
            jnp.stack([o[2] for o in outs]), bsel, axis=0
        )[0]
    else:
        T, inliers, sq_sum = run_level(T_init, zi, zf, k0)
    for k in range(levels - 2, -1, -1):
        T, inliers, sq_sum = run_level(T, inliers, sq_sum, k)

    valid_src = jnp.sum(src_pyr[0]["valid"], axis=(-2, -1))
    rmse = jnp.sqrt(sq_sum / jnp.maximum(inliers, 1))
    return ICPResult(
        T=T,
        inliers=inliers,
        rmse=rmse,
        valid_fraction=inliers / jnp.maximum(valid_src, 1),
    )


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def track_frame_batched(
    prev_pyr: tuple,
    curr_pyr: tuple,
    T_world_prev: jax.Array,  # (B, 4, 4)
    T_motion_prior: jax.Array,  # (B, 4, 4)
    cam: CameraIntrinsics,
    cfg: ICPConfig,
):
    """`track_frame` for B sequences in one program (batched Pallas path).

    Same motion-sanity clamp and constant-velocity composition, applied
    per sequence."""
    res = icp_align_batched(curr_pyr, prev_pyr, T_motion_prior, cam, cfg)
    dt = jnp.linalg.norm(res.T[:, :3, 3], axis=-1)
    ok_step = (dt <= cfg.max_step_m) & jnp.all(
        jnp.isfinite(res.T), axis=(-2, -1)
    )
    eye = jnp.broadcast_to(jnp.eye(4, dtype=res.T.dtype), res.T.shape)
    T_rel = jnp.where(ok_step[:, None, None], res.T, eye)
    if cfg.drift_xi:  # fault injection (see ICPConfig.drift_xi)
        D = se3.exp(jnp.asarray(cfg.drift_xi, jnp.float32))
        T_rel = jax.vmap(lambda t: se3.normalize_rotation(t @ D))(T_rel)
    res = res._replace(
        T=T_rel,
        valid_fraction=jnp.where(ok_step, res.valid_fraction, 0.0),
    )
    T_world_curr = jax.vmap(
        lambda a, b: se3.normalize_rotation(a @ b)
    )(T_world_prev, T_rel)
    return T_world_curr, T_rel, res


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
    # Motion sanity clamp: a step beyond `max_step_m` is physically
    # impossible at sensor rate — reject it (identity step, zeroed
    # quality so the session flags the frame) rather than integrate a
    # diverged solve AND feed it to the next frame as the motion prior
    # (the mechanism behind multi-frame tracking cascades).
    dt = jnp.linalg.norm(res.T[:3, 3])
    ok_step = (dt <= cfg.max_step_m) & jnp.all(jnp.isfinite(res.T))
    T_rel = jnp.where(ok_step, res.T, jnp.eye(4, dtype=res.T.dtype))
    if cfg.drift_xi:  # fault injection (see ICPConfig.drift_xi)
        T_rel = se3.normalize_rotation(
            T_rel @ se3.exp(jnp.asarray(cfg.drift_xi, jnp.float32))
        )
    res = res._replace(
        T=T_rel,
        valid_fraction=jnp.where(ok_step, res.valid_fraction, 0.0),
    )
    T_world_curr = se3.normalize_rotation(T_world_prev @ T_rel)
    return T_world_curr, T_rel, res
