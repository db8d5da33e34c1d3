"""Sliding-window local bundle adjustment — Schur complement, batched XLA.

The BA capability the reference outsources to ORB-SLAM3's g2o backend,
re-designed as dense batched linear algebra (BASELINE.json: "distributed
bundle adjustment assembles the Schur-complement reduced camera system with
psum/all-gather collectives" — this module is the single-device core; the
`parallel/` layer wraps its assembly step in shard_map).

Formulation (standard local BA):
  * Variables: window keyframe poses T_w (W, 4, 4) (oldest held fixed as
    gauge) and map-point positions X (P, 3).
  * Residuals: reprojection r = pi(T_wc^-1 X) - uv over the (W, K)
    observation grid from `MapState.point_id` — masked, static shape.
  * Normal equations in block form:
        [ Hcc  Hcp ] [ dc ]   [ -gc ]
        [ Hcp' Hpp ] [ dp ] = [ -gp ]
    with Hpp block-diagonal (3x3 per point). The reduced camera system
        S = Hcc - Hcp Hpp^-1 Hcp',   b = -gc + Hcp Hpp^-1 gp
    is (6W, 6W); dp back-substitutes per point.
  * Assembly is einsum/scatter over all observations at once: per-point
    blocks live in (P, 3, 3)/(P, 3) arrays, camera-point coupling in a
    (P, 6W, 3) tensor (P and W are config-bounded so this is a few MB).

Pose twists use the same left-multiplicative (v, w) convention as
`core.se3` / ICP.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_rgbd_tpu.core import se3
from slam_rgbd_tpu.core.config import BAConfig, CameraIntrinsics


class BAResult(NamedTuple):
    kf_pose: jax.Array  # (W, 4, 4) refined camera-to-world poses
    pt_xyz: jax.Array  # (P, 3) refined points (only observed ones move)
    rmse_px: jax.Array  # () reprojection RMSE over inliers, pixels
    n_obs: jax.Array  # () int32 active observations
    pt_solved: jax.Array | None = None  # (P,) bool — points the solve moved
    n_dropped: jax.Array | None = None  # () int32 — observed points beyond
    # the per-window compaction budget (excluded from this pass)


def _inv3x3(M):
    """Closed-form adjugate inverse of batched 3x3 blocks.

    `jnp.linalg.inv` lowers to a batched-LU custom call that traced at
    ~1.6 ms per LM iteration for the (2049, 3, 3) Hpp table — 35% of the
    whole iteration. The cofactor form is ~40 fused elementwise ops.
    Callers pass DAMPED blocks (relative Levenberg damping on the
    diagonal), so the determinant is bounded away from zero exactly where
    the LU path was relying on the same conditioning.
    """
    a, b, c = M[..., 0, 0], M[..., 0, 1], M[..., 0, 2]
    d, e, f = M[..., 1, 0], M[..., 1, 1], M[..., 1, 2]
    g, h, i = M[..., 2, 0], M[..., 2, 1], M[..., 2, 2]
    ca = e * i - f * h
    cb = c * h - b * i
    cc = b * f - c * e
    cd = f * g - d * i
    ce = a * i - c * g
    cf = c * d - a * f
    cg = d * h - e * g
    ch = b * g - a * h
    ci = a * e - b * d
    det = a * ca + b * cd + c * cg
    inv_det = 1.0 / det
    rows = [
        jnp.stack([ca, cb, cc], axis=-1),
        jnp.stack([cd, ce, cf], axis=-1),
        jnp.stack([cg, ch, ci], axis=-1),
    ]
    return jnp.stack(rows, axis=-2) * inv_det[..., None, None]


def _reproj_residuals(poses_wc, pt_xyz, obs_uv, obs_z, obs_pid, obs_ok, cam):
    """Residuals + Jacobians for all (W, K) observations.

    RGB-D observation model: residual is 3-D — pixel reprojection (u, v)
    plus the measured DEPTH, r_z = (z_pred - z_obs) * fx / z_obs (scaled to
    pixel units, the RGB-D analogue of ORB-SLAM's stereo u_R residual).
    Without the depth term, small-baseline windows are monocular-degenerate:
    points slide along viewing rays and cameras drift centimetres while 2-D
    reprojection stays sub-pixel.

    Returns r (W,K,3), Jc (W,K,3,6), Jx (W,K,3,3), mask (W,K).
    Pose Jacobian is for a LEFT twist delta on T_cw (camera-from-world):
    p_c = exp(d) T_cw X  =>  dp_c/dd = [I | -hat(p_c)].
    """
    W, K = obs_pid.shape
    P = pt_xyz.shape[0]
    X = pt_xyz[jnp.clip(obs_pid, 0, P - 1)]  # (W, K, 3)
    T_cw = jax.vmap(se3.inverse)(poses_wc)  # (W, 4, 4)
    p_c = jnp.einsum("wij,wkj->wki", T_cw[:, :3, :3], X) + T_cw[:, None, :3, 3]
    x, y, z = p_c[..., 0], p_c[..., 1], p_c[..., 2]
    z_safe = jnp.maximum(z, 1e-3)
    u = cam.fx * x / z_safe + cam.cx
    v = cam.fy * y / z_safe + cam.cy
    z_obs_safe = jnp.maximum(obs_z, 0.1)
    zw = cam.fx / z_obs_safe  # metres -> pixel-equivalent units
    r = jnp.stack(
        [u - obs_uv[..., 0], v - obs_uv[..., 1], (z - obs_z) * zw], axis=-1
    )  # (W, K, 3)

    mask = obs_ok & (obs_pid >= 0) & (z > 0.05) & (obs_z > 0.05)

    # d(u,v,rz)/d p_c
    fx, fy = cam.fx, cam.fy
    zero = jnp.zeros_like(z_safe)
    duv_dp = jnp.stack(
        [
            jnp.stack([fx / z_safe, zero, -fx * x / (z_safe * z_safe)], axis=-1),
            jnp.stack([zero, fy / z_safe, -fy * y / (z_safe * z_safe)], axis=-1),
            jnp.stack([zero, zero, zw], axis=-1),
        ],
        axis=-2,
    )  # (W, K, 3, 3)

    # dp_c/dd for left twist on T_cw: [I | -hat(p_c)]
    def hat_batch(p):
        px, py, pz = p[..., 0], p[..., 1], p[..., 2]
        z0 = jnp.zeros_like(px)
        return jnp.stack(
            [
                jnp.stack([z0, -pz, py], axis=-1),
                jnp.stack([pz, z0, -px], axis=-1),
                jnp.stack([-py, px, z0], axis=-1),
            ],
            axis=-2,
        )

    dp_dd = jnp.concatenate(
        [
            jnp.broadcast_to(jnp.eye(3), p_c.shape[:-1] + (3, 3)),
            -hat_batch(p_c),
        ],
        axis=-1,
    )  # (W, K, 3, 6)
    Jc = jnp.einsum("wkab,wkbc->wkac", duv_dp, dp_dd)  # (W, K, 2, 6)
    # dp_c/dX = R_cw
    Jx = jnp.einsum("wkab,wbc->wkac", duv_dp, T_cw[:, :3, :3])  # (W, K, 2, 3)
    return r, Jc, Jx, mask


def _make_lm(
    window_valid, obs_uv, obs_z, obs_pid, obs_ok, cam, cfg,
    free_mask, psum_axis, P,
):
    """Build the LM machinery: returns (cost_fn, lm_iter) closures over a
    fixed observation set. Shared by the single-dispatch `local_ba` and the
    chunked windowed path (which issues iterations as separate device
    programs so concurrent frontend work can interleave on a shared chip).
    """
    W, K = obs_pid.shape
    D = 6 * W

    def _r(x):
        """Complete an observation-reduction. Under shard_map each device
        holds a K/n slice of the observation grid, so every sum over
        observations must finish with a psum over `psum_axis` — this is
        the whole distributed-BA assembly (BASELINE.json): partial
        Hpp/gp/A/Hcc blocks meet on ICI, the small solve is replicated."""
        return x if psum_axis is None else jax.lax.psum(x, psum_axis)

    obs_ok = obs_ok & window_valid[:, None]
    if free_mask is None:
        free_mask = window_valid
    # gauge: ensure at least one valid camera is anchored — if every valid
    # camera is free, pin the first valid one.
    first_valid = jnp.argmax(window_valid)
    any_fixed_valid = jnp.any(window_valid & ~free_mask)
    cam_free = window_valid & free_mask & (
        any_fixed_valid | (jnp.arange(W) != first_valid)
    )

    # Robust kernel: Tukey biweight (redescending). Huber's linear tail let
    # a few hundred 3-6 px wrong-association/bad-depth observations outvote
    # thousands of sub-pixel inliers — BA would *improve* its cost while
    # dragging cameras ~10 cm. Tukey gives outliers asymptotically zero
    # influence, so the dense consensus wins.
    c_tukey = cfg.reject_px

    def _tukey_weight(rn):
        t = jnp.clip(rn / c_tukey, 0.0, 1.0)
        return (1.0 - t * t) ** 2

    def _cost(poses, X):
        """Tukey rho-cost over observations (for LM accept/reject)."""
        r, _, _, mask = _reproj_residuals(poses, X, obs_uv, obs_z, obs_pid, obs_ok, cam)
        rn = jnp.linalg.norm(r, axis=-1)
        t2 = jnp.clip((rn / c_tukey) ** 2, 0.0, 1.0)
        rho = (c_tukey * c_tukey / 6.0) * (1.0 - (1.0 - t2) ** 3)
        return _r(jnp.sum(jnp.where(mask, rho, 0.0)))

    def lm_iter(_, state):
        poses, X, lam, cost = state
        r, Jc, Jx, mask = _reproj_residuals(poses, X, obs_uv, obs_z, obs_pid, obs_ok, cam)
        # Tukey IRLS weights (zero beyond c_tukey — hard gate included)
        rn = jnp.linalg.norm(r, axis=-1)
        w = _tukey_weight(rn)
        w = jnp.where(mask, w, 0.0)  # (W, K)
        mask = mask & (w > 0.0)

        pid_safe = jnp.where(mask, obs_pid, P)  # scatter dump slot P

        # --- point blocks: Hpp (P, 3, 3), gp (P, 3) ------------------------
        JxT_Jx = jnp.einsum("wkab,wkac->wkbc", Jx, Jx * w[..., None, None])
        JxT_r = jnp.einsum("wkab,wka->wkb", Jx * w[..., None, None], r)
        Hpp = _r(jnp.zeros((P + 1, 3, 3)).at[pid_safe].add(JxT_Jx)[:P])
        gp = _r(jnp.zeros((P + 1, 3)).at[pid_safe].add(JxT_r)[:P])
        observed = (
            _r(jnp.zeros((P + 1,), jnp.int32).at[pid_safe].add(1)[:P]) > 0
        )

        # Damped inverse of each 3x3 block. Damping must be RELATIVE to the
        # block scale: a point seen once gives a rank-2 block with entries
        # ~1e3-1e4, and an absolute 1e-4 shift is below float32 resolution
        # there (LU pivot underflows to NaN). `lam` is the live LM damping.
        tr = (Hpp[:, 0, 0] + Hpp[:, 1, 1] + Hpp[:, 2, 2]) / 3.0
        Hpp = Hpp + (lam * tr + 1e-5)[:, None, None] * jnp.eye(3)[None]
        Hpp_inv = _inv3x3(Hpp)
        Hpp_inv = jnp.where(observed[:, None, None], Hpp_inv, 0.0)

        # --- camera blocks: Hcc (W, 6, 6) -> (D, D) block-diag -------------
        JcT_Jc = jnp.einsum("wkab,wkac->wkbc", Jc, Jc * w[..., None, None])
        JcT_r = jnp.einsum("wkab,wka->wkb", Jc * w[..., None, None], r)
        Hcc_blocks = _r(jnp.sum(JcT_Jc, axis=1))  # (W, 6, 6)
        gc = _r(jnp.sum(JcT_r, axis=1))  # (W, 6)

        # --- coupling: A[p] = (6W, 3) column block per point ---------------
        # per-obs Jc^T Jx (6, 3) scattered into (P, W, 6, 3)
        JcT_Jx = jnp.einsum("wkab,wkac->wkbc", Jc, Jx * w[..., None, None])  # (W,K,6,3)
        A = _r(
            jnp.zeros((P + 1, W, 6, 3)).at[pid_safe, jnp.arange(W)[:, None]].add(
                JcT_Jx
            )[:P]
        )  # (P, W, 6, 3)

        # --- Schur: S = Hcc - sum_p A_p Hpp_p^-1 A_p^T ---------------------
        AH = jnp.einsum("pwab,pbc->pwac", A, Hpp_inv)  # (P, W, 6, 3)
        S_off = jnp.einsum("pwac,pvbc->wavb", AH, A)  # (W, 6, W, 6)
        S = -S_off.reshape(D, D)
        S = S.at[jnp.arange(D), jnp.arange(D)].add(0.0)  # keep layout
        # add block-diagonal Hcc
        Hcc_full = jax.scipy.linalg.block_diag(*[Hcc_blocks[i] for i in range(W)])
        S = S + Hcc_full
        b = -gc.reshape(D) + jnp.einsum("pwac,pc->wa", AH, gp).reshape(D)

        # gauge + invalid cameras: pin their 6-blocks to identity rows.
        # Camera damping likewise scales with the diagonal.
        free = jnp.repeat(cam_free, 6)
        S = jnp.where(free[:, None] & free[None, :], S, 0.0)
        s_diag = jnp.diagonal(S)
        S = S.at[jnp.arange(D), jnp.arange(D)].add(
            jnp.where(free, lam * jnp.maximum(s_diag, 1.0) + 1e-5, 1.0)
        )
        b = jnp.where(free, b, 0.0)

        # Jacobi preconditioning: the raw Schur system mixes rotation
        # (~1e6) and translation (~1e3) scales; float32 LU on it produces
        # garbage steps on real observation patterns.
        d_scale = 1.0 / jnp.sqrt(jnp.maximum(jnp.diagonal(S), 1e-8))
        S_hat = S * d_scale[:, None] * d_scale[None, :]
        dc = jnp.linalg.solve(S_hat, b * d_scale) * d_scale  # (D,)
        dc_blocks = dc.reshape(W, 6)

        # back-substitute points: dp = Hpp^-1 (-gp - A^T dc)
        Atdc = jnp.einsum("pwab,wa->pb", A, dc_blocks)  # (P, 3)
        dp = jnp.einsum("pab,pb->pa", Hpp_inv, -gp - Atdc)
        dp = jnp.where(observed[:, None], dp, 0.0)

        # apply: left twist on T_cw  =>  T_wc_new = T_wc exp(-d)
        def apply_one(Ti, di, freei):
            T_new = Ti @ se3.exp(-di)
            T_new = se3.normalize_rotation(T_new)
            return jnp.where(freei, T_new, Ti)

        poses_new = jax.vmap(apply_one)(poses, dc_blocks, cam_free)
        X_new = X + dp

        # LM accept/reject: keep the step only if the Huber cost drops.
        cost_new = _cost(poses_new, X_new)
        step_finite = jnp.all(jnp.isfinite(dc)) & jnp.all(jnp.isfinite(dp))
        accept = (cost_new < cost) & step_finite
        poses_out = jnp.where(accept, poses_new, poses)
        X_out = jnp.where(accept, X_new, X)
        cost_out = jnp.where(accept, cost_new, cost)
        lam_out = jnp.clip(jnp.where(accept, lam * 0.3, lam * 8.0), 1e-6, 1e3)
        return (poses_out, X_out, lam_out, cost_out)

    return _cost, lm_iter


@functools.partial(jax.jit, static_argnames=("cam", "cfg", "psum_axis"))
def local_ba(
    poses_wc: jax.Array,  # (W, 4, 4) window keyframe poses (cam->world)
    window_valid: jax.Array,  # (W,) bool
    pt_xyz: jax.Array,  # (P, 3) all map points (world)
    obs_uv: jax.Array,  # (W, K, 2) observed pixels
    obs_z: jax.Array,  # (W, K) measured depth at observation (metres)
    obs_pid: jax.Array,  # (W, K) int32 point ids (-1 none)
    obs_ok: jax.Array,  # (W, K) bool
    cam: CameraIntrinsics,
    cfg: BAConfig,
    free_mask: jax.Array | None = None,  # (W,) bool — poses to optimize
    psum_axis: str | None = None,  # set under shard_map: observation axis
) -> BAResult:
    """Gauss-Newton local BA over a fixed camera set.

    Cameras with `free_mask` False (plus a gauge anchor) contribute
    residuals — constraining the points — but their poses do not move.
    Passing older covisible keyframes as fixed observers is what keeps
    repeated local BA from sliding shared structure: without them the
    window + its points form a nearly-gauge-free subproblem. When
    `free_mask` is None every valid camera except the first is free.

    Points outside the camera set's observations are untouched. Runs
    `cfg.iters` fixed iterations (static); Huber + hard gate on pixels.
    """
    P = pt_xyz.shape[0]
    _cost, lm_iter = _make_lm(
        window_valid, obs_uv, obs_z, obs_pid, obs_ok, cam, cfg,
        free_mask, psum_axis, P,
    )
    obs_ok = obs_ok & window_valid[:, None]

    init = (poses_wc, pt_xyz, jnp.float32(cfg.damping), _cost(poses_wc, pt_xyz))
    poses_out, X_out, _, _ = jax.lax.fori_loop(0, cfg.iters, lm_iter, init)

    # final stats
    r, _, _, mask = _reproj_residuals(poses_out, X_out, obs_uv, obs_z, obs_pid, obs_ok, cam)

    def _r(x):
        return x if psum_axis is None else jax.lax.psum(x, psum_axis)

    rn2 = jnp.sum(r * r, axis=-1)
    n = _r(jnp.sum(mask))
    rmse = jnp.sqrt(_r(jnp.sum(jnp.where(mask, rn2, 0.0))) / jnp.maximum(n, 1))
    return BAResult(kf_pose=poses_out, pt_xyz=X_out, rmse_px=rmse, n_obs=n)


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def _win_compact(
    window_valid, pt_xyz, obs_uv, obs_z, obs_pid, obs_ok, cam, cfg,
):
    """Compaction stage of the windowed solve: pick the per-window point
    budget and remap the observation grid onto it. Returns
    (sel, pid_c, ok_c, pt_c, n_observed)."""
    P = pt_xyz.shape[0]
    C = min(cfg.max_points_per_window, P)
    ok = obs_ok & window_valid[:, None] & (obs_pid >= 0)
    pid_safe = jnp.where(ok, obs_pid, P)

    n_obs_pt = jnp.zeros((P + 1,), jnp.int32).at[pid_safe].add(1)[:P]
    observed = n_obs_pt > 0
    n_observed = jnp.sum(observed.astype(jnp.int32))
    # budget by observation count: a point seen by more window keyframes
    # constrains more poses (ties break toward higher = newer ids, which
    # are the ones still being refined)
    # clamp counts so rank stays exactly representable in f32 (<2^24)
    rank = jnp.where(
        observed,
        jnp.minimum(n_obs_pt, 255).astype(jnp.float32) * (P + 1) + jnp.arange(P),
        -1.0,
    )
    _, sel = jax.lax.top_k(rank, C)  # (C,) point ids, best-constrained first
    sel = jnp.where(jnp.take(observed, sel), sel, P)  # pad unobserved slots
    lookup = (
        jnp.full((P + 1,), -1, jnp.int32)
        .at[sel].set(jnp.arange(C, dtype=jnp.int32))
        .at[P].set(-1)  # pad writes above land on row P — restore it
    )
    pt_pad = jnp.concatenate([pt_xyz, jnp.zeros((1, 3), pt_xyz.dtype)])
    pt_c = pt_pad[sel]  # (C, 3)
    pid_c = lookup[pid_safe]  # (W, K): compact id, -1 if masked/overflow
    ok_c = ok & (pid_c >= 0)
    return sel, pid_c, ok_c, pt_c, n_observed


@functools.partial(jax.jit, static_argnames=("cam", "cfg", "n_iters", "first"))
def _win_chunk(
    poses, X, lam, cost, window_valid, obs_uv, obs_z, pid_c, ok_c,
    free_mask, cam, cfg, n_iters: int, first: bool,
):
    """`n_iters` LM iterations as ONE device program (state carried)."""
    C = X.shape[0]
    _cost, lm_iter = _make_lm(
        window_valid, obs_uv, obs_z, pid_c, ok_c, cam, cfg,
        free_mask, None, C,
    )
    if first:
        cost = _cost(poses, X)
    state = jax.lax.fori_loop(0, n_iters, lm_iter, (poses, X, lam, cost))
    return state


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def _win_finalize(
    poses, X, window_valid, obs_uv, obs_z, pid_c, ok_c, sel, pt_xyz,
    n_observed, cam, cfg,
):
    """Final stats + scatter the compact solution back to the full table."""
    P = pt_xyz.shape[0]
    C = X.shape[0]
    ok = ok_c & window_valid[:, None]
    r, _, _, mask = _reproj_residuals(poses, X, obs_uv, obs_z, pid_c, ok, cam)
    rn2 = jnp.sum(r * r, axis=-1)
    n = jnp.sum(mask)
    rmse = jnp.sqrt(jnp.sum(jnp.where(mask, rn2, 0.0)) / jnp.maximum(n, 1))

    pt_pad = jnp.concatenate([pt_xyz, jnp.zeros((1, 3), pt_xyz.dtype)])
    pt_new = pt_pad.at[sel].set(X)[:P]
    pt_solved = jnp.zeros((P + 1,), bool).at[sel].set(True)[:P]
    return BAResult(
        kf_pose=poses, pt_xyz=pt_new, rmse_px=rmse, n_obs=n,
        pt_solved=pt_solved, n_dropped=jnp.maximum(n_observed - C, 0),
    )


def windowed_local_ba(
    poses_wc: jax.Array,  # (W, 4, 4)
    window_valid: jax.Array,  # (W,)
    pt_xyz: jax.Array,  # (P, 3) FULL map point table
    obs_uv: jax.Array,  # (W, K, 2)
    obs_z: jax.Array,  # (W, K)
    obs_pid: jax.Array,  # (W, K) ids into the FULL table
    obs_ok: jax.Array,  # (W, K)
    cam: CameraIntrinsics,
    cfg: BAConfig,
    free_mask: jax.Array | None = None,
    dispatch_iters: int | None = None,
) -> BAResult:
    """Local BA over the full map table, with the solve COMPACTED to the
    window's observed points (cfg.max_points_per_window slots).

    `local_ba`'s per-point state is sized by its point table: a window
    observes at most W*K distinct points, yet handing it the full
    P=16k table makes every iteration scatter into (P, W, 6, 3) coupling
    blocks and invert (P, 3, 3) systems — ~8x more HBM traffic and
    scatter lanes than the observed set needs, which measured ~600 ms on
    a v5e for the product workload (the backend stall behind the round-2
    session p99). This wrapper gathers the observed ids into a
    C=max_points_per_window compact table, remaps the observation grid,
    runs the identical solver, and scatters the refined points back —
    same math, same result, on arrays sized to the actual problem.

    If the window observes more than C distinct points, the LEAST-observed
    points are excluded from this pass (ORB-SLAM-style per-window point
    budgets keep the best-constrained structure); the overflow count is
    reported in `BAResult.n_dropped` so accuracy pressure is visible.

    `dispatch_iters=None` runs everything as ONE device program
    (compaction, solve, scatter-back fuse into a single dispatch — best
    throughput). `dispatch_iters=k` splits the solve into ceil(iters/k)
    separate device dispatches with LM state carried between them —
    IDENTICAL math, but on a chip shared with a latency-critical frontend
    the frontend's small programs can interleave between chunks, bounding
    its tail latency by one chunk's duration instead of the whole solve
    (the backend worker uses this; `SLAM.cpp:32-63`'s thread-decoupling
    intent, done TPU-style).
    """
    if dispatch_iters is None or dispatch_iters >= cfg.iters:
        return _windowed_single(
            poses_wc, window_valid, pt_xyz, obs_uv, obs_z, obs_pid, obs_ok,
            cam, cfg, free_mask,
        )

    sel, pid_c, ok_c, pt_c, n_observed = _win_compact(
        window_valid, pt_xyz, obs_uv, obs_z, obs_pid, obs_ok, cam, cfg
    )
    poses, X = poses_wc, pt_c
    lam = jnp.float32(cfg.damping)
    cost = jnp.float32(0)
    done = 0
    while done < cfg.iters:
        k = min(dispatch_iters, cfg.iters - done)
        poses, X, lam, cost = _win_chunk(
            poses, X, lam, cost, window_valid, obs_uv, obs_z, pid_c, ok_c,
            free_mask, cam, cfg, k, done == 0,
        )
        done += k
    return _win_finalize(
        poses, X, window_valid, obs_uv, obs_z, pid_c, ok_c, sel, pt_xyz,
        n_observed, cam, cfg,
    )


@functools.partial(jax.jit, static_argnames=("cam", "cfg"))
def _windowed_single(
    poses_wc, window_valid, pt_xyz, obs_uv, obs_z, obs_pid, obs_ok,
    cam, cfg, free_mask=None,
):
    """Single-dispatch windowed solve (see `windowed_local_ba`)."""
    sel, pid_c, ok_c, pt_c, n_observed = _win_compact(
        window_valid, pt_xyz, obs_uv, obs_z, obs_pid, obs_ok, cam, cfg
    )
    res = local_ba(
        poses_wc, window_valid, pt_c, obs_uv, obs_z, pid_c, ok_c,
        cam, cfg, free_mask=free_mask,
    )
    P = pt_xyz.shape[0]
    C = pt_c.shape[0]
    pt_pad = jnp.concatenate([pt_xyz, jnp.zeros((1, 3), pt_xyz.dtype)])
    pt_new = pt_pad.at[sel].set(res.pt_xyz)[:P]
    pt_solved = jnp.zeros((P + 1,), bool).at[sel].set(True)[:P]
    return BAResult(
        kf_pose=res.kf_pose, pt_xyz=pt_new, rmse_px=res.rmse_px,
        n_obs=res.n_obs, pt_solved=pt_solved,
        n_dropped=jnp.maximum(n_observed - C, 0),
    )
