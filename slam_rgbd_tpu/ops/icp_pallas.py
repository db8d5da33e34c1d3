"""Fused dense-ICP Gauss-Newton Pallas kernel.

One GN iteration of projective point-to-plane + photometric alignment
(`odometry/icp.py:_normal_equations`) evaluated as a single row-tiled
kernel. The XLA stencil path re-reads the packed target maps from HBM for
every one of the (2R+2)^2 shift-FMA terms (~36 full-image passes per
iteration at the finest level); here each grid step

  1. DMAs one target row-window (tile + stencil halo) HBM -> VMEM with
     double buffering,
  2. transforms + projects the source tile, evaluates the exact
     windowed-bilinear association stencil entirely from VMEM,
  3. reduces the weighted 7x7 normal-equation blocks (geometric and
     photometric) in-register,

so HBM traffic per iteration drops to one streaming read of the source
and target maps, and only an (8, 128) accumulator block ever leaves the
chip. This is the speed-of-light replacement for the reference's hottest
loop, the O(W*H) per-pixel back-projection at
`Youth.Source/ViewerModule/viewerModule.c:336-357` (SURVEY.md section 3.2),
fused with the tracking math the reference delegates to ORB-SLAM3's
`TrackRGBD` (`Youth.Source/AlgorithmModule/SLAM.cpp:54`).

Association math is identical to `odometry.icp.windowed_bilinear` with a
fixed per-level dominant-flow shift (mu_u, mu_v): the target maps are
rolled by -mu once per pyramid level (they do not depend on the pose), and
the kernel's static stencil then only covers flow *variation*, which
coarse-to-fine alignment keeps within a few pixels.

Layout: planes are channel-first (C, H, W) float32.
  source (8, H, W):  vx vy vz  nx ny nz  valid  intensity
  target (10, Hp, W): vx vy vz  nx ny nz  valid  intensity  gx gy
with Hp = n_tiles*TH + 2*(radius+1) rows (zero/invalid padded).

Output block (8, 128) float32, accumulated over the sequential grid:
  [0:7, 0:7]   M_geo  = sum w  * a a^T,  a = [J0..J5, r]
  [0:7, 8:15]  M_pho  = sum wi * b b^T,  b = [Ji0..Ji5, ri]
  [0, 16]      inlier count
so H = M_geo[:6,:6] + M_pho[:6,:6], g = column 6 of both, the robust
squared-residual sum is M_geo[6,6], matching `_normal_equations` exactly.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from slam_rgbd_tpu.core.config import CameraIntrinsics, ICPConfig

_LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


_VMEM_LIMIT = 100 * 1024 * 1024  # v5e/v5p VMEM is 128 MiB; the default
# 16 MiB scoped limit forced 72-row tiles (7 dispatch-pipelined tiles and
# 7x the stencil's per-tile fixed costs at 640x480)


def plan_tiles(height: int, width: int, radius: int):
    """(tile_rows, n_tiles, padded_width) keeping the working set in VMEM.

    Tile rows are bounded by a source-block byte budget (VMEM, with the
    raised `_VMEM_LIMIT`) and by a stencil-terms x pixels budget: Mosaic's
    compiler falls over (helper exit 1) once the unrolled stencil's live
    vector state exceeds roughly 4M term-pixels per tile (measured: 100
    terms x 120x384 crashes, 100 x 88x384 and 36 x 96x640 compile fine).
    """
    w_pad = _round_up(width, _LANE)
    n_terms = (2 * radius + 2) ** 2
    th = min(
        _round_up(height, 8),
        (10_000_000 // (8 * w_pad * 4)) & ~7,
        (3_200_000 // (w_pad * n_terms)) & ~7,
        120,
    )
    th = max(8, th)
    n_tiles = -(-height // th)
    return th, n_tiles, w_pad


def build_source_planes(src: dict, th: int, n_tiles: int, w_pad: int):
    """Stack source maps channel-first, zero-padded to the tile grid."""
    h, w = src["valid"].shape
    inten = src.get("intensity", jnp.zeros((h, w), jnp.float32))
    planes = jnp.concatenate(
        [
            jnp.moveaxis(src["vertices"], -1, 0),
            jnp.moveaxis(src["normals"], -1, 0),
            src["valid"].astype(jnp.float32)[None],
            inten[None],
        ],
        axis=0,
    )
    return jnp.pad(planes, ((0, 0), (0, n_tiles * th - h), (0, w_pad - w)))


def build_target_planes(
    tgt: dict, mu_u: jax.Array, mu_v: jax.Array, radius: int,
    th: int, n_tiles: int, w_pad: int,
):
    """Channel-first target maps, rolled by the dominant flow and padded.

    Rolled once per pyramid level (the target does not depend on the
    pose); row padding gives the kernel a statically-sliceable halo.
    Wrapped rows/columns are gated out in-kernel by absolute-coordinate
    bounds checks, exactly like the XLA roll-stencil path.
    """
    h, w = tgt["valid"].shape
    inten = tgt.get("intensity", jnp.zeros((h, w), jnp.float32))
    grad = tgt.get("grad", jnp.zeros((h, w, 2), jnp.float32))
    planes = jnp.concatenate(
        [
            jnp.moveaxis(tgt["vertices"], -1, 0),
            jnp.moveaxis(tgt["normals"], -1, 0),
            tgt["valid"].astype(jnp.float32)[None],
            inten[None],
            jnp.moveaxis(grad, -1, 0),
        ],
        axis=0,
    )
    planes = jnp.roll(planes, (-mu_v, -mu_u), axis=(1, 2))
    rv = radius + 1
    span = _round_up(th + 2 * rv, 8)  # DMA slices must be sublane-aligned
    rows_total = (n_tiles - 1) * th + span
    return jnp.pad(planes, ((0, 0), (rv, rows_total - h - rv), (0, w_pad - w)))


def _make_kernel(cam: CameraIntrinsics, cfg: ICPConfig, radius: int,
                 th: int, n_tiles: int, height: int, width: int,
                 n_b: int = 1, batched: bool = False):
    """Kernel body for `gn_reduce` (n_b=1) and `gn_reduce_batched` (grid
    (B, n_tiles) with a leading batch axis on every operand — B problems
    stream through the same sequential grid, so one dispatch amortizes B
    tracking problems and batched/data-parallel paths keep the fused
    kernel instead of collapsing onto the XLA stencil)."""
    rv = radius + 1
    span = _round_up(th + 2 * rv, 8)  # matches build_target_planes padding
    fx, fy, cx, cy = cam.fx, cam.fy, cam.cx, cam.cy
    min_depth = cam.min_depth
    max_dist_sq = cfg.max_dist * cfg.max_dist
    import math

    cos_thresh = math.cos(math.radians(cfg.max_normal_angle_deg))
    huber = cfg.huber_delta
    rgb_w = cfg.rgb_weight
    rgb_huber = cfg.rgb_huber

    def kernel(scal_ref, src_ref, tgt_ref, out_ref, scratch, sems, acc_ref):
        # `batched` selects the (B, ...) block layouts of
        # `gn_reduce_batched` — including at B == 1, whose blocks still
        # carry the leading batch axis (conflating the two on n_b == 1
        # mis-indexed every operand; round-5 regression).
        if not batched:
            b = jnp.int32(0)
            i = pl.program_id(0)
        else:
            b = pl.program_id(0)
            i = pl.program_id(1)

        def window_dma(slot, tile, bb):
            return pltpu.make_async_copy(
                tgt_ref.at[bb, :, pl.ds(tile * th, span), :]
                if batched else tgt_ref.at[:, pl.ds(tile * th, span), :],
                scratch.at[slot],
                sems.at[slot],
            )

        step = b * n_tiles + i  # global sequential step for slot parity

        @pl.when(step == 0)
        def _():
            window_dma(0, 0, jnp.int32(0)).start()

        # prefetch the next step's window: next tile of this problem, or
        # tile 0 of the next problem at a batch boundary
        last_tile = i + 1 >= n_tiles
        nxt_i = jnp.where(last_tile, 0, i + 1)
        nxt_b = jnp.where(last_tile, b + 1, b)

        @pl.when(step + 1 < n_b * n_tiles)
        def _():
            window_dma((step + 1) % 2, nxt_i, nxt_b).start()

        window_dma(step % 2, i, b).wait()
        slot = step % 2

        # ---- transform + project the source tile --------------------------
        # Value indexing (not `.at[]` ref transforms): interpret mode
        # squeezes integer-indexed ref transforms but the Mosaic lowering
        # does not, so `.at[0]` left a phantom leading axis on the real
        # TPU path (round-5 batch-scaling regression).
        def scal_at(j):
            return scal_ref[0, j] if not batched else scal_ref[0, 0, j]

        t = [[scal_at(4 * r + c) for c in range(4)] for r in range(4)]
        mu_u = scal_at(16)
        mu_v = scal_at(17)

        def src_at(c):
            return src_ref[c] if not batched else src_ref[0, c]

        px, py, pz = src_at(0), src_at(1), src_at(2)
        snx, sny, snz = src_at(3), src_at(4), src_at(5)
        sval = src_at(6)
        sint = src_at(7)

        yx = t[0][0] * px + t[0][1] * py + t[0][2] * pz + t[0][3]
        yy = t[1][0] * px + t[1][1] * py + t[1][2] * pz + t[1][3]
        yz = t[2][0] * px + t[2][1] * py + t[2][2] * pz + t[2][3]
        rnx = t[0][0] * snx + t[0][1] * sny + t[0][2] * snz
        rny = t[1][0] * snx + t[1][1] * sny + t[1][2] * snz
        rnz = t[2][0] * snx + t[2][1] * sny + t[2][2] * snz

        z_safe = jnp.maximum(yz, 1e-6)
        inv_z = 1.0 / z_safe
        up = fx * yx * inv_z + cx
        vp = fy * yy * inv_z + cy
        in_front = yz > min_depth

        shape = px.shape  # (th, w_pad)
        u_grid = jax.lax.broadcasted_iota(jnp.int32, shape, 1).astype(jnp.float32)
        v_abs = jax.lax.broadcasted_iota(jnp.int32, shape, 0).astype(
            jnp.float32
        ) + (i * th).astype(jnp.float32)
        du_f = up - u_grid - mu_u
        dv_f = vp - v_abs - mu_v
        tu_base = u_grid + mu_u
        tv_base = v_abs + mu_v
        row_ok = v_abs < height  # tile-grid padding rows

        # ---- exact windowed-bilinear stencil from VMEM --------------------
        # Column shift in the OUTER loop: one whole-window roll per du
        # ((2R+2) rolls total) — per-term rolls of the row slices blow up
        # the Mosaic compiler at image widths beyond one lane tile.
        #
        # Effective 1-D weights are PRECOMPUTED per offset with the bounds
        # checks folded in — the bilinear weight is separable
        # (wgt = wu_eff[du] * wv_eff[dv]), so the (2R+2)^2-term loop does
        # one multiply + 10 channel-FMAs per term instead of re-deriving
        # weights/bounds (~21 vector ops) every term; the weight sum is
        # likewise the product of the two 1-D sums. ~40% fewer VPU ops in
        # the kernel's dominant loop.
        offs = list(range(-radius, radius + 2))
        wu_eff = []
        wv_eff = []
        for du in offs:
            wu = jnp.maximum(0.0, 1.0 - jnp.abs(du_f - du))
            tu = tu_base + du
            wu_eff.append(jnp.where((tu >= 0.0) & (tu < width), wu, 0.0))
        for dv in offs:
            wv = jnp.maximum(0.0, 1.0 - jnp.abs(dv_f - dv))
            tv = tv_base + dv
            wv_eff.append(
                jnp.where((tv >= 0.0) & (tv < height) & row_ok, wv, 0.0)
            )
        wsum = sum(wu_eff) * sum(wv_eff)

        # ---- flow-bound term pruning (runtime, exact) ----------------------
        # Coarse-to-fine alignment keeps the tile's flow VARIATION within a
        # couple of pixels of the (mean-shifted) zero, so most of the
        # (2R+2)^2 static stencil terms have zero bilinear weight for EVERY
        # pixel that can pass the masks. Per tile, the min/max of the
        # predicted displacement over maskable pixels bound which column
        # groups can contribute: group du is live iff du in
        # (du_lo - 1, du_hi + 1). Displacements are clamped to the stencil
        # span first — a pixel whose |du_f| exceeds radius+1 gets zero
        # weight from every in-span term anyway (its wsum gate then fails
        # identically), so clamping keeps the pruned kernel BIT-IDENTICAL
        # to the full stencil while skipping the dead groups' rolls and
        # FMAs (typically 40-70% of the dominant loop). The group
        # accumulation moves to a VMEM scratch (`pl.when` predicates ref
        # writes, not register dataflow); one RMW of the (10, th, w_pad)
        # block per LIVE group is ~1% of the FMA work it replaces.
        pix_ok = (sval > 0.5) & in_front & row_ok
        du_c = jnp.where(pix_ok, jnp.clip(du_f, -rv, rv + 1.0), 0.0)
        du_lo, du_hi = jnp.min(du_c), jnp.max(du_c)

        win = scratch[slot]  # (10, span, w_pad)
        w_pad = shape[1]
        acc_ref[:] = jnp.zeros((10, th, w_pad), jnp.float32)
        for idu, du in enumerate(offs):

            @pl.when((du > du_lo - 1.0) & (du < du_hi + 1.0))
            def _(idu=idu, du=du):
                # pltpu.roll wants a non-negative shift; wrap is gated out
                # by the absolute-coordinate bounds check in wu_eff.
                win_du = pltpu.roll(win, (-du) % w_pad, 2) if du else win
                grp = jnp.zeros((10,) + shape, jnp.float32)
                for idv, dv in enumerate(offs):
                    wgt = wu_eff[idu] * wv_eff[idv]
                    rows = win_du[:, rv + dv : rv + dv + th, :]
                    grp = grp + wgt[None] * rows
                acc_ref[:] = acc_ref[:] + grp

        acc = acc_ref[:]
        # acc[6] IS the weighted validity sum (channel 6 = valid plane);
        # a separate vsum accumulator would be a redundant per-term FMA.
        samp_ok = (wsum > 0.999) & (acc[6] > 0.999)
        qx, qy, qz = acc[0], acc[1], acc[2]
        nxr, nyr, nzr = acc[3], acc[4], acc[5]
        n_norm = jnp.maximum(jnp.sqrt(nxr * nxr + nyr * nyr + nzr * nzr), 1e-9)
        nx, ny, nz = nxr / n_norm, nyr / n_norm, nzr / n_norm

        dx, dy, dz = yx - qx, yy - qy, yz - qz
        dist_ok = dx * dx + dy * dy + dz * dz < max_dist_sq
        angle_ok = nx * rnx + ny * rny + nz * rnz > cos_thresh
        mask = (sval > 0.5) & in_front & samp_ok & dist_ok & angle_ok

        # ---- geometric point-to-plane block --------------------------------
        r = nx * dx + ny * dy + nz * dz
        j3 = yy * nz - yz * ny  # y x n
        j4 = yz * nx - yx * nz
        j5 = yx * ny - yy * nx
        abs_r = jnp.abs(r)
        w = jnp.where(abs_r <= huber, 1.0, huber / jnp.maximum(abs_r, 1e-12))
        w = jnp.where(mask, w, 0.0)
        a = (nx, ny, nz, j3, j4, j5, r)

        # ---- photometric (DVO) block ---------------------------------------
        i_tgt = acc[7]
        gx, gy = acc[8], acc[9]
        ri = i_tgt - sint
        ga = gx * fx * inv_z
        gb = gy * fy * inv_z
        gc = -(ga * yx + gb * yy) * inv_z
        ji3 = yy * gc - yz * gb
        ji4 = yz * ga - yx * gc
        ji5 = yx * gb - yy * ga
        abs_ri = jnp.abs(ri)
        wi = jnp.where(
            abs_ri <= rgb_huber, 1.0, rgb_huber / jnp.maximum(abs_ri, 1e-12)
        )
        wi = jnp.where(mask, wi * rgb_w, 0.0)
        b = (ga, gb, gc, ji3, ji4, ji5, ri)

        # The 7x7 normal-equation blocks are tall-skinny reduction matmuls:
        # stack the 7 residual/Jacobian planes (+1 pad row) as (8, N) and
        # contract over pixels on the MXU — M = (wA) A^T in one pass per
        # block instead of 57 full-tile VPU reductions (which dominated
        # kernel liveness and time in the round-2 profile).
        n_px = shape[0] * shape[1]
        zero_plane = jnp.zeros(shape, jnp.float32)

        def stack8(planes):
            return jnp.concatenate(
                [p.reshape(1, n_px) for p in planes + (zero_plane,)], axis=0
            )

        a_mat = stack8(a)  # (8, N)
        b_mat = stack8(b)
        w_flat = w.reshape(1, n_px)
        wi_flat = wi.reshape(1, n_px)
        dn = (((1,), (1,)), ((), ()))  # contract pixel axis of both
        m_geo = jax.lax.dot_general(
            a_mat * w_flat, a_mat, dn, preferred_element_type=jnp.float32
        )  # (8, 8)
        m_pho = jax.lax.dot_general(
            b_mat * wi_flat, b_mat, dn, preferred_element_type=jnp.float32
        )

        col_ids = jax.lax.broadcasted_iota(jnp.int32, (8, _LANE), 1)
        row_ids = jax.lax.broadcasted_iota(jnp.int32, (8, _LANE), 0)
        pad8 = jnp.zeros((8, _LANE - 16), jnp.float32)
        contrib = jnp.concatenate([m_geo, m_pho, pad8], axis=1)
        n_inl = jnp.sum(mask.astype(jnp.float32))
        contrib = jnp.where((row_ids == 0) & (col_ids == 16), n_inl, contrib)

        @pl.when(i == 0)
        def _():
            if not batched:
                out_ref[:] = contrib
            else:
                out_ref[0] = contrib

        @pl.when(i > 0)
        def _():
            if not batched:
                out_ref[:] = out_ref[:] + contrib
            else:
                out_ref[0] = out_ref[0] + contrib

    return kernel


@functools.partial(
    jax.jit, static_argnames=("cam", "cfg", "radius", "shape", "interpret")
)
def gn_reduce(
    scalars: jax.Array,  # (1, 32) f32: T row-major (16), mu_u, mu_v
    src_planes: jax.Array,  # (8, n_tiles*th, w_pad)
    tgt_planes: jax.Array,  # (10, n_tiles*th + 2*(radius+1), w_pad)
    cam: CameraIntrinsics,
    cfg: ICPConfig,
    radius: int,
    shape: tuple,  # true (height, width) of the level
    interpret: bool = False,
):
    """One fused GN reduction -> (H (6,6), g (6,), inliers, sq_sum)."""
    height, width = shape
    th, n_tiles, w_pad = plan_tiles(height, width, radius)
    rv = radius + 1
    span = _round_up(th + 2 * rv, 8)
    kernel = _make_kernel(cam, cfg, radius, th, n_tiles, height, width)

    n_terms = (2 * radius + 2) ** 2
    out = pl.pallas_call(
        kernel,
        grid=(n_tiles,),
        in_specs=[
            pl.BlockSpec((1, 32), lambda i: (0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(
                (8, th, w_pad), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (8, _LANE), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((8, _LANE), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 10, span, w_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            # stencil accumulator: `pl.when`-predicated group skipping
            # needs ref (not register) accumulation
            pltpu.VMEM((10, th, w_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=n_tiles * th * w_pad * (n_terms * 24 + 260),
            bytes_accessed=(src_planes.size + tgt_planes.size) * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scalars, src_planes, tgt_planes)

    m_geo = out[:7, :7]
    m_pho = out[:7, 8:15]
    m = m_geo + m_pho
    # symmetrize (only the upper triangle was accumulated)
    upper = jnp.triu(m[:6, :6])
    h_mat = upper + jnp.triu(upper, 1).T
    g = m[:6, 6]
    inliers = out[0, 16].astype(jnp.int32)
    sq_sum = m_geo[6, 6]
    return h_mat, g, inliers, sq_sum


@functools.partial(
    jax.jit, static_argnames=("cam", "cfg", "radius", "shape", "interpret")
)
def gn_reduce_batched(
    scalars: jax.Array,  # (B, 32) f32: per-problem T row-major, mu_u, mu_v
    src_planes: jax.Array,  # (B, 8, n_tiles*th, w_pad)
    tgt_planes: jax.Array,  # (B, 10, n_tiles*th + 2*(radius+1), w_pad)
    cam: CameraIntrinsics,
    cfg: ICPConfig,
    radius: int,
    shape: tuple,  # true (height, width) of the level
    interpret: bool = False,
):
    """B fused GN reductions in ONE dispatch — grid (B, n_tiles).

    The batch axis is an outer sequential grid dimension: problem b's
    tiles stream through the same VMEM-resident stencil pipeline as the
    single-problem kernel (double-buffered target windows prefetch across
    batch boundaries), so B-sequence tracking runs at ~B x the
    single-problem kernel time instead of falling back to the XLA stencil
    (which collapsed to 6.5% efficiency at B=8 in round 4). Returns
    (H (B,6,6), g (B,6), inliers (B,), sq_sum (B,)).
    """
    height, width = shape
    n_b = src_planes.shape[0]
    th, n_tiles, w_pad = plan_tiles(height, width, radius)
    rv = radius + 1
    span = _round_up(th + 2 * rv, 8)
    kernel = _make_kernel(
        cam, cfg, radius, th, n_tiles, height, width, n_b=n_b, batched=True
    )

    n_terms = (2 * radius + 2) ** 2
    # SMEM blocks must match the array's trailing dims, and sub-ref slicing
    # (`scal_ref.at[0]`) requires lane alignment: pad (B, 32) -> (B, 1, 128)
    scalars3 = jnp.pad(scalars, ((0, 0), (0, _LANE - 32))).reshape(
        n_b, 1, _LANE
    )
    out = pl.pallas_call(
        kernel,
        grid=(n_b, n_tiles),
        in_specs=[
            pl.BlockSpec(
                (1, 1, _LANE), lambda b, i: (b, 0, 0),
                memory_space=pltpu.SMEM,
            ),
            pl.BlockSpec(
                (1, 8, th, w_pad), lambda b, i: (b, 0, i, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(memory_space=pl.ANY),
        ],
        out_specs=pl.BlockSpec(
            (1, 8, _LANE), lambda b, i: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((n_b, 8, _LANE), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2, 10, span, w_pad), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
            # stencil accumulator: `pl.when`-predicated group skipping
            # needs ref (not register) accumulation
            pltpu.VMEM((10, th, w_pad), jnp.float32),
        ],
        cost_estimate=pl.CostEstimate(
            flops=n_b * n_tiles * th * w_pad * (n_terms * 24 + 260),
            bytes_accessed=(src_planes.size + tgt_planes.size) * 4,
            transcendentals=0,
        ),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(scalars3, src_planes, tgt_planes)

    m_geo = out[:, :7, :7]
    m_pho = out[:, :7, 8:15]
    m = m_geo + m_pho
    upper = jnp.triu(m[:, :6, :6])
    h_mat = upper + jnp.swapaxes(jnp.triu(upper, 1), -1, -2)
    g = m[:, :6, 6]
    inliers = out[:, 0, 16].astype(jnp.int32)
    sq_sum = m_geo[:, 6, 6]
    return h_mat, g, inliers, sq_sum


def pack_scalars(T: jax.Array, mu_u: jax.Array, mu_v: jax.Array) -> jax.Array:
    """(1, 32) f32 scalar block for `gn_reduce`."""
    vals = jnp.concatenate(
        [
            T.reshape(-1).astype(jnp.float32),
            jnp.stack([mu_u.astype(jnp.float32), mu_v.astype(jnp.float32)]),
            jnp.zeros(14, jnp.float32),
        ]
    )
    return vals[None, :]
