"""Distributed programs: sharded BA assembly, batched tracking, sharded
matching — XLA collectives over the mesh (BASELINE.json's distributed BA).

Design (scaling-book recipe: pick a mesh, annotate shardings, let XLA
insert collectives):

  * `sharded_local_ba` — the Schur-complement assembly (the O(obs) part)
    runs under `shard_map` with observation COLUMNS sharded over `model`;
    per-shard partial Hpp/gp/A/Hcc/gc blocks are `psum`med over ICI and
    the small (6W, 6W) reduced-camera solve happens replicated on every
    device (cheaper than sharding a 48x48 solve). Numerically identical to
    `backend.ba.local_ba` (tested for equality on a CPU mesh).

  * `batch_track` — multi-sequence odometry: the ICP+photometric GN step
    vmapped over a leading sequence axis and sharded over `data`. Each
    device tracks its own sequences; zero cross-device traffic in the
    steady state (embarrassingly parallel — the scaling-efficiency
    workload of BASELINE.json configs[4]).

  * `sharded_hamming` — all-pairs descriptor matching with query rows
    sharded over `model`; the (K1/n, K2) distance blocks stay sharded and
    the per-row top-k is computed locally then gathered (the matmul is
    MXU-bound; only (K1, 2) floats cross the wire).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
try:
    from jax import shard_map  # jax >= 0.8
except ImportError:  # pragma: no cover
    from jax.experimental.shard_map import shard_map

from slam_rgbd_tpu.backend.ba import BAResult, local_ba
from slam_rgbd_tpu.core import se3
from slam_rgbd_tpu.core.config import BAConfig, CameraIntrinsics, ICPConfig
from slam_rgbd_tpu.odometry.icp import icp_align_batched


# --------------------------------------------------------------------- BA
def sharded_local_ba(
    mesh: Mesh,
    poses_wc: jax.Array,  # (W, 4, 4)
    window_valid: jax.Array,  # (W,)
    pt_xyz: jax.Array,  # (P, 3) replicated
    obs_uv: jax.Array,  # (W, K, 2) — K sharded over `model`
    obs_z: jax.Array,  # (W, K)
    obs_pid: jax.Array,  # (W, K)
    obs_ok: jax.Array,  # (W, K)
    cam: CameraIntrinsics,
    cfg: BAConfig,
    free_mask: jax.Array | None = None,
    model_axis: str = "model",
) -> BAResult:
    """Local BA with observation columns sharded across the mesh.

    Implementation note: the existing `local_ba` body executes inside
    `shard_map` with each device holding a K/n slice of the observation
    grid; its `psum_axis` parameter completes every observation-reduction
    (point-block scatters, Hcc sums, coupling tensor, LM cost, final
    stats) with a psum over `model`. Every device then sees identical
    normal equations, runs the identical replicated solve, and makes the
    identical LM accept decision — bitwise-equivalent to the single-device
    path up to reduction order.
    """
    if free_mask is None:
        free_mask = window_valid

    axis = model_axis

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(None, axis, None), P(None, axis),
                  P(None, axis), P(None, axis), P()),
        out_specs=(P(), P(), P(), P()),
        check_vma=False,
    )
    def run(poses, valid, pts, uv, z, pid, ok, free):
        # local_ba is written against jnp reductions over the full
        # observation set; under shard_map each device sees a K/n slice,
        # and `psum_axis` completes every observation-reduction with a
        # psum over the model axis.
        res = local_ba(
            poses, valid, pts, uv, z, pid, ok, cam, cfg,
            free_mask=free, psum_axis=axis,
        )
        return res.kf_pose, res.pt_xyz, res.rmse_px, res.n_obs

    kf_pose, pt_out, rmse, n_obs = run(
        poses_wc, window_valid, pt_xyz, obs_uv, obs_z, obs_pid, obs_ok, free_mask
    )
    return BAResult(kf_pose=kf_pose, pt_xyz=pt_out, rmse_px=rmse, n_obs=n_obs)


# ----------------------------------------------------------------- tracking
def batch_track(
    mesh: Mesh,
    src_pyrs,  # pytree with leading batch axis B on every leaf
    tgt_pyrs,
    T_init: jax.Array,  # (B, 4, 4)
    cam: CameraIntrinsics,
    cfg: ICPConfig,
    data_axis: str = "data",
):
    """Track B sequences concurrently, sharded over the `data` axis.

    Each device runs the BATCHED fused Pallas path on its local B/n
    sequence shard (`icp_align_batched`, one (B_local, n_tiles)-grid
    dispatch) — the data-parallel mesh scales the fast kernel, not the
    XLA stencil fallback."""
    spec_tree = jax.tree_util.tree_map(lambda _: P(data_axis), src_pyrs)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec_tree, spec_tree, P(data_axis)),
        out_specs=(P(data_axis), P(data_axis), P(data_axis), P(data_axis)),
        check_vma=False,
    )
    def run(src, tgt, T0):
        res = icp_align_batched(src, tgt, T0, cam, cfg)
        return res.T, res.inliers, res.rmse, res.valid_fraction

    return run(src_pyrs, tgt_pyrs, T_init)


# ------------------------------------------------------- map-block sharding
def sharded_map_association(
    mesh: Mesh,
    signs: jax.Array,  # (K, 256) query descriptors, replicated
    ok: jax.Array,  # (K,)
    kp_uv: jax.Array,  # (K, 2)
    kp_z: jax.Array,  # (K,)
    T_world_cam: jax.Array,  # (4, 4)
    pt_xyz: jax.Array,  # (P, 3) — map points SHARDED over `model`
    pt_signs: jax.Array,  # (P, 256) sharded
    pt_valid: jax.Array,  # (P,) sharded
    cam: CameraIntrinsics,
    px_radius: float = 6.0,
    z_rel_tol: float = 0.08,
    max_distance: float = 64.0,
    kp_pts: jax.Array | None = None,  # (K, 3) camera-frame (merge tier)
    merge_radius: float = 0.05,
    merge_max_distance: float = 40.0,
    model_axis: str = "model",
) -> jax.Array:
    """Map association with the MAP sharded in blocks across the mesh.

    The map is the state that outgrows one device (SURVEY.md §5's
    long-context analogue: map blocks over hosts). Layout: each device
    holds a P/n block of `pt_xyz`/`pt_signs`/`pt_valid`; queries are
    replicated (a frame is ~100 KB of descriptors vs. a multi-GB map).
    Per block: project the block into the query camera, run the same
    two-tier gated matching as `mapping.map.match_against_map`, keep the
    block winner per query. The halo exchange is one all-gather of the
    (K,) block winners — 12 bytes/query/device — after which every device
    computes the identical global argmin. Bit-equal to the single-device
    path (ties break toward the lowest global point index because blocks
    are ordered and the XLA argmin picks first occurrence in-block).

    Returns (K,) int32 global map-point ids, -1 if unmatched.
    """
    from slam_rgbd_tpu.features.match import hamming_matrix

    K = signs.shape[0]
    cap = pt_xyz.shape[0]
    n = mesh.shape[model_axis]
    assert cap % n == 0, f"map capacity {cap} not divisible by mesh {n}"
    blk = cap // n
    big = jnp.float32(1e9)

    if kp_pts is not None:
        pts_w = kp_pts @ T_world_cam[:3, :3].T + T_world_cam[:3, 3]
    else:
        pts_w = jnp.zeros((K, 3), jnp.float32)
    T_cw = se3.inverse(T_world_cam)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), P(), P(), P(),
                  P(model_axis), P(model_axis), P(model_axis)),
        out_specs=P(),
        check_vma=False,
    )
    def run(sg, okq, uv, zq, pw, bxyz, bsigns, bvalid):
        # ---- this device's map block, projected into the query camera ----
        p_c = bxyz @ T_cw[:3, :3].T + T_cw[:3, 3]  # (blk, 3)
        z = p_c[:, 2]
        z_safe = jnp.maximum(z, 1e-6)
        pu = cam.fx * p_c[:, 0] / z_safe + cam.cx
        pv = cam.fy * p_c[:, 1] / z_safe + cam.cy
        proj_ok = bvalid & (z > cam.min_depth) & (z < cam.max_depth)

        d0 = hamming_matrix(sg, bsigns)  # (K, blk)
        d0 = jnp.where(okq[:, None] & proj_ok[None, :], d0, big)
        du = uv[:, 0:1] - pu[None, :]
        dv = uv[:, 1:2] - pv[None, :]
        z_ok = jnp.abs(zq[:, None] - z[None, :]) < z_rel_tol * jnp.maximum(
            zq[:, None], 0.3
        )
        d1 = jnp.where(
            (du * du + dv * dv < px_radius * px_radius) & z_ok, d0, big
        )

        base = jax.lax.axis_index(model_axis).astype(jnp.int32) * blk

        def block_winner(dm):
            j = jnp.argmin(dm, axis=1)
            return jnp.take_along_axis(dm, j[:, None], 1)[:, 0], base + j.astype(jnp.int32)

        b1, i1 = block_winner(d1)
        if kp_pts is not None:
            dist2 = (
                jnp.sum(pw * pw, axis=1)[:, None]
                + jnp.sum(bxyz * bxyz, axis=1)[None, :]
                - 2.0 * (pw @ bxyz.T)
            )
            b2, i2 = block_winner(
                jnp.where(dist2 < merge_radius * merge_radius, d0, big)
            )
        else:
            b2, i2 = jnp.full((K,), big), jnp.zeros((K,), jnp.int32)

        # ---- halo exchange: (n, K) block winners, argmin replicated -------
        cand = jax.lax.all_gather(
            jnp.stack([b1, b2]), model_axis, axis=0
        )  # (n, 2, K)
        which1 = jnp.argmin(cand[:, 0, :], axis=0)  # (K,) winning block
        which2 = jnp.argmin(cand[:, 1, :], axis=0)
        idx1 = jax.lax.all_gather(i1, model_axis, axis=0)  # (n, K)
        idx2 = jax.lax.all_gather(i2, model_axis, axis=0)
        g = jnp.arange(K)
        best1 = cand[which1, 0, g]
        best2 = cand[which2, 1, g]
        pid = jnp.where(best1 < max_distance, idx1[which1, g], -1)
        if kp_pts is not None:
            merge_pid = jnp.where(best2 < merge_max_distance, idx2[which2, g], -1)
            pid = jnp.where(pid >= 0, pid, merge_pid)
        return pid

    return run(signs, ok, kp_uv, kp_z, pts_w, pt_xyz, pt_signs, pt_valid)


# ------------------------------------------------------------- pose graph
def sharded_pose_graph(
    mesh: Mesh,
    poses: jax.Array,  # (M, 4, 4) replicated
    node_valid: jax.Array,  # (M,) replicated
    edges,  # EdgeList — every leaf sharded over `model` on axis 0
    iters: int = 10,
    damping: float = 1e-6,
    model_axis: str = "model",
):
    """Global pose-graph Gauss-Newton with EDGES sharded across the mesh.

    The distributed global-optimization layer (SURVEY.md §5's
    "ring-attention-style neighbor exchange over the pose graph"): poses
    are replicated (6M floats — tiny), the edge set — which grows with
    trajectory length and loop density — is block-sharded, each device
    assembles the (M, M, 6, 6) normal-equation blocks from its shard, and
    one psum over ICI completes the system; the dense (6M, 6M) solve is
    replicated (cheaper than sharding a small SPD solve). Numerically
    identical to `backend.pose_graph.optimize_pose_graph` up to reduction
    order (equality-tested on a CPU mesh).
    """
    from slam_rgbd_tpu.backend.pose_graph import PGResult, optimize_pose_graph

    axis = model_axis
    edge_spec = jax.tree_util.tree_map(lambda _: P(axis), edges)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(), P(), edge_spec),
        out_specs=(P(), P(), P()),
        check_vma=False,
    )
    def run(T, valid, e):
        res = optimize_pose_graph(
            T, valid, e, iters=iters, damping=damping, psum_axis=axis
        )
        return res.poses, res.rmse, res.n_edges

    T_out, rmse, n = run(poses, node_valid, edges)
    return PGResult(poses=T_out, rmse=rmse, n_edges=n)


# ----------------------------------------------------------------- matching
def sharded_hamming_match(
    mesh: Mesh,
    signs1: jax.Array,  # (K1, 256) — rows sharded over `model`
    valid1: jax.Array,
    signs2: jax.Array,  # (K2, 256) replicated
    valid2: jax.Array,
    max_distance: float = 64.0,
    ratio: float = 0.9,
    model_axis: str = "model",
):
    """All-pairs Hamming matching with query rows sharded over the mesh.

    Each device computes its (K1/n, K2) distance block on its MXU and its
    local best/second-best; results concatenate along the sharded axis.
    Cross-check runs on the gathered result (host of (K1,) ints, cheap).
    """

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(P(model_axis), P(model_axis), P(), P()),
        out_specs=(P(model_axis), P(model_axis), P(model_axis)),
        check_vma=False,
    )
    def run(s1, v1, s2, v2):
        from slam_rgbd_tpu.features.match import hamming_matrix

        d = hamming_matrix(s1, s2)
        big = jnp.float32(1e9)
        d = jnp.where(v1[:, None] & v2[None, :], d, big)
        neg_top2, idx_top2 = jax.lax.top_k(-d, 2)
        best = -neg_top2[:, 0]
        second = -neg_top2[:, 1]
        ok = (best < max_distance) & (best < ratio * second) & v1
        return idx_top2[:, 0].astype(jnp.int32), best, ok

    return run(signs1, valid1, signs2, valid2)
