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
from slam_rgbd_tpu.core.config import BAConfig, CameraIntrinsics, ICPConfig
from slam_rgbd_tpu.odometry.icp import icp_align


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
    """Track B sequences concurrently, sharded over the `data` axis."""
    spec_tree = jax.tree_util.tree_map(lambda _: P(data_axis), src_pyrs)

    @functools.partial(
        shard_map,
        mesh=mesh,
        in_specs=(spec_tree, spec_tree, P(data_axis)),
        out_specs=(P(data_axis), P(data_axis), P(data_axis), P(data_axis)),
        check_vma=False,
    )
    def run(src, tgt, T0):
        res = jax.vmap(
            lambda s, t, T: icp_align(s, t, T, cam, cfg)
        )(src, tgt, T0)
        return res.T, res.inliers, res.rmse, res.valid_fraction

    return run(src_pyrs, tgt_pyrs, T_init)


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
