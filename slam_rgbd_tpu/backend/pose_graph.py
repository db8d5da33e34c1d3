"""Pose-graph Gauss-Newton over keyframe poses (loop-closure backend).

Fixed-capacity edge list (odometry chain + loop constraints); residual per
edge r = log(T_meas^-1 T_i^-1 T_j) with the standard small-residual
Jacobians J_j = I, J_i = -Ad(T_j^-1 T_i) (right-multiplicative updates).
The (6M, 6M) system is assembled by block scatter and solved densely — at
M=256 keyframes that is a 1536x1536 SPD solve, which is MXU-friendly work,
not a sparse-graph traversal (BASELINE.json: "pose-graph Gauss-Newton runs
as sharded sparse matvecs" — the `parallel/` layer shards the edge-block
assembly; the dense solve stays replicated).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
from flax import struct

from slam_rgbd_tpu.core import se3


@struct.dataclass
class EdgeList:
    """Fixed-capacity relative-pose constraints."""

    i: jax.Array  # (E,) int32 source node
    j: jax.Array  # (E,) int32 target node
    T_meas: jax.Array  # (E, 4, 4) measured T_i^-1 T_j
    weight: jax.Array  # (E,) float32
    valid: jax.Array  # (E,) bool

    @classmethod
    def empty(cls, capacity: int) -> "EdgeList":
        return cls(
            i=jnp.zeros(capacity, jnp.int32),
            j=jnp.zeros(capacity, jnp.int32),
            T_meas=jnp.tile(jnp.eye(4, dtype=jnp.float32), (capacity, 1, 1)),
            weight=jnp.zeros(capacity, jnp.float32),
            valid=jnp.zeros(capacity, bool),
        )

    def add(self, n_edges: jax.Array, i, j, T_meas, weight=1.0):
        """Functional append at slot `n_edges` (drops silently when full)."""
        E = self.i.shape[0]
        slot = jnp.minimum(n_edges, E - 1)
        room = n_edges < E
        new = EdgeList(
            i=self.i.at[slot].set(jnp.int32(i)),
            j=self.j.at[slot].set(jnp.int32(j)),
            T_meas=self.T_meas.at[slot].set(T_meas),
            weight=self.weight.at[slot].set(weight),
            valid=self.valid.at[slot].set(True),
        )
        return jax.tree_util.tree_map(lambda a, b: jnp.where(room, a, b), new, self), n_edges + room


class PGResult(NamedTuple):
    poses: jax.Array  # (M, 4, 4) optimized
    rmse: jax.Array  # () residual RMSE over valid edges
    n_edges: jax.Array  # () int32


@functools.partial(jax.jit, static_argnames=("iters", "psum_axis"))
def optimize_pose_graph(
    poses: jax.Array,  # (M, 4, 4) camera-to-world keyframe poses
    node_valid: jax.Array,  # (M,) bool
    edges: EdgeList,
    iters: int = 10,
    damping: float = 1e-6,
    psum_axis: str | None = None,  # set under shard_map: edge axis
) -> PGResult:
    """Gauss-Newton with node 0 (first valid) fixed as gauge.

    With `psum_axis` set (inside `shard_map`), each device assembles the
    (M, M, 6, 6) block system from ITS edge shard and a psum over the
    edge axis completes it — the distributed global-optimization assembly
    (poses replicated, edges sharded, small solve replicated); see
    `parallel.dist.sharded_pose_graph`.
    """
    M = poses.shape[0]
    D = 6 * M
    first = jnp.argmax(node_valid)
    free = node_valid & (jnp.arange(M) != first)

    def _r(x):
        return x if psum_axis is None else jax.lax.psum(x, psum_axis)

    ew = edges.weight * edges.valid.astype(jnp.float32)

    def body(_, T):
        Ti = T[edges.i]  # (E, 4, 4)
        Tj = T[edges.j]
        E_err = jax.vmap(lambda m, a, b: se3.inverse(m) @ se3.inverse(a) @ b)(
            edges.T_meas, Ti, Tj
        )
        r = jax.vmap(se3.log)(E_err)  # (E, 6)
        Ad = jax.vmap(lambda a, b: se3.adjoint(se3.inverse(b) @ a))(Ti, Tj)  # (E,6,6)
        Jj = jnp.broadcast_to(jnp.eye(6), Ad.shape)
        Ji = -Ad

        w = ew[:, None, None]
        # block contributions
        Hii = jnp.einsum("eab,eac->ebc", Ji, Ji * w)
        Hjj = jnp.einsum("eab,eac->ebc", Jj, Jj * w)
        Hij = jnp.einsum("eab,eac->ebc", Ji, Jj * w)
        gi = jnp.einsum("eab,ea->eb", Ji * w, r)
        gj = jnp.einsum("eab,ea->eb", Jj * w, r)

        Hb = jnp.zeros((M, M, 6, 6))
        Hb = Hb.at[edges.i, edges.i].add(Hii)
        Hb = Hb.at[edges.j, edges.j].add(Hjj)
        Hb = Hb.at[edges.i, edges.j].add(Hij)
        Hb = Hb.at[edges.j, edges.i].add(jnp.swapaxes(Hij, -1, -2))
        Hb = _r(Hb)
        g = _r(jnp.zeros((M, 6)).at[edges.i].add(gi).at[edges.j].add(gj))

        H = jnp.swapaxes(Hb, 1, 2).reshape(D, D)
        gv = g.reshape(D)

        fmask = jnp.repeat(free, 6)
        H = jnp.where(fmask[:, None] & fmask[None, :], H, 0.0)
        H = H.at[jnp.arange(D), jnp.arange(D)].add(jnp.where(fmask, damping, 1.0))
        gv = jnp.where(fmask, gv, 0.0)

        # Jacobi-preconditioned CG instead of jnp.linalg.solve: the damped
        # GN system is SPD, and at M=256 keyframes the (1536, 1536) LU is
        # a serialized custom call repeated every GN iteration — CG is
        # pure matvec (MXU) and fuses with the assembly. GN steps only
        # need an inexact solve; D matvecs is the exact-solve bound.
        d_scale = 1.0 / jnp.sqrt(jnp.maximum(jnp.diagonal(H), 1e-12))
        H_hat = H * d_scale[:, None] * d_scale[None, :]
        # tol must be float32-achievable: CG's relative residual stalls
        # around 1e-6..1e-7 in f32, so 1e-8 would always run the full
        # maxiter matvec budget. GN only needs an inexact solve anyway.
        x, _ = jax.scipy.sparse.linalg.cg(
            lambda v: H_hat @ v, -gv * d_scale, tol=1e-5, maxiter=256
        )
        d = (x * d_scale).reshape(M, 6)

        def apply(Tk, dk, fk):
            Tn = se3.normalize_rotation(Tk @ se3.exp(dk))
            return jnp.where(fk, Tn, Tk)

        return jax.vmap(apply)(T, d, free)

    T_out = jax.lax.fori_loop(0, iters, body, poses)

    # final residual stats
    Ei = jax.vmap(lambda m, a, b: se3.inverse(m) @ se3.inverse(a) @ b)(
        edges.T_meas, T_out[edges.i], T_out[edges.j]
    )
    r = jax.vmap(se3.log)(Ei)
    n = _r(jnp.sum(edges.valid))
    rmse = jnp.sqrt(
        _r(jnp.sum(jnp.where(edges.valid[:, None], r * r, 0.0)))
        / jnp.maximum(n, 1)
    )
    return PGResult(poses=T_out, rmse=rmse, n_edges=n)
