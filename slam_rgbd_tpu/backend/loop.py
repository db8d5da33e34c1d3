"""Loop closure: binary-descriptor place recognition + geometric verification.

Replaces ORB-SLAM3's DBoW2 vocabulary + Sim3 solver capability with a
TPU-shaped design:

  * Place signature: each keyframe's keypoint sign-descriptors are averaged
    into a 256-d float vector and L2-normalized — a "soft BoW" embedding
    whose pairwise cosine similarity over ALL keyframes is one matmul
    against the stacked (M, 256) signature matrix.
  * Candidate gating: temporal separation (`loop_min_interval` keyframes),
    not currently covisible, similarity above `loop_min_score`.
  * Verification: full K x K Hamming matching between the two keyframes
    (MXU matmul) followed by the robust 3D-3D IRLS solve
    (`features/pose3d.py`). RGB-D depth gives metric scale, so a rigid
    solve replaces Sim3.

Everything returns fixed-shape candidates + masks; the runtime decides
host-side whether to commit the loop edge and run the pose graph.
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from slam_rgbd_tpu.features import match as fmatch
from slam_rgbd_tpu.features.pose3d import Pose3DResult, solve_pose3d
from slam_rgbd_tpu.mapping.map import MapState


def place_signatures(m: MapState) -> jax.Array:
    """(M, 256) L2-normalized mean-of-signs signatures for all keyframes.

    Recomputes from the raw descriptor store — the oracle for the
    incrementally-maintained `MapState.kf_sig` (which `insert_keyframe`
    fills row-by-row and `find_loop_candidate` reads; streaming the whole
    (M, K, 256) store per query cost ~100 MB of HBM traffic per backend
    pass)."""
    s = m.kp_signs.astype(jnp.float32)  # (M, K, 256)
    w = m.kp_ok.astype(jnp.float32)[..., None]
    mean = jnp.sum(s * w, axis=1) / jnp.maximum(jnp.sum(w, axis=1), 1.0)
    norm = jnp.linalg.norm(mean, axis=-1, keepdims=True)
    return jnp.where(norm > 1e-6, mean / jnp.maximum(norm, 1e-6), 0.0)


class LoopCandidate(NamedTuple):
    kf_idx: jax.Array  # () int32 best candidate keyframe
    score: jax.Array  # () float32 cosine similarity
    ok: jax.Array  # () bool passed gating


@functools.partial(jax.jit, static_argnames=("min_interval",))
def find_loop_candidate(
    m: MapState,
    query_idx: jax.Array,
    min_interval: int = 20,
    min_score: float = 0.20,
    max_covis: int = 5,
) -> LoopCandidate:
    """Best loop candidate for keyframe `query_idx` (device-side gating)."""
    sig = m.kf_sig  # (M, 256), maintained incrementally on insert
    q = sig[query_idx]
    sim = sig @ q  # (M,)
    idx = jnp.arange(m.capacity_kf)
    old_enough = idx < (query_idx - min_interval)
    not_covis = m.covis[query_idx] <= max_covis
    eligible = m.kf_valid & old_enough & not_covis
    sim = jnp.where(eligible, sim, -1.0)
    best = jnp.argmax(sim)
    return LoopCandidate(
        kf_idx=best.astype(jnp.int32),
        score=sim[best],
        ok=sim[best] > min_score,
    )


class LoopVerification(NamedTuple):
    T_rel: jax.Array  # (4, 4): T_cand_query — query-cam points -> cand-cam
    inliers: jax.Array
    n_matches: jax.Array
    ok: jax.Array


@jax.jit
def verify_loop(
    m: MapState,
    query_idx: jax.Array,
    cand_idx: jax.Array,
    max_distance: float = 64.0,
    min_matches: int = 25,
) -> LoopVerification:
    """Descriptor-match the two keyframes and solve the relative pose.

    Returns T_rel mapping query-camera coordinates into candidate-camera
    coordinates (the measurement for a pose-graph edge cand -> query after
    inversion, see runtime).
    """
    s1 = m.kp_signs[query_idx]
    s2 = m.kp_signs[cand_idx]
    ok1 = m.kp_ok[query_idx]
    ok2 = m.kp_ok[cand_idx]
    mt = fmatch.match(s1, ok1, s2, ok2, max_distance=max_distance, ratio=0.9)

    p1 = m.kp_pts[query_idx]  # (K, 3) query-camera frame
    p2 = m.kp_pts[cand_idx][mt.idx2]  # matched candidate-camera points
    res: Pose3DResult = solve_pose3d(p1, p2, mt.valid, iters=8)
    n_m = jnp.sum(mt.valid)
    # Acceptance needs CONSENSUS, not just a count: repeating texture
    # yields aliased match sets that are mutually consistent, and a
    # 30-inlier wrong solution out of 400 matches used to pass (and bend
    # the whole trajectory through the pose graph). Requiring the solve
    # to explain >= 50% of all matches, tightly (rmse < 6 cm), makes a
    # structured-alias win much harder than a genuine revisit.
    consensus = res.inliers >= 0.5 * n_m.astype(jnp.float32)
    return LoopVerification(
        T_rel=res.T,
        inliers=res.inliers,
        n_matches=n_m,
        ok=res.ok & (n_m >= min_matches) & consensus & (res.rmse < 0.06),
    )
