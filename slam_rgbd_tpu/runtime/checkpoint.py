"""Checkpoint / resume of the full SLAM state.

The reference has two persistence forms (SURVEY.md §5): raw-stream
recordings (handled by `io.stream`) and result export (TUM trajectories,
`SLAM.cpp:187-188`; its map *save* is an unimplemented stub). Here the
entire SLAM state — map pytree, pose-graph edges, live pose, trajectory —
checkpoints to a single directory and restores into a running session,
giving the resume-from-checkpoint capability the reference only intended.

Format: a compressed npz of the flattened pytree plus a JSON metadata
sidecar — every leaf is a fixed-capacity array, so a flat archive has the
same fidelity as a structured checkpointer.
"""

from __future__ import annotations

import json
import os
from typing import TYPE_CHECKING

import jax
import jax.numpy as jnp
import numpy as np

if TYPE_CHECKING:  # pragma: no cover
    from slam_rgbd_tpu.runtime.session import SLAMSession


def _flatten_state(session: "SLAMSession") -> dict:
    arrays: dict[str, np.ndarray] = {}
    map_leaves, map_tree = jax.tree_util.tree_flatten(session.map)
    for i, leaf in enumerate(map_leaves):
        arrays[f"map_{i}"] = np.asarray(leaf)
    edge_leaves, _ = jax.tree_util.tree_flatten(session.edges)
    for i, leaf in enumerate(edge_leaves):
        arrays[f"edges_{i}"] = np.asarray(leaf)
    arrays["n_edges"] = np.asarray(session.n_edges)
    arrays["T_world"] = np.asarray(session.T_world)
    arrays["motion"] = np.asarray(session.motion)
    ts, traj_T, kf_idx, kf_T = session._traj_arrays()
    arrays["traj_ts"] = ts
    arrays["traj_T"] = traj_T
    arrays["frame_kf_idx"] = kf_idx
    arrays["kf_T_at_frame"] = kf_T
    return arrays


def save(session: "SLAMSession", path: str) -> None:
    os.makedirs(path, exist_ok=True)
    session.flush_pipeline()  # finalize the newest frame's decisions
    arrays = _flatten_state(session)
    np.savez_compressed(os.path.join(path, "state.npz"), **arrays)
    meta = {
        "frames": session.state.frames,
        "keyframes": session.state.keyframes,
        "loops": session.state.loops,
        "last_kf_idx": session.last_kf_idx,
        "n_kf": session._n_kf_host,
        "format_version": 1,
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def restore(session: "SLAMSession", path: str) -> "SLAMSession":
    """Restore state in place into a freshly constructed session (same
    config/capacities) and return it."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    data = np.load(os.path.join(path, "state.npz"))

    map_leaves, map_tree = jax.tree_util.tree_flatten(session.map)
    new_map_leaves = []
    for i, leaf in enumerate(map_leaves):
        arr = data[f"map_{i}"]
        if arr.shape != leaf.shape:
            raise ValueError(
                f"checkpoint shape mismatch for map leaf {i}: "
                f"{arr.shape} vs {leaf.shape} — config capacities must match"
            )
        new_map_leaves.append(jnp.asarray(arr))
    session.map = jax.tree_util.tree_unflatten(map_tree, new_map_leaves)

    edge_leaves, edge_tree = jax.tree_util.tree_flatten(session.edges)
    session.edges = jax.tree_util.tree_unflatten(
        edge_tree, [jnp.asarray(data[f"edges_{i}"]) for i in range(len(edge_leaves))]
    )
    session.n_edges = jnp.asarray(data["n_edges"])
    session.T_world = jnp.asarray(data["T_world"])
    session.motion = jnp.asarray(data["motion"])
    session._restore_traj(
        data["traj_ts"], data["traj_T"], data["frame_kf_idx"],
        data["kf_T_at_frame"],
    )
    session.last_kf_idx = int(meta["last_kf_idx"])
    if session.last_kf_idx >= 0:
        session.last_kf_T = session.map.kf_pose[session.last_kf_idx]
    session.state.frames = meta["frames"]
    session.state.keyframes = meta["keyframes"]
    session.state.loops = meta["loops"]
    session._n_kf_host = meta.get("n_kf", meta["keyframes"])
    session._pending.clear()
    session._frame_i = meta["frames"]
    session._last_kf_frame_i = -(10 ** 9)
    session.prev_pyr = None  # next frame re-bootstraps tracking reference
    return session
