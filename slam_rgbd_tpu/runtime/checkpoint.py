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


def _map_fields(m) -> list[str]:
    """Array-field names of MapState in declaration order."""
    import dataclasses

    return [f.name for f in dataclasses.fields(m)]


def _flatten_state(session: "SLAMSession") -> dict:
    arrays: dict[str, np.ndarray] = {}
    # Map leaves are keyed BY FIELD NAME (format_version 2): positional
    # `map_{i}` keys silently misalign whenever MapState gains a field
    # (adding `kf_sig` mid-struct shifted every later leaf and made v1
    # checkpoints fail restore with a misleading capacity error).
    for name in _map_fields(session.map):
        arrays[f"map.{name}"] = np.asarray(getattr(session.map, name))
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
        "format_version": 2,
    }
    with open(os.path.join(path, "meta.json"), "w") as f:
        json.dump(meta, f)


def restore(session: "SLAMSession", path: str) -> "SLAMSession":
    """Restore state in place into a freshly constructed session (same
    config/capacities) and return it."""
    with open(os.path.join(path, "meta.json")) as f:
        meta = json.load(f)
    data = np.load(os.path.join(path, "state.npz"))

    version = meta.get("format_version", 1)
    fields = _map_fields(session.map)
    if version >= 2:
        named = {name: data[f"map.{name}"] for name in fields}
    else:
        # v1 layout: positional map_{i} keys in field order, saved before
        # `kf_sig` existed — map positionally over the OLD field list and
        # backfill the signature rows from the restored descriptors.
        old_fields = [f for f in fields if f != "kf_sig"]
        if len([k for k in data.files if k.startswith("map_")]) != len(
            old_fields
        ):
            raise ValueError(
                "unrecognized v1 checkpoint layout: "
                f"{len([k for k in data.files if k.startswith('map_')])} "
                f"map leaves vs {len(old_fields)} known fields"
            )
        named = {name: data[f"map_{i}"] for i, name in enumerate(old_fields)}
    for name in fields:
        if name not in named:
            continue
        want = getattr(session.map, name)
        if named[name].shape != tuple(want.shape):
            raise ValueError(
                f"checkpoint shape mismatch for map.{name}: "
                f"{named[name].shape} vs {tuple(want.shape)} — config "
                "capacities must match"
            )
    session.map = session.map.replace(
        **{name: jnp.asarray(arr) for name, arr in named.items()}
    )
    if version < 2:
        from slam_rgbd_tpu.backend.loop import place_signatures

        session.map = session.map.replace(
            kf_sig=place_signatures(session.map)
        )

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
