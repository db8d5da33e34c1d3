"""Point-cloud export: PLY files + JSON payloads for the web viewer.

Capability parity with the reference's presentation layer:
  * the OpenGL viewer's colored back-projection
    (`Youth.Source/ViewerModule/viewerModule.c:321-367`) becomes
    `frame_to_pointcloud` — one vectorized op instead of a 307k-iteration
    immediate-mode loop;
  * the web pipeline's JSON point payload (`Youth.App/Youth.Web/BackEnd/
    server/server.js:7-29` + the commented exporters in
    `astra_wrapper.cpp:74-140`) becomes `pointcloud_json` consumed by
    `viz.server`.

PLY output opens in any 3D tool (MeshLab, CloudCompare, Open3D).
"""

from __future__ import annotations

import json
import struct

import jax.numpy as jnp
import numpy as np

from slam_rgbd_tpu.core import camera
from slam_rgbd_tpu.core.config import CameraIntrinsics


def frame_to_pointcloud(
    depth_raw: np.ndarray,
    rgb: np.ndarray | None,
    cam: CameraIntrinsics,
    stride: int = 1,
    T_world_cam: np.ndarray | None = None,
):
    """(N, 3) positions + (N, 3) uint8 colors from one RGB-D frame.

    Invalid-depth pixels are dropped; `stride` subsamples; points are
    world-frame when a pose is given, else camera-frame.
    """
    depth_m = camera.depth_to_metres(jnp.asarray(depth_raw), cam)
    verts = np.asarray(camera.backproject(depth_m, cam))
    valid = verts[..., 2] > 0
    verts = verts[::stride, ::stride]
    valid = valid[::stride, ::stride]
    pts = verts[valid]
    if rgb is not None:
        colors = np.asarray(rgb)[::stride, ::stride][valid]
    else:
        colors = np.full((len(pts), 3), 200, np.uint8)
    if T_world_cam is not None:
        pts = pts @ np.asarray(T_world_cam)[:3, :3].T + np.asarray(T_world_cam)[:3, 3]
    return pts.astype(np.float32), colors.astype(np.uint8)


def map_to_pointcloud(map_state) -> tuple[np.ndarray, np.ndarray]:
    """Map points of a `MapState` as a colored cloud (uniform color)."""
    valid = np.asarray(map_state.pt_valid)
    pts = np.asarray(map_state.pt_xyz)[valid]
    colors = np.full((len(pts), 3), (120, 180, 255), np.uint8)
    return pts.astype(np.float32), colors


def save_ply(path: str, pts: np.ndarray, colors: np.ndarray | None = None,
             binary: bool = True) -> None:
    """Write a point cloud as PLY (binary_little_endian or ascii)."""
    n = len(pts)
    has_color = colors is not None
    header = ["ply"]
    header.append("format binary_little_endian 1.0" if binary else "format ascii 1.0")
    header += [f"element vertex {n}",
               "property float x", "property float y", "property float z"]
    if has_color:
        header += ["property uchar red", "property uchar green", "property uchar blue"]
    header.append("end_header")
    with open(path, "wb") as f:
        f.write(("\n".join(header) + "\n").encode())
        if binary:
            if has_color:
                rec = np.zeros(n, dtype=[("xyz", np.float32, 3), ("rgb", np.uint8, 3)])
                rec["xyz"] = pts
                rec["rgb"] = colors
                f.write(rec.tobytes())
            else:
                f.write(pts.astype("<f4").tobytes())
        else:
            for i in range(n):
                row = f"{pts[i,0]:.5f} {pts[i,1]:.5f} {pts[i,2]:.5f}"
                if has_color:
                    row += f" {colors[i,0]} {colors[i,1]} {colors[i,2]}"
                f.write((row + "\n").encode())


def load_ply(path: str):
    """Read back a PLY written by `save_ply` (for tests/tools)."""
    with open(path, "rb") as f:
        header = []
        while True:
            line = f.readline().decode().strip()
            header.append(line)
            if line == "end_header":
                break
        n = int(next(h for h in header if h.startswith("element vertex")).split()[-1])
        binary = any("binary" in h for h in header)
        has_color = any("red" in h for h in header)
        if binary:
            if has_color:
                rec = np.frombuffer(
                    f.read(n * 15), dtype=[("xyz", np.float32, 3), ("rgb", np.uint8, 3)]
                )
                return rec["xyz"].copy(), rec["rgb"].copy()
            return np.frombuffer(f.read(n * 12), dtype="<f4").reshape(n, 3).copy(), None
        pts, cols = [], []
        for _ in range(n):
            parts = f.readline().split()
            pts.append([float(x) for x in parts[:3]])
            if has_color:
                cols.append([int(x) for x in parts[3:6]])
        return (np.asarray(pts, np.float32),
                np.asarray(cols, np.uint8) if cols else None)


def pointcloud_json(pts: np.ndarray, colors: np.ndarray | None = None,
                    max_points: int = 100_000) -> str:
    """JSON payload in the web frontend's format: {positions, colors} flat
    arrays (`Youth.App/Youth.Web/FrontEnd/public/main.js:20-46` consumes
    exactly this shape)."""
    if len(pts) > max_points:
        idx = np.linspace(0, len(pts) - 1, max_points).astype(int)
        pts = pts[idx]
        colors = colors[idx] if colors is not None else None
    payload = {"positions": np.round(pts, 4).flatten().tolist()}
    if colors is not None:
        payload["colors"] = (colors.astype(np.float32) / 255.0).round(4).flatten().tolist()
    return json.dumps(payload)
