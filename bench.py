"""Benchmark: steady-state RGB-D tracking throughput on one chip.

Measures the full per-frame hot path — depth->pyramid (bilateral filter,
vertex/normal maps) + coarse-to-fine geometric+photometric GN tracking —
at the reference's operating point: 640x480 RGB-D (BASELINE.md: the
reference paces everything to 30 fps, `sensorModule.c:242-243`; no
published throughput exists, so 30 fps real-time is the baseline).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np


def main():
    from slam_rgbd_tpu.core import camera
    from slam_rgbd_tpu.core.config import astra_default_config
    from slam_rgbd_tpu.io.synthetic import SceneSpec, orbit_trajectory, render_frame
    from slam_rgbd_tpu.odometry.icp import track_frame

    cfg = astra_default_config()
    cam = cfg.camera

    # A short synthetic orbit rendered on device (realistic depth/rgb content).
    n_frames = 8
    spec = SceneSpec()
    poses = orbit_trajectory(n_frames, spec)
    frames = []
    for i in range(n_frames):
        d, c = render_frame(jnp.asarray(poses[i]), cam, spec)
        frames.append((jax.device_put(d), jax.device_put(c)))
    jax.block_until_ready(frames[-1])

    # The steady-state hot path builds ONE pyramid per frame and tracks
    # against the cached previous pyramid, exactly like
    # `runtime.session.SLAMSession.process_frame`.
    @jax.jit
    def step(prev_pyr, depth_cur, rgb_cur, T_world, motion):
        cur_pyr = camera.build_frame_pyramid(
            depth_cur, cam, levels=cfg.icp.levels, rgb=rgb_cur
        )
        T, m, res = track_frame(prev_pyr, cur_pyr, T_world, motion, cam, cfg.icp)
        return cur_pyr, T, m, res

    pyramid = jax.jit(
        lambda d, c: camera.build_frame_pyramid(d, cam, levels=cfg.icp.levels, rgb=c)
    )
    T = jnp.eye(4)
    motion = jnp.eye(4)

    # warmup / compile
    pyr = pyramid(*frames[0])
    pyr, T, motion, res = step(pyr, *frames[1], T, motion)
    jax.block_until_ready(T)

    iters = 120
    t0 = time.perf_counter()
    for i in range(iters):
        b = frames[i % (n_frames - 1) + 1]
        pyr, T, motion, res = step(pyr, *b, T, motion)
    jax.block_until_ready(T)
    dt = time.perf_counter() - t0
    fps = iters / dt

    baseline_fps = 30.0  # the reference's real-time operating target
    print(
        json.dumps(
            {
                "metric": "rgbd_tracking_fps_per_chip_640x480",
                "value": round(fps, 2),
                "unit": "frames/sec",
                "vs_baseline": round(fps / baseline_fps, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
