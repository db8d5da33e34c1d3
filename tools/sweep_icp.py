"""Sweep ICP (iters, window_px) configs: tracking time vs odometry ATE.

Runs odometry-only tracking over a synthetic orbit (clean and noisy) on the
live backend and reports per-config: steady-state ms/frame (best-of-5
amortized) and ATE RMSE. Used to pick the default coarse-to-fine schedule.
"""

import sys
import time
from dataclasses import replace

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from slam_rgbd_tpu.benchmarks import enable_compile_cache
from slam_rgbd_tpu.core import camera
from slam_rgbd_tpu.core.config import astra_default_config
from slam_rgbd_tpu.eval.trajectory import ate_rmse
from slam_rgbd_tpu.io.synthetic import (
    SceneSpec, NoiseSpec, apply_sensor_noise, orbit_trajectory, render_frame,
)
from slam_rgbd_tpu.odometry.icp import track_frame


def render(cfg, n, noisy):
    spec = SceneSpec()
    poses = orbit_trajectory(n, spec)
    frames = []
    key = jax.random.PRNGKey(7)
    for i in range(n):
        d, c = render_frame(jnp.asarray(poses[i]), cfg.camera, spec)
        if noisy:
            key, k = jax.random.split(key)
            d, c = apply_sensor_noise(d, c, k, cfg.camera, NoiseSpec())
        frames.append((d, c))
    jax.block_until_ready(frames[-1][0])
    return np.asarray(poses), frames


def run_cfg(icp_cfg, cam, frames):
    @jax.jit
    def step(prev_pyr, d, c, T, motion):
        pyr = camera.build_frame_pyramid(d, cam, levels=icp_cfg.levels, rgb=c)
        T, m, res = track_frame(prev_pyr, pyr, T, motion, cam, icp_cfg)
        return pyr, T, m, res

    T = jnp.eye(4)
    motion = jnp.eye(4)
    pyr = jax.jit(
        lambda d, c: camera.build_frame_pyramid(d, cam, levels=icp_cfg.levels, rgb=c)
    )(*frames[0])
    traj = [np.eye(4)]
    for d, c in frames[1:]:
        pyr, T, motion, res = step(pyr, d, c, T, motion)
        traj.append(T)
    traj = np.asarray([np.asarray(t) for t in traj])

    # timing: steady state over the first 8 frames, best-of-5
    T = jnp.eye(4)
    motion = jnp.eye(4)
    best = 1e9
    for _ in range(5):
        t0 = time.perf_counter()
        for i in range(40):
            d, c = frames[i % 8]
            pyr, T, motion, res = step(pyr, d, c, T, motion)
        jax.block_until_ready(T)
        best = min(best, (time.perf_counter() - t0) / 40 * 1e3)
    return traj, best


def main():
    enable_compile_cache()
    cfg = astra_default_config()
    cam = cfg.camera
    n = 80
    gt, clean = render(cfg, n, noisy=False)
    _, noisy = render(cfg, n, noisy=True)

    sweeps = [
        ("baseline 10,7,5 / 8,4,2", (10, 7, 5), (8, 4, 2)),
        ("it 10,7,4  / 8,4,2", (10, 7, 4), (8, 4, 2)),
        ("it 10,6,4  / 8,3,2", (10, 6, 4), (8, 3, 2)),
        ("it 10,7,5  / 8,4,1", (10, 7, 5), (8, 4, 1)),
        ("it 10,7,4  / 8,3,1", (10, 7, 4), (8, 3, 1)),
        ("it 10,6,3  / 8,3,1", (10, 6, 3), (8, 3, 1)),
    ]
    for name, iters, win in sweeps:
        icp = replace(cfg.icp, iters=iters, window_px=win)
        traj_c, ms = run_cfg(icp, cam, clean)
        ate_c, _, _ = ate_rmse(traj_c, gt)
        traj_n, _ = run_cfg(icp, cam, noisy)
        ate_n, _, _ = ate_rmse(traj_n, gt)
        print(
            f"{name}: {ms:.2f} ms/frame  ATE clean {ate_c*100:.2f} cm  "
            f"noisy {ate_n*100:.2f} cm", flush=True,
        )


if __name__ == "__main__":
    main()
