"""Worker for the 2-process `jax.distributed` smoke test (not collected).

Each process owns ONE CPU device; together they form a 1x2 (data, model)
mesh across process boundaries — the minimal DCN topology of SURVEY.md §5
("multi-host tests without a cluster via jax.distributed multi-process on
CPU"). Process 0 also runs the single-device `local_ba` on the same
problem and asserts the sharded result matches.

Usage: python tests/mp_worker.py <coordinator> <n_procs> <pid>
"""

import os
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=1"
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main(coordinator: str, n_procs: int, pid: int) -> None:
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    from slam_rgbd_tpu.backend import ba
    from slam_rgbd_tpu.core import se3
    from slam_rgbd_tpu.core.config import BAConfig, CameraIntrinsics, MeshConfig
    from slam_rgbd_tpu.parallel import dist, mesh as pmesh

    pmesh.initialize_distributed(coordinator, n_procs, pid)
    assert jax.process_count() == n_procs, jax.process_count()
    assert len(jax.devices()) == n_procs  # one CPU device per process

    cam = CameraIntrinsics(fx=120.0, fy=120.0, cx=79.5, cy=59.5,
                           width=160, height=120)

    # Deterministic BA problem (same on every process).
    rng = np.random.default_rng(0)
    W, n_pts = 3, 64
    pts_w = np.stack([
        rng.uniform(-1.5, 1.5, n_pts), rng.uniform(-1, 1, n_pts),
        rng.uniform(2, 4, n_pts)], 1).astype(np.float32)
    poses = [np.eye(4, dtype=np.float32)]
    for _ in range(W - 1):
        poses.append(poses[-1] @ np.asarray(se3.exp(jnp.asarray(
            np.array([0.06, 0.01, 0.02, 0.01, 0.02, 0.0], np.float32)))))
    poses = np.stack(poses)
    obs_uv = np.zeros((W, n_pts, 2), np.float32)
    obs_z = np.zeros((W, n_pts), np.float32)
    obs_ok = np.zeros((W, n_pts), bool)
    for w in range(W):
        T_cw = np.linalg.inv(poses[w])
        pc = pts_w @ T_cw[:3, :3].T + T_cw[:3, 3]
        u = cam.fx * pc[:, 0] / pc[:, 2] + cam.cx
        v = cam.fy * pc[:, 1] / pc[:, 2] + cam.cy
        obs_uv[w] = np.stack([u + rng.normal(0, 0.3, n_pts),
                              v + rng.normal(0, 0.3, n_pts)], 1)
        obs_z[w] = pc[:, 2]
        obs_ok[w] = (u > 0) & (u < 160) & (v > 0) & (v < 120)
    obs_pid = np.tile(np.arange(n_pts, dtype=np.int32), (W, 1))
    poses_init = poses.copy()
    for w in range(1, W):
        xi = (rng.normal(size=6) * 0.01).astype(np.float32)
        poses_init[w] = poses[w] @ np.asarray(se3.exp(jnp.asarray(xi)))
    pts_init = pts_w + rng.normal(size=pts_w.shape).astype(np.float32) * 0.01
    cfg = BAConfig(iters=3)

    # Global mesh spanning both processes; explicit global shardings
    # (multi-process arrays are constructed, not inferred).
    mesh = pmesh.make_mesh(MeshConfig(data=1, model=n_procs))

    def put(x, spec):
        return jax.device_put(jnp.asarray(x), NamedSharding(mesh, spec))

    args = (
        put(poses_init, P()), put(np.ones(W, bool), P()), put(pts_init, P()),
        put(obs_uv, P(None, "model", None)), put(obs_z, P(None, "model")),
        put(obs_pid, P(None, "model")), put(obs_ok, P(None, "model")),
    )
    res = dist.sharded_local_ba(mesh, *args, cam, cfg)
    kf = np.asarray(res.kf_pose)  # replicated output: fully addressable
    pt = np.asarray(res.pt_xyz)

    if pid == 0:
        ref = ba.local_ba(
            jnp.asarray(poses_init), jnp.ones(W, bool), jnp.asarray(pts_init),
            jnp.asarray(obs_uv), jnp.asarray(obs_z), jnp.asarray(obs_pid),
            jnp.asarray(obs_ok), cam, cfg,
        )
        d_kf = float(np.abs(kf - np.asarray(ref.kf_pose)).max())
        d_pt = float(np.abs(pt - np.asarray(ref.pt_xyz)).max())
        assert d_kf < 5e-5 and d_pt < 5e-4, (d_kf, d_pt)
        assert int(res.n_obs) == int(ref.n_obs)
        print(f"MULTIPROC OK kf_diff={d_kf:.2e} pt_diff={d_pt:.2e} "
              f"n_obs={int(res.n_obs)}", flush=True)


if __name__ == "__main__":
    main(sys.argv[1], int(sys.argv[2]), int(sys.argv[3]))
