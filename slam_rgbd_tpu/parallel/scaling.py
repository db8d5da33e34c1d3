"""Scaling-efficiency harness: frames/s vs mesh size (BASELINE.md:32).

The embarrassingly-parallel workload is multi-sequence odometry
(`dist.batch_track`: B sequences sharded over the `data` axis — the
multi-sequence batch mode of BASELINE.json configs[4]). The reference has
no scaling story at all (single host, POSIX queues, SURVEY.md §2); the
target here is >= 70% frames/s efficiency from 1 chip to 2 hosts.

Two measurements, because the build environment has ONE real chip:

  * `mesh_scaling` — frames/s at mesh sizes {1, 2, 4, ...} with B = n
    sequences, one per device. On real multi-chip hardware this IS the
    scaling-efficiency number. On a virtual CPU mesh (tests/CI) it
    validates the sharded program end-to-end; the timing is protocol
    overhead only (virtual devices share the host cores, so compute
    cannot speed up — efficiency numbers are reported with
    `hardware: "virtual-cpu"` and are not the BASELINE claim).
  * `batch_scaling` — frames/s at B = {1, 2, 4, ...} sequences on ONE
    device. Real hardware signal for how much headroom the chip has to
    host multiple sequence-shards — the upper bound a multi-chip mesh
    scales against.

Each entry reports frames/s and efficiency = fps(n) / (n * fps(1)).
"""

from __future__ import annotations

import time

import jax
import jax.numpy as jnp
import numpy as np

from slam_rgbd_tpu.core import camera
from slam_rgbd_tpu.core.config import CameraIntrinsics, ICPConfig, MeshConfig
from slam_rgbd_tpu.parallel import dist
from slam_rgbd_tpu.parallel.mesh import make_mesh


def _stack_pyramids(pyrs):
    """List of per-frame pyramids -> one pyramid with a leading batch axis."""
    return jax.tree.map(lambda *xs: jnp.stack(xs), *pyrs)


def _tile_batch(tree, b: int):
    """Tile a batch-1 pytree to batch `b` along the leading axis."""
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (b,) + x.shape[1:]) if x.shape[0] == 1 else x,
        tree,
    )


def _make_pair(cam: CameraIntrinsics, cfg: ICPConfig):
    """One (src, tgt) pyramid pair with a leading batch axis of 1."""
    from slam_rgbd_tpu.io.synthetic import SceneSpec, orbit_trajectory, render_frame

    spec = SceneSpec()
    poses = orbit_trajectory(2, spec, step_t=0.015, step_r=0.012)
    pyrs = []
    for i in range(2):
        d, c = render_frame(jnp.asarray(poses[i]), cam, spec)
        pyrs.append(camera.build_frame_pyramid(d, cam, levels=cfg.levels, rgb=c))
    src = _stack_pyramids([pyrs[0]])
    tgt = _stack_pyramids([pyrs[1]])
    return src, tgt


def _time_steps(fn, iters: int) -> float:
    """Wall time of `iters` calls of `fn(i)`.

    `fn` must vary its operand values with `i`: repeated dispatches of a
    pure program with unchanged operands can be served without
    re-execution on the tunneled TPU platform (see
    `benchmarks._time_device_chain`), which turns the timing into a
    transport benchmark."""
    out = fn(0)  # warmup/compile
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(i + 1)
    jax.block_until_ready(out)
    return time.perf_counter() - t0


def batch_scaling(
    cam: CameraIntrinsics,
    cfg: ICPConfig,
    batches=(1, 2, 4),
    iters: int = 20,
) -> list[dict]:
    """Frames/s at batch sizes B on ONE device (batched tracking).

    Runs `icp_align_batched`: B problems stream through the fused Pallas
    GN kernel's (B, n_tiles) grid in one dispatch (round 4's vmapped XLA
    fallback collapsed to 6.5% efficiency at B=8; the batched kernel
    holds ~1.0 since each problem keeps the single-problem kernel's
    speed)."""
    from slam_rgbd_tpu.odometry.icp import icp_align_batched

    src1, tgt1 = _make_pair(cam, cfg)
    rows = []
    for b in batches:
        src, tgt = _tile_batch(src1, b), _tile_batch(tgt1, b)
        T0 = jnp.broadcast_to(jnp.eye(4), (b, 4, 4))
        step = jax.jit(
            lambda s, t, T: icp_align_batched(s, t, T, cam, cfg).T
        )
        dt = _time_steps(lambda i: step(src, tgt, T0 + i * 1e-7), iters)
        fps = b * iters / dt
        rows.append({
            "batch": b,
            "frames_per_s": round(fps, 2),
            "step_ms": round(1e3 * dt / iters, 2),
        })
    base = rows[0]["frames_per_s"]
    prev = None
    for r in rows:
        r["efficiency"] = round(r["frames_per_s"] / (r["batch"] * base), 3)
        # marginal device cost of each ADDED sequence: on a sequential-
        # grid batched kernel this is the per-problem kernel time, and it
        # approaching step_ms(B=1) is the direct evidence that ONE
        # problem already saturates the chip (the kernel occupies the
        # whole VPU) — per-chip "efficiency" then measures amortized
        # dispatch overhead, not wasted compute, and multi-sequence
        # scaling is the data mesh's job (BASELINE.md:32).
        if prev is not None:
            r["marginal_ms_per_seq"] = round(
                (r["step_ms"] - prev["step_ms"]) / (r["batch"] - prev["batch"]),
                2,
            )
        prev = r
    return rows


def mesh_scaling(
    cam: CameraIntrinsics,
    cfg: ICPConfig,
    mesh_sizes=None,
    iters: int = 10,
) -> list[dict]:
    """Frames/s of `dist.batch_track` at mesh sizes {1, 2, 4, ...}."""
    n_dev = len(jax.devices())
    if mesh_sizes is None:
        mesh_sizes = [n for n in (1, 2, 4, 8) if n <= n_dev]
    src1, tgt1 = _make_pair(cam, cfg)
    rows = []
    for n in mesh_sizes:
        mesh = make_mesh(MeshConfig(data=n, model=1), devices=jax.devices()[:n])
        src, tgt = _tile_batch(src1, n), _tile_batch(tgt1, n)
        T0 = jnp.broadcast_to(jnp.eye(4), (n, 4, 4))

        # jit ONCE per mesh size: `batch_track` builds its shard_map per
        # call, so an unjitted loop would re-trace + re-compile every step
        fn = jax.jit(
            lambda s, t, T, mesh=mesh: dist.batch_track(mesh, s, t, T, cam, cfg)[0]
        )

        def step(i, fn=fn, src=src, tgt=tgt, T0=T0):
            return fn(src, tgt, T0 + i * 1e-7)

        dt = _time_steps(step, iters)
        fps = n * iters / dt
        rows.append({"mesh_data": n, "frames_per_s": round(fps, 2)})
    base = rows[0]["frames_per_s"]
    for r in rows:
        r["efficiency"] = round(r["frames_per_s"] / (r["mesh_data"] * base), 3)
    return rows


def scaling_report(
    cam: CameraIntrinsics | None = None,
    cfg: ICPConfig | None = None,
    iters: int = 10,
    width: int | None = None,
    height: int | None = None,
) -> dict:
    """Full report: platform, mesh scaling, single-device batch scaling."""
    from slam_rgbd_tpu.core.config import astra_default_config

    base = astra_default_config()
    cam = cam or base.camera
    if width and height:
        import dataclasses

        cam = dataclasses.replace(cam, width=width, height=height,
                                  cx=width / 2 - 0.5, cy=height / 2 - 0.5)
    cfg = cfg or base.icp
    platform = jax.default_backend()
    report = {
        "platform": platform,
        "hardware": (jax.devices()[0].device_kind
                     if platform == "tpu" else f"virtual-{platform}"),
        "n_devices": len(jax.devices()),
        "resolution": f"{cam.width}x{cam.height}",
        "mesh_scaling": mesh_scaling(cam, cfg, iters=iters),
        "batch_scaling_1dev": batch_scaling(cam, cfg, iters=max(iters, 10)),
    }
    if platform != "tpu":
        report["note"] = (
            "virtual devices share the host cores: mesh efficiency here "
            "validates the sharded protocol, not chip scaling"
        )
    return report
