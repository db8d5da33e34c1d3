"""Diagnose the bench sweep's tracking-loss region.

Runs PURE frame-to-frame odometry (no session machinery, no backend, no
relocalization) over the exact bench sequence and prints, per frame:
inlier fraction, ICP rmse, and the frame-to-frame motion error vs ground
truth (rotation deg / translation cm). Separates "ICP genuinely fails
here" from "session-level machinery (thresholds, reloc, merges) causes
the cascade".
"""

import sys

sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from slam_rgbd_tpu.benchmarks import _render_sequence, enable_compile_cache
from slam_rgbd_tpu.core import camera, se3
from slam_rgbd_tpu.core.config import astra_default_config
from slam_rgbd_tpu.odometry.icp import track_frame


def run(n_frames=240):
    enable_compile_cache()
    cfg = astra_default_config()
    frames, gt = _render_sequence(cfg, n_frames, return_gt=True)
    cam = cfg.camera

    @jax.jit
    def step(prev_pyr, d, c, T, motion):
        pyr = camera.build_frame_pyramid(d, cam, levels=cfg.icp.levels, rgb=c)
        T2, m2, res = track_frame(prev_pyr, pyr, T, motion, cam, cfg.icp)
        return pyr, T2, m2, res

    pyr = jax.jit(
        lambda d, c: camera.build_frame_pyramid(d, cam, levels=cfg.icp.levels, rgb=c)
    )(frames[0][1], frames[0][2])
    T = jnp.eye(4)
    motion = jnp.eye(4)

    rows = []
    for i in range(1, n_frames):
        _, d, c = frames[i]
        pyr, T, motion, res = step(pyr, d, c, T, motion)
        # frame-to-frame GT motion vs estimated motion
        gt_rel = np.linalg.inv(gt[i - 1]) @ gt[i]
        est_rel = np.asarray(motion)
        err = np.asarray(se3.log(jnp.asarray(np.linalg.inv(gt_rel) @ est_rel)))
        rows.append((
            i, float(res.valid_fraction), float(res.rmse),
            float(np.linalg.norm(err[:3]) * 100),
            float(np.rad2deg(np.linalg.norm(err[3:]))),
        ))

    # absolute drift at end
    print("frame  inlier  rmse    t_err_cm  r_err_deg")
    for i, vf, rm, te, re_ in rows:
        flag = " <-- LOW" if vf < 0.3 else ""
        if vf < 0.45 or i % 10 == 0 or te > 0.5 or re_ > 0.3:
            print(f"{i:5d}  {vf:.3f}  {rm:.4f}  {te:8.3f}  {re_:8.3f}{flag}")
    vfs = np.array([r[1] for r in rows])
    tes = np.array([r[3] for r in rows])
    print(f"min inlier {vfs.min():.3f} at frame {int(np.argmin(vfs)) + 1}")
    print(f"frames with vf<0.25: {(vfs < 0.25).sum()}, vf<0.35: {(vfs < 0.35).sum()}")
    print(f"max per-frame t err {tes.max():.3f} cm at frame {int(np.argmax(tes)) + 1}")
    # final absolute pose error
    D = np.linalg.inv(gt[n_frames - 1]) @ np.asarray(T)
    lg = np.asarray(se3.log(jnp.asarray(D)))
    print(f"end-of-run abs err: {np.linalg.norm(lg[:3]) * 100:.2f} cm, "
          f"{np.rad2deg(np.linalg.norm(lg[3:])):.2f} deg")


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 240)
