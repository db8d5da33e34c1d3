"""Breakdown: features internals + windowed BA on TPU."""
import time, functools
import jax, jax.numpy as jnp, numpy as np

from slam_rgbd_tpu.core.config import astra_default_config
from slam_rgbd_tpu.core import camera
from slam_rgbd_tpu.io.synthetic import SceneSpec, orbit_trajectory, render_frame
from slam_rgbd_tpu.features import detect as fdetect
from slam_rgbd_tpu.features import orb as forb
from slam_rgbd_tpu.mapping import map as smap
from slam_rgbd_tpu.backend import ba as ba_mod
from slam_rgbd_tpu.runtime import session as sess_mod

cfg = astra_default_config()
spec = SceneSpec()
poses = orbit_trajectory(20, spec)
frames = [render_frame(jnp.asarray(poses[i]), cfg.camera, spec) for i in range(20)]
jax.block_until_ready(frames[-1][0])

def t(name, fn, iters=10):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:30s} {(time.perf_counter()-t0)/iters*1e3:8.1f} ms")

d, c = frames[0]
orb = cfg.orb
intensity = jax.jit(lambda r: camera.rgb_to_intensity(r) / 255.0)(c)
jax.block_until_ready(intensity)

detect_j = jax.jit(functools.partial(
    fdetect.detect_pyramid, n_features=orb.n_features, n_levels=orb.n_levels,
    scale_factor=orb.scale_factor, threshold=orb.fast_threshold,
    min_threshold=orb.fast_min_threshold))
t("detect_pyramid", lambda: detect_j(intensity))
kp, pyr = detect_j(intensity)

desc_j = jax.jit(functools.partial(forb.describe, scale_factor=orb.scale_factor))
t("describe", lambda: desc_j(kp, pyr))

depth_j = jax.jit(lambda kp_, dm: forb.keypoint_depth(kp_, dm, cfg.camera))
dm = jax.jit(lambda x: camera.depth_to_metres(x, cfg.camera))(d)
t("keypoint_depth", lambda: depth_j(kp, dm))

t("features(all)", lambda: sess_mod._features_jit(d, c, orb, cfg.camera))

# --- windowed BA on a real session map --------------------------------------
s = sess_mod.SLAMSession(cfg, async_backend=False)
for i in range(18):
    d_i, c_i = frames[i]
    s.process_frame(i / 30.0, np.asarray(d_i), np.asarray(c_i))
s.flush_pipeline()
m = s.map
w = cfg.ba.window
idx, valid = smap.local_window(m, 2 * w)
free = jnp.arange(2 * w) >= w
t("windowed_local_ba", lambda: ba_mod.windowed_local_ba(
    m.kf_pose[idx], valid, m.pt_xyz, m.kp_uv[idx], m.kp_pts[idx][..., 2],
    m.point_id[idx], m.kp_ok[idx] & valid[:, None],
    cfg.camera, cfg.ba, free_mask=free), iters=5)
