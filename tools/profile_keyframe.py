"""Keyframe-path breakdown on the real chip.

Times every device program the session enqueues on a keyframe frame
(features, map association, insert, cull) plus the backend pass, each in
isolation, to find what makes keyframe frames ~430 ms (BENCH_r02).
Run: python tools/profile_keyframe.py
"""
import time
import sys
sys.path.insert(0, ".")

import jax
import jax.numpy as jnp
import numpy as np

from slam_rgbd_tpu.core.config import astra_default_config
from slam_rgbd_tpu.io.synthetic import SceneSpec, orbit_trajectory, render_frame
from slam_rgbd_tpu.mapping import map as smap
from slam_rgbd_tpu.backend import worker as bworker
from slam_rgbd_tpu.runtime import session as sess_mod

cfg = astra_default_config()
spec = SceneSpec()
N = 40
poses = orbit_trajectory(N, spec)
frames = [render_frame(jnp.asarray(poses[i]), cfg.camera, spec) for i in range(N)]
jax.block_until_ready(frames[-1][0])


def t(name, fn, iters=10):
    jax.block_until_ready(fn())
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn()
    jax.block_until_ready(out)
    print(f"{name:28s} {(time.perf_counter() - t0) / iters * 1e3:8.2f} ms")


# Build a real mid-run session state (sync backend so the map is populated).
s = sess_mod.SLAMSession(cfg, async_backend=False)
for i in range(N):
    d, c = frames[i]
    s.process_frame(i / 30.0, np.asarray(d), np.asarray(c))
s.flush_pipeline()
print(f"session state: {s.state.keyframes} KFs, {s.map_point_count()} points")

d, c = frames[N - 1]
d, c = jnp.asarray(d), jnp.asarray(c)

t("features_jit", lambda: sess_mod._features_jit(d, c, cfg.orb, cfg.camera)[0].uv)
kp, desc, pts, ok = sess_mod._features_jit(d, c, cfg.orb, cfg.camera)

t("match_against_map", lambda: smap.match_against_map(
    s.map, desc.signs, ok, kp.uv, pts[:, 2], s.T_world,
    cam=cfg.camera, max_distance=float(cfg.orb.match_threshold),
    kp_pts=pts, merge_radius=cfg.keyframes.merge_radius))

mpid = smap.match_against_map(
    s.map, desc.signs, ok, kp.uv, pts[:, 2], s.T_world,
    cam=cfg.camera, max_distance=float(cfg.orb.match_threshold),
    kp_pts=pts, merge_radius=cfg.keyframes.merge_radius)

t("insert_keyframe", lambda: smap.insert_keyframe(
    s.map, s.T_world, jnp.float32(1.0), kp.uv, pts, ok, desc.signs, mpid).pt_xyz)

t("cull_points", lambda: smap.cull_points(
    s.map, jnp.int32(s.last_kf_idx),
    min_obs=cfg.keyframes.cull_min_obs,
    max_age_kf=cfg.keyframes.cull_max_age_kf)[0].pt_xyz)

job = bworker.BackendJob(map=s.map, edges=s.edges, n_edges=s.n_edges,
                         kf_idx=s.last_kf_idx, n_kf=s._n_kf_host)
t("backend_pass (BA+loop+pg)", lambda: bworker.backend_pass(
    job.map, job.edges, job.n_edges, job.kf_idx, cfg, n_kf=job.n_kf).kf_pose,
  iters=3)

# Sub-breakdown of features_jit
import functools
from slam_rgbd_tpu.core import camera
from slam_rgbd_tpu.features import detect as fdetect
from slam_rgbd_tpu.features import orb as forb

orb = cfg.orb
intensity = jax.jit(lambda r: camera.rgb_to_intensity(r) / 255.0)(c)
detect_j = jax.jit(functools.partial(
    fdetect.detect_pyramid, n_features=orb.n_features, n_levels=orb.n_levels,
    scale_factor=orb.scale_factor, threshold=orb.fast_threshold,
    min_threshold=orb.fast_min_threshold))
t("  detect_pyramid", lambda: detect_j(intensity)[0].uv)
kp2, pyr2 = detect_j(intensity)
desc_j = jax.jit(functools.partial(forb.describe, scale_factor=orb.scale_factor))
t("  describe", lambda: desc_j(kp2, pyr2).signs)

# loop sub-breakdown
from slam_rgbd_tpu.backend import loop as loop_mod
from slam_rgbd_tpu.backend import ba as ba_mod

w = cfg.ba.window
idx, valid = smap.local_window(s.map, 2 * w)
free = jnp.arange(2 * w) >= w
t("  windowed_local_ba", lambda: ba_mod.windowed_local_ba(
    s.map.kf_pose[idx], valid, s.map.pt_xyz, s.map.kp_uv[idx],
    s.map.kp_pts[idx][..., 2], s.map.point_id[idx],
    s.map.kp_ok[idx] & valid[:, None], cfg.camera, cfg.ba,
    free_mask=free).kf_pose, iters=5)
t("  find_loop_candidate", lambda: loop_mod.find_loop_candidate(
    s.map, jnp.int32(s.last_kf_idx), min_interval=cfg.ba.loop_min_interval,
    min_score=cfg.ba.loop_min_score).ok)
cand = loop_mod.find_loop_candidate(
    s.map, jnp.int32(s.last_kf_idx), min_interval=cfg.ba.loop_min_interval,
    min_score=cfg.ba.loop_min_score)
t("  verify_loop", lambda: loop_mod.verify_loop(
    s.map, jnp.int32(s.last_kf_idx), cand.kf_idx).ok)
