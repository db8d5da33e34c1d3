"""Device-time budget of the keyframe burst + host-link latency.

Chain-measures (the `benchmarks._time_device_chain` methodology) the
fused backend program, the feature stage, the keyframe-insert program,
and the steady tracking step on a mid-run session state, then measures
the blocking device->host fetch latency of the link. Separates "what the
chip spends" from "what the transport adds" in the session frame-time
tail: on the tunneled bench rig one blocking fetch is ~26-30 ms p50
(with rare multi-second hiccups), so session p99/max frame times measure
the link, not the SLAM. All numbers print per run; sub-millisecond
programs land below the chain fit's resolution and clamp to 0.

Run: python tools/profile_burst.py
"""
import sys, time
sys.path.insert(0, ".")
import jax, jax.numpy as jnp, numpy as np
from slam_rgbd_tpu.benchmarks import enable_compile_cache
from slam_rgbd_tpu.core.config import astra_default_config
from slam_rgbd_tpu.io.synthetic import SceneSpec, orbit_trajectory, render_frame
from slam_rgbd_tpu.runtime import session as sess_mod
from slam_rgbd_tpu.backend import worker as bworker

enable_compile_cache()
cfg = astra_default_config()
spec = SceneSpec()
N = 60
poses = orbit_trajectory(N, spec)
frames = [render_frame(jnp.asarray(poses[i]), cfg.camera, spec) for i in range(N)]
jax.block_until_ready(frames[-1][0])

s = sess_mod.SLAMSession(cfg, async_backend=False)
for i in range(N):
    d, c = frames[i]
    s.process_frame(i / 30.0, d, c)
s.flush_pipeline()
print(f"state: {s.state.keyframes} KFs, {s.map_point_count()} pts", flush=True)

def chain_time(body, init, n1=8, n2=24, reps=3):
    def mk(n):
        @jax.jit
        def chain(carry):
            return jax.lax.fori_loop(0, n, lambda i, c: body(c), carry)
        return chain
    c1, c2 = mk(n1), mk(n2)
    jax.block_until_ready(c1(init())); jax.block_until_ready(c2(init()))
    best = float("inf")
    for _ in range(reps):
        t0 = time.perf_counter(); jax.block_until_ready(c1(init())); w1 = time.perf_counter() - t0
        t0 = time.perf_counter(); jax.block_until_ready(c2(init())); w2 = time.perf_counter() - t0
        best = min(best, (w2 - w1) / (n2 - n1))
    return max(best, 0.0)

# --- fused backend program ---
m, edges, n_edges = s.map, s.edges, s.n_edges
kf_idx = jnp.int32(s.last_kf_idx)
ee = np.random.default_rng(0)

def backend_body(carry):
    pose_eps, acc = carry
    mm = m.replace(kf_pose=m.kf_pose + pose_eps)
    kf_pose, pt_xyz, pt_adj, T_rel, stats = bworker._backend_program(
        mm, edges, n_edges, kf_idx, jnp.bool_(True), cfg=cfg, run_ba=True)
    chk = jnp.sum(stats) + jnp.sum(kf_pose[0]) + jnp.sum(pt_xyz[0])
    return (pose_eps + 1e-12 * chk, acc + chk)

def backend_init():
    return (jnp.float32(ee.uniform(0, 1e-6)), jnp.float32(0))

t = chain_time(backend_body, backend_init)
print(f"backend_program device time: {t*1e3:.1f} ms", flush=True)

# --- features ---
d0, c0 = frames[-1]
def feat_body(carry):
    eps, acc = carry
    kp, desc, pts, ok = sess_mod._features_jit(d0, c0, cfg.orb, cfg.camera)
    chk = jnp.sum(kp.uv) + jnp.sum(pts) + jnp.sum(ok)
    return (eps + 0 * chk.astype(jnp.float32), acc + chk)
# features input constant -> loop could be hoisted! perturb depth instead
def feat_body2(carry):
    dd, acc = carry
    kp, desc, pts, ok = sess_mod._features_jit(dd, c0, cfg.orb, cfg.camera)
    chk = jnp.sum(kp.uv) + jnp.sum(pts) + jnp.sum(ok.astype(jnp.int32)).astype(jnp.float32)
    bump = (chk > 1e18).astype(jnp.uint16)
    return (dd + bump, acc + chk)
t = chain_time(feat_body2, lambda: (d0 + np.uint16(ee.integers(0, 3)), jnp.float32(0)))
print(f"features device time: {t*1e3:.1f} ms", flush=True)

# --- kf insert fused program ---
kp, desc, pts, ok = sess_mod._features_jit(d0, c0, cfg.orb, cfg.camera)
def ins_body(carry):
    eps, acc = carry
    mo, eo, no, lkT, nc = sess_mod._kf_insert_jit(
        m, edges, n_edges, kp.uv + eps, desc.signs, pts, ok,
        s.T_world, jnp.float32(2.0), jnp.int32(s.last_kf_idx),
        jnp.int32(s.last_kf_idx + 1), cfg)
    chk = jnp.sum(lkT) + jnp.sum(mo.pt_xyz[0]) + nc.astype(jnp.float32)
    return (eps + 1e-10 * chk, acc + chk)
t = chain_time(ins_body, lambda: (jnp.float32(ee.uniform(0, 1e-5)), jnp.float32(0)))
print(f"kf_insert device time: {t*1e3:.1f} ms", flush=True)

# --- steady step ---
pyr = s.prev_pyr
bufT = jnp.zeros((64, 4, 4)); bufK = jnp.zeros((64, 4, 4))
def steady_body(carry):
    T, mo, acc, bT, bK = carry
    d1, c1 = frames[-2]
    pyr2, T2, mo2, summ, bT2, bK2 = sess_mod._steady_step(
        pyr, d1, c1, T, mo, s.last_kf_T, bT, bK, jnp.int32(0),
        cfg.camera, cfg.icp, cfg.keyframes)
    return (T2, mo2, acc + jnp.sum(summ), bT2, bK2)
def steady_init():
    e = jnp.float32(ee.uniform(0, 1e-6))
    return (s.T_world + e, s.motion, jnp.float32(0), bufT, bufK)
t = chain_time(steady_body, steady_init)
print(f"steady_step device time: {t*1e3:.1f} ms", flush=True)

# --- tunnel fetch latency (the non-device component of frame-time tails) ---
@jax.jit
def _tiny(x):
    return jnp.sum(x) * 1.000001

x0 = jnp.ones((4,))
jax.block_until_ready(_tiny(x0))
lats = []
for i in range(200):
    y = _tiny(x0 + i * 1e-6)
    t0 = time.perf_counter()
    np.asarray(y)
    lats.append((time.perf_counter() - t0) * 1e3)
a = np.array(lats)
print(f"blocking-fetch latency: p50={np.percentile(a, 50):.1f} ms "
      f"p99={np.percentile(a, 99):.1f} ms", flush=True)

# --- loop-merge storm (the closure path's device budget) -----------------
# What one accepted loop costs the chip: verification + pose graph live
# inside the fused backend program above; here the post-closure stages —
# landmark fusion, the COMPACTED global BA, and the live-merge rewrite
# (trajectory-ring correction + fusion merge) — are chain-timed on the
# same mid-run state. The bench's loop_leg.merge_frame_ms is the
# wall-clock of all of it plus the link; this is the chip-side split.
def fuse_body(carry):
    eps, acc = carry
    pidf, frow, gh, dl, nf = bworker._loop_fuse_program(
        m.replace(kf_pose=m.kf_pose + eps), kf_idx, jnp.int32(0),
        jnp.eye(4))
    chk = jnp.sum(frow) + jnp.sum(dl) + nf
    return (eps + 1e-12 * chk.astype(jnp.float32), acc + chk.astype(jnp.float32))
t = chain_time(fuse_body, lambda: (jnp.float32(ee.uniform(0, 1e-6)), jnp.float32(0)))
print(f"loop_fuse device time: {t*1e3:.1f} ms", flush=True)

def gba_body(carry):
    eps, acc = carry
    kf2, pt2, solved, rmse, okg, dmax = bworker._global_ba_program(
        m.kf_pose + eps, m.pt_xyz, m.point_id, m, cfg)
    chk = jnp.sum(kf2[0]) + rmse + dmax
    return (eps + 1e-12 * chk, acc + chk)
t = chain_time(gba_body, lambda: (jnp.float32(ee.uniform(0, 1e-6)), jnp.float32(0)), n1=3, n2=9)
print(f"global_ba (compacted) device time: {t*1e3:.1f} ms", flush=True)

def merge_body(carry):
    eps, acc, bT = carry
    mm = sess_mod._fuse_merge(
        m, kf_idx, jnp.int32(0),
        m.point_id[kf_idx], jnp.zeros((m.capacity_pt,), bool),
        jnp.zeros((m.capacity_pt,), jnp.int32), jnp.int32(0))
    bT2 = sess_mod._traj_correct(bT, jnp.int32(0), jnp.eye(4) + eps)
    chk = jnp.sum(mm.pt_nobs).astype(jnp.float32) + jnp.sum(bT2[0])
    return (eps + 1e-12 * chk, acc + chk, bT2)
t = chain_time(
    merge_body,
    lambda: (jnp.float32(ee.uniform(0, 1e-6)), jnp.float32(0),
             jnp.zeros((4096, 4, 4))),
)
print(f"merge rewrite (fusion + traj ring) device time: {t*1e3:.1f} ms", flush=True)
