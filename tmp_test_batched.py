import jax, jax.numpy as jnp, numpy as np, time
from slam_rgbd_tpu.core.config import astra_default_config
from slam_rgbd_tpu.core import camera
from slam_rgbd_tpu.io.synthetic import SceneSpec, orbit_trajectory, render_frame
from slam_rgbd_tpu.ops import icp_pallas as ip
from slam_rgbd_tpu.benchmarks import enable_compile_cache, _time_device_chain
enable_compile_cache()

cfg = astra_default_config()
cam = cfg.camera; icp = cfg.icp
spec = SceneSpec()
poses = orbit_trajectory(3, spec, step_t=0.02, step_r=0.01)
pyrs = []
for i in range(3):
    d, c = render_frame(jnp.asarray(poses[i]), cam, spec)
    pyrs.append(camera.build_frame_pyramid(d, cam, levels=1, rgb=c))

radius = icp.window_px[-1]
h, w = cam.height, cam.width
th, n_tiles, w_pad = ip.plan_tiles(h, w, radius)
B = 4
srcs = [ip.build_source_planes(pyrs[i % 2][0], th, n_tiles, w_pad) for i in range(B)]
tgts = [ip.build_target_planes(pyrs[i % 2 + 1][0], jnp.int32(0), jnp.int32(0), radius, th, n_tiles, w_pad) for i in range(B)]
scals = [ip.pack_scalars(jnp.eye(4), jnp.float32(0), jnp.float32(0)) for _ in range(B)]

ref = ip.gn_reduce(scals[0], srcs[0], tgts[0], cam, icp, radius, (h, w))
jax.block_until_ready(ref)
t0=time.time()
out = ip.gn_reduce_batched(jnp.concatenate(scals), jnp.stack(srcs), jnp.stack(tgts), cam, icp, radius, (h, w))
jax.block_until_ready(out)
print("batched compile+run", time.time()-t0)
Hb, gb, ib, sb = out
H, g, inl, ss = ref
print("match H:", np.allclose(np.asarray(H), np.asarray(Hb[0])),
      "g:", np.allclose(np.asarray(g), np.asarray(gb[0])),
      "inl:", int(inl), int(ib[0]))
assert np.allclose(np.asarray(H), np.asarray(Hb[0]))

scal0, srcp, tgtp = scals[0], srcs[0], tgts[0]
def body1(carry):
    sc, acc = carry
    H, g, inl, ss = ip.gn_reduce(sc, srcp, tgtp, cam, icp, radius, (h, w))
    chk = jnp.sum(H) + jnp.sum(g) + ss + inl.astype(jnp.float32)
    return (sc + 1e-12 * chk, acc + chk)
rng = np.random.default_rng(0)
def init1():
    return (scal0 + jnp.float32(rng.uniform(0, 1e-6)), jnp.float32(0.0))
t1 = _time_device_chain(body1, init1, reps=3)
print(f"single chain: {t1*1e6:.1f} us")

scalB = jnp.concatenate(scals); srcB = jnp.stack(srcs); tgtB = jnp.stack(tgts)
def bodyB(carry):
    sc, acc = carry
    H, g, inl, ss = ip.gn_reduce_batched(sc, srcB, tgtB, cam, icp, radius, (h, w))
    chk = jnp.sum(H) + jnp.sum(g) + jnp.sum(ss) + jnp.sum(inl.astype(jnp.float32))
    return (sc + 1e-12 * chk, acc + chk)
def initB():
    return (scalB + jnp.float32(rng.uniform(0, 1e-6)), jnp.float32(0.0))
tB = _time_device_chain(bodyB, initB, n_small=20, n_large=80, reps=3)
print(f"batched B={B} chain: {tB*1e6:.1f} us total, {tB/B*1e6:.1f} us/problem, efficiency {t1/(tB/B):.2f}")
