"""Synthetic RGB-D sequence generator — the framework's hardware-free sensor.

The reference's substitute for a camera is its `.bin` record/playback path
(`Youth.Source/LoggingModule/loggingModule.c:505-613`, SURVEY.md §4): a
recorded stream replayed at 30 fps lets every downstream stage run with no
Astra attached.  We go one step further: an analytic raycast scene with an
exact ground-truth trajectory, so odometry/BA/loop-closure tests have a
metric oracle (no dataset download needed — the build environment has zero
egress).

The scene is a box room with textured walls plus a set of spheres; color is a
procedural 3D texture (stable under viewpoint change => usable for feature
matching).  Raycasting is pure jax.numpy, jit-compiled, static-shaped, and
runs on CPU or TPU.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from slam_rgbd_tpu.core import se3
from slam_rgbd_tpu.core.config import CameraIntrinsics


@dataclass(frozen=True)
class SceneSpec:
    """Box room [-half, half]^3 cluttered with spheres and cuboids.

    A bare box room viewed frontally is a *degenerate* scene for
    point-to-plane ICP — translation parallel to the visible wall and yaw
    are nearly unconstrained, so the optimizer slides into deep false
    minima. The cuboid clutter exists to make the 6x6 normal-equations
    Hessian well-conditioned from any interior viewpoint, like a real
    indoor scene (desks, shelves) would be.
    """

    room_half: float = 3.0
    n_spheres: int = 16
    sphere_min_r: float = 0.15
    sphere_max_r: float = 0.5
    n_boxes: int = 12
    box_min_half: float = 0.12
    box_max_half: float = 0.6
    seed: int = 7
    tex_freq: float = 2.1
    checker_freq: float = 1.7

    def spheres(self) -> np.ndarray:
        """(n, 4) array of (cx, cy, cz, r), deterministic from seed."""
        rng = np.random.default_rng(self.seed)
        c = rng.uniform(-self.room_half * 0.6, self.room_half * 0.6, size=(self.n_spheres, 3))
        r = rng.uniform(self.sphere_min_r, self.sphere_max_r, size=(self.n_spheres, 1))
        return np.concatenate([c, r], axis=1).astype(np.float32)

    def boxes(self) -> np.ndarray:
        """(n, 6) array of (cx, cy, cz, hx, hy, hz) axis-aligned cuboids."""
        rng = np.random.default_rng(self.seed + 1)
        c = rng.uniform(-self.room_half * 0.7, self.room_half * 0.7, size=(self.n_boxes, 3))
        h = rng.uniform(self.box_min_half, self.box_max_half, size=(self.n_boxes, 3))
        return np.concatenate([c, h], axis=1).astype(np.float32)


def _ray_box_interior(origin, dirs, half):
    """Distance t to the box wall for rays starting inside [-half, half]^3.

    Slab method: for an interior origin, the exit distance is
    min over axes of max(t_near, t_far) per axis.
    """
    inv = 1.0 / jnp.where(jnp.abs(dirs) < 1e-9, jnp.sign(dirs) * 1e-9 + 1e-12, dirs)
    t1 = (-half - origin) * inv
    t2 = (half - origin) * inv
    t_far = jnp.maximum(t1, t2)
    return jnp.min(t_far, axis=-1)


def _ray_spheres(origin, dirs, spheres):
    """Min positive hit distance over all spheres; inf if none.

    origin: (3,), dirs: (..., 3), spheres: (n, 4).
    """
    c = spheres[:, :3]
    r = spheres[:, 3]
    oc = origin - c  # (n, 3)
    # per-sphere quadratic: |d|^2 t^2 + 2 d.oc t + |oc|^2 - r^2 = 0
    d = dirs[..., None, :]  # (..., 1, 3)
    a = jnp.sum(d * d, axis=-1)  # (..., 1) broadcast over n
    b = 2.0 * jnp.sum(d * oc, axis=-1)  # (..., n)
    cc = jnp.sum(oc * oc, axis=-1) - r * r  # (n,)
    disc = b * b - 4.0 * a * cc
    sq = jnp.sqrt(jnp.maximum(disc, 0.0))
    t0 = (-b - sq) / (2.0 * a)
    t1 = (-b + sq) / (2.0 * a)
    t = jnp.where(t0 > 1e-4, t0, t1)
    t = jnp.where((disc > 0) & (t > 1e-4), t, jnp.inf)
    return jnp.min(t, axis=-1)


def _ray_aabbs(origin, dirs, boxes):
    """Min positive *entering* hit distance over axis-aligned boxes.

    origin: (3,), dirs: (..., 3), boxes: (n, 6) = center + half-extents.
    Returns inf where a ray misses every box (or starts inside one — the
    clutter boxes are treated as solid, rays from inside see their walls
    via the room/sphere terms instead).
    """
    c = boxes[:, :3]
    h = boxes[:, 3:]
    d = dirs[..., None, :]  # (..., 1, 3)
    inv = 1.0 / jnp.where(jnp.abs(d) < 1e-9, jnp.sign(d) * 1e-9 + 1e-12, d)
    oc = origin - c  # (n, 3)
    t1 = (-h - oc) * inv  # (..., n, 3)
    t2 = (h - oc) * inv
    t_near = jnp.max(jnp.minimum(t1, t2), axis=-1)  # (..., n)
    t_far = jnp.min(jnp.maximum(t1, t2), axis=-1)
    hit = (t_near > 1e-4) & (t_near <= t_far)
    t = jnp.where(hit, t_near, jnp.inf)
    return jnp.min(t, axis=-1)


def _texture(p: jax.Array, spec: SceneSpec) -> jax.Array:
    """Procedural RGB in [0,1] from world position (..., 3).

    Checkerboard (sharp edges => FAST corners) modulated by smooth sinusoids
    (shading variety), identical from any viewpoint.
    """
    f = spec.checker_freq
    checker = jnp.mod(
        jnp.floor(p[..., 0] * f) + jnp.floor(p[..., 1] * f) + jnp.floor(p[..., 2] * f), 2.0
    )
    g = spec.tex_freq
    s1 = 0.5 + 0.5 * jnp.sin(p[..., 0] * g * 3.1 + p[..., 1] * g * 1.7)
    s2 = 0.5 + 0.5 * jnp.sin(p[..., 1] * g * 2.3 + p[..., 2] * g * 2.9)
    s3 = 0.5 + 0.5 * jnp.sin(p[..., 2] * g * 3.7 + p[..., 0] * g * 1.3)
    # fine detail layer for sub-checker corners
    fine = 0.5 + 0.5 * jnp.sin(p[..., 0] * 11.0) * jnp.sin(p[..., 1] * 13.0) * jnp.sin(p[..., 2] * 9.0)
    base = jnp.stack([s1, s2, s3], axis=-1)
    return jnp.clip(0.15 + 0.55 * base * (0.4 + 0.6 * checker[..., None]) + 0.25 * fine[..., None], 0.0, 1.0)


@functools.partial(jax.jit, static_argnames=("cam", "spec"))
def render_frame(T_wc: jax.Array, cam: CameraIntrinsics, spec: SceneSpec = SceneSpec()):
    """Render (depth_raw uint16 sensor-units, rgb uint8) from camera pose T_wc.

    T_wc maps camera coordinates to world coordinates (camera-to-world).
    Depth is z-depth in camera frame, quantized like the reference sensor
    (mm for depth_scale=1000 — `frameDefinitions.h`-era semantics).
    """
    h, w = cam.height, cam.width
    v = jax.lax.broadcasted_iota(jnp.float32, (h, w), 0)
    u = jax.lax.broadcasted_iota(jnp.float32, (h, w), 1)
    # Unnormalized camera-ray with dz = 1 so t == z-depth.
    d_cam = jnp.stack(
        [(u - cam.cx) / cam.fx, (v - cam.cy) / cam.fy, jnp.ones_like(u)], axis=-1
    )
    R = T_wc[:3, :3]
    origin = T_wc[:3, 3]
    d_world = d_cam @ R.T

    spheres = jnp.asarray(spec.spheres())
    boxes = jnp.asarray(spec.boxes())
    t_room = _ray_box_interior(origin, d_world, spec.room_half)
    t_sph = _ray_spheres(origin, d_world, spheres)
    t_cub = _ray_aabbs(origin, d_world, boxes)
    t = jnp.minimum(jnp.minimum(t_room, t_sph), t_cub)

    p_world = origin + t[..., None] * d_world
    rgb = _texture(p_world, spec)

    depth_m = t  # z-depth because d_cam.z == 1
    depth_raw = jnp.clip(depth_m * cam.depth_scale, 0, 65535).astype(jnp.uint16)
    rgb_u8 = jnp.clip(rgb * 255.0, 0, 255).astype(jnp.uint8)
    return depth_raw, rgb_u8


@dataclass(frozen=True)
class NoiseSpec:
    """Kinect-class RGB-D sensor noise (the real-sensor operating point of
    the reference's Astra config, `astra_orb_slam3_rgbd.yaml:9-35`).

    The analytic raycaster is noiseless — perfect depth, perfect
    brightness constancy — which is the easiest possible input for a
    photometric+geometric tracker. This model restores the three error
    sources that dominate structured-light RGB-D sensors:

      * axial depth noise growing quadratically with range
        (sigma_z = `depth_sigma_rel2` * z^2, the Khoshelham/Elberink
        Kinect model; ~1.4 mm at 1 m, ~5.6 mm at 2 m),
      * depth dropout at object silhouettes (structured-light shadowing:
        pixels whose local depth gradient is large lose their return)
        plus uniform random dropout,
      * RGB brightness flicker (per-frame global gain — auto-exposure
        hunting) and per-pixel shot noise.
    """

    depth_sigma_rel2: float = 1.4e-3  # m of std per m^2 of range
    edge_dropout: float = 0.6  # P(drop) where the depth edge test fires
    edge_rel_tol: float = 0.02  # neighbour depth ratio that counts as edge
    random_dropout: float = 0.002  # uniform missing-return probability
    rgb_sigma: float = 2.0  # shot noise, 0..255 units
    flicker: float = 0.03  # max |gain - 1| per frame
    seed: int = 11
    # Motion blur: RGB box blur along the dominant image flow, scaled by
    # the per-frame camera motion (rolling-integration smear of a
    # handheld sensor — the failure mode that ruins FAST corners on real
    # fr1-style footage). 0 disables; 1.0 blurs over the full inter-frame
    # flow magnitude.
    motion_blur: float = 0.0
    # Slow auto-exposure hunting: sinusoidal global gain drift with this
    # amplitude on top of the per-frame flicker (breaks brightness
    # constancy across MANY frames, unlike flicker's frame-to-frame
    # jitter).
    exposure_drift: float = 0.0
    exposure_period_s: float = 4.0


@functools.partial(jax.jit, static_argnames=("cam", "spec"))
def apply_sensor_noise(
    depth_raw: jax.Array,  # (H, W) uint16 sensor units
    rgb: jax.Array,  # (H, W, 3) uint8
    key: jax.Array,
    cam: CameraIntrinsics,
    spec: NoiseSpec = NoiseSpec(),
    flow_px: jax.Array | None = None,  # (2,) dominant image flow px/frame
    t_s: jax.Array | None = None,  # () seconds (exposure-drift phase)
):
    """Corrupt a clean rendered frame like a real structured-light sensor."""
    k_z, k_edge, k_drop, k_rgb, k_gain = jax.random.split(key, 5)
    z = depth_raw.astype(jnp.float32) / cam.depth_scale

    if spec.motion_blur > 0.0 and flow_px is not None:
        # 5-tap box blur along the dominant flow (integer-shifted rolls —
        # a separable streak; real smear is the integral over exposure)
        acc = jnp.zeros(rgb.shape, jnp.float32)
        for frac in (-0.5, -0.25, 0.0, 0.25, 0.5):
            off = spec.motion_blur * frac * flow_px
            dy = jnp.round(off[1]).astype(jnp.int32)
            dx = jnp.round(off[0]).astype(jnp.int32)
            acc = acc + jnp.roll(
                rgb.astype(jnp.float32), (dy, dx), axis=(0, 1)
            )
        rgb = (acc / 5.0).astype(jnp.uint8)

    # axial noise ~ z^2
    sigma = spec.depth_sigma_rel2 * z * z
    z_noisy = z + sigma * jax.random.normal(k_z, z.shape)

    # silhouette dropout: depth edge = any 4-neighbour differing by more
    # than edge_rel_tol * z
    edge = jnp.zeros(z.shape, bool)
    for ax, s in ((0, 1), (0, -1), (1, 1), (1, -1)):
        edge = edge | (jnp.abs(jnp.roll(z, s, axis=ax) - z)
                       > spec.edge_rel_tol * jnp.maximum(z, 0.5))
    drop = (edge & (jax.random.uniform(k_edge, z.shape) < spec.edge_dropout)) | (
        jax.random.uniform(k_drop, z.shape) < spec.random_dropout
    )
    z_noisy = jnp.where(drop, 0.0, z_noisy)
    depth_out = jnp.clip(z_noisy * cam.depth_scale, 0, 65535).astype(jnp.uint16)

    gain = 1.0 + spec.flicker * (2.0 * jax.random.uniform(k_gain, ()) - 1.0)
    if spec.exposure_drift > 0.0 and t_s is not None:
        gain = gain * (1.0 + spec.exposure_drift * jnp.sin(
            2.0 * jnp.pi * t_s / spec.exposure_period_s
        ))
    rgb_f = rgb.astype(jnp.float32) * gain + spec.rgb_sigma * jax.random.normal(
        k_rgb, rgb.shape
    )
    rgb_out = jnp.clip(rgb_f, 0, 255).astype(jnp.uint8)
    return depth_out, rgb_out


def orbit_trajectory(n_frames: int, spec: SceneSpec = SceneSpec(),
                     radius: float = 0.8, step_t: float = 0.012,
                     step_r: float = 0.01, seed: int = 3,
                     sweep: bool = False) -> np.ndarray:
    """Smooth ground-truth trajectory: (n, 4, 4) camera-to-world poses.

    A gentle orbit + bob inside the room, with small per-frame motion
    comparable to TUM fr1 handheld speed (~1 cm / 0.5 deg per frame).

    `sweep=True` reverses the yaw (and forward drift) halfway: the camera
    sweeps out and RETURNS through previously-seen views at the same
    angular speed — the second half offers real revisit opportunities, so
    place recognition, loop verification, and the map's re-association /
    merge tiers are exercised end-to-end (a one-way orbit at this rate
    covers only ~0.6 deg x n_frames and never revisits anything).
    """
    poses = []
    T = np.eye(4, dtype=np.float32)
    T[:3, 3] = (0.0, 0.0, -radius)
    for i in range(n_frames):
        a = i * step_r
        direction = -1.0 if (sweep and i >= n_frames // 2) else 1.0
        # twist in camera frame: forward drift + slow yaw + bob
        xi = np.array(
            [
                step_t * np.sin(a * 3.0),
                step_t * 0.5 * np.cos(a * 5.0),
                direction * step_t * np.cos(a * 2.0),
                step_r * 0.3 * np.sin(a * 4.0),
                direction * step_r * 1.0,
                step_r * 0.2 * np.cos(a * 3.0),
            ],
            dtype=np.float32,
        )
        poses.append(T.copy())
        T = T @ np.asarray(se3.exp(jnp.asarray(xi)))
        T = np.asarray(se3.normalize_rotation(jnp.asarray(T)))
    return np.stack(poses)


class SyntheticSequence:
    """Iterable RGB-D sequence with ground truth — the dataset-shaped API.

    Matches the loader protocol of `slam_rgbd_tpu.io.tum` so the SLAM
    session can consume either interchangeably.
    """

    def __init__(self, n_frames: int, cam: CameraIntrinsics,
                 spec: SceneSpec = SceneSpec(), fps: float = 30.0,
                 noise: NoiseSpec | None = None, **traj_kw):
        self.cam = cam
        self.spec = spec
        self.fps = fps
        self.noise = noise
        self.poses = orbit_trajectory(n_frames, spec, **traj_kw)
        self.timestamps = np.arange(n_frames, dtype=np.float64) / fps

    def __len__(self) -> int:
        return len(self.poses)

    def frame(self, i: int):
        """(timestamp_s, depth_raw u16 (H,W), rgb u8 (H,W,3))."""
        depth, rgb = render_frame(jnp.asarray(self.poses[i]), self.cam, self.spec)
        if self.noise is not None:
            key = jax.random.fold_in(jax.random.key(self.noise.seed), i)
            # dominant image flow of this frame's motion (rotational terms
            # dominate handheld flow): u ~ fx*w_y, v ~ fy*w_x
            j = max(i - 1, 0)
            xi = np.asarray(se3.log(jnp.asarray(
                (np.linalg.inv(self.poses[j]) @ self.poses[min(j + 1, len(self.poses) - 1)]).astype(np.float32)
            )))
            flow = jnp.asarray(
                [self.cam.fx * abs(xi[4]), self.cam.fy * abs(xi[3])],
                jnp.float32,
            )
            depth, rgb = apply_sensor_noise(
                depth, rgb, key, self.cam, self.noise,
                flow_px=flow, t_s=jnp.float32(self.timestamps[i]),
            )
        return self.timestamps[i], np.asarray(depth), np.asarray(rgb)

    def __iter__(self):
        for i in range(len(self)):
            yield self.frame(i)

    def groundtruth(self) -> np.ndarray:
        """(n, 4, 4) camera-to-world poses."""
        return self.poses
