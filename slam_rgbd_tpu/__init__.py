"""slam_rgbd_tpu — a TPU-native RGB-D SLAM framework (JAX / XLA / Pallas / pjit).

A from-scratch re-design of the capabilities of SeunghwanByun/SLAM-RGBD
("Youth"): RGB-D frame ingest with record/replay, dense projective ICP
odometry, ORB-class features with Hamming matching, a keyframe map with
co-visibility, sliding-window local bundle adjustment (Schur complement),
pose-graph optimization with loop closure, TUM trajectory export and ATE
evaluation, a host runtime with watchdog/health/shutdown semantics, and a
device-mesh parallel layer for multi-chip / multi-host scaling.

Layer map (each importable on its own):

    core/      SE(3), pinhole camera, pyramids, config (single-source intrinsics)
    ops/       Pallas TPU kernels + XLA fallbacks for the hot ops
    io/        dataset loaders, synthetic scenes, record/replay streams, control
    odometry/  coarse-to-fine dense projective ICP (point-to-plane)
    features/  FAST + ORB descriptors, Hamming matching (MXU bitplane trick)
    mapping/   keyframe store, map points, co-visibility (fixed-capacity, masked)
    backend/   local BA (Schur), pose-graph Gauss-Newton, loop closure
    parallel/  mesh / shardings / collectives; distributed BA and batch mode
    runtime/   session lifecycle, watchdog, checkpoint, metrics
    viz/       point-cloud export + web viewer payloads
    eval/      TUM trajectory export, ATE/RPE metrics
    cli/       `run`, `record`, `play`, `eval`, `benchmark` verbs

The reference's capability surface is documented per-module with file:line
citations into /root/reference so parity can be audited.
"""

__version__ = "0.1.0"

from slam_rgbd_tpu.core.config import (  # noqa: F401
    SLAMConfig,
    CameraIntrinsics,
    astra_default_config,
)
