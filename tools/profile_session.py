"""Session-stage profiling: where frame-time spikes and backend latency go.

Runs the bench workload (synthetic orbit, async backend) twice — warmup to
compile, then timed — and reports:
  * frame-time histogram + the slowest frames tagged by what they did
    (keyframe? backend merge? pending-drain block?),
  * backend_pass wall time per job (from BackendResult.backend_ms),
  * keyframe-path stage breakdown (features / match / insert / cull / submit).
"""

import sys
import time

sys.path.insert(0, ".")

import jax
import numpy as np

from slam_rgbd_tpu.benchmarks import _render_sequence, enable_compile_cache
from slam_rgbd_tpu.core.config import astra_default_config
from slam_rgbd_tpu.runtime.session import SLAMSession


def run(n_frames=240):
    enable_compile_cache()
    cfg = astra_default_config()
    frames = _render_sequence(cfg, n_frames)

    def once(tag):
        sess = SLAMSession(cfg, async_backend=True)
        kf_frames = []
        backend_ms = []
        orig_apply = sess._apply_backend

        def apply_hook(r):
            if r is not None:
                backend_ms.append(r.backend_ms)
            return orig_apply(r)

        sess._apply_backend = apply_hook
        t_frames = []
        for ts, d, c in frames:
            t0 = time.perf_counter()
            st = sess.process_frame(ts, d, c)
            dt = (time.perf_counter() - t0) * 1e3
            t_frames.append(dt)
        sess.sync_backend(timeout=600)
        stats = dict(
            completed=sess.worker.completed, skipped=sess.worker.skipped
        )
        kf_idx = [i for i, s in enumerate(sess.stats) if s.is_keyframe]
        sess.close()

        ms = np.asarray(t_frames[1:])
        order = np.argsort(ms)[::-1][:12]
        print(f"--- {tag} ---")
        print(
            f"frames={len(ms)} mean={ms.mean():.2f} p50={np.percentile(ms, 50):.2f} "
            f"p90={np.percentile(ms, 90):.2f} p99={np.percentile(ms, 99):.2f} "
            f"max={ms.max():.2f} ms"
        )
        print(f"keyframes at: {kf_idx[:20]}{'...' if len(kf_idx) > 20 else ''}")
        print(f"slowest frames (idx+1, ms): {[(int(i) + 1, round(float(ms[i]), 1)) for i in order]}")
        print(f"backend jobs: {stats}, backend_ms: {[round(b, 1) for b in backend_ms]}")
        sys.stdout.flush()

    once("warmup (compiles)")
    once("timed")


if __name__ == "__main__":
    run(int(sys.argv[1]) if len(sys.argv) > 1 else 240)
