"""Smoke tests for the benchmark suite (slam_rgbd_tpu.benchmarks).

The driver runs `python bench.py` on real TPU hardware at the end of every
round; these tests keep the bench code importable and its workload
construction sane on the CPU mesh so a bench-side regression is caught in
CI rather than at round end.
"""

import pytest

from slam_rgbd_tpu.benchmarks import bench_ba
from slam_rgbd_tpu.core.config import astra_default_config


@pytest.mark.slow
class TestBenchBA:
    def test_ba_ms_per_iter_reported(self):
        cfg = astra_default_config()
        out = bench_ba(cfg, timing_iters=2)
        assert out["ba_ms_per_iter"] > 0
        assert out["ba_window_kf"] == 2 * cfg.ba.window
        # the synthetic geometry must actually land in-image: most of the
        # W*K observation grid should be valid, or the bench times a
        # mostly-masked (unrepresentative) solve
        assert out["ba_obs"] > 0.25 * out["ba_window_kf"] * 1024
