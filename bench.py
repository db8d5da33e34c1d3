"""Repo-root benchmark shim (the driver runs `python bench.py` here).

The suite lives in `slam_rgbd_tpu.benchmarks`: full-session fps with p99,
tracking-only fps, and Pallas-kernel speed-of-light rooflines. Prints ONE
JSON line.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from slam_rgbd_tpu.benchmarks import main

if __name__ == "__main__":
    main()
