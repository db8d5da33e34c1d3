"""`python -m slam_rgbd_tpu` entry point."""

import sys

from slam_rgbd_tpu.cli.main import main

sys.exit(main())
