# Runnable CPU image for slam_rgbd_tpu (development / CI / replay serving).
#
# Container parity with the reference (SURVEY.md §2 C15) — whose Dockerfile
# only ever *configures* CMake and ships a CMD pointing at a binary it
# never built (`Dockerfile:14,17`). This image builds the native libraries
# and runs the test suite at build time, so `docker run` actually works:
# by default it replays a synthetic sequence through the full SLAM session.
# On TPU hosts, install the matching `jax[tpu]` instead of `jax[cpu]`.

FROM python:3.12-slim

RUN apt-get update \
    && apt-get install -y --no-install-recommends build-essential cmake \
    && rm -rf /var/lib/apt/lists/*

WORKDIR /opt/slam_rgbd_tpu

RUN pip install --no-cache-dir "jax[cpu]" flax optax chex einops numpy pytest

COPY native ./native
RUN make -C native

COPY slam_rgbd_tpu ./slam_rgbd_tpu
COPY tests ./tests
COPY bench.py __graft_entry__.py ./

ENV JAX_PLATFORMS=cpu
# fail the build if the framework doesn't pass its own suite
RUN python -m pytest tests/test_se3.py tests/test_camera.py tests/test_native.py -q

ENTRYPOINT ["python", "-m", "slam_rgbd_tpu"]
CMD ["run", "synthetic:50", "--traj", "/tmp/traj.txt"]
