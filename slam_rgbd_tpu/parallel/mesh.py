"""Device mesh + shardings — the transport layer of the framework.

Where the reference moves data over three named POSIX message queues with
an 8 KiB chunk protocol (`Youth.Source/frameDefinitions.h:59-64`,
SURVEY.md §2 "Parallelism inventory"), the TPU framework moves it over
ICI/DCN with XLA collectives: shardings are declared here, psum/all-gather
happen inside `shard_map`ped programs (`parallel/dist.py`), and multi-host
wiring uses `jax.distributed`.

Mesh axes:
  * `data`  — concurrent sequences (the multi-sequence batch mode of
    BASELINE.json configs[4]); also the axis frame batches shard over.
  * `model` — intra-problem parallelism: observation columns in BA
    assembly, descriptor rows in matching, map blocks.
"""

from __future__ import annotations

import functools
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from slam_rgbd_tpu.core.config import MeshConfig


def make_mesh(cfg: MeshConfig = MeshConfig(), devices=None) -> Mesh:
    """Build a (data, model) mesh from the available devices.

    Axis sizes of 0 are inferred: `model` defaults to 1 and `data` takes
    every remaining device, so a single chip yields a 1x1 mesh and the
    same program runs unchanged.
    """
    devices = devices if devices is not None else jax.devices()
    n = len(devices)
    data, model = cfg.data, cfg.model
    if model == 0 and data == 0:
        model = 1
        data = n
    elif model == 0:
        model = n // data
    elif data == 0:
        data = n // model
    if data * model != n:
        raise ValueError(f"mesh {data}x{model} != {n} devices")
    arr = np.asarray(devices).reshape(data, model)
    return Mesh(arr, (cfg.data_axis, cfg.model_axis))


def data_sharding(mesh: Mesh, cfg: MeshConfig = MeshConfig()) -> NamedSharding:
    """Shard the leading (batch/sequence) dimension over `data`."""
    return NamedSharding(mesh, P(cfg.data_axis))


def model_sharding(mesh: Mesh, cfg: MeshConfig = MeshConfig()) -> NamedSharding:
    """Shard the leading dimension over `model`."""
    return NamedSharding(mesh, P(cfg.model_axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def initialize_distributed(coordinator: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up (`jax.distributed`) — the DCN analogue of the
    reference's queue creation in `loggingModule.c:631-647`. No-op when
    single-process or already initialized."""
    if num_processes is None or num_processes <= 1:
        return
    try:
        jax.distributed.initialize(
            coordinator_address=coordinator,
            num_processes=num_processes,
            process_id=process_id,
        )
    except RuntimeError:
        pass  # already initialized
