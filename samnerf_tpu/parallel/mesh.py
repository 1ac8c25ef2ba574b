"""Device mesh + sharding for data-parallel training.

Replaces the reference's NCCL/DDP stack (``samnerf/train.py:93-146``,
``pipelines/base_pipeline.py:246-248``, ``utils/comms.py`` — see SURVEY.md
section 2g): instead of per-process NCCL groups and gradient all-reduce
hooks, we build one ``jax.sharding.Mesh`` with a ``data`` axis, shard the
ray batch over it, replicate params, and let XLA insert the psum over ICI
when differentiating the mean loss.

Multi-host: call :func:`initialize_distributed` first
(``jax.distributed.initialize`` stands in for
``dist.init_process_group('nccl')``, ``samnerf/train.py:127-133``).
"""
from __future__ import annotations

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

DATA_AXIS = "data"


def initialize_distributed(coordinator_address: Optional[str] = None,
                           num_processes: Optional[int] = None,
                           process_id: Optional[int] = None) -> None:
    """Multi-host bring-up; no-op for single-process runs
    (reference: world_size<=1 runs in-process, ``samnerf/train.py:171-175``)."""
    if num_processes is not None and num_processes > 1:
        jax.distributed.initialize(coordinator_address, num_processes, process_id)


def make_mesh(num_devices: Optional[int] = None) -> Mesh:
    devices = jax.devices()
    if num_devices is not None:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (DATA_AXIS,))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard leading (ray/batch) axis across the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def local_rank() -> int:
    """Maps the reference's comms.get_local_rank (``utils/comms.py:40-49``)."""
    return jax.process_index()


def world_size() -> int:
    return jax.process_count()


def is_main_process() -> bool:
    """Rank-0 gating for viewer/checkpoint/logging
    (``nerfstudio/utils/decorators.py`` @check_main_thread)."""
    return jax.process_index() == 0
