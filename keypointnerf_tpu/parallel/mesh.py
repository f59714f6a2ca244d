"""Device mesh construction + multi-host initialization.

The reference's entire distribution story is Lightning `strategy="ddp"` →
torch.distributed/NCCL (reference train.py:71, SURVEY.md §2.7). The
TPU-native equivalent: one `jax.sharding.Mesh` whose collectives ride ICI,
multi-host rendezvous over DCN via `jax.distributed.initialize`, and
sharding annotations on jit — XLA inserts the psum/all-gather.

Axes:
  * "data"  — ray/sample batches (DP). Gradient psum over ICI.
  * "tile"  — image-tile axis for sharded inference (same devices, reshaped).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_distributed(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
):
    """Multi-host rendezvous (DCN). No-op for single-process runs."""
    if num_processes is None or num_processes <= 1:
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )


def make_mesh(
    n_data: Optional[int] = None, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    """1-D data-parallel mesh over all (or the first n_data) devices."""
    devices = list(devices if devices is not None else jax.devices())
    if n_data is not None:
        devices = devices[:n_data]
    return Mesh(np.asarray(devices), axis_names=("data",))


def data_sharding(mesh: Mesh) -> NamedSharding:
    """Shard the leading (batch/ray) axis across the data axis."""
    return NamedSharding(mesh, P("data"))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
