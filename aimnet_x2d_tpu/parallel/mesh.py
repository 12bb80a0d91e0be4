"""Device mesh construction and sharding specs.

The reference scales with torch DDP over NCCL (reference:
src/utils/distributed.py, src/main/utils.py:24-76).  The TPU-native design
replaces process-group plumbing with a ``jax.sharding.Mesh`` over the
pod-slice devices and two logical axes:

- ``data``  — batch-parallel replication (DDP equivalent); gradients are
  psum-averaged over this axis inside the shard_mapped train step.
- ``graph`` — reserved for edge-partitioned graphs (boundary-atom halo
  exchange), the graph-world analog of sequence parallelism.

Multi-host initialization is a single ``jax.distributed.initialize()``
call before mesh creation; XLA compiles the collectives over ICI/DCN.
"""

from __future__ import annotations

from typing import Optional, Tuple

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def create_mesh(
    num_data: Optional[int] = None,
    num_graph: int = 1,
    devices=None,
) -> Mesh:
    """Build a ('data', 'graph') mesh over the available devices."""
    devices = np.asarray(devices if devices is not None else jax.devices())
    n = devices.size
    if num_data is None:
        num_data = n // num_graph
    if num_data * num_graph != n:
        raise ValueError(
            f"mesh {num_data}x{num_graph} does not cover {n} devices"
        )
    return Mesh(devices.reshape(num_data, num_graph), ("data", "graph"))


def data_parallel_specs(mesh: Mesh) -> Tuple[NamedSharding, NamedSharding]:
    """(batch_sharding, replicated_sharding) for stacked per-device batches.

    Batches are stacked on a leading 'data' axis by the loader
    (BatchLoader(stack_devices=N)); params/optimizer state are replicated.
    """
    batch = NamedSharding(mesh, P(("data", "graph")))
    replicated = NamedSharding(mesh, P())
    return batch, replicated
