"""Multi-host (multi-process) utilities.

The reference manages NCCL process groups, rank-gathering of metric
arrays, pickled-object broadcasts, and sleep-based file merges by hand
(reference: src/utils/distributed.py:12-228, src/main/utils.py:24-76).
The TPU-native equivalents:

- ``initialize()``: one ``jax.distributed.initialize`` call; afterwards
  ``jax.devices()`` spans the whole slice and a Mesh over it makes XLA
  compile the cross-host collectives (ICI within a slice, DCN across).
- host-level data sharding: each host loads its contiguous chunk
  (HDF5BatchLoader(host_id=process_index, num_hosts=process_count)).
- ``allgather_numpy`` / ``broadcast_pyobj``: host-level assembly of eval
  arrays and coordination flags via multihost_utils — the analog of the
  reference's padded all_gather + pickle broadcast.
"""

from __future__ import annotations

from typing import Any, Optional

import jax
import numpy as np


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
) -> None:
    """Initialize multi-host JAX.  With no arguments the TPU environment
    supplies everything; explicit values support manual launches."""
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(
            coordinator_address=coordinator_address,
            num_processes=num_processes,
            process_id=process_id,
        )
    jax.distributed.initialize(**kwargs)


def process_index() -> int:
    return jax.process_index()


def process_count() -> int:
    return jax.process_count()


def is_primary() -> bool:
    return jax.process_index() == 0


def allgather_numpy(x: np.ndarray) -> np.ndarray:
    """Gather a per-host array to all hosts, concatenated on axis 0
    (replaces the reference's pad-to-max all_gather,
    src/utils/distributed.py:49-95)."""
    from jax.experimental import multihost_utils

    return np.asarray(
        multihost_utils.process_allgather(np.asarray(x), tiled=True)
    )


def broadcast_pyobj(obj: Any, root: int = 0) -> Any:
    """Broadcast a python object from ``root`` to all hosts (replaces the
    pickle→byte-tensor broadcast, src/utils/distributed.py:98-185)."""
    import pickle

    from jax.experimental import multihost_utils

    payload = np.frombuffer(pickle.dumps(obj), dtype=np.uint8) if (
        jax.process_index() == root
    ) else np.zeros(0, np.uint8)
    sizes = allgather_numpy(np.array([payload.size], np.int64))
    size = int(sizes[root])
    buf = np.zeros(size, np.uint8)
    if jax.process_index() == root:
        buf[:] = payload
    out = multihost_utils.broadcast_one_to_all(buf, is_source=jax.process_index() == root)
    return pickle.loads(np.asarray(out).tobytes())


def sync() -> None:
    """Barrier across hosts (replaces dist.barrier)."""
    from jax.experimental import multihost_utils

    multihost_utils.sync_global_devices("aimnet_x2d_tpu_sync")
