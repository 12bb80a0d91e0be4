"""Boundary-atom halo exchange over the mesh 'graph' axis.

The round-1 edge-partitioned mode replicates the full (A, D) atom array on
every 'graph' device and psums the partial aggregation each layer — the
collective volume is A·D regardless of how small the boundary is.  Halo
mode (docs/DESIGN_halo_exchange.md) shards *atoms* too: each device owns a
contiguous block of atoms, every edge lives on the owner of its
*destination* atom, and only the remote source rows actually referenced by
local edges — the halo — cross the interconnect, as one `lax.all_to_all`
of H·D elements per message-passing layer.

This replaces the capability ceiling of the reference's DDP-only design
(reference: src/utils/distributed.py:12-228 — pure data parallelism, every
GPU holds whole graphs) with graph partitioning, the graph-world analog of
sequence parallelism.

Index layout (host side, parallel/halo.py): on device g, edge sources are
local indices into ``[own atoms (A_loc) ‖ halo buffer (G·Hp)]`` where the
halo row for the r-th atom that peer p sends to g sits at A_loc + p·Hp + r.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def halo_exchange(x: jax.Array, send_idx: jax.Array, axis_name: str) -> jax.Array:
    """Exchange boundary rows of ``x`` over mesh axis ``axis_name``.

    Args:
      x: (A_loc, D) locally-owned atom features (inside shard_map).
      send_idx: (G, Hp) int32 — row g lists the local atom indices this
        device must send to peer g; -1 marks padding (sends a zero row).
      axis_name: mesh axis of size G.

    Returns:
      (G·Hp, D) halo buffer: rows [p·Hp : (p+1)·Hp] hold the atoms peer p
      sent here, in p's send order — matching the host's index rewrite.

    The backward pass is the transposed all_to_all of the halo cotangents,
    i.e. exactly the boundary scatter-add the math requires (JAX transposes
    collectives automatically; validated in tests/test_halo.py).
    """
    A_loc = x.shape[0]
    G, Hp = send_idx.shape
    safe = jnp.clip(send_idx, 0, A_loc - 1)
    buf = jnp.where((send_idx >= 0)[:, :, None], x[safe], jnp.zeros((), x.dtype))
    # all_to_all: send buf[g] to device g; receive recv[p] = peer p's rows.
    recv = jax.lax.all_to_all(buf, axis_name, split_axis=0, concat_axis=0)
    return recv.reshape(G * Hp, x.shape[-1])
