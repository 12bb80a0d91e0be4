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


def halo_exchange_t(xT: jax.Array, send_idx: jax.Array, axis_name: str) -> jax.Array:
    """Feature-major twin of :func:`halo_exchange`: xT is (D, A_loc), the
    returned halo buffer is (D, G·Hp) with the same row layout on the lane
    axis (rows [p·Hp : (p+1)·Hp] = peer p's atoms in p's send order).

    Gather + all_to_all only — pure data movement, so its transpose is the
    boundary scatter-add, and it shares no compute with the local per-bin
    aggregation it is meant to overlap with (binned_halo_mp notes)."""
    D = xT.shape[0]
    G, Hp = send_idx.shape
    safe = jnp.clip(send_idx, 0, xT.shape[1] - 1)
    buf = jnp.where(
        (send_idx >= 0)[None, :, :], xT[:, safe.reshape(-1)].reshape(D, G, Hp),
        jnp.zeros((), xT.dtype),
    )
    recv = jax.lax.all_to_all(buf, axis_name, split_axis=1, concat_axis=1)
    return recv.reshape(D, G * Hp)


def binned_local_agg_t(xT: jax.Array, bin_adj: jax.Array, dt) -> jax.Array:
    """Local neighborhood aggregation over the binned layout, feature-major:
    aggT[d, b·ab+i] = Σ_j bin_adj[b, i, j] · xT[d, b·ab+j], fp32.

    This is the XLA (outside-the-kernel) twin of the megakernel's in-VMEM
    ``_agg_fwd`` — hoisted so the halo ``all_to_all`` (which also depends
    only on the previous layer's xT) can run concurrently with it."""
    nb, ab, _ = bin_adj.shape
    D = xT.shape[0]
    x3 = xT.reshape(D, nb, ab)
    agg = jnp.einsum(
        "dbj,bij->dbi",
        x3.astype(dt),
        bin_adj.astype(dt),
        preferred_element_type=jnp.float32,
    )
    return agg.reshape(D, nb * ab)


def halo_agg_contrib_t(haloT: jax.Array, halo_adj: jax.Array, dt) -> jax.Array:
    """Halo-source contribution to the aggregation, feature-major:
    (D, H) halo rows × (H, A_loc) int8 multiplicity → (D, A_loc) fp32.
    H = G·Hp is small (boundary rows only), so this matmul is cheap and
    runs strictly AFTER the collective lands — the heavy local part
    (:func:`binned_local_agg_t`) does not wait for it."""
    return jnp.dot(
        haloT.astype(dt), halo_adj.astype(dt), preferred_element_type=jnp.float32
    )
