"""Fixed-shape padded molecular batches for TPU.

The reference framework batches ragged PyG graphs by concatenation with
atom-index offsets (reference: src/datasets/molecular.py:332-458,
``MyBatch.from_data_list``).  Ragged shapes force recompilation or dynamic
shapes under XLA, so the TPU-native design instead pads every batch to a
bucketed fixed shape:

- atoms are concatenated across graphs and padded to ``A`` slots;
- edges across all hops are concatenated, *sorted by destination atom* (so a
  Pallas segment kernel can accumulate sequentially), and padded to ``E``;
- per-graph quantities are padded to ``B`` graph slots;
- stereo index lists are padded to ``C`` (tetrahedral) / ``P`` (cis/trans).

Padding convention (see ops/segment.py): padded edges point at atom slot
``A`` and padded atoms at graph slot ``B`` — one past the end — so XLA
scatter drops them; boolean masks are carried for everything else.

Collation parity notes vs the reference:
- cis/trans pairs are appended *again* in reversed order exactly as the
  reference does, even though the featurizer already emits both directions
  (quirk Q7; reference: src/datasets/molecular.py:388-397).
- only chiral centers with exactly 4 neighbors are kept
  (reference: src/datasets/molecular.py:365).
- per-hop edges are concatenated with atom offsets only — hop ids are kept
  in a separate ``edge_hop`` array instead of being folded into the index,
  which lets the model reproduce the reference's hop-collapse behavior
  (quirk Q1) or do true per-hop aggregation behind a flag.
"""

from __future__ import annotations

import dataclasses
from typing import Sequence

import numpy as np
from flax import struct


@dataclasses.dataclass
class MolFeatures:
    """Host-side featurizer output for one molecule (ragged, numpy).

    Equivalent content to the reference's ``compute_all`` dict
    (reference: src/datasets/features.py:325-334).
    """

    edge_hops: list  # list over hops of (2, E_h) int32 [src_row0, dst_row1]? see note
    atom_type: np.ndarray  # int (N,)
    hydrogen_count: np.ndarray
    degree: np.ndarray
    hybridization: np.ndarray
    tet_nbrs: np.ndarray  # (C, 4) int32 — neighbor indices of chiral centers
    cis_pairs: np.ndarray  # (P, 2) int32 directed pairs
    trans_pairs: np.ndarray  # (Q, 2) int32
    total_charge: float
    atomic_numbers: np.ndarray  # int32 (N,)
    smiles: str = ""

    @property
    def num_atoms(self) -> int:
        return int(self.atom_type.shape[0])

    @property
    def num_edges(self) -> int:
        return int(sum(e.shape[1] for e in self.edge_hops))


class MolBatch(struct.PyTreeNode):
    """A padded, fixed-shape batch of molecular graphs (device pytree).

    Edge direction convention matches the reference collate output
    (reference: src/datasets/molecular.py:436 then src/models/gnn.py:302-305):
    column 0 of the reference's (E, 2) edge tensor is the *target* (origin
    atom of the BFS = message destination) and column 1 the *source*.  Here
    ``edge_dst`` is the aggregation target and ``edge_src`` the gathered atom.
    """

    # Atom-level int features, shape (A,)
    atom_type: np.ndarray
    hydrogen_count: np.ndarray
    degree: np.ndarray
    hybridization: np.ndarray
    atom_mol: np.ndarray  # (A,) graph id; padding -> B
    atom_mask: np.ndarray  # (A,) bool

    # Edge-level, shape (E,)
    edge_src: np.ndarray  # padding -> 0 (gather-safe)
    edge_dst: np.ndarray  # padding -> A (scatter-dropped)
    edge_hop: np.ndarray  # 1..K for real edges, 0 for padding
    edge_mask: np.ndarray  # (E,) bool

    # Graph-level, shape (B, ...)
    total_charge: np.ndarray  # (B,) float32
    targets: np.ndarray  # (B, T) float32
    graph_mask: np.ndarray  # (B,) bool

    # Stereochemistry
    tet_nbrs: np.ndarray  # (C, 4) int32; padding rows -> A
    tet_mask: np.ndarray  # (C,) bool
    cis_pairs: np.ndarray  # (P, 2) int32 [src, dst]; padding dst -> A
    cis_mask: np.ndarray  # (P,) bool
    trans_pairs: np.ndarray  # (P, 2)
    trans_mask: np.ndarray  # (P,) bool

    # Halo-partitioned execution (parallel/halo.py): (G, Hp) int32 send map
    # into the local atom axis, -1 = padding; None on ordinary batches.
    # When set, edge_src indexes [local atoms ‖ halo buffer] and the model
    # runs atom-sharded over the mesh 'graph' axis.
    halo_send_idx: "np.ndarray | None" = None

    # Binned halo shards additionally carry (G·Hp, A_loc) int8 halo-edge
    # multiplicities: halo_adj[h, a] = #edges whose source is halo row h
    # and destination local atom a.  Local edges live in bin_adj; halo
    # (and intra-device cross-bin) edges live here, so
    # agg = bin_local_agg + haloᵀ-contrib covers every edge exactly once.
    halo_adj: "np.ndarray | None" = None

    # Static metadata (not a pytree leaf): True when edges are sorted
    # dst-major, letting parity-mode segment sums claim
    # indices_are_sorted=True (measured ~1.8x faster scatter on TPU v5e).
    edges_dst_sorted: bool = struct.field(pytree_node=False, default=False)

    # True when the flat edge arrays were dropped (8 empty slots): on the
    # binned path bin_adj carries every edge, and the flat lists are ~40%
    # of the host→device bytes per batch.  Parity-mode consumers only
    # (models/gnn.py guards — the per-hop path needs real edge lists).
    edges_slim: bool = struct.field(pytree_node=False, default=False)

    # Fused-kernel edge layouts (ops/fused_edge.py): window-grouped one-hot
    # MXU aggregation replacing XLA's slow row gather+scatter.  Built by
    # loaders on TPU (attach_fused_layouts); None elsewhere.
    fused_fwd: "object | None" = None
    fused_bwd: "object | None" = None

    # Bin-packed dense layout (data/binning.py): per-bin int8 adjacency
    # (bins, ab, ab) and molecule-membership matrix (bins, mb, ab).  When
    # set, atoms are laid out bins×ab, molecules bins×mb, and the MP
    # aggregation / pooling / charge-equilibration run as batched MXU
    # matmuls instead of segment scatters.
    bin_adj: "np.ndarray | None" = None
    pool_mat: "np.ndarray | None" = None

    # Per-bin tetrahedral-center table (bins, 4, Tc) int32 for the fused
    # inject kernel (ops/bin_inject.py): entry [b, k, t] is the bin-LOCAL
    # atom column of neighbor k of the t-th stereo center packed in bin b,
    # -1 padding.  A center's four neighbors always share its molecule's
    # bin, so the Q6 polynomial's gather AND scatter become per-bin
    # one-hot matmuls.  Built by both binned builders
    # (binning.tet_bin_tables); None off the binned path.
    tet_bin: "np.ndarray | None" = None

    @property
    def num_atom_slots(self) -> int:
        return self.atom_type.shape[-1]

    @property
    def num_graph_slots(self) -> int:
        return self.total_charge.shape[-1]


# Bucket ladder: smallest power-of-two-ish size >= n, aligned to TPU lanes.
_DEFAULT_ALIGN = 8


def bucket_size(n: int, align: int = _DEFAULT_ALIGN, ladder: Sequence[float] = (1.0, 1.25, 1.5, 1.75)) -> int:
    """Round ``n`` up to a small set of bucket sizes to bound recompiles.

    Buckets are {m * 2^k} for m in ``ladder``, aligned to ``align``.
    """
    if n <= align:
        return align
    k = int(np.ceil(np.log2(n)))
    candidates = []
    for kk in (k - 1, k):
        for m in ladder:
            c = int(m * (1 << kk))
            c = ((c + align - 1) // align) * align
            if c >= n:
                candidates.append(c)
    return min(candidates)


def collate(
    mols: Sequence[MolFeatures],
    targets: np.ndarray,
    *,
    num_hops: int,
    atom_slots: int | None = None,
    edge_slots: int | None = None,
    graph_slots: int | None = None,
    tet_slots: int | None = None,
    pair_slots: int | None = None,
    sort_edges: bool = True,
) -> MolBatch:
    """Collate ragged per-molecule features into one padded MolBatch.

    ``targets`` has shape (len(mols), T).  Slot counts default to bucketed
    sizes derived from the actual totals; pass explicit values for a fully
    static training shape.
    """
    B = len(mols)
    targets = np.asarray(targets, dtype=np.float32)
    if targets.ndim == 1:
        targets = targets[:, None]

    n_atoms = np.array([m.num_atoms for m in mols], dtype=np.int64)
    offsets = np.concatenate([[0], np.cumsum(n_atoms)[:-1]])
    total_atoms = int(n_atoms.sum())

    A = atom_slots or bucket_size(total_atoms)
    Bslots = graph_slots or B
    if A < total_atoms:
        raise ValueError(f"atom_slots={A} < total atoms {total_atoms}")
    if Bslots < B:
        raise ValueError(f"graph_slots={Bslots} < batch {B}")

    def _cat(key):
        if not mols:  # empty device shard (short final chunk)
            return np.zeros(0, np.int32)
        return np.concatenate([getattr(m, key) for m in mols]).astype(np.int32)

    atom_type = np.zeros(A, np.int32)
    hydrogen_count = np.zeros(A, np.int32)
    degree = np.zeros(A, np.int32)
    hybridization = np.zeros(A, np.int32)
    atom_type[:total_atoms] = _cat("atom_type")
    hydrogen_count[:total_atoms] = _cat("hydrogen_count")
    degree[:total_atoms] = _cat("degree")
    hybridization[:total_atoms] = _cat("hybridization")

    atom_mol = np.full(A, Bslots, np.int32)
    atom_mol[:total_atoms] = np.repeat(np.arange(B, dtype=np.int32), n_atoms)
    atom_mask = np.zeros(A, bool)
    atom_mask[:total_atoms] = True

    # --- edges: concat across molecules and hops, offset atom ids ---
    srcs, dsts, hops = [], [], []
    for i, m in enumerate(mols):
        off = offsets[i]
        for h in range(num_hops):
            if h < len(m.edge_hops) and m.edge_hops[h].shape[1] > 0:
                e = m.edge_hops[h]
                # Reference convention: row 0 = origin atom (message target),
                # row 1 = the h-hop neighbor (message source).
                dsts.append(e[0] + off)
                srcs.append(e[1] + off)
                hops.append(np.full(e.shape[1], h + 1, np.int32))
    if srcs:
        src = np.concatenate(srcs).astype(np.int32)
        dst = np.concatenate(dsts).astype(np.int32)
        hop = np.concatenate(hops)
    else:
        src = np.zeros(0, np.int32)
        dst = np.zeros(0, np.int32)
        hop = np.zeros(0, np.int32)

    total_edges = src.shape[0]
    E = edge_slots or bucket_size(max(total_edges, 1))
    if E < total_edges:
        raise ValueError(f"edge_slots={E} < total edges {total_edges}")

    if sort_edges and total_edges > 0:
        # Sort dst-major (hop minor): the parity-mode union-of-hops
        # aggregation keys on dst alone, so globally nondecreasing dst lets
        # the TPU segment sum take the sorted path.
        order = np.lexsort((hop, dst))
        src, dst, hop = src[order], dst[order], hop[order]

    edge_src = np.zeros(E, np.int32)
    edge_dst = np.full(E, A, np.int32)
    edge_hop = np.zeros(E, np.int32)
    edge_mask = np.zeros(E, bool)
    edge_src[:total_edges] = src
    edge_dst[:total_edges] = dst
    edge_hop[:total_edges] = hop
    edge_mask[:total_edges] = True

    # --- graph-level ---
    total_charge = np.zeros(Bslots, np.float32)
    total_charge[:B] = np.array([m.total_charge for m in mols], np.float32)
    T = targets.shape[1]
    tgt = np.zeros((Bslots, T), np.float32)
    tgt[:B] = targets
    graph_mask = np.zeros(Bslots, bool)
    graph_mask[:B] = True

    # --- stereochemistry ---
    tet_rows = []
    for i, m in enumerate(mols):
        if m.tet_nbrs.size:
            # keep only exactly-4-neighbor centers (reference:
            # src/datasets/molecular.py:365)
            t = m.tet_nbrs
            if t.ndim == 2 and t.shape[1] == 4:
                tet_rows.append(t + offsets[i])
    tet = np.concatenate(tet_rows).astype(np.int32) if tet_rows else np.zeros((0, 4), np.int32)
    C = tet_slots or bucket_size(max(tet.shape[0], 1))
    tet_nbrs = np.full((C, 4), A, np.int32)
    tet_mask = np.zeros(C, bool)
    tet_nbrs[: tet.shape[0]] = tet
    tet_mask[: tet.shape[0]] = True

    def _pairs(key):
        rows = []
        for i, m in enumerate(mols):
            p = getattr(m, key)
            if p.size:
                rows.append(p.reshape(-1, 2) + offsets[i])
        arr = np.concatenate(rows).astype(np.int32) if rows else np.zeros((0, 2), np.int32)
        # Reference appends reversed copies again (quirk Q7;
        # src/datasets/molecular.py:388-397): each directed pair appears twice.
        if arr.shape[0]:
            arr = np.concatenate([arr, arr[:, ::-1]])
        return arr

    cis = _pairs("cis_pairs")
    trans = _pairs("trans_pairs")
    P = pair_slots or bucket_size(max(cis.shape[0], trans.shape[0], 1))
    if P < max(cis.shape[0], trans.shape[0]):
        raise ValueError("pair_slots too small")

    def _pad_pairs(arr):
        out = np.full((P, 2), A, np.int32)
        msk = np.zeros(P, bool)
        out[: arr.shape[0]] = arr
        msk[: arr.shape[0]] = True
        return out, msk

    cis_pairs, cis_mask = _pad_pairs(cis)
    trans_pairs, trans_mask = _pad_pairs(trans)

    return MolBatch(
        atom_type=atom_type,
        hydrogen_count=hydrogen_count,
        degree=degree,
        hybridization=hybridization,
        atom_mol=atom_mol,
        atom_mask=atom_mask,
        edge_src=edge_src,
        edge_dst=edge_dst,
        edge_hop=edge_hop,
        edge_mask=edge_mask,
        total_charge=total_charge,
        targets=tgt,
        graph_mask=graph_mask,
        tet_nbrs=tet_nbrs,
        tet_mask=tet_mask,
        cis_pairs=cis_pairs,
        cis_mask=cis_mask,
        trans_pairs=trans_pairs,
        trans_mask=trans_mask,
        edges_dst_sorted=bool(sort_edges),
    )


def attach_fused_layouts(batch: MolBatch, pins: dict | None = None) -> MolBatch:
    """Build and attach the fused-kernel edge layouts (ops/fused_edge.py).

    ``pins`` (mutated in place) carries {"cap": .., "sb": ..} minimums so a
    loader keeps one static kernel shape across batches.  Falls back to the
    plain batch when the atom count is too small for a source block.
    """
    from ..ops.fused_edge import build_layouts

    def _cap(l):
        return l.src_local.shape[0] // l.num_windows * l.chunk

    A = batch.num_atom_slots
    kw = dict(cap=pins.get("cap"), sb=pins.get("sb")) if pins else {}
    # smaller windows for small batches (the one-hot last dim must tile to
    # 128 lanes, so the source block is a 128-multiple ≤ A)
    kw["window"] = 256 if A >= 512 else 128
    try:
        fwd, bwd = build_layouts(
            batch.edge_src, batch.edge_dst, batch.edge_mask, A, **kw
        )
        if pins is not None:
            pins["cap"] = max(_cap(fwd), _cap(bwd))
            pins["sb"] = max(fwd.sb, bwd.sb)
            if (_cap(fwd), fwd.sb) != (pins["cap"], pins["sb"]) or (
                (_cap(bwd), bwd.sb) != (pins["cap"], pins["sb"])
            ):
                # rebuild both at the shared pinned shape so fwd/bwd (and
                # successive batches) hit one compiled kernel
                fwd, bwd = build_layouts(
                    batch.edge_src, batch.edge_dst, batch.edge_mask, A,
                    cap=pins["cap"], sb=pins["sb"], window=kw["window"],
                )
    except ValueError:  # tiny batch: source block would exceed atom slots
        return batch
    return dataclasses.replace(batch, fused_fwd=fwd, fused_bwd=bwd)


def repin_fused_shards(shards: list, pins: dict) -> list:
    """Fused-layout pins may have grown while collating a stacked batch;
    rebuild earlier shards' layouts so np.stack sees uniform shapes."""
    target = dict(pins)
    out = []
    for b in shards:
        f = b.fused_fwd
        needs = f is None or (
            f.sb != target.get("sb")
            or f.src_local.shape[0] // f.num_windows * f.chunk != target.get("cap")
            or b.fused_bwd.sb != target.get("sb")
        )
        if needs:
            b = attach_fused_layouts(
                dataclasses.replace(b, fused_fwd=None, fused_bwd=None), dict(target)
            )
        out.append(b)
    return out


def shard_edges(batch: MolBatch, num_shards: int) -> list:
    """Split a batch's edges into ``num_shards`` contiguous slices for
    edge-partitioned execution (atoms/graphs/stereo replicated per shard).

    Each shard sees the full atom set but 1/num_shards of the edges; under
    shard_map the partial neighborhood sums are psum'd over the 'graph'
    mesh axis (ShellConvolutionLayer.graph_axis).  Edge count is padded to
    a multiple of ``num_shards``.
    """
    E = batch.edge_src.shape[0]
    A = batch.num_atom_slots
    per = -(-E // num_shards)
    E_pad = per * num_shards

    def _pad_edge(arr, fill):
        if E_pad == E:
            return arr
        return np.pad(arr, (0, E_pad - E), constant_values=fill)

    src = _pad_edge(batch.edge_src, 0)
    dst = _pad_edge(batch.edge_dst, A)
    hop = _pad_edge(batch.edge_hop, 0)
    mask = _pad_edge(batch.edge_mask, False)

    shards = []
    for s in range(num_shards):
        sl = slice(s * per, (s + 1) * per)
        shards.append(
            dataclasses.replace(
                batch,
                edge_src=src[sl],
                edge_dst=dst[sl],
                edge_hop=hop[sl],
                edge_mask=mask[sl],
            )
        )
    return shards


def pad_batch(batch: MolBatch, *, atom_slots: int, edge_slots: int, graph_slots: int) -> MolBatch:
    """Re-pad an existing batch to larger static slot counts."""
    A0, E0, B0 = batch.num_atom_slots, batch.edge_src.shape[0], batch.num_graph_slots
    if atom_slots < A0 or edge_slots < E0 or graph_slots < B0:
        raise ValueError("pad_batch cannot shrink")

    def _pad(arr, n, fill):
        pad_width = [(0, n - arr.shape[0])] + [(0, 0)] * (arr.ndim - 1)
        return np.pad(arr, pad_width, constant_values=fill)

    # Atom-slot index changes: scatter-drop index A0 -> atom_slots
    def _remap(ix):
        ix = np.asarray(ix)
        return np.where(ix == A0, atom_slots, ix).astype(np.int32)

    return MolBatch(
        atom_type=_pad(batch.atom_type, atom_slots, 0),
        hydrogen_count=_pad(batch.hydrogen_count, atom_slots, 0),
        degree=_pad(batch.degree, atom_slots, 0),
        hybridization=_pad(batch.hybridization, atom_slots, 0),
        atom_mol=_pad(
            np.where(batch.atom_mol == B0, graph_slots, batch.atom_mol).astype(np.int32),
            atom_slots,
            graph_slots,
        ),
        atom_mask=_pad(batch.atom_mask, atom_slots, False),
        edge_src=_pad(batch.edge_src, edge_slots, 0),
        edge_dst=_pad(_remap(batch.edge_dst), edge_slots, atom_slots),
        edge_hop=_pad(batch.edge_hop, edge_slots, 0),
        edge_mask=_pad(batch.edge_mask, edge_slots, False),
        total_charge=_pad(batch.total_charge, graph_slots, 0.0),
        targets=_pad(batch.targets, graph_slots, 0.0),
        graph_mask=_pad(batch.graph_mask, graph_slots, False),
        tet_nbrs=_remap(batch.tet_nbrs),
        tet_mask=batch.tet_mask,
        cis_pairs=_remap(batch.cis_pairs),
        cis_mask=batch.cis_mask,
        trans_pairs=_remap(batch.trans_pairs),
        trans_mask=batch.trans_mask,
        edges_dst_sorted=batch.edges_dst_sorted,
    )
