"""Synthetic molecular batches for benchmarks, dry runs, and compile checks.

Generates ring-topology "molecules" with realistic QM9-like size statistics
(≈18 atoms incl. H per molecule, 1..K-hop BFS edge structure) without
touching the featurizer, so device-side code can be exercised hermetically.
"""

from __future__ import annotations

from typing import List

import numpy as np

from .batching import MolBatch, MolFeatures, collate


def make_synthetic_mol(rng: np.random.Generator, n_atoms: int, num_hops: int) -> MolFeatures:
    """A ring molecule of ``n_atoms`` with exact k-hop BFS edge lists."""
    hops: List[np.ndarray] = []
    for h in range(1, num_hops + 1):
        pairs = []
        if 2 * h < n_atoms:  # on a ring, hop-h neighbors are i±h
            for i in range(n_atoms):
                pairs.append((i, (i + h) % n_atoms))
                pairs.append((i, (i - h) % n_atoms))
        e = np.array(pairs, np.int32).T if pairs else np.zeros((2, 0), np.int32)
        hops.append(e)
    return MolFeatures(
        edge_hops=hops,
        atom_type=rng.integers(0, 9, n_atoms).astype(np.int32),
        hydrogen_count=rng.integers(0, 4, n_atoms).astype(np.int32),
        degree=rng.integers(1, 5, n_atoms).astype(np.int32),
        hybridization=rng.integers(0, 4, n_atoms).astype(np.int32),
        tet_nbrs=np.zeros((0, 4), np.int32),
        cis_pairs=np.zeros((0, 2), np.int32),
        trans_pairs=np.zeros((0, 2), np.int32),
        total_charge=0.0,
        atomic_numbers=rng.integers(1, 9, n_atoms).astype(np.int32),
    )


def make_synthetic_batch(
    num_graphs: int = 64,
    mean_atoms: int = 18,
    num_hops: int = 3,
    num_tasks: int = 12,
    seed: int = 0,
    **collate_kw,
) -> MolBatch:
    rng = np.random.default_rng(seed)
    mols = [
        make_synthetic_mol(rng, int(rng.integers(max(4, mean_atoms - 6), mean_atoms + 7)), num_hops)
        for _ in range(num_graphs)
    ]
    targets = rng.normal(size=(num_graphs, num_tasks)).astype(np.float32)
    return collate(mols, targets, num_hops=num_hops, **collate_kw)
