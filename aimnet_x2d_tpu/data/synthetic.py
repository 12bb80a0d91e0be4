"""Synthetic molecular batches for benchmarks, dry runs, and compile checks.

Generates ring-topology "molecules" with realistic QM9-like size statistics
(≈18 atoms incl. H per molecule, 1..K-hop BFS edge structure) without
touching the featurizer, so device-side code can be exercised hermetically.
"""

from __future__ import annotations

from typing import List

import numpy as np

from .batching import MolBatch, MolFeatures, collate


def make_synthetic_mol(
    rng: np.random.Generator,
    n_atoms: int,
    num_hops: int,
    with_stereo: bool = False,
) -> MolFeatures:
    """A ring molecule of ``n_atoms`` with exact k-hop BFS edge lists.

    ``with_stereo`` adds QM9-plausible stereo annotations (one tetrahedral
    4-neighbor row, one cis and one trans directed pair each way) so
    BASELINE.json config 3 (stereochemistry + partial charges) can be
    benchmarked on synthetic data."""
    hops: List[np.ndarray] = []
    for h in range(1, num_hops + 1):
        pairs = []
        if 2 * h < n_atoms:  # on a ring, hop-h neighbors are i±h
            for i in range(n_atoms):
                pairs.append((i, (i + h) % n_atoms))
                pairs.append((i, (i - h) % n_atoms))
        e = np.array(pairs, np.int32).T if pairs else np.zeros((2, 0), np.int32)
        hops.append(e)
    tet = np.zeros((0, 4), np.int32)
    cis = np.zeros((0, 2), np.int32)
    trans = np.zeros((0, 2), np.int32)
    charge = 0.0
    if with_stereo and n_atoms >= 6:
        c = int(rng.integers(0, n_atoms))
        tet = (c + np.array([[1, 2, 3, 4]], np.int32)) % n_atoms
        a, b = int(rng.integers(0, n_atoms)), int(rng.integers(0, n_atoms))
        cis = np.array([[a, (a + 1) % n_atoms], [(a + 1) % n_atoms, a]], np.int32)
        trans = np.array([[b, (b + 2) % n_atoms], [(b + 2) % n_atoms, b]], np.int32)
        charge = float(rng.integers(-1, 2))
    return MolFeatures(
        edge_hops=hops,
        atom_type=rng.integers(0, 9, n_atoms).astype(np.int32),
        hydrogen_count=rng.integers(0, 4, n_atoms).astype(np.int32),
        degree=rng.integers(1, 5, n_atoms).astype(np.int32),
        hybridization=rng.integers(0, 4, n_atoms).astype(np.int32),
        tet_nbrs=tet,
        cis_pairs=cis,
        trans_pairs=trans,
        total_charge=charge,
        atomic_numbers=rng.integers(1, 9, n_atoms).astype(np.int32),
    )


def make_synthetic_batch(
    num_graphs: int = 64,
    mean_atoms: int = 18,
    num_hops: int = 3,
    num_tasks: int = 12,
    seed: int = 0,
    with_stereo: bool = False,
    **collate_kw,
) -> MolBatch:
    rng = np.random.default_rng(seed)
    mols = [
        make_synthetic_mol(
            rng,
            int(rng.integers(max(4, mean_atoms - 6), mean_atoms + 7)),
            num_hops,
            with_stereo=with_stereo,
        )
        for _ in range(num_graphs)
    ]
    targets = rng.normal(size=(num_graphs, num_tasks)).astype(np.float32)
    return collate(mols, targets, num_hops=num_hops, **collate_kw)
