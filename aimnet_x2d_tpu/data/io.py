"""CSV loading and deterministic splitting
(reference: src/datasets/io.py:11-85)."""

from __future__ import annotations

from typing import List, Optional, Sequence, Tuple

import numpy as np
import pandas as pd


def load_dataset(
    path: str,
    smiles_column: str = "smiles",
    target_column: str = "target",
    multi_target_columns: Optional[Sequence[str]] = None,
) -> Tuple[List[str], np.ndarray]:
    """Read (smiles, targets) from CSV; targets are (N, T) float32."""
    df = pd.read_csv(path)
    smiles = df[smiles_column].astype(str).tolist()
    if multi_target_columns is not None:
        targets = df[list(multi_target_columns)].to_numpy(dtype=np.float32)
    else:
        targets = df[[target_column]].to_numpy(dtype=np.float32)
    return smiles, targets


def split_dataset(
    smiles: Sequence[str],
    targets: np.ndarray,
    train_split: float = 0.8,
    val_split: float = 0.1,
    test_split: float = 0.1,
    seed: int = 42,
):
    """Two-stage shuffled split with a fixed seed, matching the reference's
    sklearn train_test_split(random_state=42) twice
    (reference: src/datasets/io.py:55-85)."""
    from sklearn.model_selection import train_test_split

    n = len(smiles)
    idx = np.arange(n)
    test_frac = test_split
    idx_trainval, idx_test = train_test_split(idx, test_size=test_frac, random_state=seed)
    val_frac = val_split / (train_split + val_split)
    idx_train, idx_val = train_test_split(idx_trainval, test_size=val_frac, random_state=seed)

    def take(ix):
        return [smiles[i] for i in ix], targets[ix]

    return take(idx_train), take(idx_val), take(idx_test)
