"""Native C++ featurizer: cross-validation against the pure-Python
featurizer (the executable specification) on real QM9 SMILES."""

import csv
import os

import numpy as np
import pytest

from aimnet_x2d_tpu.chem import compute_features
from aimnet_x2d_tpu.chem.native import compute_features_native, native_available

from conftest import SAMPLE_DATA, has_sample_data

pytestmark = pytest.mark.skipif(
    not native_available(), reason="native featurizer not built (make -C native)"
)


def _canon_edges(hops):
    return [
        np.sort(e.T, axis=0) if e.size else e for e in hops
    ]


def _assert_equal(a, b, smiles):
    assert (a is None) == (b is None), smiles
    if a is None:
        return
    np.testing.assert_array_equal(a.atom_type, b.atom_type, err_msg=smiles)
    np.testing.assert_array_equal(a.hydrogen_count, b.hydrogen_count, err_msg=smiles)
    np.testing.assert_array_equal(a.degree, b.degree, err_msg=smiles)
    np.testing.assert_array_equal(a.hybridization, b.hybridization, err_msg=smiles)
    np.testing.assert_array_equal(a.atomic_numbers, b.atomic_numbers, err_msg=smiles)
    assert a.total_charge == b.total_charge, smiles
    for x, y in zip(_canon_edges(a.edge_hops), _canon_edges(b.edge_hops)):
        np.testing.assert_array_equal(x, y, err_msg=smiles)
    np.testing.assert_array_equal(
        np.sort(a.tet_nbrs, axis=0), np.sort(b.tet_nbrs, axis=0), err_msg=smiles
    )
    for key in ("cis_pairs", "trans_pairs"):
        np.testing.assert_array_equal(
            np.sort(getattr(a, key), axis=0), np.sort(getattr(b, key), axis=0),
            err_msg=smiles,
        )


HAND_PICKED = [
    "C", "CCO", "c1ccccc1", "c1ccncc1", "c1cc[nH]c1", "CC(=O)[O-]",
    "[NH4+]", "F/C=C/F", "F/C=C\\F", "N[C@@H](C)C(=O)O", "C(F)(Cl)Br",
    "C#N", "O=C=O", "C1CC1", "c1ccc2ccccc2c1", "CC(C)(C)C",
]


@pytest.mark.parametrize("smiles", HAND_PICKED)
def test_hand_picked_parity(smiles):
    _assert_equal(
        compute_features_native(smiles, 3), compute_features(smiles, 3), smiles
    )


def test_invalid_smiles_none():
    assert compute_features_native("C1CC", 3) is None
    assert compute_features_native("xx(", 3) is None


@pytest.mark.skipif(not has_sample_data(), reason="sample data unavailable")
def test_qm9_sample_parity():
    with open(os.path.join(SAMPLE_DATA, "val.csv")) as f:
        rows = [r["smiles"] for r in csv.DictReader(f)][:400]
    for s in rows:
        _assert_equal(compute_features_native(s, 3), compute_features(s, 3), s)


def test_thread_pool_dispatch(rng):
    from aimnet_x2d_tpu.data.dataset import featurize_many

    smiles = ["CCO", "c1ccccc1", "bogus((", "CC(=O)O"] * 10
    targets = rng.normal(size=(40, 1)).astype(np.float32)
    keep, t, feats = featurize_many(smiles, targets, max_hops=2, num_workers=4)
    assert len(keep) == 30  # bogus dropped
    assert len(feats) == 30 and t.shape == (30, 1)
