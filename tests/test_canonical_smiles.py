"""Canonical SMILES writer + CIP stereocenter detection (round 4).

Covers the two PARITY.md omissions closed this round:
- processed canonical SMILES output (reference stores
  ``MolToSmiles(AddHs(mol), isomericSmiles=True, allHsExplicit=True)``,
  src/datasets/features.py:173,333; molecular.py:68)
- unassigned-stereocenter detection via the CIP hierarchical digraph
  (reference: RDKit ``FindMolChiralCenters(includeUnassigned=True)``,
  src/datasets/features.py:211-218)

The C++ featurizer (native/featurizer.cpp) must emit byte-identical
canonical strings and identical stereocenter sets — chem/ is the
executable specification.
"""

import numpy as np
import pytest

from aimnet_x2d_tpu.chem import smiles as sm
from aimnet_x2d_tpu.chem.featurize import compute_features


def canon(s: str) -> str:
    return sm.write_canonical_smiles(sm.add_hydrogens(sm.parse_smiles(s)))


# --------------------------------------------------------------- writer


@pytest.mark.parametrize(
    "variants",
    [
        ["CCO", "OCC", "C(O)C"],
        ["CC(N)C(=O)O", "NC(C)C(=O)O", "OC(=O)C(C)N"],
        # same stereoisomer, different writings (L-alanine)
        ["N[C@@H](C)C(=O)O", "C[C@H](N)C(=O)O", "OC(=O)[C@H](C)N"],
        # trans-1,2-difluoroethene: global direction flip is a no-op
        ["F/C=C/F", "F\\C=C\\F"],
        ["F/C=C\\F", "F\\C=C/F"],
        # conjugated diene, different traversal roots
        ["OC(=O)/C=C/C=C/C", "C/C=C/C=C/C(O)=O"],
        ["c1ccc2ccccc2c1", "c1ccc2ccccc2c1"],
    ],
)
def test_canonical_invariance(variants):
    forms = {canon(s) for s in variants}
    assert len(forms) == 1, forms


def test_canonical_distinguishes_stereoisomers():
    assert (
        len({canon("N[C@@H](C)C(=O)O"), canon("N[C@H](C)C(=O)O"), canon("NC(C)C(=O)O")})
        == 3
    )
    assert len({canon("F/C=C/F"), canon("F/C=C\\F"), canon("FC=CF")}) == 3
    assert len({canon("C/C=C/C=C/C"), canon("C/C=C\\C=C/C"), canon("CC=CC=CC")}) == 3


@pytest.mark.parametrize(
    "s",
    [
        "CCO", "c1ccccc1", "N[C@@H](C)C(=O)O", "F/C=C/F",
        "CC(=O)Oc1ccccc1C(=O)O", "[O-]C(=O)C", "C[N+](C)(C)C",
        "F[C@@]1(C)CC[C@H](Cl)CC1", "OC(=O)/C=C(/Cl)C#N", "[13CH4]",
        "C1CC1C2CC2", "CN1CCC[C@H]1c1cccnc1",
    ],
)
def test_canonical_idempotent_and_parseable(s):
    c = canon(s)
    # the canonical form parses with our own parser and re-canonicalizes
    # to itself (fixed point)
    assert canon(c) == c
    # same heavy-atom multiset
    f1, f2 = compute_features(s, 3), compute_features(c, 3)
    np.testing.assert_array_equal(
        np.sort(f1.atomic_numbers), np.sort(f2.atomic_numbers)
    )
    # same stereo content cardinality
    assert f1.tet_nbrs.shape == f2.tet_nbrs.shape
    assert f1.cis_pairs.shape == f2.cis_pairs.shape
    assert f1.trans_pairs.shape == f2.trans_pairs.shape


def test_processed_smiles_in_features():
    # MolFeatures.smiles is the PROCESSED canonical explicit-H string,
    # not the raw input (reference molecular.py:68)
    f = compute_features("OCC", 3)
    assert f.smiles == canon("CCO")
    assert "[H]" in f.smiles or "[H]" in f.smiles  # explicit-H form


def test_native_canonical_smiles_identical():
    native = pytest.importorskip("aimnet_x2d_tpu.chem.native")
    if not native.native_available():
        pytest.skip("native featurizer not built")
    cases = [
        "CCO", "c1ccccc1", "N[C@@H](C)C(=O)O", "F/C=C/F", "F/C=C\\F",
        "CC(=O)Oc1ccccc1C(=O)O", "C[N+](C)(C)C", "OC1CCCC1C",
        "F[C@@]1(C)CC[C@H](Cl)CC1", "C/C=C/C=C\\C", "CN1CCC[C@H]1c1cccnc1",
        "OCC(O)C(O)C(O)C(O)CO", "c1ccc2c(c1)cccc2O",
    ]
    for s in cases:
        py = compute_features(s, 3)
        na = native.compute_features_native(s, 3)
        assert py.smiles == na.smiles, s


# ----------------------------------------------------------- CIP digraph


def _unassigned_centers(s):
    f = compute_features(s, 3)
    mol = sm.add_hydrogens(sm.parse_smiles(s))
    assigned = {i for i, a in enumerate(mol.atoms) if a.chiral}
    return {tuple(r) for r in f.tet_nbrs.tolist()
            if not any(set(r) <= set(mol.neighbors(c)) for c in assigned)}


def test_cip_basic_centers():
    # alanine C2 is a potential center; isobutyric acid's C2 is not
    assert compute_features("CC(N)C(=O)O", 3).tet_nbrs.shape[0] == 1
    assert compute_features("CC(C)C(=O)O", 3).tet_nbrs.shape[0] == 0


def test_cip_ring_symmetry():
    # cyclopentanol C1: the two ring branches are mirror images -> no center
    assert compute_features("OC1CCCC1", 3).tet_nbrs.shape[0] == 0
    # 2-methylcyclopentanol: both ring carbons bearing O and CH3 are centers
    assert compute_features("OC1CCCC1C", 3).tet_nbrs.shape[0] == 2
    # 3-chloro-1-fluorocyclopentane: ring paths differ at depth 2 vs 3
    assert compute_features("FC1CC(Cl)CC1", 3).tet_nbrs.shape[0] == 2


def test_cip_phantom_atoms():
    # 3-cyclopentenol: double bond symmetric about C1 -> NOT a center
    # (requires phantom duplicates to land symmetrically)
    assert compute_features("OC1CC=CC1", 3).tet_nbrs.shape[0] == 0
    # 2-cyclopentenol: asymmetric -> center
    assert compute_features("OC1C=CCC1", 3).tet_nbrs.shape[0] == 1


def test_cip_pseudoasymmetry_not_flagged():
    # pentane-2,3,4-triol: C3's two branches are constitutionally identical
    # (pseudo-asymmetric only given assigned configurations) -> C2 and C4
    # flagged, C3 not (legacy FindMolChiralCenters behavior)
    assert compute_features("CC(O)C(O)C(O)C", 3).tet_nbrs.shape[0] == 2


class TestCleanItAnalog:
    """AssignStereochemistry(cleanIt=True) analog (ADVICE r4): bogus @/@@
    tags on non-stereogenic atoms are dropped before both the writer and
    stereocenter detection (reference: src/datasets/features.py:169-176)."""

    def test_bogus_tag_writings_canonicalize_identically(self):
        forms = {
            canon("[C@@]1(F)(Cl)CC1"),
            canon("Cl[C@@](F)1CC1"),
            canon("[C@]1(F)(Cl)CC1"),
            canon("C1(F)(Cl)CC1"),  # tag-free writing of the same compound
        }
        assert len(forms) == 1, forms

    def test_bogus_tag_emits_no_tet_row(self):
        # 1-chloro-1-fluorocyclopropane: the two ring branches are
        # constitutionally identical -> not a stereocenter
        assert compute_features("[C@@]1(F)(Cl)CC1", 3).tet_nbrs.shape[0] == 0

    def test_genuine_tag_survives_cleaning(self):
        a = canon("N[C@@H](C)C(=O)O")
        b = canon("N[C@H](C)C(=O)O")
        assert a != b
        assert "@" in a and "@" in b
        assert compute_features("N[C@@H](C)C(=O)O", 3).tet_nbrs.shape[0] == 1

    def test_native_twin_matches(self):
        native = pytest.importorskip("aimnet_x2d_tpu.chem.native")
        if not native.native_available():
            pytest.skip("native featurizer not built")
        for s in ["[C@@]1(F)(Cl)CC1", "Cl[C@@](F)1CC1", "C1(F)(Cl)CC1",
                  "N[C@@H](C)C(=O)O", "F[C@@]1(C)CC[C@H](Cl)CC1"]:
            py = compute_features(s, 3)
            na = native.compute_features_native(s, 3)
            assert py.smiles == na.smiles, s
            np.testing.assert_array_equal(py.tet_nbrs, na.tet_nbrs)


def test_cip_deep_chain_falls_back_not_crashes():
    # ~1200-atom alkane chain: the CIP digraph would recurse past Python's
    # default recursion limit — the shared depth bound (_CIP_MAX_DEPTH)
    # must route BOTH twins to the symmetry-rank fallback deterministically
    # instead of RecursionError / native stack overflow (ADVICE r4).
    s = "C" * 1200
    f = compute_features(s, 1)
    assert f is not None and f.num_atoms == 1200 + 2 * 1200 + 2
    c = canon(s)
    assert c.count("[C") == 1200
    native = None
    try:
        from aimnet_x2d_tpu.chem import native
    except ImportError:
        pass
    if native is not None and native.native_available():
        na = native.compute_features_native(s, 1)
        assert na.smiles == f.smiles
        np.testing.assert_array_equal(f.tet_nbrs, na.tet_nbrs)


def test_cip_native_matches_python():
    native = pytest.importorskip("aimnet_x2d_tpu.chem.native")
    if not native.native_available():
        pytest.skip("native featurizer not built")
    for s in ["OC1CCCC1", "OC1CCCC1C", "FC1CC(Cl)CC1", "OC1CC=CC1",
              "OC1C=CCC1", "CC(O)C(O)C(O)C", "CC(N)C(=O)O",
              "C1CC2CCC1CC2", "OC12CC3CC(CC(C3)C1)C2"]:
        py = compute_features(s, 3)
        na = native.compute_features_native(s, 3)
        np.testing.assert_array_equal(py.tet_nbrs, na.tet_nbrs)
