"""Native featurizer tests with hand-derived chemistry expectations."""

import numpy as np
import pytest

from aimnet_x2d_tpu.chem import compute_features, parse_atomic_numbers, parse_smiles
from aimnet_x2d_tpu.chem.smiles import SmilesError, add_hydrogens, hybridization


def _edges_set(arr):
    return set(map(tuple, arr.T.tolist()))


class TestParser:
    def test_methane(self):
        mol = add_hydrogens(parse_smiles("C"))
        assert [a.atomic_num for a in mol.atoms] == [6, 1, 1, 1, 1]
        assert len(mol.bonds) == 4

    def test_ethanol(self):
        mol = add_hydrogens(parse_smiles("CCO"))
        zs = [a.atomic_num for a in mol.atoms]
        assert zs[:3] == [6, 6, 8]
        assert zs.count(1) == 6  # C2H5OH

    def test_charges(self):
        mol = parse_smiles("[NH4+]")
        assert mol.atoms[0].charge == 1
        assert mol.atoms[0].explicit_h == 4
        mol2 = parse_smiles("CC(=O)[O-]")
        assert sum(a.charge for a in mol2.atoms) == -1

    def test_benzene_kekulized(self):
        mol = parse_smiles("c1ccccc1")
        orders = sorted(b.order for b in mol.bonds)
        assert orders == [1, 1, 1, 2, 2, 2]
        assert all(a.implicit_h == 1 for a in mol.atoms)

    def test_pyridine_kekulized(self):
        mol = parse_smiles("c1ccncc1")
        assert sum(b.order == 2 for b in mol.bonds) == 3
        n_atom = next(a for a in mol.atoms if a.atomic_num == 7)
        assert n_atom.implicit_h == 0

    def test_pyrrole(self):
        mol = parse_smiles("c1cc[nH]c1")
        assert sum(b.order == 2 for b in mol.bonds) == 2  # N contributes none
        n_atom = next(a for a in mol.atoms if a.atomic_num == 7)
        assert n_atom.explicit_h == 1

    def test_furan(self):
        mol = parse_smiles("c1ccoc1")
        assert sum(b.order == 2 for b in mol.bonds) == 2

    def test_ring_closure_percent(self):
        mol = parse_smiles("C%10CC%10")
        assert len(mol.bonds) == 3  # cyclopropane

    def test_fragments_dot(self):
        mol = parse_smiles("[Na+].[Cl-]")
        assert len(mol.bonds) == 0
        assert sum(a.charge for a in mol.atoms) == 0

    def test_triple_bond(self):
        mol = add_hydrogens(parse_smiles("C#N"))
        assert mol.bonds[0].order == 3
        # HCN: C has 1 implicit H
        assert sum(1 for a in mol.atoms if a.atomic_num == 1) == 1

    @pytest.mark.parametrize("bad", ["C(", "C1CC", "[Xx]", "C==C", ")C"])
    def test_invalid_smiles(self, bad):
        with pytest.raises(SmilesError):
            parse_smiles(bad)

    def test_invalid_returns_none(self):
        assert compute_features("C1CC", max_hops=3) is None
        assert parse_atomic_numbers("(((") is None


class TestHybridization:
    def test_cases(self):
        # (smiles, atom index, expected)
        cases = [
            ("C", 0, "SP3"),
            ("C=C", 0, "SP2"),
            ("C#C", 0, "SP"),
            ("O", 0, "SP3"),  # water
            ("C=O", 1, "SP2"),  # carbonyl O
            ("c1ccccc1", 0, "SP2"),
            ("N", 0, "SP3"),  # ammonia
            ("C#N", 1, "SP"),  # nitrile N
        ]
        for smi, idx, expected in cases:
            mol = add_hydrogens(parse_smiles(smi))
            assert hybridization(mol, idx) == expected, (smi, idx)


class TestMultiHop:
    def test_chain_hops(self):
        """Propane heavy chain C0-C1-C2 with explicit H.

        Hop-1 must be all directed adjacency; hop-2 contains (0,2)/(2,0)
        plus H-H and H-C pairs two bonds apart; minimal-hop uniqueness."""
        feats = compute_features("CCC", max_hops=3)
        h1 = _edges_set(feats.edge_hops[0])
        assert (0, 1) in h1 and (1, 0) in h1 and (1, 2) in h1
        h2 = _edges_set(feats.edge_hops[1])
        assert (0, 2) in h2 and (2, 0) in h2
        # no duplicates across hops
        h3 = _edges_set(feats.edge_hops[2])
        assert not (h1 & h2) and not (h1 & h3) and not (h2 & h3)
        # symmetric: every directed pair has its reverse in the same hop
        for hs in (h1, h2, h3):
            assert all((b, a) in hs for (a, b) in hs)

    def test_hop1_count_equals_twice_bonds(self):
        feats = compute_features("c1ccccc1", max_hops=2)
        # benzene with H: 12 atoms, 12 bonds -> 24 directed hop-1 edges
        assert feats.edge_hops[0].shape[1] == 24

    def test_max_hops_padding(self):
        feats = compute_features("C", max_hops=4)
        assert len(feats.edge_hops) == 4
        assert feats.edge_hops[2].shape == (2, 0)


class TestAtomFeatures:
    def test_ethanol_features(self):
        feats = compute_features("CCO", max_hops=1)
        # atoms: C C O + 6 H
        assert feats.num_atoms == 9
        np.testing.assert_array_equal(feats.atomic_numbers[:3], [6, 6, 8])
        # atom_type index = Z - 1
        np.testing.assert_array_equal(feats.atom_type[:3], [5, 5, 7])
        # H counts: CH3=3, CH2=2, OH=1
        np.testing.assert_array_equal(feats.hydrogen_count[:3], [3, 2, 1])
        # degrees (explicit, post AddHs): C=4, C=4, O=2; H atoms=1
        np.testing.assert_array_equal(feats.degree[:3], [4, 4, 2])
        assert np.all(feats.degree[3:] == 1)
        # hybridization: SP3 (index 3) for heavy atoms, S (index 0) for H
        np.testing.assert_array_equal(feats.hybridization[:3], [3, 3, 3])
        assert np.all(feats.hybridization[3:] == 0)
        assert feats.total_charge == 0.0

    def test_charged_molecule(self):
        feats = compute_features("CC(=O)[O-]", max_hops=1)
        assert feats.total_charge == -1.0


class TestStereo:
    def test_trans_difluoroethene(self):
        feats = compute_features("F/C=C/F", max_hops=1)
        # atoms: F0 C1 C2 F3 + 2H
        # E-config: high substituents (F,F) opposite -> the F..F directed
        # pairs land in trans, F..H pairs in cis
        trans = set(map(tuple, feats.trans_pairs.tolist()))
        cis = set(map(tuple, feats.cis_pairs.tolist()))
        assert (0, 3) in trans and (3, 0) in trans
        assert len(feats.trans_pairs) == 4 and len(feats.cis_pairs) == 4
        assert (0, 3) not in cis

    def test_cis_difluoroethene(self):
        feats = compute_features("F/C=C\\F", max_hops=1)
        cis = set(map(tuple, feats.cis_pairs.tolist()))
        assert (0, 3) in cis and (3, 0) in cis

    def test_no_stereo_no_pairs(self):
        feats = compute_features("FC=CF", max_hops=1)  # undecorated
        assert feats.cis_pairs.shape[0] == 0
        assert feats.trans_pairs.shape[0] == 0

    def test_assigned_chiral_center(self):
        # bromochlorofluoromethane: C with H, F, Cl, Br
        feats = compute_features("[C@H](F)(Cl)Br", max_hops=1)
        assert feats.tet_nbrs.shape[0] == 1
        assert feats.tet_nbrs.shape[1] == 4

    def test_potential_chiral_center_detected(self):
        # same molecule without the tag — 4 distinct substituents
        feats = compute_features("C(F)(Cl)Br", max_hops=1)
        assert feats.tet_nbrs.shape[0] == 1

    def test_symmetric_center_not_chiral(self):
        feats = compute_features("CC(C)C", max_hops=1)  # isobutane CH
        assert feats.tet_nbrs.shape[0] == 0


class TestQM9Coverage:
    def test_sample_smiles_parse(self):
        import csv
        import os

        path = "/root/reference/sample-data/qm9/sample-splits/val.csv"
        if not os.path.exists(path):
            pytest.skip("sample data unavailable")
        with open(path) as f:
            rows = [r["smiles"] for r in csv.DictReader(f)][:500]
        ok = sum(compute_features(s, max_hops=3) is not None for s in rows)
        assert ok >= 498  # ≥99.6% parse coverage on QM9 sample
