"""Out-of-core HDF5 pipeline: chunk-append writer, streaming SAE/scaler
fit, in-place target transform, and block-read loader — cross-validated
against the in-memory implementations on the same molecules."""

import numpy as np
import pytest

from aimnet_x2d_tpu.data.dataset import MoleculeDataset
from aimnet_x2d_tpu.data.hdf5 import (
    HDF5BatchLoader,
    HDF5MoleculeDataset,
    fit_pipeline_streaming,
    transform_targets_streaming,
    write_hdf5,
    write_hdf5_streaming,
)
from aimnet_x2d_tpu.data.preprocessing import (
    PreprocessingConfig,
    PreprocessingPipeline,
)

SMILES = [
    "CCO", "c1ccccc1", "CC(=O)O", "CCN", "C1CCCCC1", "CC(C)C", "C#N",
    "OCC(O)CO", "c1ccncc1", "CCOC(=O)C", "NC(=O)N", "ClCCl", "FC(F)F",
    "CC(C)(C)O", "C1=CC=CC=C1C", "CCCCCC", "N#Cc1ccccc1", "OC(=O)c1ccccc1",
    "CSC", "CC=CC",
] * 3  # 60 molecules


def _targets(rng, n, t=3):
    return (rng.normal(size=(n, t)) * [1.0, 10.0, 0.1] + [0.0, -30.0, 5.0]).astype(
        np.float32
    )


@pytest.fixture
def mem_ds(rng):
    return MoleculeDataset.from_smiles(SMILES, _targets(rng, len(SMILES)), max_hops=3)


def test_streaming_writer_matches_batch_writer(tmp_path, mem_ds):
    p_stream = str(tmp_path / "stream.h5")
    p_batch = str(tmp_path / "batch.h5")
    # write from the RAW input strings (featurizing mem_ds.smiles — now the
    # processed canonical form — would give canonical atom order, while
    # mem_ds's feature arrays are in input order)
    kept = write_hdf5_streaming(
        p_stream, SMILES, mem_ds.targets, 3, chunk_size=7, target_columns=["a", "b", "c"]
    )
    assert kept == len(mem_ds)
    write_hdf5(p_batch, mem_ds, target_columns=["a", "b", "c"])

    a = HDF5MoleculeDataset(p_stream)
    b = HDF5MoleculeDataset(p_batch)
    assert len(a) == len(b)
    assert a.max_atoms_per_mol == b.max_atoms_per_mol
    assert a.max_edges_per_mol == b.max_edges_per_mol
    assert a.target_columns == ["a", "b", "c"]
    for i in (0, 13, len(a) - 1):
        fa, fb = a.get_features(i), b.get_features(i)
        np.testing.assert_array_equal(fa.atom_type, fb.atom_type)
        np.testing.assert_array_equal(fa.atomic_numbers, fb.atomic_numbers)
        np.testing.assert_array_equal(fa.tet_nbrs, fb.tet_nbrs)
        np.testing.assert_array_equal(fa.cis_pairs, fb.cis_pairs)
        for h in range(3):
            np.testing.assert_array_equal(fa.edge_hops[h], fb.edge_hops[h])
    np.testing.assert_allclose(
        a.file["graphs/targets"][:], b.file["graphs/targets"][:]
    )
    a.close()
    b.close()


@pytest.mark.parametrize(
    "task_type,subtasks", [("regression", None), ("multitask", [1, 2])]
)
def test_streaming_fit_matches_in_memory(tmp_path, mem_ds, task_type, subtasks):
    cfg = PreprocessingConfig(
        apply_sae=True,
        sae_subtasks=subtasks,
        apply_standard_scaling=True,
        task_type=task_type,
    )
    # in-memory reference fit
    ref = PreprocessingPipeline(cfg)
    ref.fit(mem_ds.atomic_numbers(), mem_ds.targets)

    path = str(tmp_path / "d.h5")
    write_hdf5_streaming(path, mem_ds.smiles, mem_ds.targets, 3, chunk_size=11)
    pipe = fit_pipeline_streaming(path, cfg, chunk_size=13)

    # SAE dicts agree (normal equations vs direct lstsq)
    for key, sub_ref in ref.sae_normalizer.sae_statistics.items():
        sub = pipe.sae_normalizer.sae_statistics[key]
        for z, v in sub_ref.items():
            if abs(v) > 1e-9:
                np.testing.assert_allclose(sub[z], v, rtol=1e-6, atol=1e-8)
    # scaler moments agree
    np.testing.assert_allclose(
        pipe.standard_scaler.means, ref.standard_scaler.means, rtol=1e-5, atol=1e-5
    )
    np.testing.assert_allclose(
        pipe.standard_scaler.stds, ref.standard_scaler.stds, rtol=1e-5, atol=1e-5
    )

    # in-place transform equals in-memory transform
    transform_targets_streaming(path, pipe, chunk_size=17)
    h5 = HDF5MoleculeDataset(path)
    expected = ref.transform(mem_ds.atomic_numbers(), mem_ds.targets)
    np.testing.assert_allclose(
        h5.file["graphs/targets"][:], expected, rtol=1e-4, atol=1e-4
    )
    assert h5.preprocessing_state is not None
    # the recorded state reconstructs an equivalent pipeline
    rt = PreprocessingPipeline.from_state_dict(h5.preprocessing_state)
    np.testing.assert_allclose(
        rt.standard_scaler.means, pipe.standard_scaler.means
    )
    h5.close()


def test_block_reader_matches_get_features(tmp_path, mem_ds):
    path = str(tmp_path / "d.h5")
    write_hdf5_streaming(path, mem_ds.smiles, mem_ds.targets, 3, chunk_size=9)
    h5 = HDF5MoleculeDataset(path)
    feats, targets = h5.read_block(10, 30)
    assert len(feats) == 20
    for j, i in enumerate(range(10, 30)):
        ref = h5.get_features(i)
        got = feats[j]
        np.testing.assert_array_equal(got.atom_type, ref.atom_type)
        np.testing.assert_array_equal(got.atomic_numbers, ref.atomic_numbers)
        np.testing.assert_array_equal(got.tet_nbrs, ref.tet_nbrs)
        np.testing.assert_array_equal(got.cis_pairs, ref.cis_pairs)
        np.testing.assert_array_equal(got.trans_pairs, ref.trans_pairs)
        for h in range(3):
            np.testing.assert_array_equal(got.edge_hops[h], ref.edge_hops[h])
        assert got.smiles == ref.smiles
        assert got.total_charge == ref.total_charge
    h5.close()


def test_block_loader_epoch_coverage_and_shuffle(tmp_path, mem_ds):
    path = str(tmp_path / "d.h5")
    write_hdf5_streaming(path, mem_ds.smiles, mem_ds.targets, 3)
    h5 = HDF5MoleculeDataset(path)

    loader = HDF5BatchLoader(h5, batch_size=8, shuffle=True, seed=3, block_batches=2)
    loader.set_epoch(0)
    t0 = np.concatenate(
        [np.asarray(b.targets)[np.asarray(b.graph_mask)] for b in loader]
    )
    assert len(t0) == len(mem_ds)
    # every molecule appears exactly once (match on target rows)
    np.testing.assert_allclose(
        np.sort(t0, axis=0), np.sort(mem_ds.targets, axis=0), rtol=1e-6
    )
    loader.set_epoch(1)
    t1 = np.concatenate(
        [np.asarray(b.targets)[np.asarray(b.graph_mask)] for b in loader]
    )
    assert not np.allclose(t0, t1)  # different epoch order
    h5.close()


def test_native_binned_loader_matches_flat(tmp_path, mem_ds):
    """The native binned HDF5 path (read_block_cache → C builder) must
    visit the same molecules in the same epoch order as the flat loader
    and attach consistent dense layouts."""
    pytest.importorskip("aimnet_x2d_tpu.data.native_batch")
    from aimnet_x2d_tpu.data.native_batch import load_library

    if load_library() is None:
        pytest.skip("native batch builder not built")

    path = str(tmp_path / "nb.h5")
    write_hdf5_streaming(path, mem_ds.smiles, mem_ds.targets, 3)
    h5 = HDF5MoleculeDataset(path)

    flat = HDF5BatchLoader(h5, batch_size=8, shuffle=True, seed=5, binned=False)
    # size_sort=False: exact order comparison (the round-5 default sorts
    # within a batch by size — set-equality checked separately below)
    binned = HDF5BatchLoader(
        h5, batch_size=8, shuffle=True, seed=5, binned=True, size_sort=False
    )
    sorted_loader = HDF5BatchLoader(h5, batch_size=8, shuffle=True, seed=5, binned=True)
    assert sorted_loader.size_sort  # training default
    flat.set_epoch(2)
    binned.set_epoch(2)
    sorted_loader.set_epoch(2)
    fb, bb, sb = list(flat), list(binned), list(sorted_loader)
    for a, b, s in zip(fb, bb, sb):
        assert b.bin_adj is not None and b.pool_mat is not None
        ta = np.asarray(a.targets)[np.asarray(a.graph_mask)]
        tb = np.asarray(b.targets)[np.asarray(b.graph_mask)]
        np.testing.assert_allclose(ta, tb, rtol=1e-6)
        assert int(np.asarray(b.bin_adj).sum()) == int(np.asarray(a.edge_mask).sum())
        # sorted loader: same molecule SET per batch, permuted within
        ts = np.asarray(s.targets)[np.asarray(s.graph_mask)]
        np.testing.assert_allclose(
            np.sort(ts, axis=0), np.sort(ta, axis=0), rtol=1e-6
        )
    h5.close()


def test_hdf5_warm_bin_pins_exact(tmp_path, mem_ds):
    """Streaming-TRAINING pin preseeding (VERDICT r4 #4): warm_bin_pins
    replays the loader's own shuffle schedule from HDF5 metadata, so no
    pin growth — i.e. no mid-run remote recompile — can occur over the
    simulated epochs, and every batch carries one static (bins, mb)."""
    path = str(tmp_path / "warm.h5")
    write_hdf5_streaming(path, mem_ds.smiles, mem_ds.targets, 3)
    h5 = HDF5MoleculeDataset(path)
    loader = HDF5BatchLoader(
        h5, batch_size=8, shuffle=True, seed=11, block_batches=2, binned=True
    )
    loader.warm_bin_pins(epochs=3)
    seeded = dict(loader._bin_pins)
    assert seeded.get("bins", 0) > 0
    shapes = set()
    for ep in range(3):
        loader.set_epoch(ep)
        for b in loader:
            shapes.add((b.bin_adj.shape[0], b.pool_mat.shape[1]))
    assert loader._bin_pins == seeded, "pins grew despite exact preseeding"
    assert shapes == {(seeded["bins"], seeded["mb"])}
    h5.close()
