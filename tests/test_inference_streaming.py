"""Streaming inference upgrades: multi-host CSV sharding + merge, chunked
HDF5 inference, constant-memory embedding writer with atom embeddings."""

import os

import numpy as np
import pandas as pd
import pytest

from aimnet_x2d_tpu.cli import parse_arguments
from aimnet_x2d_tpu.inference.pipeline import StreamingInferencePipeline

from conftest import SAMPLE_DATA, has_sample_data

VAL_CSV = os.path.join(SAMPLE_DATA, "val.csv")

pytestmark = pytest.mark.skipif(not has_sample_data(), reason="sample data unavailable")


@pytest.fixture(scope="module")
def artifact(tmp_path_factory):
    """Train a tiny model once for all inference tests."""
    from aimnet_x2d_tpu.runner import main_runner

    root = tmp_path_factory.mktemp("inf")
    df = pd.read_csv(VAL_CSV).head(120)
    csv = str(root / "small.csv")
    df.to_csv(csv, index=False)
    model_path = str(root / "m.npz")
    args = parse_arguments(
        [
            "--data_path", csv, "--target_column", "gap",
            "--epochs", "1", "--batch_size", "32", "--hidden_dim", "48",
            "--embedding_dim", "8", "--num_message_passing_layers", "1",
            "--num_shells", "2", "--ffn_num_layers", "1",
            "--pooling_type", "mean", "--num_workers", "0",
            "--model_save_path", model_path,
        ]
    )
    main_runner(args)
    return model_path, csv


def _pipeline(model_path, **kw):
    return StreamingInferencePipeline(
        artifact_path=model_path, chunk_size=50, batch_size=16, **kw
    )


def test_multihost_csv_sharding_matches_single(artifact, tmp_path):
    model_path, csv = artifact
    single = str(tmp_path / "single.csv")
    _pipeline(model_path).run_csv(csv, single)
    ref = pd.read_csv(single)

    # simulate 2 hosts sequentially: host 1 writes its shard, then host 0
    # merges (the real multi-host run interleaves these around a barrier)
    merged = str(tmp_path / "merged.csv")
    r1 = _pipeline(model_path).run_csv(csv, merged, host_id=1, num_hosts=2)
    r0 = _pipeline(model_path).run_csv(csv, merged, host_id=0, num_hosts=2)
    # in this single-process simulation allgather only sees the local shard,
    # so each result reports its own half
    assert r0["total_molecules"] + r1["total_molecules"] == len(ref)
    got = pd.read_csv(merged)
    assert not os.path.exists(merged + ".rank0")
    assert not os.path.exists(merged + ".rank1")
    assert list(got.columns) == list(ref.columns)
    assert len(got) == len(ref)
    # contiguous rank ranges merged in order → identical row order
    assert got["smiles"].tolist() == ref["smiles"].tolist()
    np.testing.assert_allclose(got["gap"].to_numpy(), ref["gap"].to_numpy(), rtol=1e-5)


def test_hdf5_inference_chunked_matches_csv(artifact, tmp_path):
    model_path, csv = artifact
    from aimnet_x2d_tpu.data.hdf5 import write_hdf5_streaming

    df = pd.read_csv(csv)
    h5_path = str(tmp_path / "inf.h5")
    write_hdf5_streaming(
        h5_path, df["smiles"].tolist(), np.zeros((len(df), 1), np.float32), 2
    )
    out_h5 = str(tmp_path / "preds_h5.csv")
    res = _pipeline(model_path).run_hdf5(h5_path, out_h5)
    assert res["valid_molecules"] == len(df)

    out_csv = str(tmp_path / "preds_csv.csv")
    _pipeline(model_path).run_csv(csv, out_csv)
    a = pd.read_csv(out_h5)
    b = pd.read_csv(out_csv)
    assert len(a) == len(b)
    np.testing.assert_allclose(a["gap"].to_numpy(), b["gap"].to_numpy(), rtol=1e-4)


def test_streaming_embeddings_with_atoms(artifact, tmp_path):
    import h5py

    model_path, csv = artifact
    emb = str(tmp_path / "emb.h5")
    out = str(tmp_path / "p.csv")
    _pipeline(
        model_path,
        save_embeddings=True,
        embeddings_output_path=emb,
        include_atom_embeddings=True,
    ).run_csv(csv, out)

    n = len(pd.read_csv(out))
    with h5py.File(emb, "r") as f:
        assert f["mol_embeddings"].shape == (n, 48)
        assert f["smiles"].shape == (n,)
        offs = f["atom_offsets"][:]
        assert len(offs) == n + 1
        assert offs[-1] == f["atom_embeddings"].shape[0]
        assert f["atom_embeddings"].shape[1] == 48
        assert np.all(np.diff(offs) > 0)  # every molecule has atoms
        assert np.all(np.isfinite(f["mol_embeddings"][:]))
