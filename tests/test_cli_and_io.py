"""CLI parsing/validation, runner end-to-end, inference pipeline, HDF5
streaming dataset, hyperopt sampler."""

import json
import os
import random

import numpy as np
import pytest

from aimnet_x2d_tpu.cli import parse_arguments
from aimnet_x2d_tpu.config import (
    ValidationError,
    load_experiment_config,
    save_experiment_config,
    validate_args,
)
from aimnet_x2d_tpu.hyperopt import sample_hparam_value

from conftest import SAMPLE_DATA, has_sample_data

VAL_CSV = os.path.join(SAMPLE_DATA, "val.csv")


class TestCLI:
    def test_defaults_and_derived(self):
        args = parse_arguments(["--data_path", "x.csv"])
        assert args.hidden_dim == 512 and args.learning_rate == 0.00025
        assert args.ffn_hidden_dim == 512  # derived from hidden_dim
        assert not args.is_inference

    def test_multitask_lists(self):
        args = parse_arguments(
            ["--data_path", "x.csv", "--task_type", "multitask",
             "--multi_target_columns", "a,b,c", "--sae_subtasks", "1,2",
             "--multitask_weights", "1.0,2.0,3.0"]
        )
        assert args.multi_target_list == ["a", "b", "c"]
        assert args.sae_subtask_list == [1, 2]
        assert args.multitask_weight_list == [1.0, 2.0, 3.0]
        assert validate_args(args) == []

    def test_inference_autodetect(self):
        args = parse_arguments(["--inference_csv", "x.csv", "--mc_samples", "10"])
        assert args.is_inference and args.inference_mode == "mc_dropout"
        args2 = parse_arguments(["--inference_csv", "x.csv"])
        assert args2.inference_mode == "deterministic"

    @pytest.mark.parametrize(
        "argv,frag",
        [
            ([], "data_path"),
            (["--data_path", "x.csv", "--train_split", "0.9"], "sum to 1.0"),
            (["--data_path", "x.csv", "--task_type", "multitask"], "multi_target"),
            (["--data_path", "x.csv", "--task_type", "multitask",
              "--multi_target_columns", "a,b", "--sae_subtasks", "5"], "out of range"),
            (["--data_path", "x.csv", "--epochs", "0"], "positive"),
        ],
    )
    def test_validation_errors(self, argv, frag):
        args = parse_arguments(argv)
        with pytest.raises(ValidationError, match=frag):
            validate_args(args)

    def test_experiment_config_roundtrip(self, tmp_path):
        args = parse_arguments(["--data_path", "x.csv", "--hidden_dim", "128"])
        path = str(tmp_path / "exp.yaml")
        save_experiment_config(args, path)
        cfg = load_experiment_config(path)
        assert cfg["hidden_dim"] == 128


class TestHyperoptSampler:
    def test_semantics(self):
        rng = random.Random(0)
        assert sample_hparam_value(rng, [1, 2, 3]) in (1, 2, 3)
        v = sample_hparam_value(rng, {"type": "int", "min": 2, "max": 4})
        assert 2 <= v <= 4 and isinstance(v, int)
        f = sample_hparam_value(rng, {"type": "float", "min": 1e-5, "max": 1e-2, "log": True})
        assert 1e-5 <= f <= 1e-2
        c = sample_hparam_value(rng, {"type": "choice", "values": ["a", "b"]})
        assert c in ("a", "b")
        assert sample_hparam_value(rng, 7) == 7


@pytest.mark.skipif(not has_sample_data(), reason="sample data unavailable")
class TestRunnerEndToEnd:
    def _base_args(self, tmp_path, extra=()):
        return parse_arguments(
            [
                "--data_path", VAL_CSV, "--target_column", "gap",
                "--epochs", "2", "--batch_size", "32", "--hidden_dim", "48",
                "--embedding_dim", "8", "--num_message_passing_layers", "1",
                "--num_shells", "2", "--ffn_num_layers", "1",
                "--pooling_type", "mean", "--num_workers", "0",
                "--model_save_path", str(tmp_path / "m.npz"),
                *extra,
            ]
        )

    @pytest.fixture(autouse=True)
    def _small_data(self, monkeypatch, tmp_path):
        # shrink the CSV for speed
        import pandas as pd

        df = pd.read_csv(VAL_CSV).head(150)
        small = str(tmp_path / "small.csv")
        df.to_csv(small, index=False)
        self.small_csv = small

    def test_train_then_infer(self, tmp_path):
        from aimnet_x2d_tpu.runner import main_runner

        args = self._base_args(tmp_path)
        args.data_path = self.small_csv
        summary = main_runner(args)
        assert np.isfinite(summary["best_val_loss"])
        assert os.path.exists(str(tmp_path / "m.npz"))

        inf_args = parse_arguments(
            [
                "--inference_csv", self.small_csv,
                "--model_save_path", str(tmp_path / "m.npz"),
                "--inference_output", str(tmp_path / "preds.csv"),
                "--stream_chunk_size", "100", "--num_workers", "0",
            ]
        )
        res = main_runner(inf_args)
        assert res["valid_molecules"] == 150
        import pandas as pd

        preds = pd.read_csv(str(tmp_path / "preds.csv"))
        assert list(preds.columns) == ["smiles", "gap"]
        assert len(preds) == 150

    def test_transfer_learning_preserved(self, tmp_path):
        """Quirk Q4 fix: transferred weights survive into training."""
        from aimnet_x2d_tpu.checkpoint import load_artifact
        from aimnet_x2d_tpu.runner import main_runner

        args = self._base_args(tmp_path)
        args.data_path = self.small_csv
        main_runner(args)

        args2 = self._base_args(tmp_path)
        args2.data_path = self.small_csv
        args2.transfer_learning = str(tmp_path / "m.npz")
        args2.model_save_path = str(tmp_path / "m2.npz")
        args2.epochs = 1
        summary2 = main_runner(args2)
        # warm start should beat a 1-epoch cold start by a wide margin
        art1 = load_artifact(str(tmp_path / "m.npz"))
        assert summary2["best_val_loss"] < art1.extra["best_val_loss"] * 1.5


@pytest.mark.skipif(not has_sample_data(), reason="sample data unavailable")
class TestHDF5:
    def test_roundtrip_and_loader(self, tmp_path):
        import pandas as pd

        from aimnet_x2d_tpu.data.dataset import BatchLoader, MoleculeDataset
        from aimnet_x2d_tpu.data.hdf5 import (
            HDF5BatchLoader,
            HDF5MoleculeDataset,
            write_hdf5,
        )

        df = pd.read_csv(VAL_CSV).head(64)
        ds = MoleculeDataset.from_smiles(
            df["smiles"].tolist(), df[["gap"]].to_numpy(np.float32), max_hops=2
        )
        path = str(tmp_path / "data.h5")
        write_hdf5(path, ds, target_columns=["gap"], preprocessing_state={"x": 1})

        h5 = HDF5MoleculeDataset(path)
        assert len(h5) == 64
        assert h5.target_columns == ["gap"]
        assert h5.preprocessing_state == {"x": 1}

        # per-molecule features identical after round-trip
        for i in (0, 13, 63):
            a, b = ds.features[i], h5.get_features(i)
            np.testing.assert_array_equal(a.atom_type, b.atom_type)
            np.testing.assert_array_equal(a.atomic_numbers, b.atomic_numbers)
            for h in range(2):
                np.testing.assert_array_equal(
                    np.sort(a.edge_hops[h], axis=1), np.sort(b.edge_hops[h], axis=1)
                )

        # streaming loader: batches cover the whole set exactly once
        loader = HDF5BatchLoader(h5, batch_size=16, shuffle=True, seed=1)
        seen = 0
        for batch in loader:
            seen += int(np.asarray(batch.graph_mask).sum())
        assert seen == 64

        # host sharding partitions the data
        l0 = HDF5BatchLoader(h5, 16, host_id=0, num_hosts=2)
        l1 = HDF5BatchLoader(h5, 16, host_id=1, num_hosts=2)
        n0 = sum(int(np.asarray(b.graph_mask).sum()) for b in l0)
        n1 = sum(int(np.asarray(b.graph_mask).sum()) for b in l1)
        assert n0 + n1 == 64 and n0 == 32
        h5.close()
