"""Streaming CSV inference (reference: src/inference/pipeline.py:28-701).

Pipeline: chunked pandas reads → host-pool featurization → bucketed padded
batches → jitted prediction (deterministic / MC-dropout / evidential) →
inverse transform → append to the output CSV.  Bucketed batch shapes are
quantized to the standard ladder so the predict function compiles a handful
of times and then reuses the cache across all chunks.

Differences from the reference worth knowing:
- the artifact is self-describing (model + preprocessing from one file),
  so there is no state-dict shape sniffing (reference pipeline.py:203-222);
- multi-device runs shard chunks over the mesh inside predict; outputs are
  written once by the host — no per-rank files, no sleep-based merge race
  (reference quirk Q10, pipeline.py:637-701).
"""

from __future__ import annotations

import os
import time
from typing import Any, Dict, Iterator, List, Optional

import numpy as np
import pandas as pd

from ..checkpoint import Artifact, load_artifact
from ..data.dataset import BatchLoader, MoleculeDataset
from ..models import GNN
from ..training.predictor import predict, predict_evidential, predict_mc_dropout


class StreamingInferencePipeline:
    def __init__(
        self,
        artifact_path: str,
        inference_mode: str = "deterministic",
        mc_samples: int = 0,
        chunk_size: int = 1000,
        batch_size: int = 64,
        num_workers: int = 0,
        save_embeddings: bool = False,
        embeddings_output_path: Optional[str] = None,
        include_atom_embeddings: bool = False,
    ):
        self.artifact: Artifact = load_artifact(artifact_path)
        self.model = GNN(self.artifact.model_config)
        self.params = self.artifact.params
        self.pipeline = self.artifact.pipeline
        self.mode = inference_mode
        self.mc_samples = mc_samples
        self.chunk_size = chunk_size
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.save_embeddings = save_embeddings
        self.embeddings_output_path = embeddings_output_path
        self.include_atom_embeddings = include_atom_embeddings
        self.max_hops = int(self.artifact.extra.get("max_hops", self.artifact.model_config.num_shells))
        self.target_columns = self.artifact.extra.get("target_columns") or ["prediction"]
        # running slot caps so every chunk shares one compiled batch shape
        self._slots: Dict[str, int] = {}

    # ------------------------------------------------------------------ #

    def _predict_dataset(self, ds: MoleculeDataset) -> Dict[str, np.ndarray]:
        loader = BatchLoader(ds, self.batch_size, fixed_shape=True)
        loader.pin_slots(self._slots)
        num_tasks = len(self.target_columns)
        if self.mode == "mc_dropout":
            return predict_mc_dropout(
                self.model, self.params, loader, self.mc_samples, pipeline=self.pipeline
            )
        if self.mode == "evidential":
            return predict_evidential(
                self.model, self.params, loader, num_tasks, pipeline=self.pipeline
            )
        return predict(
            self.model,
            self.params,
            loader,
            pipeline=self.pipeline,
            return_embeddings=self.save_embeddings,
        )

    def _result_frame(self, ds: MoleculeDataset, res: Dict[str, np.ndarray]) -> pd.DataFrame:
        out = {"smiles": ds.smiles}
        preds = res["predictions"]
        T = len(self.target_columns)
        if preds.shape[1] == 4 * T:
            # evidential model run in deterministic mode: report the γ head
            preds = preds.reshape(len(preds), T, 4)[:, :, 0]
        for t, col in enumerate(self.target_columns):
            out[col] = preds[:, t]
        for key, suffix in (
            ("uncertainty", "_uncertainty"),
            ("aleatoric_uncertainty", "_aleatoric"),
            ("epistemic_uncertainty", "_epistemic"),
            ("total_uncertainty", "_total_uncertainty"),
        ):
            if key in res:
                for t, col in enumerate(self.target_columns):
                    out[col + suffix] = res[key][:, t]
        return pd.DataFrame(out)

    def run_csv(
        self,
        csv_path: str,
        output_path: str,
        smiles_column: str = "smiles",
    ) -> Dict[str, Any]:
        t0 = time.time()
        n_total = n_valid = 0
        first = True
        emb_file = None
        if self.save_embeddings and self.embeddings_output_path:
            import h5py

            emb_file = h5py.File(self.embeddings_output_path, "w")
            emb_mols: List[np.ndarray] = []
            emb_smiles: List[str] = []

        for chunk in pd.read_csv(csv_path, chunksize=self.chunk_size):
            smiles = chunk[smiles_column].astype(str).tolist()
            n_total += len(smiles)
            ds = MoleculeDataset.from_smiles(
                smiles,
                np.zeros((len(smiles), 1), np.float32),
                self.max_hops,
                self.num_workers,
            )
            if len(ds) == 0:
                continue
            n_valid += len(ds)
            res = self._predict_dataset(ds)
            frame = self._result_frame(ds, res)
            frame.to_csv(output_path, mode="w" if first else "a", header=first, index=False)
            first = False
            if emb_file is not None and "mol_embeddings" in res:
                emb_mols.append(res["mol_embeddings"])
                emb_smiles.extend(ds.smiles)

        if emb_file is not None:
            import h5py

            if emb_mols:
                emb_file.create_dataset("mol_embeddings", data=np.concatenate(emb_mols))
                emb_file.create_dataset(
                    "smiles", data=np.array(emb_smiles, dtype=h5py.special_dtype(vlen=str))
                )
            emb_file.close()

        dt = time.time() - t0
        summary = {
            "total_molecules": n_total,
            "valid_molecules": n_valid,
            "output_path": output_path,
            "seconds": dt,
            "molecules_per_second": n_valid / dt if dt > 0 else 0.0,
        }
        print(
            f"[inference] {n_valid}/{n_total} molecules → {output_path} "
            f"({summary['molecules_per_second']:.0f} mol/s)"
        )
        return summary
