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
from typing import Any, Dict, Iterator, List, Optional, Sequence

import numpy as np
import pandas as pd

from ..checkpoint import Artifact, load_artifact
from ..data.dataset import BatchLoader, MoleculeDataset
from ..models import GNN
from ..training.predictor import predict, predict_evidential, predict_mc_dropout


class StreamingEmbeddingWriter:
    """Constant-memory embedding sink: resizable HDF5 datasets appended per
    chunk with periodic flush (reference capability:
    src/inference/embeddings.py:159-498's temp-dataset writer; the round-1
    pipeline buffered everything in RAM).

    Molecule embeddings land in ``mol_embeddings`` (N, D) + ``smiles``;
    atom embeddings (optional) in columnar ``atom_embeddings`` (ΣA, D) +
    ``atom_offsets`` (N+1,), matching the dataset schema convention.
    """

    def __init__(self, path: str, include_atoms: bool = False, flush_every: int = 100):
        import h5py

        self._h5py = h5py
        self.file = h5py.File(path, "w")
        self.include_atoms = include_atoms
        self.flush_every = flush_every
        self._appends = 0
        self._made = False
        self._atom_counts: List[np.ndarray] = []

    def _ensure(self, mol_dim: int, atom_dim: Optional[int]) -> None:
        if self._made:
            return
        f, h5py = self.file, self._h5py
        opts = dict(compression="gzip", compression_opts=1)
        f.create_dataset(
            "mol_embeddings", shape=(0, mol_dim), maxshape=(None, mol_dim),
            dtype=np.float32, chunks=(4096, mol_dim), **opts,
        )
        f.create_dataset(
            "smiles", shape=(0,), maxshape=(None,),
            dtype=h5py.special_dtype(vlen=str), chunks=(4096,),
        )
        if self.include_atoms and atom_dim is not None:
            f.create_dataset(
                "atom_embeddings", shape=(0, atom_dim), maxshape=(None, atom_dim),
                dtype=np.float32, chunks=(16384, atom_dim), **opts,
            )
        self._made = True

    @staticmethod
    def _extend(ds, data):
        n0 = ds.shape[0]
        ds.resize(n0 + len(data), axis=0)
        ds[n0:] = data

    def append(
        self,
        mol_embeddings: np.ndarray,
        smiles: Sequence[str],
        atom_embeddings: Optional[np.ndarray] = None,
        atom_mol_index: Optional[np.ndarray] = None,
    ) -> None:
        self._ensure(
            mol_embeddings.shape[1],
            atom_embeddings.shape[1] if atom_embeddings is not None else None,
        )
        f = self.file
        self._extend(f["mol_embeddings"], np.asarray(mol_embeddings, np.float32))
        self._extend(
            f["smiles"], np.array(list(smiles), dtype=self._h5py.special_dtype(vlen=str))
        )
        if self.include_atoms and atom_embeddings is not None:
            self._extend(f["atom_embeddings"], np.asarray(atom_embeddings, np.float32))
            counts = np.bincount(
                np.asarray(atom_mol_index), minlength=len(mol_embeddings)
            ).astype(np.int64)
            self._atom_counts.append(counts)
        self._appends += 1
        if self._appends % self.flush_every == 0:
            f.flush()

    def close(self) -> None:
        if self.include_atoms and self._atom_counts:
            counts = np.concatenate(self._atom_counts)
            self.file.create_dataset(
                "atom_offsets", data=np.concatenate([[0], np.cumsum(counts)])
            )
        self.file.close()


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
        # exact worst-batch bin grid for this chunk, BEFORE the first batch
        # compiles — mid-chunk pin growth costs a full remote recompile
        loader.warm_bin_pins()
        loader.pin_slots(self._slots)
        num_tasks = len(self.target_columns)
        if self.mode == "mc_dropout":
            res = predict_mc_dropout(
                self.model, self.params, loader, self.mc_samples, pipeline=self.pipeline
            )
        elif self.mode == "evidential":
            res = predict_evidential(
                self.model, self.params, loader, num_tasks, pipeline=self.pipeline
            )
        else:
            res = predict(
                self.model,
                self.params,
                loader,
                pipeline=self.pipeline,
                return_embeddings=self.save_embeddings,
            )
        # harvest pins that grew while iterating (e.g. the binned layout's
        # bin count) so the next chunk reuses the compiled shape
        loader.pin_slots(self._slots)
        return res

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

    @staticmethod
    def _csv_data_rows(csv_path: str) -> int:
        with open(csv_path, "rb") as fh:
            n = sum(1 for _ in fh)
        return max(n - 1, 0)  # minus header

    def _featurize_ahead(self, chunks, depth: int = 2):
        """Background-thread featurization: build chunk N+1's dataset while
        the device predicts chunk N.  The native featurizer releases the
        GIL (C++ thread pool), so one Python thread overlaps fully; without
        this the loop serializes host featurization (the throughput
        bottleneck) with device prediction."""
        import queue
        import threading

        q: "queue.Queue" = queue.Queue(maxsize=depth)
        sentinel = object()
        errors: list = []

        def worker():
            try:
                for smiles, ds in chunks:
                    if ds is None:
                        ds = MoleculeDataset.from_smiles(
                            smiles,
                            np.zeros((len(smiles), 1), np.float32),
                            self.max_hops,
                            self.num_workers,
                        )
                    q.put((smiles, ds))
            except BaseException as e:  # surface in the consumer thread
                errors.append(e)
            finally:
                q.put(sentinel)

        t = threading.Thread(target=worker, daemon=True)
        t.start()
        while True:
            item = q.get()
            if item is sentinel:
                break
            yield item
        t.join()
        if errors:
            raise errors[0]

    def _run_chunks(self, chunks, output_path: str, embeddings_path: Optional[str]):
        """Shared prediction loop: iterate (smiles, MoleculeDataset|None)
        chunks, append predictions to ``output_path`` and embeddings to the
        streaming writer.  Returns (n_total, n_valid)."""
        n_total = n_valid = 0
        first = True
        writer = None
        if self.save_embeddings and embeddings_path:
            writer = StreamingEmbeddingWriter(
                embeddings_path, include_atoms=self.include_atom_embeddings
            )
        try:
            for smiles, ds in self._featurize_ahead(chunks):
                n_total += len(smiles)
                if len(ds) == 0:
                    continue
                n_valid += len(ds)
                res = self._predict_dataset(ds)
                frame = self._result_frame(ds, res)
                frame.to_csv(
                    output_path, mode="w" if first else "a", header=first, index=False
                )
                first = False
                if writer is not None and "mol_embeddings" in res:
                    writer.append(
                        res["mol_embeddings"],
                        ds.smiles,
                        res.get("atom_embeddings"),
                        res.get("atom_mol_index"),
                    )
        finally:
            if writer is not None:
                writer.close()
        if first:  # no valid molecules: still produce an (empty) output file
            pd.DataFrame(columns=["smiles"] + list(self.target_columns)).to_csv(
                output_path, index=False
            )
        return n_total, n_valid

    def run_csv(
        self,
        csv_path: str,
        output_path: str,
        smiles_column: str = "smiles",
        host_id: Optional[int] = None,
        num_hosts: Optional[int] = None,
    ) -> Dict[str, Any]:
        """Streaming CSV inference.  Multi-host runs shard the CSV by
        contiguous line ranges per process (reference:
        src/inference/pipeline.py:282-310), write per-host shard files, and
        host 0 merges after a *real* barrier — no sleep race (quirk Q10;
        reference pipeline.py:637-701 sleeps 3 s and hopes).
        """
        from ..parallel import multihost

        if num_hosts is None:
            num_hosts = multihost.process_count()
            host_id = multihost.process_index()
        t0 = time.time()

        if num_hosts <= 1:
            my_out, my_emb = output_path, self.embeddings_output_path
            reader = pd.read_csv(csv_path, chunksize=self.chunk_size)
        else:
            n_rows = self._csv_data_rows(csv_path)
            per = -(-n_rows // num_hosts)
            start, end = host_id * per, min((host_id + 1) * per, n_rows)
            my_out = f"{output_path}.rank{host_id}"
            my_emb = (
                f"{self.embeddings_output_path}.rank{host_id}"
                if self.embeddings_output_path
                else None
            )
            reader = pd.read_csv(
                csv_path,
                skiprows=range(1, 1 + start),
                nrows=max(end - start, 0),
                chunksize=self.chunk_size,
            )

        def chunks():
            for chunk in reader:
                yield chunk[smiles_column].astype(str).tolist(), None

        n_total, n_valid = self._run_chunks(chunks(), my_out, my_emb)

        if num_hosts > 1:
            counts = multihost.allgather_numpy(np.array([[n_total, n_valid]], np.int64))
            multihost.sync()  # every shard file is complete past this point
            n_total, n_valid = (int(x) for x in counts.sum(axis=0))
            if host_id == 0:
                self._merge_rank_files(output_path, num_hosts)
                if self.embeddings_output_path:
                    self._merge_rank_embeddings(self.embeddings_output_path, num_hosts)
            multihost.sync()  # hold shards until the merge is done

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

    @staticmethod
    def _merge_rank_files(output_path: str, num_hosts: int) -> None:
        frames = []
        for h in range(num_hosts):
            shard = f"{output_path}.rank{h}"
            if os.path.exists(shard):
                df = pd.read_csv(shard)
                if len(df):
                    frames.append(df)
        merged = pd.concat(frames, ignore_index=True) if frames else pd.DataFrame()
        merged.to_csv(output_path, index=False)
        for h in range(num_hosts):
            shard = f"{output_path}.rank{h}"
            if os.path.exists(shard):
                os.remove(shard)

    @staticmethod
    def _merge_rank_embeddings(path: str, num_hosts: int) -> None:
        import h5py

        shards = [f"{path}.rank{h}" for h in range(num_hosts)]
        shards = [s for s in shards if os.path.exists(s)]
        with h5py.File(path, "w") as out:
            mols, smiles, atoms, offs = [], [], [], []
            for s in shards:
                with h5py.File(s, "r") as f:
                    if "mol_embeddings" not in f:
                        continue
                    mols.append(f["mol_embeddings"][:])
                    smiles.append(f["smiles"][:])
                    if "atom_embeddings" in f:
                        atoms.append(f["atom_embeddings"][:])
                        offs.append(np.diff(f["atom_offsets"][:]))
            if mols:
                out.create_dataset("mol_embeddings", data=np.concatenate(mols))
                out.create_dataset("smiles", data=np.concatenate(smiles))
            if atoms:
                out.create_dataset("atom_embeddings", data=np.concatenate(atoms))
                counts = np.concatenate(offs)
                out.create_dataset(
                    "atom_offsets", data=np.concatenate([[0], np.cumsum(counts)])
                )
        for s in shards:
            os.remove(s)

    def run_hdf5(self, hdf5_path: str, output_path: str) -> Dict[str, Any]:
        """Chunked HDF5 inference: block reads through the columnar schema
        (the round-1 engine called load_all(), holding the whole file in
        RAM; reference equivalent: iterable chunking at
        src/inference/engine.py:43-76)."""
        from ..data.hdf5 import HDF5MoleculeDataset

        t0 = time.time()
        h5 = HDF5MoleculeDataset(hdf5_path)

        def chunks():
            for s in range(0, len(h5), self.chunk_size):
                e = min(s + self.chunk_size, len(h5))
                feats, _ = h5.read_block(s, e)
                ds = MoleculeDataset(
                    smiles=[m.smiles for m in feats],
                    targets=np.zeros((len(feats), 1), np.float32),
                    features=feats,
                    max_hops=h5.max_hops,
                )
                yield ds.smiles, ds

        n_total, n_valid = self._run_chunks(
            chunks(), output_path, self.embeddings_output_path
        )
        h5.close()
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
