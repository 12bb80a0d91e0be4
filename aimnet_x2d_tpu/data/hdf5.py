"""Columnar HDF5 streaming datasets.

The reference stores one *pickled python dict per molecule* in a vlen-uint8
HDF5 dataset and unpickles per record at train time
(reference: src/datasets/features.py:381-613, src/datasets/molecular.py:102-329).
That costs a pickle decode per molecule per epoch and can't be assembled
into device batches without python-object churn.

The TPU-native schema is columnar: every per-atom/per-edge array is stored
concatenated across molecules with an offsets index, so a batch is a set of
numpy slices — no pickle, no per-record overhead, and the arrays stream
straight into padded device batches.

Layout (all datasets gzip-chunked):
  atoms/{atom_type,hydrogen_count,degree,hybridization,atomic_numbers}  int8/int16
  atoms/offsets          int64 (N+1,)
  edges/{dst,src,hop}    int32 / int8, concatenated, sorted per molecule
  edges/offsets          int64 (N+1,)
  stereo/tet             int32 (∑C, 4) + stereo/tet_offsets
  stereo/{cis,trans}     int32 (∑P, 2) + offsets
  graphs/{targets,total_charge}
  graphs/smiles          vlen str
  metadata attrs: num_molecules, max_hops, target_columns (JSON),
                  preprocessing (JSON state dict), per-molecule maxima
"""

from __future__ import annotations

import json
import math
from typing import Iterator, List, Optional, Sequence

import h5py
import numpy as np

from .batching import MolBatch, MolFeatures, bucket_size, collate
from .dataset import BatchLoader, MoleculeDataset, featurize_many


def _decode(s) -> str:
    """h5py vlen strings read back as bytes; str() would mangle to "b'..'"."""
    return s.decode() if isinstance(s, bytes) else str(s)


def write_hdf5(
    path: str,
    dataset: MoleculeDataset,
    *,
    target_columns: Optional[Sequence[str]] = None,
    preprocessing_state: Optional[dict] = None,
) -> None:
    feats = dataset.features
    n = len(feats)
    atom_counts = np.array([f.num_atoms for f in feats], np.int64)
    atom_off = np.concatenate([[0], np.cumsum(atom_counts)])

    def _cat_atoms(key, dtype):
        return np.concatenate([getattr(f, key) for f in feats]).astype(dtype)

    dsts, srcs, hops, edge_counts = [], [], [], []
    for f in feats:
        d_parts, s_parts, h_parts = [], [], []
        for h, e in enumerate(f.edge_hops):
            if e.shape[1]:
                d_parts.append(e[0])
                s_parts.append(e[1])
                h_parts.append(np.full(e.shape[1], h + 1, np.int8))
        if d_parts:
            dsts.append(np.concatenate(d_parts))
            srcs.append(np.concatenate(s_parts))
            hops.append(np.concatenate(h_parts))
            edge_counts.append(len(dsts[-1]))
        else:
            edge_counts.append(0)
    edge_off = np.concatenate([[0], np.cumsum(edge_counts)]).astype(np.int64)

    tet_counts = [f.tet_nbrs.shape[0] for f in feats]
    tet_off = np.concatenate([[0], np.cumsum(tet_counts)]).astype(np.int64)
    cis_counts = [f.cis_pairs.shape[0] for f in feats]
    cis_off = np.concatenate([[0], np.cumsum(cis_counts)]).astype(np.int64)
    trans_counts = [f.trans_pairs.shape[0] for f in feats]
    trans_off = np.concatenate([[0], np.cumsum(trans_counts)]).astype(np.int64)

    with h5py.File(path, "w") as f:
        g = f.create_group("atoms")
        opts = dict(compression="gzip", compression_opts=1)
        g.create_dataset("offsets", data=atom_off)
        for key, dt in (
            ("atom_type", np.int16),
            ("hydrogen_count", np.int8),
            ("degree", np.int8),
            ("hybridization", np.int8),
            ("atomic_numbers", np.int16),
        ):
            g.create_dataset(key, data=_cat_atoms(key, dt), **opts)

        g = f.create_group("edges")
        g.create_dataset("offsets", data=edge_off)
        g.create_dataset(
            "dst", data=np.concatenate(dsts).astype(np.int32) if dsts else np.zeros(0, np.int32), **opts
        )
        g.create_dataset(
            "src", data=np.concatenate(srcs).astype(np.int32) if srcs else np.zeros(0, np.int32), **opts
        )
        g.create_dataset(
            "hop", data=np.concatenate(hops) if hops else np.zeros(0, np.int8), **opts
        )

        g = f.create_group("stereo")
        g.create_dataset("tet_offsets", data=tet_off)
        g.create_dataset(
            "tet",
            data=np.concatenate([f_.tet_nbrs for f_ in feats]).astype(np.int32)
            if sum(tet_counts)
            else np.zeros((0, 4), np.int32),
        )
        g.create_dataset("cis_offsets", data=cis_off)
        g.create_dataset(
            "cis",
            data=np.concatenate([f_.cis_pairs for f_ in feats]).astype(np.int32)
            if sum(cis_counts)
            else np.zeros((0, 2), np.int32),
        )
        g.create_dataset("trans_offsets", data=trans_off)
        g.create_dataset(
            "trans",
            data=np.concatenate([f_.trans_pairs for f_ in feats]).astype(np.int32)
            if sum(trans_counts)
            else np.zeros((0, 2), np.int32),
        )

        g = f.create_group("graphs")
        g.create_dataset("targets", data=dataset.targets, **opts)
        g.create_dataset(
            "total_charge",
            data=np.array([f_.total_charge for f_ in feats], np.float32),
        )
        g.create_dataset(
            "smiles",
            data=np.array(dataset.smiles, dtype=h5py.special_dtype(vlen=str)),
        )

        meta = f.create_group("metadata")
        meta.attrs["num_molecules"] = n
        meta.attrs["max_hops"] = dataset.max_hops
        meta.attrs["num_tasks"] = dataset.targets.shape[1]
        meta.attrs["max_atoms_per_mol"] = int(atom_counts.max()) if n else 0
        meta.attrs["max_edges_per_mol"] = int(max(edge_counts)) if n else 0
        meta.attrs["max_tet_per_mol"] = int(max(tet_counts)) if n else 0
        meta.attrs["max_pairs_per_mol"] = int(
            max(max(cis_counts, default=0), max(trans_counts, default=0))
        )
        if target_columns is not None:
            meta.attrs["target_columns"] = json.dumps(list(target_columns))
        if preprocessing_state is not None:
            meta.attrs["preprocessing"] = json.dumps(preprocessing_state)


def write_hdf5_from_smiles(
    path: str,
    smiles: Sequence[str],
    targets: np.ndarray,
    max_hops: int,
    *,
    num_workers: int = 0,
    target_columns: Optional[Sequence[str]] = None,
    preprocessing_state: Optional[dict] = None,
) -> int:
    """Featurize + write; returns number of valid molecules kept."""
    ds = MoleculeDataset.from_smiles(smiles, targets, max_hops, num_workers)
    write_hdf5(
        path, ds, target_columns=target_columns, preprocessing_state=preprocessing_state
    )
    return len(ds)


class HDF5MoleculeDataset:
    """Reader over the columnar schema with random access by index."""

    def __init__(self, path: str):
        self.path = path
        self._file: Optional[h5py.File] = None
        with h5py.File(path, "r") as f:
            meta = f["metadata"].attrs
            self.num_molecules = int(meta["num_molecules"])
            self.max_hops = int(meta["max_hops"])
            self.num_tasks = int(meta["num_tasks"])
            self.max_atoms_per_mol = int(meta["max_atoms_per_mol"])
            self.max_edges_per_mol = int(meta["max_edges_per_mol"])
            self.max_tet_per_mol = int(meta.get("max_tet_per_mol", 0))
            self.max_pairs_per_mol = int(meta.get("max_pairs_per_mol", 0))
            self.target_columns = (
                json.loads(meta["target_columns"]) if "target_columns" in meta else None
            )
            self.preprocessing_state = (
                json.loads(meta["preprocessing"]) if "preprocessing" in meta else None
            )

    def __len__(self) -> int:
        return self.num_molecules

    @property
    def file(self) -> h5py.File:
        if self._file is None:
            self._file = h5py.File(self.path, "r")
        return self._file

    def close(self):
        if self._file is not None:
            self._file.close()
            self._file = None

    def get_features(self, i: int) -> MolFeatures:
        f = self.file
        a0, a1 = f["atoms/offsets"][i : i + 2]
        e0, e1 = f["edges/offsets"][i : i + 2]
        t0, t1 = f["stereo/tet_offsets"][i : i + 2]
        c0, c1 = f["stereo/cis_offsets"][i : i + 2]
        r0, r1 = f["stereo/trans_offsets"][i : i + 2]

        hop = f["edges/hop"][e0:e1]
        dst = f["edges/dst"][e0:e1].astype(np.int32)
        src = f["edges/src"][e0:e1].astype(np.int32)
        edge_hops = []
        for h in range(1, self.max_hops + 1):
            sel = hop == h
            edge_hops.append(np.stack([dst[sel], src[sel]]).astype(np.int32))

        return MolFeatures(
            edge_hops=edge_hops,
            atom_type=f["atoms/atom_type"][a0:a1].astype(np.int32),
            hydrogen_count=f["atoms/hydrogen_count"][a0:a1].astype(np.int32),
            degree=f["atoms/degree"][a0:a1].astype(np.int32),
            hybridization=f["atoms/hybridization"][a0:a1].astype(np.int32),
            tet_nbrs=f["stereo/tet"][t0:t1].astype(np.int32).reshape(-1, 4),
            cis_pairs=f["stereo/cis"][c0:c1].astype(np.int32).reshape(-1, 2),
            trans_pairs=f["stereo/trans"][r0:r1].astype(np.int32).reshape(-1, 2),
            total_charge=float(f["graphs/total_charge"][i]),
            atomic_numbers=f["atoms/atomic_numbers"][a0:a1].astype(np.int32),
            smiles=_decode(f["graphs/smiles"][i]),
        )

    def load_all(self) -> MoleculeDataset:
        f = self.file
        feats = [self.get_features(i) for i in range(self.num_molecules)]
        smiles = [_decode(s) for s in f["graphs/smiles"][:]]
        return MoleculeDataset(
            smiles=smiles,
            targets=np.asarray(f["graphs/targets"][:], np.float32),
            features=feats,
            max_hops=self.max_hops,
        )


class HDF5BatchLoader:
    """Streaming loader yielding padded MolBatch objects.

    Supports host sharding for multi-host training (each host iterates its
    contiguous chunk — the TPU-native analog of the reference's rank/worker
    chunking; reference: src/datasets/molecular.py:228-250) and true
    epoch-seeded shuffling (fixing quirk Q11's cosmetic shuffle buffer).
    """

    def __init__(
        self,
        dataset: HDF5MoleculeDataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        drop_last: bool = False,
        host_id: int = 0,
        num_hosts: int = 1,
        stack_devices: int = 0,
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.seed = seed
        self.drop_last = drop_last
        self.host_id = host_id
        self.num_hosts = num_hosts
        self.stack_devices = stack_devices
        self._epoch = 0
        k = batch_size
        self.atom_slots = bucket_size(k * dataset.max_atoms_per_mol or 8)
        self.edge_slots = bucket_size(k * dataset.max_edges_per_mol or 8)
        self.tet_slots = bucket_size(k * dataset.max_tet_per_mol + 1)
        self.pair_slots = bucket_size(2 * k * dataset.max_pairs_per_mol + 1)

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def __len__(self) -> int:
        n = math.ceil(len(self.ds) / self.num_hosts)
        b = self.batch_size * max(1, self.stack_devices)
        return n // b if self.drop_last else math.ceil(n / b)

    def _collate(self, idx) -> MolBatch:
        mols = [self.ds.get_features(i) for i in idx]
        if len(idx) == 0:  # empty device shard (short final chunk)
            targets = np.zeros((0, self.ds.num_tasks), np.float32)
        else:
            targets = self.ds.file["graphs/targets"][np.sort(np.asarray(idx))]  # h5 needs sorted
            # restore requested order
            order = np.argsort(np.asarray(idx), kind="stable")
            inv = np.empty_like(order)
            inv[order] = np.arange(len(order))
            targets = targets[inv]
        return collate(
            mols,
            targets,
            num_hops=self.ds.max_hops,
            atom_slots=self.atom_slots,
            edge_slots=self.edge_slots,
            graph_slots=self.batch_size,
            tet_slots=self.tet_slots,
            pair_slots=self.pair_slots,
        )

    def __iter__(self) -> Iterator[MolBatch]:
        n = len(self.ds)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        # contiguous host chunk
        per_host = math.ceil(n / self.num_hosts)
        order = order[self.host_id * per_host : (self.host_id + 1) * per_host]
        b = self.batch_size * max(1, self.stack_devices)
        for i in range(0, len(order), b):
            idx = order[i : i + b]
            if self.drop_last and len(idx) < b:
                return
            if self.stack_devices:
                import jax

                shards = [
                    self._collate(idx[d * self.batch_size : (d + 1) * self.batch_size])
                    for d in range(self.stack_devices)
                ]
                yield jax.tree_util.tree_map(lambda *xs: np.stack(xs), *shards)
            else:
                yield self._collate(idx)
