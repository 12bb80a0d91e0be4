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
import os
from typing import Iterator, List, Optional, Sequence, Tuple

import h5py
import numpy as np

from .batching import MolBatch, MolFeatures, bucket_size, collate
from .dataset import BatchLoader, MoleculeDataset, featurize_many
from .preprocessing import (
    MAX_ATOMIC_NUM,
    PreprocessingConfig,
    PreprocessingPipeline,
    SAENormalizer,
    StandardScaler,
)


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
    cache = dataset.columnar
    if cache is not None:
        # natively-built dataset: the HDF5 schema IS the columnar cache —
        # write the arrays directly (no per-molecule materialization)
        n = len(dataset)
        atom_off = cache.mol_atom_off
        atom_counts = np.diff(atom_off)
        edge_off = cache.mol_edge_off
        edge_counts = np.diff(edge_off)
        tet_off, cis_off, trans_off = (
            cache.mol_tet_off, cache.mol_cis_off, cache.mol_trans_off,
        )
        tet_counts = np.diff(tet_off)
        cis_counts = np.diff(cis_off)
        trans_counts = np.diff(trans_off)

        def _cat_atoms(key, dtype):
            if key == "atomic_numbers":
                return cache.atomic_numbers.astype(dtype)
            return getattr(cache, key).astype(dtype)

        cat_dst = cache.edge_dst.astype(np.int32)
        cat_src = cache.edge_src.astype(np.int32)
        cat_hop = cache.edge_hop.astype(np.int8)
        cat_tet, cat_cis, cat_trans = cache.tet, cache.cis, cache.trans
        total_charges = cache.total_charge
    else:
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
        cat_dst = (
            np.concatenate(dsts).astype(np.int32) if dsts else np.zeros(0, np.int32)
        )
        cat_src = (
            np.concatenate(srcs).astype(np.int32) if srcs else np.zeros(0, np.int32)
        )
        cat_hop = np.concatenate(hops) if hops else np.zeros(0, np.int8)
        cat_tet = (
            np.concatenate([f_.tet_nbrs for f_ in feats]).astype(np.int32)
            if sum(tet_counts)
            else np.zeros((0, 4), np.int32)
        )
        cat_cis = (
            np.concatenate([f_.cis_pairs for f_ in feats]).astype(np.int32)
            if sum(cis_counts)
            else np.zeros((0, 2), np.int32)
        )
        cat_trans = (
            np.concatenate([f_.trans_pairs for f_ in feats]).astype(np.int32)
            if sum(trans_counts)
            else np.zeros((0, 2), np.int32)
        )
        total_charges = np.array([f_.total_charge for f_ in feats], np.float32)

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
        g.create_dataset("dst", data=cat_dst, **opts)
        g.create_dataset("src", data=cat_src, **opts)
        g.create_dataset("hop", data=cat_hop, **opts)

        g = f.create_group("stereo")
        g.create_dataset("tet_offsets", data=tet_off)
        g.create_dataset("tet", data=cat_tet.astype(np.int32).reshape(-1, 4))
        g.create_dataset("cis_offsets", data=cis_off)
        g.create_dataset("cis", data=cat_cis.astype(np.int32).reshape(-1, 2))
        g.create_dataset("trans_offsets", data=trans_off)
        g.create_dataset("trans", data=cat_trans.astype(np.int32).reshape(-1, 2))

        g = f.create_group("graphs")
        g.create_dataset("targets", data=dataset.targets, **opts)
        g.create_dataset("total_charge", data=total_charges)
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


class HDF5AppendWriter:
    """Chunk-appendable columnar writer: build arbitrarily large datasets
    without ever holding more than one featurized chunk in RAM (the
    capability of reference src/datasets/features.py:381-613's chunked
    pickled writer, on the columnar schema).

    Usage: ``append(feats, targets, smiles)`` per chunk, then ``finalize``.
    """

    _ATOM_COLS = (
        ("atom_type", np.int16),
        ("hydrogen_count", np.int8),
        ("degree", np.int8),
        ("hybridization", np.int8),
        ("atomic_numbers", np.int16),
    )

    def __init__(self, path: str, max_hops: int, num_tasks: int):
        self.path = path
        self.max_hops = max_hops
        self.num_tasks = num_tasks
        self._file = h5py.File(path, "w")
        self._n = 0
        self._atom_counts: List[np.ndarray] = []
        self._edge_counts: List[np.ndarray] = []
        self._tet_counts: List[np.ndarray] = []
        self._cis_counts: List[np.ndarray] = []
        self._trans_counts: List[np.ndarray] = []

        f = self._file
        opts = dict(compression="gzip", compression_opts=1)

        def _make(group, name, dtype, inner=(), compress=True):
            kw = dict(opts) if compress else {}
            group.create_dataset(
                name,
                shape=(0,) + inner,
                maxshape=(None,) + inner,
                dtype=dtype,
                chunks=(65536,) + inner,
                **kw,
            )

        ga = f.create_group("atoms")
        for key, dt in self._ATOM_COLS:
            _make(ga, key, dt)
        ge = f.create_group("edges")
        _make(ge, "dst", np.int32)
        _make(ge, "src", np.int32)
        _make(ge, "hop", np.int8)
        gs = f.create_group("stereo")
        _make(gs, "tet", np.int32, (4,), compress=False)
        _make(gs, "cis", np.int32, (2,), compress=False)
        _make(gs, "trans", np.int32, (2,), compress=False)
        gg = f.create_group("graphs")
        _make(gg, "targets", np.float32, (num_tasks,))
        _make(gg, "total_charge", np.float32, compress=False)
        gg.create_dataset(
            "smiles",
            shape=(0,),
            maxshape=(None,),
            dtype=h5py.special_dtype(vlen=str),
            chunks=(65536,),
        )

    @staticmethod
    def _extend(ds, data):
        n0 = ds.shape[0]
        ds.resize(n0 + len(data), axis=0)
        ds[n0:] = data

    def append(self, feats: Sequence[MolFeatures], targets: np.ndarray, smiles: Sequence[str]) -> None:
        if not feats:
            return
        f = self._file
        targets = np.asarray(targets, np.float32)
        if targets.ndim == 1:
            targets = targets[:, None]

        for key, dt in self._ATOM_COLS:
            self._extend(
                f["atoms"][key], np.concatenate([getattr(m, key) for m in feats]).astype(dt)
            )
        self._atom_counts.append(np.array([m.num_atoms for m in feats], np.int64))

        dsts, srcs, hops, ecounts = [], [], [], []
        for m in feats:
            cnt = 0
            for h, e in enumerate(m.edge_hops):
                if e.shape[1]:
                    dsts.append(e[0])
                    srcs.append(e[1])
                    hops.append(np.full(e.shape[1], h + 1, np.int8))
                    cnt += e.shape[1]
            ecounts.append(cnt)
        if dsts:
            self._extend(f["edges/dst"], np.concatenate(dsts).astype(np.int32))
            self._extend(f["edges/src"], np.concatenate(srcs).astype(np.int32))
            self._extend(f["edges/hop"], np.concatenate(hops))
        self._edge_counts.append(np.asarray(ecounts, np.int64))

        for name, key, counts in (
            ("tet", "tet_nbrs", self._tet_counts),
            ("cis", "cis_pairs", self._cis_counts),
            ("trans", "trans_pairs", self._trans_counts),
        ):
            rows = [np.asarray(getattr(m, key)).reshape(-1, 4 if name == "tet" else 2) for m in feats]
            counts.append(np.array([r.shape[0] for r in rows], np.int64))
            cat = np.concatenate(rows).astype(np.int32) if rows else None
            if cat is not None and cat.size:
                self._extend(f[f"stereo/{name}"], cat)

        self._extend(f["graphs/targets"], targets)
        self._extend(
            f["graphs/total_charge"], np.array([m.total_charge for m in feats], np.float32)
        )
        self._extend(
            f["graphs/smiles"], np.array(list(smiles), dtype=h5py.special_dtype(vlen=str))
        )
        self._n += len(feats)

    def finalize(
        self,
        *,
        target_columns: Optional[Sequence[str]] = None,
        preprocessing_state: Optional[dict] = None,
    ) -> int:
        f = self._file

        def _offsets(chunks):
            counts = np.concatenate(chunks) if chunks else np.zeros(0, np.int64)
            return np.concatenate([[0], np.cumsum(counts)]).astype(np.int64), counts

        atom_off, atom_counts = _offsets(self._atom_counts)
        edge_off, edge_counts = _offsets(self._edge_counts)
        tet_off, tet_counts = _offsets(self._tet_counts)
        cis_off, cis_counts = _offsets(self._cis_counts)
        trans_off, trans_counts = _offsets(self._trans_counts)
        f["atoms"].create_dataset("offsets", data=atom_off)
        f["edges"].create_dataset("offsets", data=edge_off)
        f["stereo"].create_dataset("tet_offsets", data=tet_off)
        f["stereo"].create_dataset("cis_offsets", data=cis_off)
        f["stereo"].create_dataset("trans_offsets", data=trans_off)

        meta = f.create_group("metadata")
        meta.attrs["num_molecules"] = self._n
        meta.attrs["max_hops"] = self.max_hops
        meta.attrs["num_tasks"] = self.num_tasks
        meta.attrs["max_atoms_per_mol"] = int(atom_counts.max()) if self._n else 0
        meta.attrs["max_edges_per_mol"] = int(edge_counts.max()) if self._n else 0
        meta.attrs["max_tet_per_mol"] = int(tet_counts.max()) if self._n else 0
        meta.attrs["max_pairs_per_mol"] = int(
            max(cis_counts.max() if self._n else 0, trans_counts.max() if self._n else 0)
        )
        if target_columns is not None:
            meta.attrs["target_columns"] = json.dumps(list(target_columns))
        if preprocessing_state is not None:
            meta.attrs["preprocessing"] = json.dumps(preprocessing_state)
        f.close()
        return self._n


def write_hdf5_streaming(
    path: str,
    smiles: Sequence[str],
    targets: np.ndarray,
    max_hops: int,
    *,
    chunk_size: int = 8192,
    num_workers: int = 0,
    target_columns: Optional[Sequence[str]] = None,
    preprocessing_state: Optional[dict] = None,
) -> int:
    """Featurize + append in chunks — peak RAM is one chunk, not the
    dataset (the reference equivalent: src/datasets/features.py:381-613).
    Invalid SMILES are dropped with their targets.  Returns kept count.
    """
    targets = np.asarray(targets, np.float32)
    if targets.ndim == 1:
        targets = targets[:, None]
    writer = HDF5AppendWriter(path, max_hops, targets.shape[1])
    for i in range(0, len(smiles), chunk_size):
        s, t, feats = featurize_many(
            list(smiles[i : i + chunk_size]),
            targets[i : i + chunk_size],
            max_hops,
            num_workers,
        )
        writer.append(feats, t, s)
    return writer.finalize(
        target_columns=target_columns, preprocessing_state=preprocessing_state
    )


def _chunk_count_matrix(nums_flat: np.ndarray, splits: np.ndarray, n: int) -> np.ndarray:
    """(n, 119) per-molecule element-count rows from a flat atomic-number
    slice and intra-chunk molecule split points."""
    C = np.zeros((n, MAX_ATOMIC_NUM), np.float64)
    mol_id = np.repeat(np.arange(n), np.diff(splits))
    z = np.clip(nums_flat.astype(np.int64), 0, MAX_ATOMIC_NUM - 1)
    np.add.at(C, (mol_id, z), 1.0)
    return C


def fit_pipeline_streaming(
    path: str, config: PreprocessingConfig, chunk_size: int = 65536
) -> PreprocessingPipeline:
    """Fit SAE + scaler over an HDF5 dataset in one chunked pass.

    Out-of-core equivalent of PreprocessingPipeline.fit: the SAE least
    squares is solved from accumulated normal equations (A^T A, A^T b over
    percentile-filtered rows — identical solution to the in-memory
    lstsq up to conditioning; cross-validated in tests), and the scaler
    moments of the SAE-shifted targets come from the same accumulators, so
    atomic numbers are read exactly once.  Targets (N, T) stay in RAM —
    they are small; the featurized graph data never loads.
    """
    pipe = PreprocessingPipeline(config)
    with h5py.File(path, "r") as f:
        targets = np.asarray(f["graphs/targets"][:], np.float64)
        N, T = targets.shape
        atom_off = f["atoms/offsets"][:]

        sae_tasks: List[Tuple] = []  # (key, column)
        if config.apply_sae:
            if config.task_type == "regression":
                sae_tasks = [("regression", 0)]
            elif config.sae_subtasks is None:
                raise ValueError(
                    "multitask SAE requires sae_subtasks"
                )
            else:
                for st in config.sae_subtasks:
                    if st >= T:
                        raise ValueError(f"Subtask index {st} >= number of targets {T}")
                sae_tasks = [(st, st) for st in config.sae_subtasks]

        # percentile masks computed on the (in-RAM) raw targets, as the
        # in-memory solver does (preprocessing.py compute_sae_dict)
        pc = config.sae_percentile_cutoff
        masks = {}
        for key, col in sae_tasks:
            b = targets[:, col]
            lo, hi = np.percentile(b, [pc, 100.0 - pc])
            masks[key] = (b >= lo) & (b <= hi)

        # accumulators
        AtA = {k: np.zeros((MAX_ATOMIC_NUM, MAX_ATOMIC_NUM)) for k, _ in sae_tasks}
        Atb = {k: np.zeros(MAX_ATOMIC_NUM) for k, _ in sae_tasks}
        Scc = np.zeros((MAX_ATOMIC_NUM, MAX_ATOMIC_NUM))  # unfiltered, for scaler
        Sc = np.zeros(MAX_ATOMIC_NUM)  # Σ count vectors, unfiltered
        Sct = {k: np.zeros(MAX_ATOMIC_NUM) for k, _ in sae_tasks}

        if sae_tasks:
            for c0 in range(0, N, chunk_size):
                c1 = min(c0 + chunk_size, N)
                nums = f["atoms/atomic_numbers"][atom_off[c0] : atom_off[c1]]
                C = _chunk_count_matrix(nums, atom_off[c0 : c1 + 1] - atom_off[c0], c1 - c0)
                Scc += C.T @ C
                Sc += C.sum(axis=0)
                for key, col in sae_tasks:
                    m = masks[key][c0:c1]
                    Cm = C[m]
                    AtA[key] += Cm.T @ Cm
                    Atb[key] += Cm.T @ targets[c0:c1, col][m]
                    Sct[key] += C.T @ targets[c0:c1, col]

            stats = {}
            sols = {}
            for key, _ in sae_tasks:
                sol, *_ = np.linalg.lstsq(AtA[key], Atb[key], rcond=None)
                sols[key] = sol
                stats[key] = {z: float(v) for z, v in enumerate(sol) if not np.isnan(v)}
            norm = SAENormalizer(config.task_type, pc)
            norm.sae_statistics = stats
            norm.is_fitted = True
            pipe.sae_normalizer = norm

        if config.apply_standard_scaling:
            # scaler moments of the SAE-shifted targets, exactly:
            #   Σx = Σt − Sc·s;  Σx² = Σt² − 2 s·Sct + sᵀ Scc s
            S1 = targets.sum(axis=0)
            S2 = (targets**2).sum(axis=0)
            means = np.empty(T)
            variances = np.empty(T)
            sae_cols = {col: key for key, col in sae_tasks}
            for j in range(T):
                if j in sae_cols:
                    key = sae_cols[j]
                    s = sols[key]
                    sx = S1[j] - Sc @ s
                    sx2 = S2[j] - 2.0 * (s @ Sct[key]) + s @ Scc @ s
                else:
                    sx, sx2 = S1[j], S2[j]
                means[j] = sx / N
                variances[j] = max((sx2 - sx * sx / N) / max(N - 1, 1), 0.0)
            scaler = StandardScaler()
            scaler.means = means.astype(np.float32)
            scaler.stds = np.sqrt(variances).astype(np.float32)
            scaler.stds[scaler.stds < 1e-12] = 1.0
            scaler.is_fitted = True
            pipe.standard_scaler = scaler

    pipe.is_fitted = True
    return pipe


def transform_targets_streaming(
    path: str, pipe: PreprocessingPipeline, chunk_size: int = 65536
) -> None:
    """Apply a fitted pipeline to graphs/targets in place, chunk by chunk,
    and record the pipeline state in metadata."""
    with h5py.File(path, "r+") as f:
        N = int(f["metadata"].attrs["num_molecules"])
        atom_off = f["atoms/offsets"][:]
        for c0 in range(0, N, chunk_size):
            c1 = min(c0 + chunk_size, N)
            raw = np.asarray(f["graphs/targets"][c0:c1], np.float64)
            nums = f["atoms/atomic_numbers"][atom_off[c0] : atom_off[c1]]
            splits = atom_off[c0 : c1 + 1] - atom_off[c0]
            nums_list = np.split(nums.astype(np.int32), splits[1:-1])
            f["graphs/targets"][c0:c1] = pipe.transform(nums_list, raw)
        f["metadata"].attrs["preprocessing"] = json.dumps(pipe.state_dict())


class HDF5MoleculeDataset:
    """Reader over the columnar schema with random access by index."""

    def per_mol_counts(self) -> "Optional[dict]":
        """Per-molecule atom/edge/stereo counts from the offset arrays
        (O(n) ints, read once) — lets loaders size slot caps as exact
        top-k sums instead of k × worst molecule."""
        try:
            with h5py.File(self.path, "r") as f:
                return {
                    "atoms": np.diff(f["atoms/offsets"][...]),
                    "edges": np.diff(f["edges/offsets"][...]),
                    "tets": np.diff(f["stereo/tet_offsets"][...]),
                    "pairs": np.maximum(
                        np.diff(f["stereo/cis_offsets"][...]),
                        np.diff(f["stereo/trans_offsets"][...]),
                    ),
                }
        except KeyError:
            return None

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

    def offsets(self) -> dict:
        """Offset index arrays, read once and cached (8 bytes/molecule each) —
        removes five h5py reads per molecule from the access path."""
        if not hasattr(self, "_off"):
            f = self.file
            self._off = {
                "atoms": f["atoms/offsets"][:],
                "edges": f["edges/offsets"][:],
                "tet": f["stereo/tet_offsets"][:],
                "cis": f["stereo/cis_offsets"][:],
                "trans": f["stereo/trans_offsets"][:],
            }
        return self._off

    def read_block(self, start: int, end: int) -> Tuple[List[MolFeatures], np.ndarray]:
        """Contiguous block read: ONE slice read per column dataset for the
        whole [start, end) molecule range (the round-1 loader issued ~6
        h5py reads per molecule).  Returns (features, targets)."""
        f = self.file
        off = self.offsets()
        n = end - start
        ao, eo = off["atoms"], off["edges"]
        to, co, ro = off["tet"], off["cis"], off["trans"]
        a0, a1 = ao[start], ao[end]
        e0, e1 = eo[start], eo[end]

        atom_type = f["atoms/atom_type"][a0:a1].astype(np.int32)
        hydrogen = f["atoms/hydrogen_count"][a0:a1].astype(np.int32)
        degree = f["atoms/degree"][a0:a1].astype(np.int32)
        hybrid = f["atoms/hybridization"][a0:a1].astype(np.int32)
        numbers = f["atoms/atomic_numbers"][a0:a1].astype(np.int32)
        hop = f["edges/hop"][e0:e1]
        dst = f["edges/dst"][e0:e1].astype(np.int32)
        src = f["edges/src"][e0:e1].astype(np.int32)
        tet = f["stereo/tet"][to[start] : to[end]].astype(np.int32).reshape(-1, 4)
        cis = f["stereo/cis"][co[start] : co[end]].astype(np.int32).reshape(-1, 2)
        trans = f["stereo/trans"][ro[start] : ro[end]].astype(np.int32).reshape(-1, 2)
        charges = f["graphs/total_charge"][start:end]
        targets = np.asarray(f["graphs/targets"][start:end], np.float32)
        smiles = f["graphs/smiles"][start:end]

        feats = []
        for i in range(n):
            la0, la1 = ao[start + i] - a0, ao[start + i + 1] - a0
            le0, le1 = eo[start + i] - e0, eo[start + i + 1] - e0
            h = hop[le0:le1]
            d = dst[le0:le1]
            s = src[le0:le1]
            # per-molecule edges are stored hop-major ascending: slice hops
            # with searchsorted instead of K boolean scans
            marks = np.searchsorted(h, np.arange(1, self.max_hops + 2))
            edge_hops = [
                np.stack([d[marks[k] : marks[k + 1]], s[marks[k] : marks[k + 1]]])
                for k in range(self.max_hops)
            ]
            feats.append(
                MolFeatures(
                    edge_hops=edge_hops,
                    atom_type=atom_type[la0:la1],
                    hydrogen_count=hydrogen[la0:la1],
                    degree=degree[la0:la1],
                    hybridization=hybrid[la0:la1],
                    tet_nbrs=tet[to[start + i] - to[start] : to[start + i + 1] - to[start]],
                    cis_pairs=cis[co[start + i] - co[start] : co[start + i + 1] - co[start]],
                    trans_pairs=trans[ro[start + i] - ro[start] : ro[start + i + 1] - ro[start]],
                    total_charge=float(charges[i]),
                    atomic_numbers=numbers[la0:la1],
                    smiles=_decode(smiles[i]),
                )
            )
        return feats, targets

    def read_block_cache(self, start: int, end: int):
        """Contiguous block read into a ColumnarCache (data/native_batch.py)
        — the HDF5 columnar schema maps 1:1 (per-molecule local indices,
        hop-major edge order), so no MolFeatures objects are materialized:
        the native binned builder consumes the slices directly."""
        from .native_batch import ColumnarCache

        f = self.file
        off = self.offsets()
        ao, eo = off["atoms"], off["edges"]
        to, co, ro = off["tet"], off["cis"], off["trans"]
        a0, a1 = ao[start], ao[end]
        e0, e1 = eo[start], eo[end]

        def _local(o):
            return np.ascontiguousarray((o[start : end + 1] - o[start]).astype(np.int64))

        def _i32(x):
            return np.ascontiguousarray(np.asarray(x, np.int32))

        cache = ColumnarCache(
            atom_type=_i32(f["atoms/atom_type"][a0:a1]),
            hydrogen_count=_i32(f["atoms/hydrogen_count"][a0:a1]),
            degree=_i32(f["atoms/degree"][a0:a1]),
            hybridization=_i32(f["atoms/hybridization"][a0:a1]),
            mol_atom_off=_local(ao),
            edge_dst=_i32(f["edges/dst"][e0:e1]),
            edge_src=_i32(f["edges/src"][e0:e1]),
            edge_hop=_i32(f["edges/hop"][e0:e1]),
            mol_edge_off=_local(eo),
            tet=_i32(f["stereo/tet"][to[start] : to[end]]).reshape(-1, 4),
            mol_tet_off=_local(to),
            cis=_i32(f["stereo/cis"][co[start] : co[end]]).reshape(-1, 2),
            mol_cis_off=_local(co),
            trans=_i32(f["stereo/trans"][ro[start] : ro[end]]).reshape(-1, 2),
            mol_trans_off=_local(ro),
            total_charge=np.asarray(f["graphs/total_charge"][start:end], np.float32),
        )
        targets = np.asarray(f["graphs/targets"][start:end], np.float32)
        return cache, targets

    def get_features(self, i: int) -> MolFeatures:
        f = self.file
        off = self.offsets()
        a0, a1 = off["atoms"][i : i + 2]
        e0, e1 = off["edges"][i : i + 2]
        t0, t1 = off["tet"][i : i + 2]
        c0, c1 = off["cis"][i : i + 2]
        r0, r1 = off["trans"][i : i + 2]

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
        feats, targets = self.read_block(0, self.num_molecules)
        return MoleculeDataset(
            smiles=[m.smiles for m in feats],
            targets=targets,
            features=feats,
            max_hops=self.max_hops,
        )


class HDF5BatchLoader:
    """Streaming loader yielding padded MolBatch objects.

    Supports host sharding for multi-host training (each host iterates its
    contiguous chunk — the TPU-native analog of the reference's rank/worker
    chunking; reference: src/datasets/molecular.py:228-250).

    IO design: molecules are read in contiguous *blocks* of
    ``block_batches`` batches (one slice read per column dataset per
    block); shuffling is two-level — epoch-seeded shuffle of block order,
    then a within-block shuffle (a real shuffle with sequential IO, unlike
    the reference's cosmetic shuffle buffer, quirk Q11, and unlike its
    per-record random reads).  Recorded as a deviation in PARITY.md.
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
        block_batches: int = 16,
        fused_edges: "bool | None" = None,
        binned: "bool | None" = None,
        bin_ab: int = 256,
        bin_mb: int = 48,
        slim_edges: "bool | None" = None,
        halo_shards: int = 1,
        size_sort: "bool | None" = None,
    ):
        self.ds = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        # size-descending bin packing for TRAINING loaders (see
        # BatchLoader.size_sort; AIMNET_SIZE_SORT=0 opts out)
        if size_sort is None:
            size_sort = shuffle and os.environ.get("AIMNET_SIZE_SORT", "1") != "0"
        self.size_sort = bool(size_sort)
        self.seed = seed
        self.drop_last = drop_last
        self.host_id = host_id
        self.num_hosts = num_hosts
        # halo mode partitions each data shard over the 'graph' axis, so
        # batches always carry a leading (stack, G, ...) layout — force at
        # least one data shard (mirrors BatchLoader's halo gating)
        self.halo_shards = halo_shards
        if halo_shards > 1 and stack_devices == 0:
            stack_devices = 1
        self.stack_devices = stack_devices
        self.block_batches = block_batches
        # Bin-packed dense layout (data/binning.py): fastest TPU path;
        # feasible iff every molecule fits one bin (known from HDF5 stats).
        # Halo shards bin-pack per device inside partition_halo (giant
        # fragments are chunked there), so the size cap only binds the
        # single-device layout.
        if binned is None:
            from .dataset import _binned_env_default

            binned = _binned_env_default() and (
                halo_shards > 1 or (dataset.max_atoms_per_mol or 0) <= bin_ab
            )
        elif (
            binned
            and halo_shards == 1
            and (dataset.max_atoms_per_mol or 0) > bin_ab
        ):
            raise ValueError(
                f"binned layout needs bin_ab >= largest molecule "
                f"({dataset.max_atoms_per_mol} atoms > {bin_ab})"
            )
        self.binned = binned
        self.bin_ab = bin_ab
        self.bin_mb = bin_mb
        self._bin_pins: dict = {}
        self._halo_slots: dict = {}
        if fused_edges is None:
            import jax

            fused_edges = (
                jax.default_backend() == "tpu" and not binned and halo_shards == 1
            )
        self.fused_edges = fused_edges and not binned and halo_shards == 1
        self._fused_pins: dict = {}
        # drop flat edge arrays from binned device batches (~40% of the
        # per-batch transfer; bin_adj carries every edge) — auto on TPU.
        # Halo shards keep them (their flat fallback path is load-bearing).
        if slim_edges is None:
            import jax

            slim_edges = (
                binned and halo_shards == 1 and jax.default_backend() == "tpu"
                and os.environ.get("AIMNET_SLIM_EDGES", "1") != "0"
            )
        self.slim_edges = bool(slim_edges) and binned and halo_shards == 1
        self._epoch = 0
        k = batch_size
        self.atom_slots = bucket_size(k * dataset.max_atoms_per_mol or 8)
        self.edge_slots = bucket_size(k * dataset.max_edges_per_mol or 8)
        self.tet_slots = bucket_size(k * dataset.max_tet_per_mol + 1)
        self.pair_slots = bucket_size(2 * k * dataset.max_pairs_per_mol + 1)
        # tighten the worst-case caps to exact top-k sums when per-molecule
        # counts are stored (any k-subset is bounded by the k largest):
        # k·max_per_mol overshoots the edge cap ~1.6x on realistic mixes,
        # and slot padding is pure transfer/memory waste
        counts = dataset.per_mol_counts()
        if counts is not None and len(counts["atoms"]):
            kk = min(k, len(counts["atoms"]))

            def _cap(c):
                return int(np.sort(c)[-kk:].sum())

            self.atom_slots = bucket_size(max(_cap(counts["atoms"]), 8))
            self.edge_slots = bucket_size(max(_cap(counts["edges"]), 8))
            self.tet_slots = bucket_size(_cap(counts["tets"]) + 1)
            self.pair_slots = bucket_size(2 * _cap(counts["pairs"]) + 1)

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def warm_bin_pins(self, epochs: int = 1) -> None:
        """Pre-plan the bin grids of up to ``epochs`` simulated epochs and
        seed the pins to the observed max BEFORE the first batch is built.

        Mid-run pin growth costs a full remote recompile (minutes on the
        axon runtime — the dominant term in BASELINE.md's config-4 mean
        step time).  This replays ``_mol_stream``'s exact two-level
        shuffle per epoch from dataset-wide per-molecule atom counts (the
        order is deterministic in (seed, epoch), and the plan is the same
        greedy packing the builders run), so for the simulated epochs the
        seed is exact: the first compile is the only compile.  Later
        epochs draw from the same stationary size distribution, so
        exceeding the simulated maximum is rare; the pin-growth path
        stays as a correctness fallback.  Streaming *inference* has
        preseeded this way since round 2 (inference/pipeline.py) —
        round 5 extends it to training (VERDICT r4 #4).

        Simulation cost is O(bins · log batch) per batch (plan_bin_counts);
        epochs are capped at 32 — beyond that the max has converged.
        """
        if not (self.binned and self.halo_shards == 1):
            return
        counts = self.ds.per_mol_counts()
        if counts is None or not len(counts["atoms"]):
            return
        from .binning import adaptive_mb_cap, plan_bin_counts

        sizes_all = np.asarray(counts["atoms"], np.int64)
        n = len(self.ds)
        per_host = math.ceil(n / self.num_hosts)
        h0 = self.host_id * per_host
        h1 = min(h0 + per_host, n)
        group = self.batch_size * max(1, self.stack_devices)
        block = max(self.block_batches * group, 1)
        per = self.batch_size
        bins = self._bin_pins.get("bins", 0)
        mbp = self._bin_pins.get("mb", 0)
        for ep in range(min(max(1, int(epochs)), 32)):
            starts = list(range(h0, h1, block))
            rng = (
                np.random.default_rng(self.seed + ep) if self.shuffle else None
            )
            if rng is not None:
                # identical call sequence (and argument types) to
                # _mol_stream so the replayed order is bit-exact
                rng.shuffle(starts)
            parts = []
            for s in starts:
                e = min(s + block, h1)
                order = np.arange(e - s)
                if rng is not None:
                    rng.shuffle(order)
                parts.append(s + order)
            idx = (
                np.concatenate(parts) if parts else np.zeros(0, np.int64)
            )
            for b0 in range(0, len(idx), group):
                sub_all = idx[b0 : b0 + group]
                if self.drop_last and len(sub_all) < group:
                    break
                shards = (
                    [
                        sub_all[d * per : (d + 1) * per]
                        for d in range(self.stack_devices)
                    ]
                    if self.stack_devices
                    else [sub_all]
                )
                for sub in shards:
                    sizes = sizes_all[sub]
                    cap = adaptive_mb_cap(sizes, self.bin_ab, self.bin_mb)
                    if self.size_sort:  # packer plans size-descending
                        sizes = -np.sort(-sizes)
                    nb, mbeff = plan_bin_counts(sizes, self.bin_ab, cap)
                    bins = max(bins, bucket_size(nb, align=8))
                    mbp = max(mbp, bucket_size(mbeff, align=8))
            if rng is None:
                break  # deterministic order: every epoch is identical
        self._bin_pins["bins"] = bins
        self._bin_pins["mb"] = mbp
        # per-bin tet-table slot pin (sound bound: mols/bin x per-mol max)
        max_tet = int(self.ds.max_tet_per_mol or 0)
        tetb = bucket_size(
            min(self.bin_ab, mbp * max_tet) if max_tet else 1, align=8
        )
        self._bin_pins["tetb"] = max(tetb, self._bin_pins.get("tetb", 0))

    def __len__(self) -> int:
        n = math.ceil(len(self.ds) / self.num_hosts)
        b = self.batch_size * max(1, self.stack_devices)
        return n // b if self.drop_last else math.ceil(n / b)

    def _collate(self, mols: List[MolFeatures], targets: np.ndarray) -> MolBatch:
        if not len(mols):
            targets = np.zeros((0, self.ds.num_tasks), np.float32)
        batch = collate(
            mols,
            targets,
            num_hops=self.ds.max_hops,
            atom_slots=self.atom_slots,
            edge_slots=self.edge_slots,
            graph_slots=self.batch_size,
            tet_slots=self.tet_slots,
            pair_slots=self.pair_slots,
        )
        if self.binned and self.halo_shards == 1:
            from .binning import bin_pack_batch

            batch = bin_pack_batch(
                batch, ab=self.bin_ab, mb=self.bin_mb, pins=self._bin_pins,
                size_sort=self.size_sort,
            )
        elif self.fused_edges:
            from .batching import attach_fused_layouts

            batch = attach_fused_layouts(batch, self._fused_pins)
        return batch

    def _mol_stream(self):
        """(MolFeatures, target_row) pairs in epoch order over this host's
        contiguous chunk, via block reads + two-level shuffle."""
        n = len(self.ds)
        per_host = math.ceil(n / self.num_hosts)
        h0 = self.host_id * per_host
        h1 = min(h0 + per_host, n)
        group = self.batch_size * max(1, self.stack_devices)
        block = max(self.block_batches * group, 1)
        starts = list(range(h0, h1, block))
        rng = (
            np.random.default_rng(self.seed + self._epoch) if self.shuffle else None
        )
        if rng is not None:
            rng.shuffle(starts)
        for s in starts:
            e = min(s + block, h1)
            feats, targets = self.ds.read_block(s, e)
            order = np.arange(len(feats))
            if rng is not None:
                rng.shuffle(order)
            for i in order:
                yield feats[i], targets[i]

    def _emit(self, buf) -> MolBatch:
        if not self.stack_devices:
            return self._collate([m for m, _ in buf], np.array([t for _, t in buf]))
        import jax

        shards = []
        for d in range(self.stack_devices):
            part = buf[d * self.batch_size : (d + 1) * self.batch_size]
            shards.append(
                self._collate([m for m, _ in part], np.array([t for _, t in part]))
            )
        if self.halo_shards > 1:
            # (stack, G, ...) binned-or-flat halo shards with shared slot
            # pins across shards AND steps (one compilation)
            from ..parallel.halo import partition_halo_stack

            shards, self._halo_slots = partition_halo_stack(
                shards,
                self.halo_shards,
                binned=self.binned,
                ab=self.bin_ab,
                slots=self._halo_slots,
            )
            return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *shards)
        if self.fused_edges:
            from .batching import repin_fused_shards

            shards = repin_fused_shards(shards, self._fused_pins)
        if self.binned:
            from .binning import grow_bins

            tb = self._bin_pins.get("bins", 0)
            tm = self._bin_pins.get("mb", 0)
            tt = self._bin_pins.get("tetb", 0)
            shards = [
                s
                if s.bin_adj.shape[0] == tb
                and s.pool_mat.shape[1] == tm
                and (s.tet_bin is None or s.tet_bin.shape[2] == tt)
                else grow_bins(s, tb, tm, tt or None)
                for s in shards
            ]
        return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *shards)

    def __iter__(self) -> Iterator[MolBatch]:
        if self.slim_edges:
            from .binning import slim_binned_edges

            for b in self._iter_impl():
                yield slim_binned_edges(b)
        else:
            yield from self._iter_impl()

    def _iter_impl(self) -> Iterator[MolBatch]:
        if self.binned and self.halo_shards == 1:
            # (halo mode bin-packs per device inside partition_halo, so it
            # needs the flat collate layout, not the native binned builder)
            from .native_batch import load_library

            if load_library() is not None:
                yield from self._iter_native()
                return
        group = self.batch_size * max(1, self.stack_devices)
        buf: list = []
        for item in self._mol_stream():
            buf.append(item)
            if len(buf) == group:
                yield self._emit(buf)
                buf = []
        if buf and not self.drop_last:
            yield self._emit(buf)

    # -------------------- native binned fast path -------------------- #

    def _loader_workers(self) -> int:
        """Concurrent native-builder threads (``AIMNET_LOADER_WORKERS``
        overrides).  The C fill releases the GIL through ctypes, but on
        the 2-core bench image two workers MEASURED 13% slower than one
        (107.7 vs 94.9 ms/batch at 8192 molecules — the GIL-held numpy
        tail and the memset-heavy fill leave no spare core or memory
        bandwidth), so the default threads only when the host has cores
        to spare beyond the consumer + device-dispatch threads."""
        import os as _os

        env = int(os.environ.get("AIMNET_LOADER_WORKERS", "0") or 0)
        if env > 0:
            return env
        cores = _os.cpu_count() or 1
        return 2 if cores >= 4 else 1

    def _iter_native(self) -> Iterator[MolBatch]:
        """Block reads straight into ColumnarCaches consumed by the native
        binned builder — no MolFeatures objects on the hot path.  Blocks
        are whole multiples of the batch group, so shuffle semantics match
        `_mol_stream` (block order + within-block permutation).

        With ``_loader_workers() > 1`` batch builds run on a thread pool
        (in-order yield, bounded in-flight).  Scratch-aliasing accounting:
        the loader holds ≤ workers+1 batches in flight on top of the
        prefetch pipeline's 2·size+2, so its rotation allocates
        SCRATCH_SETS + workers + 2 sets (the serial contract stays
        SCRATCH_SETS — trainer.prefetch_batches asserts against that)."""
        import jax

        from .binning import grow_bins
        from .native_batch import build_binned_batch

        n = len(self.ds)
        per_host = math.ceil(n / self.num_hosts)
        h0 = self.host_id * per_host
        h1 = min(h0 + per_host, n)
        group = self.batch_size * max(1, self.stack_devices)
        block = max(self.block_batches * group, 1)
        starts = list(range(h0, h1, block))
        rng = (
            np.random.default_rng(self.seed + self._epoch) if self.shuffle else None
        )
        if rng is not None:
            rng.shuffle(starts)
        workers = self._loader_workers()
        inflight = workers + 1
        if not hasattr(self, "_scratches"):
            # rotation depth must cover the prefetch pipeline's in-flight
            # batches (native_batch.SCRATCH_SETS; round-4 root-cause note)
            # PLUS this loader's own in-flight builds when threaded
            from .native_batch import SCRATCH_SETS

            n_sets = SCRATCH_SETS + (inflight + 1 if workers > 1 else 0)
            self._scratches = (
                [{} for _ in range(n_sets * max(1, self.stack_devices))]
                if jax.default_backend() == "tpu"
                else None
            )
            self._scratch_i = 0
        if not hasattr(self, "_pins_lock"):
            import threading

            self._pins_lock = threading.Lock()

        def _scratch():
            if self._scratches is None:
                return None
            s = self._scratches[self._scratch_i]
            self._scratch_i = (self._scratch_i + 1) % len(self._scratches)
            return s

        def _build(cache, targets, idx, scratch):
            return build_binned_batch(
                cache,
                idx,
                targets[idx],
                ab=self.bin_ab,
                mb_cap=self.bin_mb,
                edge_slots=self.edge_slots,
                tet_slots=self.tet_slots,
                pair_slots=self.pair_slots,
                pins=self._bin_pins,
                scratch=scratch,
                pins_lock=self._pins_lock,
                size_sort=self.size_sort,
            )

        def _emit_native(cache, targets, idx, scratches):
            if not self.stack_devices:
                b = _build(cache, targets, idx, scratches[0])
                tb = self._bin_pins.get("bins", 0)
                tm = self._bin_pins.get("mb", 0)
                tt = self._bin_pins.get("tetb", 0)
                # a concurrently-built later batch may have grown the pins
                # after this one planned; repad so shapes stay static
                if tb and (
                    b.bin_adj.shape[0] != tb
                    or b.pool_mat.shape[1] != tm
                    or (b.tet_bin is not None and b.tet_bin.shape[2] != tt)
                ):
                    b = grow_bins(b, tb, tm, tt or None)
                return b
            shards = [
                _build(
                    cache,
                    targets,
                    idx[d * self.batch_size : (d + 1) * self.batch_size],
                    scratches[d],
                )
                for d in range(self.stack_devices)
            ]
            tb = self._bin_pins.get("bins", 0)
            tm = self._bin_pins.get("mb", 0)
            tt = self._bin_pins.get("tetb", 0)
            shards = [
                s
                if s.bin_adj.shape[0] == tb
                and s.pool_mat.shape[1] == tm
                and (s.tet_bin is None or s.tet_bin.shape[2] == tt)
                else grow_bins(s, tb, tm, tt or None)
                for s in shards
            ]
            return jax.tree_util.tree_map(lambda *xs: np.stack(xs), *shards)

        def _jobs():
            # HDF5 reads stay on the consumer thread (h5py handles are not
            # thread-safe); they amortize over block_batches batches
            for s in starts:
                e = min(s + block, h1)
                cache, targets = self.ds.read_block_cache(s, e)
                order = np.arange(e - s)
                if rng is not None:
                    rng.shuffle(order)
                for lo in range(0, e - s, group):
                    idx = order[lo : lo + group]
                    if idx.shape[0] < group and self.drop_last:
                        continue
                    yield cache, targets, idx

        nshard = max(1, self.stack_devices)
        if workers <= 1:
            for cache, targets, idx in _jobs():
                yield _emit_native(
                    cache, targets, idx, [_scratch() for _ in range(nshard)]
                )
            return

        from collections import deque
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(workers) as ex:
            pending: deque = deque()
            for cache, targets, idx in _jobs():
                while len(pending) >= inflight:
                    yield pending.popleft().result()
                scr = [_scratch() for _ in range(nshard)]
                pending.append(
                    ex.submit(_emit_native, cache, targets, idx, scr)
                )
            while pending:
                yield pending.popleft().result()
