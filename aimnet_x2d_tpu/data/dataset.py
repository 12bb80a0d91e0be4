"""In-memory dataset + bucketed fixed-shape batch loader.

Replaces the reference's PyG InMemoryDataset + ragged DataLoader
(reference: src/datasets/molecular.py:18-99, src/datasets/loaders.py:10-45)
with a design made for XLA: every yielded batch is a ``MolBatch`` padded to
one of a small ladder of bucket shapes, so the jitted train step compiles a
bounded number of times and then runs at fixed shape.

Featurization runs in a host-side multiprocessing pool (the reference does
the same with RDKit workers; reference: src/datasets/features.py:337-379)
and invalid SMILES are dropped together with their targets.
"""

from __future__ import annotations

import dataclasses
import math
import os
from functools import partial
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..chem.featurize import compute_features
from .batching import MolBatch, MolFeatures, bucket_size, collate


def _binned_env_default() -> bool:
    """Default for the binned dense layout: on for TPU backends, overridable
    with AIMNET_BINNED=0/1 (tests and the CPU multi-chip dryrun use =1 to
    drive the megakernel datapath through the product loaders)."""
    import os

    import jax

    env = os.environ.get("AIMNET_BINNED", "").lower()
    if env in ("1", "on", "true"):
        return True
    if env in ("0", "off", "false"):
        return False
    return jax.default_backend() == "tpu"


def featurize_many(
    smiles: Sequence[str],
    targets: np.ndarray,
    max_hops: int,
    num_workers: int = 0,
) -> Tuple[List[str], np.ndarray, List[MolFeatures]]:
    """Featurize SMILES in parallel; drop failures and their targets
    (reference: src/datasets/features.py:337-379).

    Uses the native C++ featurizer (chem/native.py, ~9x faster per core and
    GIL-releasing so a thread pool scales) when the shared library is built;
    falls back to the pure-Python path with a process pool otherwise.
    """
    targets = np.asarray(targets, np.float32)
    if targets.ndim == 1:
        targets = targets[:, None]

    from ..chem.native import compute_features_batch, native_available

    if native_available():
        results = compute_features_batch(
            list(smiles), max_hops, num_threads=max(num_workers, 1)
        )
    elif num_workers and num_workers > 1:
        # fork is unsafe once JAX's thread pools exist; use forkserver/spawn
        import multiprocessing as mp

        ctx = mp.get_context(
            "forkserver" if "forkserver" in mp.get_all_start_methods() else "spawn"
        )
        fn = partial(compute_features, max_hops=max_hops)
        with ctx.Pool(num_workers) as pool:
            results = pool.map(fn, smiles, chunksize=256)
    else:
        results = [compute_features(s, max_hops) for s in smiles]

    keep_smiles, keep_targets, feats = [], [], []
    for s, t, r in zip(smiles, targets, results):
        if r is not None:
            # processed canonical SMILES, not the raw input (reference:
            # molecular.py:68 stores compute_all's processed_smiles)
            keep_smiles.append(r.smiles)
            keep_targets.append(t)
            feats.append(r)
    return keep_smiles, np.asarray(keep_targets, np.float32), feats


@dataclasses.dataclass
class MoleculeDataset:
    """Featurized molecules + (preprocessed) targets, ready to batch.

    With the native featurizer, ``features`` is a ``LazyFeatures`` view
    over the dataset-wide ``columnar`` cache (built directly by ONE native
    call, no per-molecule objects — data/native_batch.py); per-molecule
    MolFeatures are materialized only by fallback consumers.
    """

    smiles: List[str]
    targets: np.ndarray  # (N, T) float32
    features: "List[MolFeatures]"  # list or LazyFeatures (sequence protocol)
    max_hops: int
    columnar: "object | None" = None  # ColumnarCache when built natively

    def __len__(self) -> int:
        return len(self.features)

    @property
    def num_tasks(self) -> int:
        return int(self.targets.shape[1])

    @classmethod
    def from_smiles(
        cls,
        smiles: Sequence[str],
        targets: np.ndarray,
        max_hops: int,
        num_workers: int = 0,
    ) -> "MoleculeDataset":
        targets = np.asarray(targets, np.float32)
        if targets.ndim == 1:
            targets = targets[:, None]

        from ..chem.native import native_available

        if native_available():
            from .native_batch import ColumnarCache, LazyFeatures

            cache, keep = ColumnarCache.from_smiles(
                list(smiles), max_hops, num_threads=max(num_workers, 1)
            )
            kept = cache.processed_smiles or [
                s for s, v in zip(smiles, keep) if v
            ]
            return cls(
                smiles=kept,
                targets=targets[keep],
                features=LazyFeatures(cache, kept, max_hops),
                max_hops=max_hops,
                columnar=cache,
            )
        s, t, f = featurize_many(smiles, targets, max_hops, num_workers)
        return cls(smiles=s, targets=t, features=f, max_hops=max_hops)

    def atomic_numbers(self) -> List[np.ndarray]:
        if self.columnar is not None and self.columnar.atomic_numbers is not None:
            off = self.columnar.mol_atom_off
            an = self.columnar.atomic_numbers
            return [an[off[i] : off[i + 1]] for i in range(len(self))]
        return [f.atomic_numbers for f in self.features]

    def with_targets(self, targets: np.ndarray) -> "MoleculeDataset":
        t = np.asarray(targets, np.float32)
        if t.ndim == 1:
            t = t[:, None]
        assert len(t) == len(self.features)
        return dataclasses.replace(self, targets=t)


class BatchLoader:
    """Yields padded MolBatch objects with bucketed static shapes.

    ``fixed_shape=True`` (default for training) pads every batch to the
    dataset-level caps so one compilation serves all batches;
    ``fixed_shape=False`` buckets per batch (fewer pad slots, a handful of
    shapes — fine for evaluation).
    """

    def __init__(
        self,
        dataset: MoleculeDataset,
        batch_size: int,
        shuffle: bool = False,
        seed: int = 0,
        fixed_shape: bool = True,
        drop_last: bool = False,
        stack_devices: int = 0,
        edge_shards: int = 1,
        halo_shards: int = 1,
        fused_edges: "bool | None" = None,
        binned: "bool | None" = None,
        bin_ab: int = 256,
        bin_mb: int = 48,
        slim_edges: "bool | None" = None,
        size_sort: "bool | None" = None,
    ):
        if edge_shards > 1 and halo_shards > 1:
            raise ValueError("edge_shards and halo_shards are exclusive graph-axis modes")
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        # Size-descending bin packing (binning.plan_bins_sorted): tighter
        # fill on real size mixes.  TRAINING loaders only — a shuffled
        # loader's batch is an order-free molecule set, while eval /
        # inference output rows must stay aligned with input order.
        # AIMNET_SIZE_SORT=0 opts out.
        if size_sort is None:
            size_sort = shuffle and os.environ.get("AIMNET_SIZE_SORT", "1") != "0"
        self.size_sort = bool(size_sort)
        self.seed = seed
        self.fixed_shape = fixed_shape
        self.drop_last = drop_last
        self.stack_devices = stack_devices
        self.edge_shards = edge_shards
        self.halo_shards = halo_shards
        # Per-molecule sizes from the columnar cache when present (vector
        # diffs of the offset arrays) — materializing MolFeatures for the
        # whole dataset defeats the lazy columnar path.
        cache = dataset.columnar
        if cache is not None:
            mol_atoms = np.diff(cache.mol_atom_off)
        else:
            mol_atoms = np.array([f.num_atoms for f in dataset.features])
        # Bin-packed dense layout (data/binning.py): the fastest TPU path.
        # Feasible iff every molecule fits a bin; decided up-front so the
        # whole loader serves one layout (no mid-epoch shape changes).
        if binned is None:
            import jax

            # halo shards bin-pack per device inside partition_halo (giant
            # fragments are chunked there), so the molecule-size cap only
            # binds the single-device layout
            binned = (
                _binned_env_default()
                and edge_shards == 1
                and (
                    halo_shards > 1
                    or mol_atoms.size == 0
                    or int(mol_atoms.max()) <= bin_ab
                )
            )
        elif (
            binned
            and halo_shards == 1
            and mol_atoms.size
            and int(mol_atoms.max()) > bin_ab
        ):
            raise ValueError(
                f"binned layout needs bin_ab >= largest molecule "
                f"({int(mol_atoms.max())} atoms > {bin_ab})"
            )
        self.binned = binned
        self.bin_ab = bin_ab
        self.bin_mb = bin_mb
        self._bin_pins: dict = {}
        # Rotating scratch sets for the native builder: batch N+k reuses
        # batch N's host buffers, safe only when batches are copied off-host
        # (device_put) before reuse — i.e. on a real accelerator, not the
        # CPU backend where jax may alias numpy memory.  The rotation depth
        # must cover the prefetch pipeline's in-flight batches
        # (native_batch.SCRATCH_SETS; round-4 root-cause note there).
        import jax as _jax

        from .native_batch import SCRATCH_SETS

        n_sets = SCRATCH_SETS * max(1, stack_devices)
        self._scratches = (
            [{} for _ in range(n_sets)]
            if _jax.default_backend() == "tpu"
            else None
        )
        self._scratch_i = 0
        # Fused-kernel layouts (ops/fused_edge.py): auto-enabled on TPU
        # for the plain (non-graph-sharded) path where the model uses them.
        if fused_edges is None:
            import jax

            fused_edges = (
                not binned
                and jax.default_backend() == "tpu"
                and edge_shards == 1
                and halo_shards == 1
            )
        self.fused_edges = fused_edges and not binned
        self._fused_pins: dict = {}
        # drop flat edge arrays from binned device batches (~40% of the
        # per-batch host→device bytes; bin_adj carries every edge).  Halo
        # shards keep them (their flat fallback path is load-bearing).
        if slim_edges is None:
            import jax as _j2

            slim_edges = (
                binned and halo_shards == 1 and _j2.default_backend() == "tpu"
                and os.environ.get("AIMNET_SLIM_EDGES", "1") != "0"
            )
        self.slim_edges = bool(slim_edges) and binned and halo_shards == 1
        # running per-device slot minimums so halo batches keep one static
        # shape once warmed (partition_halo treats these as minimums)
        self._halo_slots: dict = {}
        self._epoch = 0

        if cache is not None:
            atoms = mol_atoms
            edges = np.diff(cache.mol_edge_off)
            tets = np.diff(cache.mol_tet_off)
            pairs = 2 * np.maximum(
                np.diff(cache.mol_cis_off), np.diff(cache.mol_trans_off)
            )
        else:
            atoms = np.array([f.num_atoms for f in dataset.features])
            edges = np.array([f.num_edges for f in dataset.features])
            tets = np.array([f.tet_nbrs.shape[0] for f in dataset.features])
            pairs = np.array(
                [
                    2 * max(f.cis_pairs.shape[0], f.trans_pairs.shape[0])
                    for f in dataset.features
                ]
            )
        # Static caps: batch_size molecules of p-max size, bucketed.  Using
        # the true max keeps a hard guarantee (no overflow recompiles).
        k = min(batch_size, len(atoms))
        self.atom_slots = bucket_size(int(np.sort(atoms)[-k:].sum()) if len(atoms) else 8)
        self.edge_slots = bucket_size(int(np.sort(edges)[-k:].sum()) if len(edges) else 8)
        self.tet_slots = bucket_size(int(np.sort(tets)[-k:].sum()) + 1 if len(tets) else 8)
        self.pair_slots = bucket_size(int(np.sort(pairs)[-k:].sum()) + 1 if len(pairs) else 8)

    def pin_slots(self, slots: dict) -> dict:
        """Grow this loader's slot caps to at least ``slots`` (and update
        ``slots`` in place to the running max).  Streaming callers use this
        to keep one static batch shape across many small datasets/chunks so
        the jitted forward compiles once."""
        for name in ("atom_slots", "edge_slots", "tet_slots", "pair_slots"):
            merged = max(slots.get(name, 0), getattr(self, name))
            slots[name] = merged
            setattr(self, name, merged)
        if self.binned:
            # both bin-grid dimensions must carry across loaders, or every
            # chunk's (nb, mb) drift retriggers a (minutes-long on the
            # remote runtime) recompile
            for name in ("bins", "mb"):
                merged = max(slots.get(name, 0), self._bin_pins.get(name, 0))
                if merged:
                    slots[name] = merged
                    self._bin_pins[name] = merged
        return slots

    def warm_bin_pins(self) -> None:
        """Pre-plan every batch's bin grid and seed the pins to the
        loader-wide max BEFORE the first batch is built.

        Without this a streaming caller hits a pin growth — a full remote
        recompile, minutes on the axon runtime — whenever a later batch
        needs more bins / molecule-slots than the first.  For a
        deterministic (shuffle=False) loader the greedy plan here is the
        SAME plan batch construction runs, so the seed is exact: the first
        compile is the only compile.  (Shuffled loaders would only be exact
        for epoch 0; call sites are the inference/eval paths.)"""
        if not self.binned:
            return
        from .binning import adaptive_mb_cap, plan_bin_counts

        cache = self.dataset.columnar
        if cache is not None:
            sizes_all = np.diff(cache.mol_atom_off)
            tets_all = np.diff(cache.mol_tet_off)
        else:
            sizes_all = np.array(
                [f.num_atoms for f in self.dataset.features], np.int64
            )
            tets_all = np.array(
                [f.tet_nbrs.shape[0] for f in self.dataset.features], np.int64
            )
        bins = self._bin_pins.get("bins", 0)
        mb = self._bin_pins.get("mb", 0)
        per = self.batch_size
        for idx in self._batch_indices():
            # stacked loaders bin each device shard independently
            subs = (
                [idx[d * per : (d + 1) * per] for d in range(self.stack_devices)]
                if self.stack_devices
                else [idx]
            )
            for sub in subs:
                sizes = sizes_all[sub]
                # same adaptive cap the packer applies (bin_pack_batch /
                # native builder) — planning with the uncapped mb could
                # under-count bins and re-trigger the pin-growth recompile
                # this warm-up exists to prevent
                cap = adaptive_mb_cap(sizes, self.bin_ab, self.bin_mb)
                if self.size_sort:  # packer plans size-descending
                    sizes = -np.sort(-sizes)
                nb, mbeff = plan_bin_counts(sizes, self.bin_ab, cap)
                bins = max(bins, bucket_size(nb, align=8))
                mb = max(mb, bucket_size(mbeff, align=8))
        self._bin_pins["bins"] = bins
        self._bin_pins["mb"] = mb
        # per-bin tet-table slot pin: centers per bin <= mols/bin x the
        # dataset's per-molecule max (sound upper bound, so the seed never
        # grows mid-run)
        max_tet = int(tets_all.max()) if tets_all.size else 0
        tetb = bucket_size(min(self.bin_ab, mb * max_tet) if max_tet else 1, align=8)
        self._bin_pins["tetb"] = max(tetb, self._bin_pins.get("tetb", 0))

    def set_epoch(self, epoch: int) -> None:
        self._epoch = epoch

    def _native_cache(self):
        """Columnar cache for the native binned builder: the dataset's own
        cache when it was built natively, else a one-time build from the
        MolFeatures list (None when the native library lacks the
        batch-builder entry points)."""
        if not hasattr(self, "_columnar"):
            from .native_batch import ColumnarCache, load_library

            if load_library() is None or not len(self.dataset.features):
                self._columnar = None
            elif self.dataset.columnar is not None:
                self._columnar = self.dataset.columnar
            else:
                self._columnar = ColumnarCache.from_features(
                    self.dataset.features, self.dataset.max_hops
                )
        return self._columnar

    def __len__(self) -> int:
        n = len(self.dataset)
        b = self.batch_size * max(1, self.stack_devices)
        return n // b if self.drop_last else math.ceil(n / b)

    def _batch_indices(self) -> List[np.ndarray]:
        n = len(self.dataset)
        order = np.arange(n)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self._epoch)
            rng.shuffle(order)
        b = self.batch_size * max(1, self.stack_devices)
        chunks = [order[i : i + b] for i in range(0, n, b)]
        if self.drop_last and chunks and len(chunks[-1]) < b:
            chunks.pop()
        return chunks

    def _collate(self, idx: np.ndarray) -> MolBatch:
        # halo mode bin-packs per device inside partition_halo, not here
        if self.binned and self.halo_shards == 1 and self._native_cache() is not None:
            # native one-pass binned builder (native/batch_builder.cpp):
            # ~30x the python collate+bin_pack path, array-exact equal
            # (tests/test_native_batch.py)
            from .native_batch import build_binned_batch

            cache = self._native_cache()
            if self.fixed_shape:
                e_slots, t_slots, p_slots = self.edge_slots, self.tet_slots, self.pair_slots
            else:
                e_slots = bucket_size(
                    max(int((cache.mol_edge_off[idx + 1] - cache.mol_edge_off[idx]).sum()), 1)
                )
                t_slots = bucket_size(
                    max(int((cache.mol_tet_off[idx + 1] - cache.mol_tet_off[idx]).sum()), 1)
                )
                p_slots = bucket_size(
                    max(
                        2 * int((cache.mol_cis_off[idx + 1] - cache.mol_cis_off[idx]).sum()),
                        2 * int((cache.mol_trans_off[idx + 1] - cache.mol_trans_off[idx]).sum()),
                        1,
                    )
                )
            scratch = None
            if self._scratches is not None:
                scratch = self._scratches[self._scratch_i]
                self._scratch_i = (self._scratch_i + 1) % len(self._scratches)
            return build_binned_batch(
                cache,
                idx,
                self.dataset.targets[idx],
                ab=self.bin_ab,
                mb_cap=self.bin_mb,
                edge_slots=e_slots,
                tet_slots=t_slots,
                pair_slots=p_slots,
                pins=self._bin_pins,
                scratch=scratch,
                size_sort=self.size_sort,
            )
        mols = [self.dataset.features[i] for i in idx]
        targets = self.dataset.targets[idx]
        kw = {}
        if self.fixed_shape:
            kw = dict(
                atom_slots=self.atom_slots,
                edge_slots=self.edge_slots,
                tet_slots=self.tet_slots,
                pair_slots=self.pair_slots,
            )
        batch = collate(
            mols,
            targets,
            num_hops=self.dataset.max_hops,
            graph_slots=self.batch_size,
            **kw,
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

    def _partition_halo_shards(self, collated: List[MolBatch]) -> List[MolBatch]:
        """Halo-partition each data shard with shared (pinned, monotonically
        growing) per-device slot minimums so every shard in the stack — and
        across steps — has identical static shapes."""
        from ..parallel.halo import partition_halo_stack

        parts, self._halo_slots = partition_halo_stack(
            collated,
            self.halo_shards,
            binned=self.binned,
            ab=self.bin_ab,
            slots=self._halo_slots,
        )
        return parts

    def _repin_fused(self, shards: List[MolBatch]) -> List[MolBatch]:
        from .batching import repin_fused_shards

        return repin_fused_shards(shards, self._fused_pins)

    def _rebin(
        self, shard: MolBatch, target_bins: int, target_mb: int,
        target_tetb: "int | None" = None,
    ) -> MolBatch:
        from .binning import grow_bins

        return grow_bins(shard, target_bins, target_mb, target_tetb)

    def __iter__(self) -> Iterator[MolBatch]:
        if self.slim_edges:
            from .binning import slim_binned_edges

            for b in self._iter_impl():
                yield slim_binned_edges(b)
        else:
            yield from self._iter_impl()

    def _iter_impl(self) -> Iterator[MolBatch]:
        for idx in self._batch_indices():
            if self.stack_devices:
                # Split across devices and stack on a leading device axis
                # for shard_map data parallelism; short shards are padded
                # with empty batches (all masks False).  With edge_shards>1
                # each data shard is additionally edge-partitioned, giving
                # leading dims (stack_devices, edge_shards) matching a
                # ('data', 'graph') mesh.
                import jax

                from .batching import shard_edges

                shards = []
                per = self.batch_size
                for d in range(self.stack_devices):
                    sub = idx[d * per : (d + 1) * per]
                    b = self._collate(sub)
                    if self.edge_shards > 1:
                        parts = shard_edges(b, self.edge_shards)
                        b = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *parts)
                    shards.append(b)
                if self.halo_shards > 1:
                    shards = self._partition_halo_shards(shards)
                if self.fused_edges:
                    shards = self._repin_fused(shards)
                if self.binned and self.halo_shards == 1:
                    # earlier shards may predate a bin/mb-pin growth within
                    # this stack — repin them to the final shared shape
                    tb = self._bin_pins.get("bins", 0)
                    tm = self._bin_pins.get("mb", 0)
                    tt = self._bin_pins.get("tetb", 0)
                    shards = [
                        s
                        if s.bin_adj.shape[0] == tb
                        and s.pool_mat.shape[1] == tm
                        and (s.tet_bin is None or s.tet_bin.shape[2] == tt)
                        else self._rebin(s, tb, tm, tt or None)
                        for s in shards
                    ]
                yield jax.tree_util.tree_map(lambda *xs: np.stack(xs), *shards)
            else:
                yield self._collate(idx)
