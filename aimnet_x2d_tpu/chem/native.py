"""ctypes binding to the native C++ featurizer (native/featurizer.cpp).

Loads ``libaimnet_featurizer.so`` (built with ``make -C native``) and
exposes ``compute_features_native`` with the exact signature/semantics of
the pure-Python ``chem.featurize.compute_features`` — tests cross-validate
the two on the QM9 sample set.  If the library is absent (or
``AIMNET_NO_NATIVE=1``), callers fall back to the Python path.

ctypes releases the GIL during calls, so host featurization can use a
thread pool instead of process pools.
"""

from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

from ..data.batching import MolFeatures

_LIB = None
_TRIED = False


def _find_library() -> Optional[str]:
    here = os.path.dirname(os.path.abspath(__file__))
    candidates = [
        os.path.join(here, "..", "..", "native", "libaimnet_featurizer.so"),
        os.path.join(here, "libaimnet_featurizer.so"),
    ]
    for c in candidates:
        if os.path.exists(c):
            return os.path.abspath(c)
    return None


def load_library():
    global _LIB, _TRIED
    if _TRIED:
        return _LIB
    _TRIED = True
    if os.environ.get("AIMNET_NO_NATIVE"):
        return None
    path = _find_library()
    if path is None:
        return None
    try:
        lib = ctypes.CDLL(path)
    except OSError:
        return None

    i32p = ctypes.POINTER(ctypes.c_int32)
    lib.aimnet_featurize.restype = ctypes.c_void_p
    lib.aimnet_featurize.argtypes = [ctypes.c_char_p, ctypes.c_int]
    lib.aimnet_free.argtypes = [ctypes.c_void_p]
    for name, res in [
        ("aimnet_num_atoms", ctypes.c_int),
        ("aimnet_total_charge", ctypes.c_int),
        ("aimnet_num_tet", ctypes.c_int),
        ("aimnet_num_cis", ctypes.c_int),
        ("aimnet_num_trans", ctypes.c_int),
    ]:
        fn = getattr(lib, name)
        fn.restype = res
        fn.argtypes = [ctypes.c_void_p]
    for name in ["aimnet_atom_features", "aimnet_atomic_numbers", "aimnet_tet",
                 "aimnet_cis", "aimnet_trans"]:
        fn = getattr(lib, name)
        fn.restype = i32p
        fn.argtypes = [ctypes.c_void_p]
    lib.aimnet_num_edges.restype = ctypes.c_int
    lib.aimnet_num_edges.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.aimnet_edges.restype = i32p
    lib.aimnet_edges.argtypes = [ctypes.c_void_p, ctypes.c_int]
    lib.aimnet_smiles.restype = ctypes.c_char_p
    lib.aimnet_smiles.argtypes = [ctypes.c_void_p]
    lib.aimnet_batch_smiles.restype = ctypes.c_char_p
    lib.aimnet_batch_smiles.argtypes = [ctypes.c_void_p, ctypes.c_int]

    # batch API
    i64p = ctypes.POINTER(ctypes.c_int64)
    u8p = ctypes.POINTER(ctypes.c_uint8)
    i8p = ctypes.POINTER(ctypes.c_int8)
    lib.aimnet_featurize_batch.restype = ctypes.c_void_p
    lib.aimnet_featurize_batch.argtypes = [
        ctypes.POINTER(ctypes.c_char_p), ctypes.c_int, ctypes.c_int, ctypes.c_int,
    ]
    lib.aimnet_batch_free.argtypes = [ctypes.c_void_p]
    for name, res in [
        ("aimnet_batch_valid", u8p),
        ("aimnet_batch_atom_offsets", i64p),
        ("aimnet_batch_atom_features", i32p),
        ("aimnet_batch_atomic_numbers", i32p),
        ("aimnet_batch_edge_offsets", i64p),
        ("aimnet_batch_edge_dst", i32p),
        ("aimnet_batch_edge_src", i32p),
        ("aimnet_batch_edge_hop", i8p),
        ("aimnet_batch_tet_offsets", i64p),
        ("aimnet_batch_tet", i32p),
        ("aimnet_batch_cis_offsets", i64p),
        ("aimnet_batch_cis", i32p),
        ("aimnet_batch_trans_offsets", i64p),
        ("aimnet_batch_trans", i32p),
        ("aimnet_batch_total_charge", i32p),
    ]:
        fn = getattr(lib, name)
        fn.restype = res
        fn.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return load_library() is not None


def _as_array(ptr, n) -> np.ndarray:
    if n == 0 or not ptr:
        return np.zeros(0, np.int32)
    return np.ctypeslib.as_array(ptr, shape=(n,)).copy()


def compute_features_native(smiles: str, max_hops: int) -> Optional[MolFeatures]:
    lib = load_library()
    if lib is None:
        raise RuntimeError("native featurizer library not available")
    h = lib.aimnet_featurize(smiles.encode("utf-8"), max_hops)
    if not h:
        return None
    try:
        n = lib.aimnet_num_atoms(h)
        feats = _as_array(lib.aimnet_atom_features(h), n * 4).reshape(n, 4)
        atomic = _as_array(lib.aimnet_atomic_numbers(h), n)
        edge_hops = []
        for hop in range(max_hops):
            e = lib.aimnet_num_edges(h, hop)
            arr = _as_array(lib.aimnet_edges(h, hop), 2 * e).reshape(2, e)
            edge_hops.append(arr)
        n_tet = lib.aimnet_num_tet(h)
        tet = _as_array(lib.aimnet_tet(h), n_tet * 4).reshape(n_tet, 4)
        n_cis = lib.aimnet_num_cis(h)
        cis = _as_array(lib.aimnet_cis(h), n_cis * 2).reshape(n_cis, 2)
        n_trans = lib.aimnet_num_trans(h)
        trans = _as_array(lib.aimnet_trans(h), n_trans * 2).reshape(n_trans, 2)
        charge = float(lib.aimnet_total_charge(h))
        processed = lib.aimnet_smiles(h).decode("utf-8")
    finally:
        lib.aimnet_free(h)

    return MolFeatures(
        edge_hops=edge_hops,
        atom_type=feats[:, 0].copy(),
        hydrogen_count=feats[:, 1].copy(),
        degree=feats[:, 2].copy(),
        hybridization=feats[:, 3].copy(),
        tet_nbrs=tet,
        cis_pairs=cis,
        trans_pairs=trans,
        total_charge=charge,
        atomic_numbers=atomic,
        smiles=processed,  # canonical explicit-H output (C++ writer)
    )


def compute_features_batch(
    smiles_list, max_hops: int, num_threads: int = 0
) -> list:
    """Batch featurization: one C call, C++-side threading, columnar
    buffers sliced into MolFeatures.  Returns a list aligned with the
    input; unparseable SMILES give None."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native featurizer library not available")
    if num_threads <= 0:
        num_threads = os.cpu_count() or 1
    n = len(smiles_list)
    if n == 0:
        return []
    arr = (ctypes.c_char_p * n)(*[s.encode("utf-8") for s in smiles_list])
    h = lib.aimnet_featurize_batch(arr, n, max_hops, num_threads)

    def _np(fn, count, dtype):
        ptr = fn(h)
        if count == 0 or not ptr:
            return np.zeros(0, dtype)
        return np.ctypeslib.as_array(ptr, shape=(count,)).copy().astype(dtype, copy=False)

    try:
        valid = _np(lib.aimnet_batch_valid, n, np.uint8).astype(bool)
        atom_off = _np(lib.aimnet_batch_atom_offsets, n + 1, np.int64)
        total_atoms = int(atom_off[-1])
        afeat = _np(lib.aimnet_batch_atom_features, total_atoms * 4, np.int32).reshape(-1, 4)
        anum = _np(lib.aimnet_batch_atomic_numbers, total_atoms, np.int32)
        edge_off = _np(lib.aimnet_batch_edge_offsets, n + 1, np.int64)
        te = int(edge_off[-1])
        edst = _np(lib.aimnet_batch_edge_dst, te, np.int32)
        esrc = _np(lib.aimnet_batch_edge_src, te, np.int32)
        ehop = _np(lib.aimnet_batch_edge_hop, te, np.int8)
        tet_off = _np(lib.aimnet_batch_tet_offsets, n + 1, np.int64)
        tet = _np(lib.aimnet_batch_tet, int(tet_off[-1]) * 4, np.int32).reshape(-1, 4)
        cis_off = _np(lib.aimnet_batch_cis_offsets, n + 1, np.int64)
        cis = _np(lib.aimnet_batch_cis, int(cis_off[-1]) * 2, np.int32).reshape(-1, 2)
        tr_off = _np(lib.aimnet_batch_trans_offsets, n + 1, np.int64)
        trans = _np(lib.aimnet_batch_trans, int(tr_off[-1]) * 2, np.int32).reshape(-1, 2)
        charge = _np(lib.aimnet_batch_total_charge, n, np.int32)
        processed = [
            lib.aimnet_batch_smiles(h, i).decode("utf-8") for i in range(n)
        ]
    finally:
        lib.aimnet_batch_free(h)

    out = []
    for i in range(n):
        if not valid[i]:
            out.append(None)
            continue
        a0, a1 = atom_off[i], atom_off[i + 1]
        e0, e1 = edge_off[i], edge_off[i + 1]
        hop = ehop[e0:e1]
        hops = []
        for k in range(1, max_hops + 1):
            sel = hop == k
            hops.append(np.stack([edst[e0:e1][sel], esrc[e0:e1][sel]]))
        out.append(
            MolFeatures(
                edge_hops=hops,
                atom_type=afeat[a0:a1, 0],
                hydrogen_count=afeat[a0:a1, 1],
                degree=afeat[a0:a1, 2],
                hybridization=afeat[a0:a1, 3],
                tet_nbrs=tet[tet_off[i] : tet_off[i + 1]],
                cis_pairs=cis[cis_off[i] : cis_off[i + 1]],
                trans_pairs=trans[tr_off[i] : tr_off[i + 1]],
                total_charge=float(charge[i]),
                atomic_numbers=anum[a0:a1],
                smiles=processed[i],  # canonical explicit-H output
            )
        )
    return out
