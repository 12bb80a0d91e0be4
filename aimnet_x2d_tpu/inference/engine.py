"""Inference dispatch (reference: src/inference/engine.py:16-140).

Unlike the reference, errors are not swallowed (reference engine.py:127-139
catches everything and prints); failures propagate so callers see them.
The reference's HDF5-inference embedding path crashes on a nonexistent
import (quirk Q8); here both CSV and HDF5 inputs share one working path.
"""

from __future__ import annotations

import argparse
from typing import Any, Dict

from .pipeline import StreamingInferencePipeline


def inference_main(args: argparse.Namespace) -> Dict[str, Any]:
    batch = args.stream_batch_size
    chunk = args.stream_chunk_size
    if batch is None:
        import jax

        if jax.default_backend() == "tpu":
            # measured on QM9/v5e: 64→669 mol/s, 2048→2379 mol/s steady
            # state — big batches amortize per-dispatch latency and fill
            # the binned MXU layout; chunks hold a few batches so the
            # featurize-ahead thread stays ahead of the device
            batch = 2048
            chunk = max(chunk, 4 * batch)
        else:
            batch = args.batch_size
    pipeline = StreamingInferencePipeline(
        artifact_path=args.model_save_path,
        inference_mode=args.inference_mode or "deterministic",
        mc_samples=args.mc_samples,
        chunk_size=chunk,
        batch_size=batch,
        num_workers=args.num_workers,
        save_embeddings=args.save_embeddings,
        embeddings_output_path=args.embeddings_output_path,
        include_atom_embeddings=args.include_atom_embeddings,
    )
    if args.inference_csv:
        return pipeline.run_csv(
            args.inference_csv, args.inference_output, smiles_column=args.smiles_column
        )
    if args.inference_hdf5:
        return pipeline.run_hdf5(args.inference_hdf5, args.inference_output)
    raise ValueError("inference requires --inference_csv or --inference_hdf5")
