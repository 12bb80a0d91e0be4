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
    pipeline = StreamingInferencePipeline(
        artifact_path=args.model_save_path,
        inference_mode=args.inference_mode or "deterministic",
        mc_samples=args.mc_samples,
        chunk_size=args.stream_chunk_size,
        batch_size=args.stream_batch_size,
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
