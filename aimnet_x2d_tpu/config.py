"""Configuration validation and experiment config round-trip
(reference: src/config/validation.py:22-436, src/config/experiment.py:20-113,
src/config/paths.py:19-100)."""

from __future__ import annotations

import argparse
import datetime
import os
from typing import List, Tuple


class ValidationError(ValueError):
    pass


def validate_args(args: argparse.Namespace) -> List[str]:
    """Cross-field checks; raises ValidationError on fatal problems and
    returns a list of warnings (reference: src/config/validation.py)."""
    errors: List[str] = []
    warnings: List[str] = []

    if not args.is_inference:
        has_single = args.data_path is not None
        has_splits = all(
            x is not None for x in (args.train_data, args.val_data, args.test_data)
        )
        if not has_single and not has_splits:
            errors.append(
                "Provide --data_path or all of --train_data/--val_data/--test_data"
            )
        if has_single and abs(args.train_split + args.val_split + args.test_split - 1.0) > 1e-6:
            errors.append("train/val/test splits must sum to 1.0")

    if args.task_type == "multitask":
        if args.multi_target_list is None or len(args.multi_target_list) < 2:
            errors.append("multitask requires --multi_target_columns with ≥2 columns")
        if args.multitask_weight_list is not None and args.multi_target_list is not None:
            if len(args.multitask_weight_list) != len(args.multi_target_list):
                errors.append("--multitask_weights length must match target columns")
        if args.sae_subtask_list is not None and args.multi_target_list is not None:
            bad = [
                s for s in args.sae_subtask_list
                if s < 0 or s >= len(args.multi_target_list)
            ]
            if bad:
                errors.append(f"--sae_subtasks out of range: {bad}")
    else:
        if args.sae_subtask_list is not None:
            warnings.append("--sae_subtasks ignored for single-task regression")

    if args.iterable_dataset and not args.is_inference:
        if not (args.train_hdf5 and args.val_hdf5 and args.test_hdf5):
            errors.append("--iterable_dataset requires train/val/test HDF5 paths")

    for name in ("learning_rate", "lr_reduce_factor", "lr_step_gamma", "lr_exp_gamma"):
        v = getattr(args, name)
        if not (0 < v <= (1.0 if name != "learning_rate" else 10.0)):
            errors.append(f"--{name} must be in (0, 1] (got {v})")
    for name in ("epochs", "batch_size", "num_shells", "num_message_passing_layers",
                 "hidden_dim", "embedding_dim"):
        if getattr(args, name) <= 0:
            errors.append(f"--{name} must be positive")

    if args.inference_mode == "mc_dropout" and args.mc_samples <= 0:
        errors.append("--inference_mode mc_dropout requires --mc_samples > 0")
    if args.mc_samples > 0 and args.mc_samples < 2:
        warnings.append("--mc_samples < 2 gives no spread estimate")

    if args.use_partial_charges and int(0.3 * args.hidden_dim) < 2:
        errors.append("--use_partial_charges needs hidden_dim ≥ 7 (x_other ≥ 2)")

    g_shards = getattr(args, "graph_shards", 1)
    g_shards = 1 if g_shards is None else g_shards
    if g_shards < 1:
        errors.append("--graph_shards must be ≥ 1")
    elif g_shards > 1:
        import jax

        need = (args.num_devices or 1) * g_shards
        have = len(jax.devices())
        if need > have:
            errors.append(
                f"--graph_shards {g_shards} x --num_devices "
                f"{args.num_devices or 1} needs {need} devices, "
                f"only {have} visible"
            )
        if getattr(args, "true_multi_hop", False):
            errors.append(
                "--graph_shards is only implemented for the reference's "
                "hop-collapse semantics (drop --true_multi_hop)"
            )

    if errors:
        raise ValidationError("; ".join(errors))
    return warnings


def setup_paths(args: argparse.Namespace) -> None:
    """mkdir -p for every output location (reference: src/config/paths.py)."""
    paths = [args.model_save_path, args.inference_output]
    if args.save_embeddings:
        paths.append(args.embeddings_output_path)
    if args.output_partial_charges:
        paths.append(args.output_partial_charges)
    if args.checkpoint_dir:
        os.makedirs(args.checkpoint_dir, exist_ok=True)
    if args.train_hdf5:
        paths += [args.train_hdf5, args.val_hdf5, args.test_hdf5]
    for p in paths:
        if p:
            d = os.path.dirname(os.path.abspath(p))
            if d:
                os.makedirs(d, exist_ok=True)


def save_experiment_config(args: argparse.Namespace, path: str) -> None:
    """args → YAML with metadata (reference: src/config/experiment.py:20-69)."""
    import yaml

    payload = {
        "metadata": {
            "created": datetime.datetime.now().isoformat(),
            "framework": "aimnet_x2d_tpu",
        },
        "config": {
            k: v for k, v in sorted(vars(args).items()) if not k.startswith("_")
        },
    }
    d = os.path.dirname(os.path.abspath(path))
    if d:
        os.makedirs(d, exist_ok=True)
    with open(path, "w") as f:
        yaml.safe_dump(payload, f, default_flow_style=False)


def load_experiment_config(path: str) -> dict:
    """YAML → config dict (reference: src/config/experiment.py:72-113)."""
    import yaml

    with open(path) as f:
        payload = yaml.safe_load(f)
    return payload["config"] if "config" in payload else payload
