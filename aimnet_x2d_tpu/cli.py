"""Command-line interface mirroring the reference flag surface
(reference: src/main/cli.py:11-404), plus TPU-native extensions.

Flag groups: data, model architecture, training, inference, system,
hyperopt, logging.  Post-processing derives list-valued fields and the
inference-mode autodetect exactly like the reference
(src/main/cli.py:296-339).
"""

from __future__ import annotations

import argparse
from typing import List, Optional


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        description="aimnet_x2d_tpu: TPU-native molecular property prediction"
    )

    g = p.add_argument_group("Data Configuration")
    g.add_argument("--data_path", type=str, default=None)
    g.add_argument("--train_data", type=str, default=None)
    g.add_argument("--val_data", type=str, default=None)
    g.add_argument("--test_data", type=str, default=None)
    g.add_argument("--train_split", type=float, default=0.8)
    g.add_argument("--val_split", type=float, default=0.1)
    g.add_argument("--test_split", type=float, default=0.1)
    g.add_argument("--smiles_column", type=str, default="smiles")
    g.add_argument("--target_column", type=str, default="target")
    g.add_argument("--multi_target_columns", type=str, default=None,
                   help="comma-separated target column names for multitask")
    g.add_argument("--iterable_dataset", action="store_true",
                   help="stream batches from HDF5 instead of in-memory")
    g.add_argument("--shuffle_buffer_size", type=int, default=1000)
    g.add_argument("--train_hdf5", type=str, default=None)
    g.add_argument("--val_hdf5", type=str, default=None)
    g.add_argument("--test_hdf5", type=str, default="test.h5")

    g = p.add_argument_group("Model Architecture")
    g.add_argument("--hidden_dim", type=int, default=512)
    g.add_argument("--num_shells", type=int, default=3)
    g.add_argument("--num_message_passing_layers", type=int, default=3)
    g.add_argument("--embedding_dim", type=int, default=64)
    g.add_argument("--ffn_hidden_dim", type=int, default=None)
    g.add_argument("--ffn_num_layers", type=int, default=3)
    g.add_argument("--ffn_dropout", type=float, default=0.05)
    g.add_argument("--pooling_type", type=str, default="attention",
                   choices=["attention", "mean", "max", "sum"])
    g.add_argument("--attention_num_heads", type=int, default=4)
    g.add_argument("--attention_temperature", type=float, default=1.0)
    g.add_argument("--shell_conv_num_mlp_layers", type=int, default=2)
    g.add_argument("--shell_conv_dropout", type=float, default=0.05)
    g.add_argument("--activation_type", type=str, default="silu",
                   choices=["relu", "leakyrelu", "elu", "gelu", "silu"])
    g.add_argument("--use_partial_charges", action="store_true")
    g.add_argument("--use_stereochemistry", action="store_true")
    g.add_argument("--true_multi_hop", action="store_true",
                   help="TPU-native: true per-hop aggregation instead of the "
                   "reference's hop-collapse behavior (SURVEY quirk Q1)")

    g = p.add_argument_group("Training Configuration")
    g.add_argument("--learning_rate", type=float, default=0.00025)
    g.add_argument("--epochs", type=int, default=50)
    g.add_argument("--batch_size", type=int, default=64)
    g.add_argument("--early_stopping", action="store_true")
    g.add_argument("--patience", type=int, default=25)
    g.add_argument("--task_type", type=str, default="regression",
                   choices=["regression", "multitask"])
    g.add_argument("--loss_function", type=str, default="l1",
                   choices=["l1", "mse", "evidential"])
    g.add_argument("--multitask_weights", type=str, default=None)
    g.add_argument("--evidential_lambda", type=float, default=1.0)
    g.add_argument("--lr_scheduler", type=str, default="ReduceLROnPlateau",
                   choices=["ReduceLROnPlateau", "CosineAnnealingLR", "StepLR",
                            "ExponentialLR"])
    g.add_argument("--lr_reduce_factor", type=float, default=0.5)
    g.add_argument("--lr_patience", type=int, default=10)
    g.add_argument("--lr_cosine_t_max", type=int, default=10)
    g.add_argument("--lr_step_size", type=int, default=10)
    g.add_argument("--lr_step_gamma", type=float, default=0.1)
    g.add_argument("--lr_exp_gamma", type=float, default=0.95)
    g.add_argument("--transfer_learning", type=str, default=None,
                   help="path to a pretrained artifact")
    g.add_argument("--freeze_pretrained", action="store_true")
    g.add_argument("--freeze_layers", type=str, default=None)
    g.add_argument("--unfreeze_layers", type=str, default=None)
    g.add_argument("--layer_wise_lr_decay", action="store_true")
    g.add_argument("--lr_decay_factor", type=float, default=0.8)
    g.add_argument("--calculate_sae", action="store_true")
    g.add_argument("--sae_subtasks", type=str, default=None)
    g.add_argument("--checkpoint_dir", type=str, default=None,
                   help="TPU-native: periodic orbax checkpoints for resume")
    g.add_argument("--checkpoint_every", type=int, default=10)

    g = p.add_argument_group("Inference Configuration")
    g.add_argument("--inference_csv", type=str, default=None)
    g.add_argument("--inference_hdf5", type=str, default=None)
    g.add_argument("--inference_output", type=str, default="predictions.csv")
    g.add_argument("--inference_mode", type=str, default=None,
                   choices=[None, "deterministic", "mc_dropout", "evidential"])
    g.add_argument("--mc_samples", type=int, default=0)
    g.add_argument("--stream_chunk_size", type=int, default=1000)
    g.add_argument("--stream_batch_size", type=int, default=None)
    g.add_argument("--save_embeddings", action="store_true")
    g.add_argument("--embeddings_output_path", type=str, default="embeddings.h5")
    g.add_argument("--include_atom_embeddings", action="store_true")
    g.add_argument("--output_partial_charges", type=str, default=None)

    g = p.add_argument_group("System Configuration")
    g.add_argument("--num_workers", type=int, default=4)
    g.add_argument("--num_devices", type=int, default=None,
                   help="data-parallel devices (default: all visible)")
    g.add_argument("--graph_shards", type=int, default=1,
                   help="TPU-native: shard each molecule batch's atoms+edges "
                   "over this many devices along the mesh 'graph' axis with "
                   "boundary-atom halo exchange (parallel/halo.py); composes "
                   "with --num_devices data shards — total devices = "
                   "num_devices x graph_shards")
    g.add_argument("--mixed_precision", action="store_true",
                   help="bfloat16 matmuls on TPU")
    g.add_argument("--gradient_checkpointing", action="store_true",
                   help="rematerialize MP layers in backward (larger batches)")
    g.add_argument("--precompute_num_workers", type=int, default=None)
    g.add_argument("--model_save_path", type=str, default="gnn_model.npz")
    g.add_argument("--seed", type=int, default=42)

    g = p.add_argument_group("Hyperparameter Optimization")
    g.add_argument("--hyperparameter_file", type=str, default=None)
    g.add_argument("--num_trials", type=int, default=1)

    g = p.add_argument_group("Logging & Tracking")
    g.add_argument("--enable_wandb", action="store_true")
    g.add_argument("--wandb_project", type=str, default="aimnet-x2d-tpu")
    g.add_argument("--wandb_entity", type=str, default=None)
    g.add_argument("--wandb_tags", type=str, default=None)
    g.add_argument("--experiment_config", type=str, default=None,
                   help="save the resolved configuration to this YAML path")

    return p


def _csv_list(value: Optional[str], cast) -> Optional[List]:
    if value is None:
        return None
    return [cast(x) for x in value.split(",") if x.strip() != ""]


def postprocess_arguments(args: argparse.Namespace) -> argparse.Namespace:
    """Derived fields (reference: src/main/cli.py:296-339)."""
    args.multi_target_list = _csv_list(args.multi_target_columns, str)
    args.sae_subtask_list = _csv_list(args.sae_subtasks, int)
    args.multitask_weight_list = _csv_list(args.multitask_weights, float)
    args.freeze_layer_list = _csv_list(args.freeze_layers, str)
    args.unfreeze_layer_list = _csv_list(args.unfreeze_layers, str)
    args.wandb_tag_list = _csv_list(args.wandb_tags, str)
    if args.ffn_hidden_dim is None:
        args.ffn_hidden_dim = args.hidden_dim
    if args.precompute_num_workers is None:
        args.precompute_num_workers = args.num_workers
    # stream_batch_size=None survives parsing: the inference engine picks a
    # backend-appropriate default at runtime (large batches keep the TPU
    # fed; the training batch size is the right CPU default)
    # inference-mode autodetect
    args.is_inference = args.inference_csv is not None or args.inference_hdf5 is not None
    if args.is_inference and args.inference_mode is None:
        args.inference_mode = "mc_dropout" if args.mc_samples > 0 else "deterministic"
    return args


def parse_arguments(argv: Optional[List[str]] = None) -> argparse.Namespace:
    return postprocess_arguments(build_parser().parse_args(argv))
