"""Model artifacts and training checkpoints.

The reference's serialization contract (SURVEY §2d; reference:
src/main/runner.py:899-969) is a torch.save of
``{"hyperparams": {...}, "state_dict": {...}}`` able to rebuild model +
preprocessing from one file.  The TPU-native equivalent is a single ``.npz``
artifact holding flattened params plus a JSON metadata blob (model config,
preprocessing statistics, task/loss info) — dependency-free and portable.

Additionally — infrastructure the reference lacks (SURVEY §5): periodic
mid-training checkpoint/resume via orbax, so long runs survive preemption.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any, Dict, Optional, Tuple

import numpy as np

from .data.preprocessing import PreprocessingPipeline
from .models.gnn import GNNConfig

_META_KEY = "__artifact_meta__"
_PARAM_PREFIX = "param/"


def _flatten(tree, prefix="") -> Dict[str, np.ndarray]:
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def _unflatten(flat: Dict[str, np.ndarray]):
    tree: Dict[str, Any] = {}
    for key, value in flat.items():
        parts = key.split("/")
        node = tree
        for p in parts[:-1]:
            node = node.setdefault(p, {})
        node[parts[-1]] = value
    return tree


@dataclasses.dataclass
class Artifact:
    params: Any
    model_config: GNNConfig
    pipeline: Optional[PreprocessingPipeline]
    extra: Dict[str, Any]


def save_artifact(
    path: str,
    params,
    model_config: GNNConfig,
    pipeline: Optional[PreprocessingPipeline] = None,
    extra: Optional[Dict[str, Any]] = None,
) -> None:
    meta = {
        "format_version": 1,
        "model_config": model_config.to_dict(),
        "preprocessing": pipeline.state_dict() if pipeline is not None else None,
        "extra": extra or {},
    }
    flat = _flatten(params)
    payload = {_PARAM_PREFIX + k: v for k, v in flat.items()}
    payload[_META_KEY] = np.frombuffer(
        json.dumps(meta).encode("utf-8"), dtype=np.uint8
    )
    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    np.savez(path if path.endswith(".npz") else path + ".npz", **payload)


def _resolve(path: str) -> str:
    if os.path.exists(path):
        return path
    if os.path.exists(path + ".npz"):
        return path + ".npz"
    raise FileNotFoundError(path)


def load_artifact(path: str) -> Artifact:
    with np.load(_resolve(path)) as data:
        meta = json.loads(bytes(data[_META_KEY].tobytes()).decode("utf-8"))
        flat = {
            k[len(_PARAM_PREFIX) :]: data[k]
            for k in data.files
            if k.startswith(_PARAM_PREFIX)
        }
    params = _unflatten(flat)
    cfg = GNNConfig.from_dict(meta["model_config"])
    pipeline = (
        PreprocessingPipeline.from_state_dict(meta["preprocessing"])
        if meta.get("preprocessing")
        else None
    )
    return Artifact(params=params, model_config=cfg, pipeline=pipeline, extra=meta.get("extra", {}))


def transfer_params(pretrained, target, verbose: bool = True) -> Tuple[Any, int, int]:
    """Copy intersecting, shape-matching leaves from ``pretrained`` into
    ``target`` — the equivalent of torch load_state_dict(strict=False)
    (reference: src/main/runner.py:716-754).

    NOTE (quirk Q4): the reference then accidentally re-initializes the
    model inside train_gnn, erasing the transfer; this framework keeps the
    transferred weights (documented deviation).
    """
    src = _flatten(pretrained)
    dst = _flatten(target)
    copied = skipped = 0
    out = dict(dst)
    for k, v in dst.items():
        if k in src and src[k].shape == v.shape:
            out[k] = src[k]
            copied += 1
        else:
            skipped += 1
    if verbose:
        print(f"[transfer] copied {copied} tensors, kept {skipped} fresh")
    return _unflatten(out), copied, skipped


# ---------------------------------------------------------------------- #
# Periodic checkpoint/resume (orbax) — not present in the reference.
# ---------------------------------------------------------------------- #


class TrainCheckpointer:
    """Periodic checkpoints of (params, opt_state, epoch) with resume."""

    def __init__(self, directory: str, keep: int = 3):
        import orbax.checkpoint as ocp

        self._ocp = ocp
        self.directory = os.path.abspath(directory)
        self.manager = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(max_to_keep=keep, create=True),
        )

    def save(
        self,
        epoch: int,
        params,
        opt_state,
        aux: Optional[Dict] = None,
        best_params=None,
    ) -> None:
        """``aux`` carries host-side training state (LR, scheduler counters,
        best-val tracking) and ``best_params`` the best-so-far weights —
        without them a run resumed AFTER its best epoch would return the
        wrong final weights when no later epoch improves (round 5)."""
        items = dict(
            params=self._ocp.args.StandardSave(params),
            opt_state=self._ocp.args.StandardSave(opt_state),
            aux=self._ocp.args.JsonSave(aux or {}),
        )
        if best_params is not None:
            items["best_params"] = self._ocp.args.StandardSave(best_params)
        self.manager.save(epoch, args=self._ocp.args.Composite(**items))

    def latest_epoch(self) -> Optional[int]:
        return self.manager.latest_step()

    def restore(self, params_template, opt_state_template):
        """Returns (epoch+?, params, opt_state, aux, best_params|None);
        best_params is None for pre-round-5 checkpoints (no item saved)."""
        step = self.manager.latest_step()
        if step is None:
            return None
        items = dict(
            params=self._ocp.args.StandardRestore(params_template),
            opt_state=self._ocp.args.StandardRestore(opt_state_template),
            aux=self._ocp.args.JsonRestore(),
        )
        try:
            meta = self.manager.item_metadata(step)
            has_best = meta is not None and "best_params" in meta
        except Exception:
            has_best = False
        if has_best:
            items["best_params"] = self._ocp.args.StandardRestore(params_template)
        restored = self.manager.restore(step, args=self._ocp.args.Composite(**items))
        return (
            step,
            restored["params"],
            restored["opt_state"],
            restored.get("aux") or {},
            restored.get("best_params") if has_best else None,
        )

    def close(self):
        self.manager.close()
