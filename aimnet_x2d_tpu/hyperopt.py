"""YAML-driven random hyperparameter search
(reference: src/main/hyperopt.py:28-506).

Search-space semantics match the reference sampler (hyperopt.py:139-164):
  param: [a, b, c]                          → uniform choice
  param: {type: int, min: 2, max: 8}        → uniform integer
  param: {type: float, min: .., max: .., log: true} → (log-)uniform float
  param: {type: choice, values: [...]}      → uniform choice

Each trial deep-copies the base args, applies the sample, runs the full
training pipeline, and tracks the best validation loss; the best artifact
is saved once at the end and verified by reloading.
"""

from __future__ import annotations

import copy
import json
import math
import os
import random
import time
from typing import Any, Dict, List

import numpy as np


def sample_hparam_value(rng: random.Random, spec: Any) -> Any:
    if isinstance(spec, list):
        return rng.choice(spec)
    if isinstance(spec, dict):
        t = spec.get("type")
        if t == "int":
            return rng.randint(int(spec["min"]), int(spec["max"]))
        if t == "float":
            lo, hi = float(spec["min"]), float(spec["max"])
            if spec.get("log"):
                return math.exp(rng.uniform(math.log(lo), math.log(hi)))
            return rng.uniform(lo, hi)
        if t == "choice":
            return rng.choice(spec["values"])
        raise ValueError(f"Unknown hyperparameter spec type: {t}")
    return spec  # constant


def run_hyperparameter_optimization(args) -> Dict[str, Any]:
    import yaml

    from .checkpoint import load_artifact, save_artifact
    from .cli import postprocess_arguments
    from .runner import main_runner

    with open(args.hyperparameter_file) as f:
        space: Dict[str, Any] = yaml.safe_load(f)

    rng = random.Random(args.seed)
    results: List[Dict[str, Any]] = []
    best = {"val_loss": float("inf"), "trial": -1, "config": None, "summary": None}

    for trial in range(args.num_trials):
        sampled = {k: sample_hparam_value(rng, v) for k, v in space.items()}
        trial_args = copy.deepcopy(args)
        for k, v in sampled.items():
            setattr(trial_args, k, v)
        # re-derive coupled defaults from their (possibly sampled) sources:
        # postprocess_arguments only fills them when None, and the base args
        # were already postprocessed once
        for derived, source in (
            ("ffn_hidden_dim", "hidden_dim"),
            ("precompute_num_workers", "num_workers"),
            ("stream_batch_size", "batch_size"),
        ):
            if source in sampled and derived not in sampled:
                setattr(trial_args, derived, None)
        trial_args.hyperparameter_file = None
        trial_args.num_trials = 1
        trial_args.seed = args.seed + trial
        trial_args.model_save_path = args.model_save_path + f".trial{trial}"
        trial_args = postprocess_arguments(trial_args)

        # per-trial HDF5 isolation (reference: src/trial_utils.py:18-84):
        # featurization depends on sampled num_shells, so streaming trials
        # must not share HDF5 files; each gets a temp dir, removed after.
        tmp_dir = None
        if getattr(trial_args, "iterable_dataset", False):
            import tempfile

            tmp_dir = tempfile.mkdtemp(prefix=f"aimnet_hyperopt_trial{trial}_")
            for attr in ("train_hdf5", "val_hdf5", "test_hdf5"):
                base = os.path.basename(getattr(trial_args, attr) or f"{attr}.h5")
                setattr(trial_args, attr, os.path.join(tmp_dir, base))

        print(f"\n===== trial {trial + 1}/{args.num_trials}: {sampled} =====")
        t0 = time.time()
        try:
            summary = main_runner(trial_args)
            val_loss = summary["best_val_loss"]
        except Exception as e:
            print(f"[trial {trial}] FAILED: {type(e).__name__}: {e}")
            results.append({"trial": trial, "config": sampled, "status": "failed",
                            "error": str(e)})
            continue
        finally:
            if tmp_dir is not None:
                import shutil

                shutil.rmtree(tmp_dir, ignore_errors=True)

        results.append(
            {
                "trial": trial,
                "config": sampled,
                "status": "ok",
                "val_loss": val_loss,
                "test_metrics": {
                    k: v for k, v in summary["test_metrics"].items()
                    if not isinstance(v, dict)
                },
                "seconds": time.time() - t0,
            }
        )
        if val_loss < best["val_loss"]:
            best = {
                "val_loss": val_loss,
                "trial": trial,
                "config": sampled,
                "artifact": trial_args.model_save_path,
            }

    if best["trial"] >= 0:
        # promote best trial artifact to the final path and verify it loads
        art = load_artifact(best["artifact"])
        save_artifact(
            args.model_save_path,
            art.params,
            art.model_config,
            art.pipeline,
            extra={**art.extra, "hyperopt_best_trial": best["trial"],
                   "hyperopt_config": best["config"]},
        )
        reloaded = load_artifact(args.model_save_path)
        assert reloaded.model_config == art.model_config, "artifact verification failed"
        print(
            f"\n[hyperopt] best trial {best['trial']} "
            f"(val_loss {best['val_loss']:.5f}) → {args.model_save_path}"
        )
        # clean up per-trial artifacts
        for r in results:
            p = args.model_save_path + f".trial{r['trial']}"
            for cand in (p, p + ".npz"):
                if os.path.exists(cand):
                    os.remove(cand)

    out_path = args.model_save_path + ".hyperopt_results.json"
    with open(out_path, "w") as f:
        json.dump({"results": results, "best": {k: v for k, v in best.items()}}, f,
                  indent=2, default=str)
    print(f"[hyperopt] results → {out_path}")
    return {"results": results, "best": best}
