"""Preemption-robustness end to end (VERDICT r4 #8; beyond the reference —
SURVEY §5 lists checkpoint/resume as a day-1 infra gap there: training
that dies restarts from scratch, reference src/training/trainer.py holds
best state only in RAM).

A training run is SIGKILLed mid-epoch in a subprocess, rerun with the
same command (auto-resume from the orbax checkpoint), and the resumed
run's final artifact must match the uninterrupted run's bit-for-bit-ish:
with zero dropout the step is a deterministic function of (params,
batches), epoch shuffles are seeded by (seed, epoch), and the checkpoint
carries params + opt_state + scheduler/LR/early-stop aux + best_params.
"""

import os
import signal
import subprocess
import sys
import time

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CSV = "/root/reference/sample-data/qm9/sample-splits/val.csv"


def _write_subset(path, n=240):
    with open(CSV) as f:
        lines = f.readlines()
    with open(path, "w") as f:
        f.writelines(lines[: n + 1])


def _cmd(data_csv, model_path, ckpt_dir):
    return [
        sys.executable,
        os.path.join(REPO, "main.py"),
        "--data_path", data_csv,
        "--target_column", "gap",
        "--epochs", "6",
        "--batch_size", "32",
        "--hidden_dim", "48",
        "--embedding_dim", "12",
        "--num_message_passing_layers", "2",
        "--pooling_type", "mean",
        "--ffn_dropout", "0",
        "--shell_conv_dropout", "0",
        "--checkpoint_dir", ckpt_dir,
        "--checkpoint_every", "2",
        "--model_save_path", model_path,
    ]


def _env():
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    env.pop("PYTHONPATH", None)
    env.pop("XLA_FLAGS", None)  # single CPU device, like the real CLI
    return env


def _params_of(npz_path):
    with np.load(npz_path) as z:
        return {k: z[k] for k in z.files if k.startswith("param/")}


@pytest.mark.skipif(not os.path.exists(CSV), reason="sample data unavailable")
def test_kill_resume_matches_uninterrupted(tmp_path):
    data = str(tmp_path / "data.csv")
    _write_subset(data)

    # --- reference: uninterrupted run ---
    ref_model = str(tmp_path / "ref.npz")
    r = subprocess.run(
        _cmd(data, ref_model, str(tmp_path / "ck_ref")),
        env=_env(), capture_output=True, text=True, timeout=600,
    )
    assert r.returncode == 0, r.stdout[-2000:] + r.stderr[-2000:]

    # --- preempted run: SIGKILL mid-epoch once past a checkpoint ---
    pre_model = str(tmp_path / "pre.npz")
    ck_dir = str(tmp_path / "ck_pre")
    p = subprocess.Popen(
        _cmd(data, pre_model, ck_dir),
        env=_env(), stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True,
    )
    killed = False
    deadline = time.time() + 600
    for line in p.stdout:
        # checkpoint_every=2 → a checkpoint exists after epoch 1; the
        # epoch-3 banner prints at epoch-3 END, so killing right after it
        # lands mid-epoch-4 (uncheckpointed work is in flight)
        if "[epoch   3]" in line:
            time.sleep(0.5)  # into epoch 4's step loop
            p.send_signal(signal.SIGKILL)
            killed = True
            break
        assert time.time() < deadline
    p.wait(timeout=60)
    assert killed, "never reached epoch 3"
    assert p.returncode != 0
    assert not os.path.exists(pre_model), "artifact must not exist yet"

    # --- resume: same command, auto-restores from ck_dir ---
    r2 = subprocess.run(
        _cmd(data, pre_model, ck_dir),
        env=_env(), capture_output=True, text=True, timeout=600,
    )
    assert r2.returncode == 0, r2.stdout[-2000:] + r2.stderr[-2000:]
    assert "[resume] restored checkpoint at epoch" in r2.stdout

    ref = _params_of(ref_model)
    res = _params_of(pre_model)
    assert set(ref) == set(res)
    for k in ref:
        np.testing.assert_allclose(
            res[k], ref[k], rtol=1e-5, atol=1e-6,
            err_msg=f"resumed run diverged from uninterrupted run at {k}",
        )
