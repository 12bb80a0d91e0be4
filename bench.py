"""Benchmark: edges/sec/chip for the flagship multi-hop MP train step.

Runs the full fwd+bwd+optimizer train step of the flagship QM9 multi-task
config (BASELINE.md: metric "edges/sec/chip (multi-hop MP fwd+bwd)") on the
available accelerator and prints ONE JSON line:

    {"metric": "edges_per_sec_per_chip", "value": N, "unit": "edges/s",
     "vs_baseline": R}

``vs_baseline`` is measured against the self-recorded baseline in
BENCH_BASELINE.json (the reference publishes no numbers — BASELINE.md); if
the file is absent the run IS the baseline (ratio 1.0).
"""

import json
import os
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
BASELINE_PATH = os.path.join(REPO, "BENCH_BASELINE.json")

# Production-config defaults: 32768 molecules (~590k atoms, ~3.5M edges)
# per chip with rematerialized MP layers and bf16 activations — the largest
# batch that fits v5e HBM for the fwd+bwd step.  Smaller batches are
# dispatch-latency-bound (~0.6 ms launch overhead vs <0.15 ms compute at
# 1024 molecules).  Override via BENCH_GRAPHS / BENCH_REMAT / BENCH_BF16.
NUM_GRAPHS = int(os.environ.get("BENCH_GRAPHS", 32768))
NUM_HOPS = 3
WARMUP = 3
ITERS = int(os.environ.get("BENCH_ITERS", 20))


def main():
    import jax
    import jax.numpy as jnp

    from aimnet_x2d_tpu.data.synthetic import make_synthetic_batch
    from aimnet_x2d_tpu.models import GNN, GNNConfig
    from aimnet_x2d_tpu.training import TrainConfig
    from aimnet_x2d_tpu.training.trainer import make_optimizer, make_train_step

    cfg = GNNConfig(
        hidden_dim=512,
        output_dim=12,
        num_shells=NUM_HOPS,
        num_message_passing_layers=3,
        embedding_dim=64,
        ffn_num_layers=3,
        pooling_type="attention",
        task_type="multitask",
        shell_conv_dropout=0.0,
        ffn_dropout=0.0,
        remat=os.environ.get("BENCH_REMAT", "1") == "1",
        compute_dtype="bfloat16" if os.environ.get("BENCH_BF16", "1") == "1" else "float32",
    )
    model = GNN(cfg)
    batch = make_synthetic_batch(
        num_graphs=NUM_GRAPHS, mean_atoms=18, num_hops=NUM_HOPS, num_tasks=12, seed=0
    )
    real_edges = int(np.sum(np.asarray(batch.edge_mask)))

    tc = TrainConfig(learning_rate=1e-4, task_type="multitask")
    params = model.init(jax.random.PRNGKey(0), batch)
    opt = make_optimizer(tc, params)
    opt_state = opt.init(params)
    step = make_train_step(model, tc, opt, mesh=None)

    lr = jnp.float32(1e-4)
    rng = jax.random.PRNGKey(1)
    device_batch = jax.device_put(batch)

    for _ in range(WARMUP):
        params, opt_state, loss, n = step(params, opt_state, device_batch, lr, rng)
    jax.block_until_ready(loss)

    t0 = time.perf_counter()
    for _ in range(ITERS):
        params, opt_state, loss, n = step(params, opt_state, device_batch, lr, rng)
    jax.block_until_ready(loss)
    dt = time.perf_counter() - t0

    step_time = dt / ITERS
    edges_per_sec = real_edges / step_time

    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            baseline = json.load(f)["edges_per_sec_per_chip"]
        vs = edges_per_sec / baseline
    else:
        vs = 1.0

    print(
        json.dumps(
            {
                "metric": "edges_per_sec_per_chip",
                "value": round(edges_per_sec, 1),
                "unit": "edges/s",
                "vs_baseline": round(vs, 4),
            }
        )
    )
    print(
        f"# step={step_time*1e3:.2f} ms  edges={real_edges}  "
        f"graphs={NUM_GRAPHS}  device={jax.devices()[0].platform}",
        file=sys.stderr,
    )


if __name__ == "__main__":
    main()
