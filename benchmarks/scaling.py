"""Scaling-efficiency benchmark: edges/sec vs mesh size.

BASELINE.md target: ≥80% edges/s scaling efficiency from 1 host to 2
hosts.  On a pod slice this measures the real data-parallel (and
optionally edge-partitioned) train step over growing meshes; on a single
chip it degenerates to the 1-device row; with
``JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8``
it validates the sharded step's mechanics on a virtual mesh (timings are
then CPU-bound and not meaningful as TPU numbers).

Usage:  python benchmarks/scaling.py [--graphs-per-device 4096] [--edge-shards 1]
"""

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--graphs-per-device", type=int, default=4096)
    ap.add_argument("--edge-shards", type=int, default=1)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from aimnet_x2d_tpu.data.batching import shard_edges
    from aimnet_x2d_tpu.data.synthetic import make_synthetic_batch
    from aimnet_x2d_tpu.models import GNN, GNNConfig
    from aimnet_x2d_tpu.parallel import create_mesh
    from aimnet_x2d_tpu.parallel.graph_parallel import make_graph_parallel_train_step
    from aimnet_x2d_tpu.training import TrainConfig
    from aimnet_x2d_tpu.training.trainer import make_optimizer, make_train_step

    n_total = len(jax.devices())
    cfg = GNNConfig(
        hidden_dim=512, output_dim=12, num_shells=3, num_message_passing_layers=3,
        embedding_dim=64, ffn_num_layers=3, pooling_type="attention",
        task_type="multitask", shell_conv_dropout=0.0, ffn_dropout=0.0, remat=True,
    )
    model = GNN(cfg)
    tc = TrainConfig(learning_rate=1e-4, task_type="multitask")

    sizes = [n for n in (1, 2, 4, 8, 16, 32) if n <= n_total]
    base_rate = None
    print(f"devices available: {n_total}  graphs/device: {args.graphs_per_device}")
    for n_dev in sizes:
        n_graph = args.edge_shards if n_dev % args.edge_shards == 0 and n_dev >= args.edge_shards else 1
        n_data = n_dev // n_graph
        mesh = create_mesh(num_data=n_data, num_graph=n_graph, devices=jax.devices()[:n_dev])

        shards = []
        slot_kw = {}
        for d in range(n_data):
            b = make_synthetic_batch(
                num_graphs=args.graphs_per_device, mean_atoms=18, num_hops=3,
                num_tasks=12, seed=d, **slot_kw,
            )
            if not slot_kw:
                # pin every later shard to the first shard's bucket shapes
                slot_kw = dict(
                    atom_slots=b.num_atom_slots * 2,
                    edge_slots=b.edge_src.shape[0] * 2,
                    tet_slots=b.tet_nbrs.shape[0],
                    pair_slots=b.cis_pairs.shape[0],
                )
                b = make_synthetic_batch(
                    num_graphs=args.graphs_per_device, mean_atoms=18, num_hops=3,
                    num_tasks=12, seed=d, **slot_kw,
                )
            if n_graph > 1:
                parts = shard_edges(b, n_graph)
                b = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *parts)
            shards.append(b)
        stacked = jax.tree_util.tree_map(lambda *xs: np.stack(xs), *shards)
        edges = int(np.sum(np.asarray(stacked.edge_mask)))

        first = jax.tree_util.tree_map(
            lambda x: x[0, 0] if n_graph > 1 else x[0], stacked
        )
        params = model.init(jax.random.PRNGKey(0), first)
        opt = make_optimizer(tc, params)
        opt_state = opt.init(params)
        if n_graph > 1:
            step = make_graph_parallel_train_step(model, tc, opt, mesh)
        elif n_dev > 1:
            step = make_train_step(model, tc, opt, mesh=mesh)
        else:
            step = make_train_step(model, tc, opt, mesh=None)
            stacked = jax.tree_util.tree_map(lambda x: x[0], stacked)

        lr = jnp.float32(1e-4)
        rng = jax.random.PRNGKey(1)
        for _ in range(3):
            params, opt_state, loss, n = step(params, opt_state, stacked, lr, rng)
        jax.block_until_ready(loss)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            params, opt_state, loss, n = step(params, opt_state, stacked, lr, rng)
        jax.block_until_ready(loss)
        dt = (time.perf_counter() - t0) / args.iters
        rate = edges / dt
        if base_rate is None:
            base_rate = rate
        eff = rate / (base_rate * n_dev) * 100
        print(
            f"mesh {n_data}x{n_graph}: {dt*1e3:7.2f} ms/step  "
            f"{rate/1e9:6.2f}B edges/s  efficiency {eff:5.1f}%"
        )


if __name__ == "__main__":
    main()
