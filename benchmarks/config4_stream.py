"""BASELINE.json config 4: out-of-core streaming HDF5 training, single host.

Builds a synthetic multi-million-molecule dataset through the
constant-memory streaming writer (``write_hdf5_streaming`` — peak RAM is
one featurize chunk), then trains the flagship model through
``HDF5BatchLoader``'s native binned path with the trainer's prefetch
thread, measuring:

  * writer throughput (featurize → HDF5, mol/s)
  * loader-only throughput (block reads + native binned batch build)
  * end-to-end step time and whether the loader hides under the device
    step (overlap headroom)
  * peak host RSS — must stay far below the dataset's in-memory footprint

Run on the TPU (one process):  python benchmarks/config4_stream.py [n_mols]
The reference equivalent is the pickled-blob HDF5 iterable pipeline
(reference: src/datasets/features.py:381-613 + src/datasets/molecular.py).
"""

import os
import resource
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def rss_gb() -> float:
    return resource.getrusage(resource.RUSAGE_SELF).ru_maxrss / 1e6


SMILES_POOL = [
    "CCCCCC", "CCCCCCC", "CCCCCCCC", "CC(C)CCCC", "CCC(C)CC",
    "CCOCC", "CCCOC", "CCNCC", "CCCNC", "CC(=O)CC", "CCC(=O)C",
    "c1ccccc1", "Cc1ccccc1", "CCc1ccccc1", "c1ccncc1", "Cc1ccncc1",
    "OCC(O)CO", "CC(N)C(=O)O", "CCOC(=O)C", "CC(C)(C)CC",
]


def main() -> int:
    n_mols = int(sys.argv[1]) if len(sys.argv) > 1 else 2_000_000
    import jax
    import jax.numpy as jnp

    from aimnet_x2d_tpu.data import hdf5 as h5mod
    from aimnet_x2d_tpu.models import GNN, GNNConfig
    from aimnet_x2d_tpu.training import TrainConfig
    from aimnet_x2d_tpu.training.trainer import (
        make_optimizer,
        make_train_step,
        prefetch_batches,
    )

    path = os.environ.get("CFG4_PATH", "/tmp/config4_stream.h5")
    rng = np.random.default_rng(0)

    if not os.path.exists(path):
        smiles = [SMILES_POOL[i] for i in rng.integers(0, len(SMILES_POOL), n_mols)]
        targets = rng.normal(size=(n_mols, 12)).astype(np.float32)
        t0 = time.perf_counter()
        kept = h5mod.write_hdf5_streaming(
            path, smiles, targets, max_hops=3, chunk_size=65536, num_workers=2
        )
        dt = time.perf_counter() - t0
        print(
            f"# writer: {kept} mols in {dt:.1f}s = {kept/dt:.0f} mol/s, "
            f"file {os.path.getsize(path)/1e9:.2f} GB, peak RSS {rss_gb():.2f} GB"
        )

    ds = h5mod.HDF5MoleculeDataset(path)
    loader = h5mod.HDF5BatchLoader(
        ds, batch_size=8192, shuffle=True, seed=1, drop_last=True
    )
    # round-5: exact pin preseeding over the simulated epochs — mid-run
    # bin-pin growth (a minutes-long remote recompile each) was the
    # dominant term in the round-4 849.9 ms/step MEAN (BASELINE.md)
    t0 = time.perf_counter()
    loader.warm_bin_pins(epochs=8)
    pins_warm = dict(loader._bin_pins)
    print(
        f"# dataset: {len(ds)} molecules, binned={loader.binned}, "
        f"pins={loader._bin_pins} (warmed over 8 epochs in "
        f"{time.perf_counter()-t0:.1f}s), "
        f"builder workers={loader._loader_workers()}"
    )

    # loader-only throughput (no device work)
    t0 = time.perf_counter()
    mols = 0
    for i, b in enumerate(loader):
        mols += int(np.asarray(b.graph_mask).sum())
        if i == 39:
            break
    dt = time.perf_counter() - t0
    loader_rate = mols / dt
    print(f"# loader-only: {loader_rate:.0f} mol/s ({dt/40*1e3:.1f} ms/batch)")

    cfg = GNNConfig(
        hidden_dim=512, output_dim=12, num_shells=3,
        num_message_passing_layers=3, embedding_dim=64, ffn_num_layers=3,
        pooling_type="attention", task_type="multitask",
        shell_conv_dropout=0.0, ffn_dropout=0.0, compute_dtype="bfloat16",
    )
    model = GNN(cfg)
    tc = TrainConfig(learning_rate=1e-4, task_type="multitask")
    first = next(iter(loader))
    params = model.init(jax.random.PRNGKey(0), first)
    opt = make_optimizer(tc, params)
    opt_state = opt.init(params)
    step = make_train_step(model, tc, opt, mesh=None)

    # end-to-end: prefetch thread + jitted step (the trainer's real path).
    # Per-step times are recorded individually: on the axon remote runtime
    # every NEW shape bucket (bin-count ladder step) pays a minutes-long
    # remote compile mid-run, so the mean is meaningless — report the
    # median/p90 steady state and the outlier count separately.
    n_steps = 0
    loss = None
    times = []
    target_steps = int(os.environ.get("CFG4_STEPS", "103"))
    for epoch in range(1000):
        loader.set_epoch(epoch)
        for batch, _ in prefetch_batches(loader, None):
            t0 = time.perf_counter()
            params, opt_state, loss, n = step(
                params, opt_state, batch, jnp.float32(1e-4), jax.random.PRNGKey(1)
            )
            loss.block_until_ready()
            times.append(time.perf_counter() - t0)
            n_steps += 1
            if n_steps >= target_steps:
                break
        if n_steps >= target_steps:
            break
    warm = np.array(times[3:])
    med = float(np.median(warm)) * 1e3
    p90 = float(np.percentile(warm, 90)) * 1e3
    outliers = int(np.sum(warm > 4 * np.median(warm)))
    e2e_rate = 8192 / (med / 1e3)
    pins_after = dict(loader._bin_pins)
    print(
        f"# train e2e: median {med:.1f} ms/step (p90 {p90:.1f}, "
        f"{outliers} recompile outliers of {len(warm)}) at 8192 mols = "
        f"{e2e_rate:.0f} mol/s steady-state "
        f"(loader alone {loader_rate:.0f} mol/s -> "
        f"{'loader-bound' if loader_rate < 1.05 * e2e_rate else 'device-bound, loader hidden'}), "
        f"loss={float(loss):.4f}, peak RSS {rss_gb():.2f} GB"
    )
    print(
        f"# pins after run: {pins_after} — "
        f"{'STABLE (zero mid-run pin recompiles)' if pins_after == pins_warm else 'GREW (pin recompile occurred!)'}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
