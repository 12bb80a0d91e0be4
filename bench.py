"""Benchmark: edges/sec/chip for the flagship multi-hop MP train step.

Runs the full fwd+bwd+optimizer train step of the flagship QM9 multi-task
config (BASELINE.md: metric "edges/sec/chip (multi-hop MP fwd+bwd)") on the
available accelerator and prints ONE JSON line:

    {"metric": "edges_per_sec_per_chip", "value": N, "unit": "edges/s",
     "vs_baseline": R}

Measurement validity (the round-1 number was physically impossible —
VERDICT r1 weak #1 — because the timing loop did not observe device
execution on the axon remote runtime):

- the timed loop is CHAINED (step i+1 consumes step i's params) and ends
  with a host fetch of the final loss via ``jax.device_get`` — bytes
  cannot arrive before the whole chain has executed, so the wall time
  bounds real execution regardless of how the runtime implements
  ``block_until_ready``;
- an analytic matmul FLOP count yields implied MFU; the bench FAILS
  (exit 1) if implied MFU exceeds the chip's peak — an impossible number
  is a measurement bug, not a result;
- BENCH_SWEEP=1 re-runs smaller batches in fresh subprocesses (CLAUDE.md:
  one fresh process per config) and checks time grows with work.

``vs_baseline`` compares against BENCH_BASELINE.json (the reference
publishes no numbers — BASELINE.md); absent file ⇒ this run IS the
baseline (ratio 1.0).
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

REPO = os.path.dirname(os.path.abspath(__file__))
sys.path.insert(0, REPO)
BASELINE_PATH = os.path.join(REPO, "BENCH_BASELINE.json")

NUM_GRAPHS = int(os.environ.get("BENCH_GRAPHS", 32768))
NUM_HOPS = 3
WARMUP = 3
ITERS = int(os.environ.get("BENCH_ITERS", 16))

# Approximate per-chip matmul peaks (TPU v5e: ~197 TFLOP/s bf16; fp32
# runs through multiple bf16 passes, ~1/4 rate).  Used only for the
# impossibility check and the reported MFU.
PEAK_BF16 = 197e12
PEAK_FP32 = 49e12


def _flagship_config():
    from aimnet_x2d_tpu.models import GNNConfig

    # BENCH_CHARGES_STEREO=1: BASELINE.json config 3 (3-hop MP with
    # stereochemical features + partial-charge equilibration).  The
    # per-layer charge/stereo injections run between single-layer MP
    # megakernels instead of the fully-fused stack.
    cs = os.environ.get("BENCH_CHARGES_STEREO", "0") == "1"
    return GNNConfig(
        hidden_dim=512,
        output_dim=12,
        num_shells=NUM_HOPS,
        num_message_passing_layers=3,
        embedding_dim=64,
        ffn_num_layers=3,
        pooling_type="attention",
        task_type="multitask",
        use_partial_charges=cs,
        use_stereochemistry=cs,
        activation_type=os.environ.get("BENCH_ACT", "silu"),
        shell_conv_dropout=0.0,
        ffn_dropout=0.0,
        # remat off by default: the binned layout fits 32k molecules in HBM
        # without it, and the replay costs ~12% step time (BASELINE.md)
        remat=os.environ.get("BENCH_REMAT", "0") == "1",
        compute_dtype="bfloat16" if os.environ.get("BENCH_BF16", "1") == "1" else "float32",
    )


def train_step_flops(cfg, atoms: int, edges: int, graphs: int) -> float:
    """Analytic matmul-dominated FLOP count for one fwd+bwd train step.

    Forward matmuls are counted exactly from the architecture (parity mode:
    only the 2D live rows of the (K+1)·D input projections see data);
    backward ≈ 2× forward matmuls; remat replays the MP forward once more.
    Gather/scatter adds are included at 2·E·D.  Good to ~10%, which is all
    the MFU sanity check needs.
    """
    D, H, F = cfg.x_other_dim, cfg.hidden_dim, cfg.ffn_dim
    Eemb, T = cfg.embedding_dim, cfg.final_output_dim
    fwd = 2.0 * atoms * (4 * Eemb) * H  # embedding_projection
    per_layer = 2 * (2.0 * atoms * (2 * D) * D)  # input_proj + global_skip
    per_layer += cfg.shell_conv_num_mlp_layers * 2 * (2.0 * atoms * D * D)
    per_layer += 2.0 * edges * D  # edge gather + scatter-add
    if cfg.use_stereochemistry:
        per_layer += 2.0 * atoms * (3 * D) * D  # stereochemical_embedding_2
    mp = cfg.num_message_passing_layers * per_layer
    fwd += mp
    fwd += 2.0 * atoms * H * H  # concat_self_other
    fwd += cfg.attention_num_heads * 2.0 * atoms * H  # attention scores
    fwd += 2.0 * graphs * H * F  # post_pooling_projection
    fwd += cfg.ffn_num_layers * 2 * (2.0 * graphs * F * F)
    fwd += 2.0 * graphs * F * F  # skip_transform
    fwd += 2.0 * graphs * (2 * F) * T  # output_layer
    total = 3.0 * fwd  # fwd + bwd(≈2×)
    if cfg.remat:
        total += mp  # MP layers recomputed in backward
    return total


QM9_CSV = "/root/reference/sample-data/qm9/sample-splits/test.csv"


def _real_qm9_batch(num_graphs: int, cfg):
    """Batch of real featurized QM9 molecules (hygiene row: synthetic
    mean-18-atom molecules must be representative — VERDICT r3 weak 6).
    Repeats the 13,388-molecule sample split if num_graphs exceeds it."""
    import pandas as pd

    from aimnet_x2d_tpu.data.batching import collate
    from aimnet_x2d_tpu.data.dataset import MoleculeDataset

    smiles = pd.read_csv(QM9_CSV)["smiles"].astype(str).tolist()
    reps = (num_graphs + len(smiles) - 1) // len(smiles)
    smiles = (smiles * reps)[:num_graphs]
    ds = MoleculeDataset.from_smiles(
        smiles, np.zeros((len(smiles), 12), np.float32), max_hops=NUM_HOPS
    )
    return collate(list(ds.features), ds.targets, num_hops=NUM_HOPS)


def measure(num_graphs: int, real_qm9: bool = False):
    import jax
    import jax.numpy as jnp

    from aimnet_x2d_tpu.data.synthetic import make_synthetic_batch
    from aimnet_x2d_tpu.models import GNN
    from aimnet_x2d_tpu.training import TrainConfig
    from aimnet_x2d_tpu.training.trainer import make_optimizer, make_train_step

    cfg = _flagship_config()
    model = GNN(cfg)
    if real_qm9:
        batch = _real_qm9_batch(num_graphs, cfg)
    else:
        batch = make_synthetic_batch(
            num_graphs=num_graphs,
            mean_atoms=18,
            num_hops=NUM_HOPS,
            num_tasks=12,
            seed=0,
            with_stereo=cfg.use_stereochemistry,
        )
    if os.environ.get("BENCH_BINNED", "1") == "1" and jax.default_backend() == "tpu":
        # bin-packed dense layout (data/binning.py): MP aggregation and
        # pooling as batched MXU matmuls — the fastest path
        from aimnet_x2d_tpu.data.binning import bin_pack_batch

        # size-descending packing like the training loaders (round 5,
        # AIMNET_SIZE_SORT default); BENCH_SIZE_SORT=0 restores arrival order
        batch = bin_pack_batch(
            batch, size_sort=os.environ.get("BENCH_SIZE_SORT", "1") == "1"
        )
    elif os.environ.get("BENCH_FUSED", "1") == "1" and jax.default_backend() == "tpu":
        from aimnet_x2d_tpu.data.batching import attach_fused_layouts

        batch = attach_fused_layouts(batch)
    real_edges = int(np.sum(np.asarray(batch.edge_mask)))
    real_atoms = int(np.sum(np.asarray(batch.atom_mask)))

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
    warm_loss = float(jax.device_get(loss))  # full sync before timing
    assert np.isfinite(warm_loss), f"non-finite warmup loss {warm_loss}"

    prof_dir = os.environ.get("BENCH_PROFILE")
    if prof_dir:
        jax.profiler.start_trace(prof_dir)
    t0 = time.perf_counter()
    for _ in range(ITERS):
        params, opt_state, loss, n = step(params, opt_state, device_batch, lr, rng)
    final_loss = float(jax.device_get(loss))  # chain-forcing fetch
    dt = time.perf_counter() - t0
    if prof_dir:
        jax.profiler.stop_trace()
    assert np.isfinite(final_loss)

    step_time = dt / ITERS
    flops = train_step_flops(cfg, real_atoms, real_edges, num_graphs)
    platform = jax.devices()[0].platform
    peak = PEAK_BF16 if cfg.compute_dtype == "bfloat16" else PEAK_FP32
    mfu = flops / step_time / peak if platform != "cpu" else float("nan")
    return {
        "graphs": num_graphs,
        "atoms": real_atoms,
        "edges": real_edges,
        "step_ms": step_time * 1e3,
        "edges_per_sec": real_edges / step_time,
        "flops_per_step": flops,
        "mfu": mfu,
        "platform": platform,
    }


def main():
    if len(sys.argv) > 1 and sys.argv[1] == "--single":
        r = measure(int(sys.argv[2]))
        print(json.dumps(r))
        return
    if len(sys.argv) > 1 and sys.argv[1] == "--single-qm9":
        r = measure(int(sys.argv[2]), real_qm9=True)
        print(json.dumps(r))
        return

    if os.environ.get("BENCH_PARITY", "1") == "1":
        # On-device Mosaic-vs-XLA kernel parity gate, DEFAULT-ON (VERDICT
        # r3 item 2): fwd+grad equality of every kernel entry point —
        # megakernel stack + folds, the config-3 inject layer kernel, the
        # halo ext-agg kernel — against the pure-XLA path on real
        # hardware, in a fresh subprocess (env-toggled paths).  The
        # subprocess self-skips off-TPU.  BENCH_PARITY=0 to opt out.
        out = subprocess.run(
            [
                sys.executable,
                os.path.join(REPO, "benchmarks", "tpu_kernel_parity.py"),
            ],
            text=True,
        )
        if out.returncode != 0:
            print("BENCH INVALID: on-device kernel parity FAILED", file=sys.stderr)
            sys.exit(1)
        print("# kernel parity: PASS (Mosaic vs XLA fwd+grad)", file=sys.stderr)

    r = measure(NUM_GRAPHS)
    print(
        f"# graphs={r['graphs']} atoms={r['atoms']} edges={r['edges']} "
        f"step={r['step_ms']:.2f}ms flops/step={r['flops_per_step']/1e12:.2f}T "
        f"mfu={r['mfu']*100:.1f}% platform={r['platform']}",
        file=sys.stderr,
    )
    if r["platform"] != "cpu" and r["mfu"] > 1.0:
        print(
            f"BENCH INVALID: implied MFU {r['mfu']*100:.0f}% > 100% of peak — "
            "the timing loop is not observing device execution",
            file=sys.stderr,
        )
        sys.exit(1)

    if os.environ.get("BENCH_QM9", "1") == "1" and r["platform"] != "cpu":
        # hygiene row (VERDICT r3 weak 6): one measurement on REAL
        # featurized QM9 molecules so the synthetic mean-18-atom batch is
        # demonstrably representative.  Fresh subprocess per CLAUDE.md.
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--single-qm9", "8192"],
            capture_output=True,
            text=True,
        )
        if out.returncode == 0:
            sub = json.loads(out.stdout.strip().splitlines()[-1])
            print(
                f"# real-QM9 graphs=8192 atoms={sub['atoms']} "
                f"edges={sub['edges']} step={sub['step_ms']:.2f}ms "
                f"mfu={sub['mfu']*100:.1f}%",
                file=sys.stderr,
            )
        else:
            print("# real-QM9 row FAILED (non-fatal)", file=sys.stderr)

    if os.environ.get("BENCH_SWEEP", "0") == "1":
        # batch-size linearity: time must grow with work (fresh process per
        # config per CLAUDE.md — closure/caching effects distort in-process)
        times = {r["graphs"]: r["step_ms"]}
        for n in (2048, 8192):
            out = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--single", str(n)],
                capture_output=True,
                text=True,
                check=True,
            )
            sub = json.loads(out.stdout.strip().splitlines()[-1])
            times[n] = sub["step_ms"]
            print(
                f"# sweep graphs={n} step={sub['step_ms']:.2f}ms "
                f"mfu={sub['mfu']*100:.1f}%",
                file=sys.stderr,
            )
        if r["platform"] != "cpu" and times[NUM_GRAPHS] < 1.5 * times.get(8192, 0):
            print(
                f"BENCH SUSPECT: {NUM_GRAPHS} graphs not ≥1.5× slower than 8192 "
                f"({times[NUM_GRAPHS]:.2f} vs {times.get(8192):.2f} ms) — "
                "sublinear beyond plausibility",
                file=sys.stderr,
            )
            sys.exit(1)

    edges_per_sec = r["edges_per_sec"]
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


if __name__ == "__main__":
    main()
