"""On-device parity check: Mosaic-compiled kernels vs the unfused path.

The test suite proves kernel math in Pallas INTERPRET mode on CPU
(tests/test_bin_mp.py, test_bin_attnpool.py, ...); this script closes the
remaining gap by running the same fused-vs-unfused forward/gradient
comparisons with the REAL Mosaic-compiled kernels on the TPU, at a
production-like shape.  Coverage (every kernel entry point, VERDICT r3
item 2):

  1. flagship config  — binned_mp_stack_t (+ proj/embed folds),
     binned attnpool/wpool kernels, vs the pure-XLA path;
  2. charges+stereo config (BASELINE.json config 3) — binned_mp_layer_t
     (the per-layer inject path), vs the pure-XLA per-layer path;
  3. ext-agg kernel — binned_mp_layer_ext_t (halo datapath: aggregation
     outside the kernel) vs binned_mp_layer_t (in-kernel aggregation) on
     identical bin data; no multi-chip needed, the kernel is per-device.

Run manually (one TPU process at a time), or via the default-on
BENCH_PARITY gate in bench.py:

    python benchmarks/tpu_kernel_parity.py

Prints one PASS/FAIL line per comparison and exits nonzero on failure.
"""

import os
import sys

import numpy as np

# the container pins PYTHONPATH to the axon site dir; make the repo
# importable regardless of cwd (same trick as bench.py)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# bf16 tolerances for fused-vs-unfused comparisons
LOSS_TOL = 5e-3
GRAD_TOL = 5e-2


def _compare(tag, ref_tag, val, ref_val, g, ref_g):
    scale = max(np.abs(ref_g).max(), 1e-6)
    loss_err = abs(val - ref_val) / max(abs(ref_val), 1e-6)
    grad_err = np.abs(g / scale - ref_g / scale).max()
    good = loss_err < LOSS_TOL and grad_err < GRAD_TOL
    print(
        f"{'PASS' if good else 'FAIL'}  {tag} vs [{ref_tag}]: "
        f"rel-loss-err={loss_err:.2e}  max-scaled-grad-err={grad_err:.2e}"
    )
    return good


def _check_model(model, batch, configs) -> bool:
    """Run the model's jitted value_and_grad under each env config; the
    LAST config is the reference; compare everything against it."""
    import jax
    import jax.flatten_util
    import jax.numpy as jnp

    def loss(p):
        out = model.apply(p, batch, deterministic=True, train_mode=True)
        mask = batch.graph_mask
        return jnp.sum(
            jnp.where(mask[:, None], out.predictions.astype(jnp.float32), 0.0) ** 2
        )

    def run():
        params = model.init(jax.random.PRNGKey(0), batch)
        val, grads = jax.jit(
            jax.value_and_grad(loss),
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": "49152"},
        )(params)
        flat, _ = jax.flatten_util.ravel_pytree(grads)
        return float(val), np.asarray(jax.device_get(flat))

    keys = sorted({k for _, env in configs for k in env})
    results = []
    for tag, env in configs:
        for k in keys:
            os.environ.pop(k, None)
        os.environ.update(env)
        val, g = run()
        results.append((tag, val, g))
        print(f"computed [{tag}]: loss={val:.6f} |g|={np.abs(g).max():.4g}")
    for k in keys:
        os.environ.pop(k, None)

    ref_tag, ref_val, ref_g = results[-1]
    ok = True
    for tag, val, g in results[:-1]:
        ok &= _compare(tag, ref_tag, val, ref_val, g, ref_g)
    return ok


def check_flagship() -> bool:
    import jax

    from aimnet_x2d_tpu.data.binning import bin_pack_batch
    from aimnet_x2d_tpu.data.synthetic import make_synthetic_batch
    from aimnet_x2d_tpu.models import GNN, GNNConfig

    cfg = GNNConfig(
        hidden_dim=512,
        output_dim=12,
        num_shells=3,
        num_message_passing_layers=3,
        embedding_dim=64,
        ffn_num_layers=3,
        pooling_type="attention",
        task_type="multitask",
        compute_dtype="bfloat16",
    )
    model = GNN(cfg)
    batch = jax.device_put(
        bin_pack_batch(
            make_synthetic_batch(
                num_graphs=2048, mean_atoms=18, num_hops=3, num_tasks=12, seed=3
            )
        )
    )
    print("== flagship config (megakernel stack + folds) ==")
    return _check_model(
        model,
        batch,
        [
            ("all kernel folds ON (training default)", {}),
            ("attnpool fold OFF", {"AIMNET_ATTNPOOL_KERNEL": "0"}),
            ("projection fold also OFF", {"AIMNET_ATTNPOOL_KERNEL": "0",
                                          "AIMNET_MP_PROJ": "0"}),
            ("megakernel also OFF (pure XLA + wpool)",
             {"AIMNET_ATTNPOOL_KERNEL": "0", "AIMNET_MP_PROJ": "0",
              "AIMNET_MP_MEGAKERNEL": "0"}),
        ],
    )


def check_inject() -> bool:
    """Charges+stereo (BASELINE.json config 3): the default path is the
    round-5 fully-fused inject kernel (ops/bin_inject.py — charge-eq,
    cis/trans, the tetrahedral polynomial, the stereo projection, the
    layer and the residual in ONE pallas op per layer per direction);
    compared against the pure-XLA per-layer reference path."""
    import jax

    from aimnet_x2d_tpu.data.binning import bin_pack_batch
    from aimnet_x2d_tpu.data.synthetic import make_synthetic_batch
    from aimnet_x2d_tpu.models import GNN, GNNConfig

    cfg = GNNConfig(
        hidden_dim=512,
        output_dim=12,
        num_shells=3,
        num_message_passing_layers=3,
        embedding_dim=64,
        ffn_num_layers=3,
        pooling_type="attention",
        task_type="multitask",
        use_partial_charges=True,
        use_stereochemistry=True,
        compute_dtype="bfloat16",
    )
    model = GNN(cfg)
    batch = jax.device_put(
        bin_pack_batch(
            make_synthetic_batch(
                num_graphs=1024, mean_atoms=18, num_hops=3, num_tasks=12,
                seed=5, with_stereo=True,
            )
        )
    )
    print("== charges+stereo config (per-layer inject kernels) ==")
    return _check_model(
        model,
        batch,
        [
            ("inject kernels ON (config-3 default)", {}),
            ("megakernel OFF (pure XLA per-layer path)",
             {"AIMNET_MP_MEGAKERNEL": "0", "AIMNET_ATTNPOOL_KERNEL": "0"}),
        ],
    )


def check_ext_agg() -> bool:
    """binned_mp_layer_ext_t (halo datapath: [xT ‖ aggT] computed outside)
    vs binned_mp_layer_t (in-kernel aggregation) on the same bin data —
    the kernel itself is per-device, so this proves the halo kernel's
    Mosaic compilation and numerics without a multi-chip mesh."""
    import jax
    import jax.flatten_util
    import jax.numpy as jnp

    from aimnet_x2d_tpu.ops.bin_mp import binned_mp_layer_ext_t, binned_mp_layer_t
    from aimnet_x2d_tpu.ops.halo import binned_local_agg_t

    D, ab, nb, n_blocks = 153, 256, 16, 2
    A = nb * ab
    dt = jnp.bfloat16
    key = jax.random.PRNGKey(7)
    ks = jax.random.split(key, 4 + 4 * n_blocks + 2)
    xT = (jax.random.normal(ks[0], (D, A), jnp.float32) * 0.5).astype(dt)
    # sparse 0/1 adjacency with a few multi-hop 2s
    adj = (jax.random.uniform(ks[1], (nb, ab, ab)) < 0.02).astype(jnp.int8)
    adj = adj + (jax.random.uniform(ks[2], (nb, ab, ab)) < 0.002).astype(jnp.int8)
    r = jax.random.normal(ks[3], (D, A), jnp.float32)  # fixed cotangent seed

    def _w(k, shape):
        return jax.random.normal(k, shape, jnp.float32) * 0.05

    ws = [
        _w(ks[4], (D, D)), _w(ks[5], (D, D)), _w(ks[6], (D,)),  # w_in0/1, b_in
        _w(ks[7], (D, D)), _w(ks[8], (D, D)), _w(ks[9], (D,)),  # w_s0/1, b_s
    ]
    for i in range(n_blocks):
        ws += [
            _w(ks[10 + 4 * i], (D, D)), _w(ks[11 + 4 * i], (D,)),
            _w(ks[12 + 4 * i], (D, D)), _w(ks[13 + 4 * i], (D,)),
        ]
    ws = tuple(ws)

    def loss_in(xT, ws):
        y = binned_mp_layer_t(
            xT, adj, ws, act="silu", num_mlp_layers=n_blocks, compute_dtype=dt
        )
        return jnp.sum(y.astype(jnp.float32) * r)

    def loss_ext(xT, ws):
        aggT = binned_local_agg_t(xT, adj, dt)
        xaT = jnp.concatenate([xT, aggT.astype(dt)], axis=0)
        y = binned_mp_layer_ext_t(
            xaT, ws, ab=ab, act="silu", num_mlp_layers=n_blocks, compute_dtype=dt
        )
        return jnp.sum(y.astype(jnp.float32) * r)

    def run(fn):
        val, (dx, dws) = jax.jit(
            jax.value_and_grad(fn, argnums=(0, 1)),
            compiler_options={"xla_tpu_scoped_vmem_limit_kib": "49152"},
        )(xT, ws)
        flat, _ = jax.flatten_util.ravel_pytree(
            [dx.astype(jnp.float32), *dws]
        )
        return float(val), np.asarray(jax.device_get(flat))

    print("== ext-agg kernel (halo datapath) vs in-kernel aggregation ==")
    v1, g1 = run(loss_in)
    print(f"computed [in-kernel agg]: loss={v1:.6f} |g|={np.abs(g1).max():.4g}")
    v2, g2 = run(loss_ext)
    print(f"computed [ext agg]: loss={v2:.6f} |g|={np.abs(g2).max():.4g}")
    return _compare("ext-agg kernel", "in-kernel agg", v2, v1, g2, g1)


def main() -> int:
    import jax

    if jax.default_backend() != "tpu":
        print("SKIP: no TPU backend (this script checks Mosaic compilation)")
        return 0

    ok = check_flagship()
    ok &= check_inject()
    ok &= check_ext_agg()
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
