"""On-device parity check: Mosaic-compiled kernels vs the unfused path.

The test suite proves kernel math in Pallas INTERPRET mode on CPU
(tests/test_bin_mp.py, test_bin_attnpool.py, ...); this script closes the
remaining gap by running the same fused-vs-unfused forward/gradient
comparisons with the REAL Mosaic-compiled kernels on the TPU, at a
production-like shape.  Run manually (one TPU process at a time):

    python benchmarks/tpu_kernel_parity.py

Prints one PASS/FAIL line per comparison and exits nonzero on failure.
"""

import os
import sys

import numpy as np

# the container pins PYTHONPATH to the axon site dir; make the repo
# importable regardless of cwd (same trick as bench.py)
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    import jax
    import jax.flatten_util
    import jax.numpy as jnp

    from aimnet_x2d_tpu.data.binning import bin_pack_batch
    from aimnet_x2d_tpu.data.synthetic import make_synthetic_batch
    from aimnet_x2d_tpu.models import GNN, GNNConfig

    if jax.default_backend() != "tpu":
        print("SKIP: no TPU backend (this script checks Mosaic compilation)")
        return 0

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
    batch = bin_pack_batch(
        make_synthetic_batch(
            num_graphs=2048, mean_atoms=18, num_hops=3, num_tasks=12, seed=3
        )
    )
    batch = jax.device_put(batch)

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

    configs = [
        ("all kernel folds ON (training default)", {}),
        ("attnpool fold OFF", {"AIMNET_ATTNPOOL_KERNEL": "0"}),
        ("projection fold also OFF", {"AIMNET_ATTNPOOL_KERNEL": "0",
                                      "AIMNET_MP_PROJ": "0"}),
        ("megakernel also OFF (pure XLA + wpool)",
         {"AIMNET_ATTNPOOL_KERNEL": "0", "AIMNET_MP_PROJ": "0",
          "AIMNET_MP_MEGAKERNEL": "0"}),
    ]
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
    scale = max(np.abs(ref_g).max(), 1e-6)
    ok = True
    for tag, val, g in results[:-1]:
        loss_err = abs(val - ref_val) / max(abs(ref_val), 1e-6)
        grad_err = np.abs(g / scale - ref_g / scale).max()
        good = loss_err < 5e-3 and grad_err < 5e-2  # bf16 tolerances
        ok &= good
        print(
            f"{'PASS' if good else 'FAIL'}  {tag} vs [{ref_tag}]: "
            f"rel-loss-err={loss_err:.2e}  max-scaled-grad-err={grad_err:.2e}"
        )
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
