"""Microbenchmark: fused_edge kernel vs XLA gather+segment-sum at flagship shapes.

Run on real TPU hardware (default env):  python benchmarks/fused_edge_bench.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

GRAPHS = int(os.environ.get("FEB_GRAPHS", 8192))
D = int(os.environ.get("FEB_D", 153))
DTYPE = os.environ.get("FEB_DTYPE", "bfloat16")


def bench(g, *args, iters=30):
    import jax

    r = g(*args)
    jax.block_until_ready(r)
    t0 = time.perf_counter()
    for _ in range(iters):
        r = g(*args)
    jax.block_until_ready(r)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    import jax
    import jax.numpy as jnp

    from aimnet_x2d_tpu.data.synthetic import make_synthetic_batch
    from aimnet_x2d_tpu.ops import segment_sum
    from aimnet_x2d_tpu.ops.fused_edge import build_layouts, fused_edge_aggregate

    batch = make_synthetic_batch(num_graphs=GRAPHS, mean_atoms=18, num_hops=3, num_tasks=1)
    A = batch.atom_type.shape[0]
    E_real = int(batch.edge_mask.sum())
    fwd, bwd = build_layouts(batch.edge_src, batch.edge_dst, batch.edge_mask, A)
    W, C = fwd.num_windows, fwd.src_local.shape[0] // fwd.num_windows
    cap = C * fwd.chunk
    waste = W * cap / max(E_real, 1)
    print(
        f"A={A} E={E_real} D={D} dtype={DTYPE} | fwd: W={W} cap={cap} sb={fwd.sb} "
        f"slot-waste={waste:.2f}x | bwd: cap={bwd.src_local.shape[0]//bwd.num_windows*bwd.chunk} sb={bwd.sb}"
    )

    x = jax.random.normal(jax.random.PRNGKey(0), (A, D), dtype=DTYPE)

    src = jnp.asarray(batch.edge_src)
    dstd = jnp.asarray(np.where(batch.edge_mask, batch.edge_dst, A))
    mask = jnp.asarray(batch.edge_mask)

    xla_f = jax.jit(
        lambda x: segment_sum(
            jnp.where(mask[:, None], x[src], 0.0).astype(jnp.float32), dstd, A,
            indices_are_sorted=True,
        )
    )
    pal_f = jax.jit(lambda x: fused_edge_aggregate(x, fwd, bwd))

    xla_g = jax.jit(jax.grad(lambda x: xla_f(x).sum()))
    pal_g = jax.jit(jax.grad(lambda x: pal_f(x).sum()))

    t_xf, t_pf = bench(xla_f, x), bench(pal_f, x)
    t_xg, t_pg = bench(xla_g, x), bench(pal_g, x)

    Dp = -(-D // 128) * 128
    mxu_flops = W * cap * (fwd.sb + fwd.window) * Dp * 2  # fwd one-hot matmuls
    dma_bytes = W * fwd.sb * Dp * (2 if DTYPE == "bfloat16" else 4)
    print(
        f"XLA    fwd {t_xf:7.3f} ms   fwd+bwd {t_xg:7.3f} ms\n"
        f"Pallas fwd {t_pf:7.3f} ms   fwd+bwd {t_pg:7.3f} ms\n"
        f"fwd kernel: {mxu_flops/t_pf*1e3/1e12:.1f} TFLOP/s one-hot-MXU, "
        f"{dma_bytes/t_pf*1e3/1e9:.0f} GB/s x-block DMA"
    )
    err = np.abs(
        np.asarray(pal_f(x), np.float32) - np.asarray(xla_f(x), np.float32)
    ).max()
    print(f"max |diff| = {err:.2e}")


if __name__ == "__main__":
    main()
