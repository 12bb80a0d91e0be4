"""Microbenchmark: Pallas windowed segment-sum vs XLA fused gather+scatter.

Run on real TPU hardware (default env):  python benchmarks/pallas_vs_xla.py
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))


def main():
    import jax
    import jax.numpy as jnp

    from aimnet_x2d_tpu.data.synthetic import make_synthetic_batch
    from aimnet_x2d_tpu.ops import segment_sum
    from aimnet_x2d_tpu.ops.pallas_segment import (
        pallas_windowed_segment_sum,
        windowed_layout,
    )

    batch = make_synthetic_batch(num_graphs=1024, mean_atoms=18, num_hops=3, num_tasks=1)
    A = batch.atom_type.shape[0]
    D = 256
    x = jax.random.normal(jax.random.PRNGKey(0), (A, D))
    E_real = int(batch.edge_mask.sum())

    def bench(g, *args, iters=50):
        r = g(*args)
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        for _ in range(iters):
            r = g(*args)
        jax.block_until_ready(r)
        return (time.perf_counter() - t0) / iters * 1e3

    src = jnp.asarray(batch.edge_src)
    dst_dropped = jnp.asarray(np.where(batch.edge_mask, batch.edge_dst, A))
    mask = jnp.asarray(batch.edge_mask)
    xla = jax.jit(
        lambda x, s, d, m: segment_sum(jnp.where(m[:, None], x[s], 0.0), d, A)
    )
    t_xla = bench(xla, x, src, dst_dropped, mask)

    window = chunk = 256
    src_perm, seg_local, W, cap = windowed_layout(
        batch.edge_src, batch.edge_dst, batch.edge_mask, A, window=window, chunk=chunk
    )
    sp, sl = jnp.asarray(src_perm), jnp.asarray(seg_local)
    pal = jax.jit(
        lambda x, sp, sl: pallas_windowed_segment_sum(
            x, sp, sl, A, W, cap, window=window, chunk=chunk, exact=True
        )
    )
    t_pal = bench(pal, x, sp, sl)
    pal_fast = jax.jit(
        lambda x, sp, sl: pallas_windowed_segment_sum(
            x, sp, sl, A, W, cap, window=window, chunk=chunk, exact=False
        )
    )
    t_fast = bench(pal_fast, x, sp, sl)
    print(f"Pallas bf16-operand variant: {t_fast:.3f} ms")

    # correctness on-device
    a = np.asarray(xla(x, src, dst_dropped, mask))
    b = np.asarray(pal(x, sp, sl))[:A]
    err = np.abs(a - b).max()
    print(
        f"A={A} E={E_real} D={D} cap={cap} W={W}\n"
        f"XLA fused gather+scatter: {t_xla:.3f} ms ({E_real/t_xla*1e3/1e6:.0f}M edges/s)\n"
        f"Pallas windowed one-hot : {t_pal:.3f} ms ({E_real/t_pal*1e3/1e6:.0f}M edges/s)\n"
        f"max |diff| = {err:.2e}"
    )


if __name__ == "__main__":
    main()
