"""Prototype: binned dense-adjacency formulation vs current ops, on real TPU.

Measures (flagship-ish shapes, 8192 mols / ~147k atoms / ~886k edges):
  1. MP aggregation: per-bin adjacency batched-matmul einsum fwd / fwd+bwd
  2. attention pooling: binned dense einsums vs segment-scatter version
  3. embedding: take-fwd + one-hot-matmul bwd vs plain take (scatter bwd)
  4. host->device transfer cost of the int8 adjacency
"""

import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

AB = int(os.environ.get("PB_AB", 256))      # atom slots per bin
GRAPHS = int(os.environ.get("PB_GRAPHS", 8192))
D = 153
H = 4


def bench(g, *args, iters=20):
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
    from aimnet_x2d_tpu.ops import segment_sum, segment_softmax

    batch = make_synthetic_batch(num_graphs=GRAPHS, mean_atoms=18, num_hops=3, num_tasks=1)
    n_atoms = np.asarray(batch.atom_mask).reshape(-1)
    atom_mol = np.asarray(batch.atom_mol)
    edge_src = np.asarray(batch.edge_src)
    edge_dst = np.asarray(batch.edge_dst)
    edge_mask = np.asarray(batch.edge_mask)

    # ---- host: greedy bin packing of whole molecules ----
    t0 = time.perf_counter()
    mol_sizes = np.bincount(atom_mol[n_atoms], minlength=GRAPHS)
    starts = np.concatenate([[0], np.cumsum(mol_sizes)[:-1]])
    bin_of_mol = np.zeros(GRAPHS, np.int32)
    newstart = np.zeros(GRAPHS, np.int64)  # new atom start of each mol
    b, fill = 0, 0
    for m in range(GRAPHS):
        s = mol_sizes[m]
        if fill + s > AB:
            b += 1
            fill = 0
        bin_of_mol[m] = b
        newstart[m] = b * AB + fill
        fill += s
    nbins = b + 1
    A2 = nbins * AB
    # old atom index -> new atom index
    old2new = np.full(atom_mol.shape[0] + 1, A2, np.int64)
    for m in range(GRAPHS):
        s = mol_sizes[m]
        old2new[starts[m] : starts[m] + s] = newstart[m] + np.arange(s)
    t_pack = (time.perf_counter() - t0) * 1e3

    # ---- host: per-bin adjacency (int8 multiplicity) ----
    t0 = time.perf_counter()
    es = old2new[edge_src[edge_mask]]
    ed = old2new[edge_dst[edge_mask]]
    bin_id = ed // AB
    flat = bin_id * AB * AB + (ed % AB) * AB + (es % AB)
    adj = np.bincount(flat, minlength=nbins * AB * AB).astype(np.int8)
    adj = adj.reshape(nbins, AB, AB)
    t_adj = (time.perf_counter() - t0) * 1e3
    E = es.shape[0]
    print(f"bins={nbins} A2={A2} (was {atom_mol.shape[0]}) E={E} "
          f"pack={t_pack:.1f}ms adj_build={t_adj:.1f}ms adj={adj.nbytes/1e6:.1f}MB")

    # ---- device arrays ----
    x2 = jax.random.normal(jax.random.PRNGKey(0), (nbins, AB, D), dtype=jnp.bfloat16)
    t0 = time.perf_counter()
    adj_d = jax.device_put(adj)
    jax.block_until_ready(adj_d)
    t_put = (time.perf_counter() - t0) * 1e3
    print(f"device_put(adj int8 {adj.nbytes/1e6:.0f}MB): {t_put:.1f}ms")

    # 1. MP aggregation: einsum
    def agg(x, a):
        return jnp.einsum(
            "bij,bjd->bid", a.astype(jnp.bfloat16), x,
            preferred_element_type=jnp.float32,
        )

    agg_j = jax.jit(agg)
    agg_g = jax.jit(jax.grad(lambda x, a: agg(x, a).astype(jnp.float32).sum(), argnums=0))
    t_f = bench(agg_j, x2, adj_d)
    t_fb = bench(agg_g, x2, adj_d)
    flops = 2.0 * nbins * AB * AB * D
    print(f"[1] adj einsum  fwd {t_f:7.3f} ms ({flops/t_f*1e3/1e12:.1f} TF/s)   "
          f"fwd+bwd {t_fb:7.3f} ms")

    # reference: current XLA segment path on the same (flat) problem
    A = atom_mol.shape[0]
    xf = jax.random.normal(jax.random.PRNGKey(0), (A, D), dtype=jnp.bfloat16)
    srcd = jnp.asarray(edge_src)
    dstd = jnp.asarray(np.where(edge_mask, edge_dst, A))
    maskd = jnp.asarray(edge_mask)
    xla_f = jax.jit(lambda x: segment_sum(
        jnp.where(maskd[:, None], x[srcd], 0.0).astype(jnp.float32), dstd, A,
        indices_are_sorted=True))
    print(f"    (XLA gather+scatter fwd: {bench(xla_f, xf):7.3f} ms)")

    # 2. attention pooling, binned dense
    MB = int(os.environ.get("PB_MB", 48))
    pool_oh = np.zeros((nbins, MB, AB), np.int8)
    local_mol = np.zeros(GRAPHS, np.int32)
    cnt = np.zeros(nbins, np.int32)
    overflow = 0
    for m in range(GRAPHS):
        bb = bin_of_mol[m]
        if cnt[bb] >= MB:
            overflow += 1
            continue
        local_mol[m] = cnt[bb]
        a0 = newstart[m] - bb * AB
        pool_oh[bb, cnt[bb], a0 : a0 + mol_sizes[m]] = 1
        cnt[bb] += 1
    print(f"    pool MB={MB} overflow_mols={overflow} oh={pool_oh.nbytes/1e6:.1f}MB")
    pool_d = jax.device_put(pool_oh)

    Dh = 512
    xh = jax.random.normal(jax.random.PRNGKey(1), (nbins, AB, Dh), dtype=jnp.bfloat16)
    sc = jax.random.normal(jax.random.PRNGKey(2), (nbins, AB, H), dtype=jnp.float32)

    def pool_binned(x, s, oh):
        ohf = oh.astype(jnp.float32)
        cover = oh.sum(axis=1) > 0  # (b, AB): atom belongs to a pooled mol
        neg = jnp.float32(-1e30)
        smax = jnp.max(jnp.where(oh[..., None] > 0, s[:, None, :, :], neg), axis=2)  # (b,MB,H)
        satom = jnp.einsum("bma,bmh->bah", ohf, smax)  # broadcast max back
        e = jnp.where(cover[..., None], jnp.exp(s - satom), 0.0)
        denom = jnp.einsum("bma,bah->bmh", ohf, e)  # (b,MB,H)
        w = e / jnp.maximum(jnp.einsum("bma,bmh->bah", ohf, denom), 1e-16)
        pooled = jnp.einsum("bma,bah,bad->bmhd", ohf, w, x.astype(jnp.float32))
        return pooled.mean(axis=2)

    pj = jax.jit(pool_binned)
    pg = jax.jit(jax.grad(lambda x, s, oh: pool_binned(x, s, oh).sum(), argnums=(0, 1)))
    t_p = bench(pj, xh, sc, pool_d)
    t_pg = bench(pg, xh, sc, pool_d)
    print(f"[2] binned pool fwd {t_p:7.3f} ms   fwd+bwd {t_pg:7.3f} ms")

    # current segment pooling on flat layout
    amol = jnp.asarray(np.where(n_atoms, atom_mol, GRAPHS))
    amask = jnp.asarray(n_atoms)
    xhf = jax.random.normal(jax.random.PRNGKey(1), (A, Dh), dtype=jnp.bfloat16)
    scf = jax.random.normal(jax.random.PRNGKey(2), (H, A), dtype=jnp.float32)

    def pool_flat(x, s):
        attn = segment_softmax(s, amol, GRAPHS, mask=amask)
        weighted = x[None].astype(jnp.float32) * attn[:, :, None]
        pooled = jax.vmap(lambda w: segment_sum(w, amol, GRAPHS))(weighted)
        return pooled.mean(axis=0)

    fj = jax.jit(pool_flat)
    fg = jax.jit(jax.grad(lambda x, s: pool_flat(x, s).sum(), argnums=(0, 1)))
    print(f"    (segment pool fwd: {bench(fj, xhf, scf):7.3f} ms   "
          f"fwd+bwd {bench(fg, xhf, scf):7.3f} ms)")

    # 3. embedding bwd: one-hot matmul vs scatter
    V, ED = 119, 64
    idx = jnp.asarray(np.random.randint(0, V, A2))
    tbl = jax.random.normal(jax.random.PRNGKey(3), (V, ED))

    def emb_take(t):
        return t[idx].sum()

    def emb_oh(t):
        @jax.custom_vjp
        def take(t):
            return t[idx]
        def fwd(t):
            return t[idx], ()
        def bwd(_, g):
            oh = (idx[:, None] == jnp.arange(V)[None, :]).astype(g.dtype)
            return (jnp.einsum("av,ad->vd", oh, g),)
        take.defvjp(fwd, bwd)
        return take(t).sum()

    g1 = jax.jit(jax.grad(emb_take))
    g2 = jax.jit(jax.grad(emb_oh))
    print(f"[3] embed bwd scatter {bench(g1, tbl):7.3f} ms   onehot {bench(g2, tbl):7.3f} ms")


if __name__ == "__main__":
    main()
