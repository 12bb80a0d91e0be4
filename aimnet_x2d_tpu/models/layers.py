"""Core layers: shell convolution (multi-hop message passing) and MLPs.

TPU-native re-design of the reference's ShellConvolutionLayer /
MultiLayerPerceptron (reference: src/models/layers.py:17-267).  The hot
gather/scatter runs over fixed-shape padded edge arrays via segment
reductions (see ops/segment.py) instead of torch_scatter's CUDA kernels.

Initialization parity notes: the reference's ``GNN.init_weights`` re-inits
only top-level Linears with Xavier-uniform + zero bias; ShellConvolutionLayer
and MultiLayerPerceptron have no ``init_weights`` and therefore keep torch's
default Linear init (Kaiming-uniform(a=√5) ⇒ U(±1/√fan_in) for both kernel
and bias).  ``Linear`` exposes both schemes so the training dynamics match
distribution-wise.
"""

from __future__ import annotations

import math
from typing import Any, Callable, Sequence

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..ops import segment_sum
from ..utils.activation import get_activation_function


def _torch_kernel_init(key, shape, dtype=jnp.float32):
    # torch Kaiming-uniform(a=sqrt(5)) on a (out, in) weight == U(±1/sqrt(fan_in));
    # flax kernels are (in, out) so fan_in = shape[0].
    bound = 1.0 / math.sqrt(shape[0])
    return jax.random.uniform(key, shape, dtype, -bound, bound)


def _xavier_kernel_init(key, shape, dtype=jnp.float32):
    bound = math.sqrt(6.0 / (shape[0] + shape[1]))
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class Linear(nn.Module):
    """Dense layer with torch-default or Xavier init (see module docstring).

    Weight mapping to the torch reference: ``kernel`` here equals the torch
    ``weight.T`` (torch stores (out, in)).
    """

    features: int
    init: str = "torch"  # "torch" | "xavier"
    use_bias: bool = True
    dtype: Any = None  # compute dtype; params stay float32

    @nn.compact
    def __call__(self, x):
        in_features = x.shape[-1]
        kinit = _torch_kernel_init if self.init == "torch" else _xavier_kernel_init
        kernel = self.param("kernel", kinit, (in_features, self.features))
        if self.dtype is not None:
            # mixed precision: bf16 operands on the MXU, fp32 accumulation
            y = jnp.dot(
                x.astype(self.dtype),
                kernel.astype(self.dtype),
                preferred_element_type=jnp.float32,
            ).astype(self.dtype)
        else:
            y = jnp.dot(x, kernel.astype(x.dtype))
        if self.use_bias:
            if self.init == "torch":
                bound = 1.0 / math.sqrt(in_features)
                binit = lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                    key, shape, dtype, -bound, bound
                )
            else:
                binit = nn.initializers.zeros_init()
            bias = self.param("bias", binit, (self.features,))
            y = y + bias.astype(y.dtype)
        return y


class LinearParams(nn.Module):
    """Parameter container with ``Linear``'s exact tree (kernel + bias,
    same names/inits/RNG path), for call sites that slice the kernel into
    column/row blocks to skip split/concat materializations of the
    (A, ·)-sized operands (each costs ~0.4 ms/step on the flagship batch,
    BASELINE.md round 2).  Checkpoints stay layout-identical."""

    features: int
    in_features: int
    init: str = "torch"

    @nn.compact
    def __call__(self):
        kinit = _torch_kernel_init if self.init == "torch" else _xavier_kernel_init
        kernel = self.param("kernel", kinit, (self.in_features, self.features))
        if self.init == "torch":
            bound = 1.0 / math.sqrt(self.in_features)
            binit = lambda key, shape, dtype=jnp.float32: jax.random.uniform(
                key, shape, dtype, -bound, bound
            )
        else:
            binit = nn.initializers.zeros_init()
        bias = self.param("bias", binit, (self.features,))
        return kernel, bias


class ShellConvolutionLayer(nn.Module):
    """Multi-hop shell convolution over padded edge lists.

    Behavior parity with reference src/models/layers.py:63-167, including
    quirk Q1: the reference never adds hop offsets to edge targets, so every
    hop's edges aggregate into hop-chunk 0 and chunks 1..K-1 stay zero.
    With ``parity_mode=True`` (default) we reproduce that exactly — one
    aggregation over the union of all hops' edges, with the parameter block
    shapes unchanged (the zero chunks' weights exist but see only zeros, so
    we simply skip their matmul rows).  ``parity_mode=False`` enables true
    per-hop aggregation keyed by ``edge_hop``.
    """

    dim: int
    num_hops: int = 3
    dropout: float = 0.0
    activation_type: str = "silu"
    num_mlp_layers: int = 2
    parity_mode: bool = True
    # When set (edge-partitioned execution under shard_map), each device
    # holds the full atom features but only a shard of the edges; the local
    # partial aggregation is summed over this mesh axis so every device sees
    # the full neighborhood sum.  The dense compute stays replicated.
    graph_axis: str | None = None
    # Mixed precision: bf16 operands/activations, fp32 accumulation for
    # both the MXU matmuls and the edge scatter-add.
    dtype: Any = None
    # Edges arrive dst-major sorted (collate/halo default): lets the
    # parity-mode segment sum take XLA's sorted-scatter fast path
    # (~1.8x on v5e; measured in /tmp opbench, see BASELINE.md).
    edges_dst_sorted: bool = False

    @nn.compact
    def __call__(
        self,
        x: jax.Array,  # (A, D)
        edge_src: jax.Array,  # (E,)
        edge_dst: jax.Array,  # (E,) padding -> A
        edge_hop: jax.Array,  # (E,) 1..K, padding 0
        edge_mask: jax.Array,  # (E,) bool
        deterministic: bool = True,  # positional-friendly for nn.remat
        halo_send_idx: jax.Array | None = None,  # (G, Hp) halo mode
        fused_fwd=None,  # ops/fused_edge.py layouts (TPU fast path)
        fused_bwd=None,
        bin_adj: jax.Array | None = None,  # (bins, ab, ab) int8 dense path
        weights_only: bool = False,  # return the flat weight tuple (stack path)
    ) -> jax.Array:
        # weights_only callers may hand a feature-major (D, A) array (the
        # binned fast path) — parameter shapes come from self.dim, not x
        D = self.dim if weights_only else x.shape[1]
        A = x.shape[0]
        K = self.num_hops
        act = get_activation_function(self.activation_type)
        in_dim = D * (K + 1)

        # Full-shape parameters for checkpoint parity with the reference
        # (input dim = (K+1)*D even though zero chunks never contribute).
        w_in = self.param("input_proj_kernel", _torch_kernel_init, (in_dim, D))
        b_in = self.param(
            "input_proj_bias",
            lambda k, s, dtype=jnp.float32: jax.random.uniform(
                k, s, dtype, -1.0 / math.sqrt(in_dim), 1.0 / math.sqrt(in_dim)
            ),
            (D,),
        )
        w_skip = self.param("global_skip_proj_kernel", _torch_kernel_init, (in_dim, D))
        b_skip = self.param(
            "global_skip_proj_bias",
            lambda k, s, dtype=jnp.float32: jax.random.uniform(
                k, s, dtype, -1.0 / math.sqrt(in_dim), 1.0 / math.sqrt(in_dim)
            ),
            (D,),
        )

        def _megakernel_weights():
            # Flat weight tuple for ops/bin_mp.py.  LinearParams mirrors
            # Linear's tree (names/inits/RNG path) so checkpoints are
            # interchangeable between the fused and unfused paths.
            mlp_ws = []
            for i in range(self.num_mlp_layers):
                k1, bb1 = LinearParams(D, D, name=f"mlp_{i}_linear_1")()
                k2, bb2 = LinearParams(D, D, name=f"mlp_{i}_linear_2")()
                mlp_ws += [k1, bb1, k2, bb2]
            return (
                w_in[:D], w_in[D : 2 * D], b_in,
                w_skip[:D], w_skip[D : 2 * D], b_skip,
                *mlp_ws,
            )

        if weights_only:
            return _megakernel_weights()

        dt = self.dtype
        if halo_send_idx is not None:
            # Halo mode: atoms are sharded over graph_axis; gather sources
            # from [own atoms ‖ exchanged boundary rows].  Every edge's dst
            # is local by construction, so the segment_sum below is already
            # the complete neighborhood sum — no psum.
            from ..ops.halo import halo_exchange

            assert self.graph_axis is not None, "halo mode requires graph_axis"
            x_ext = jnp.concatenate(
                [x, halo_exchange(x, halo_send_idx, self.graph_axis)], axis=0
            )
        else:
            x_ext = x

        def _src_feat():
            feat = jnp.where(edge_mask[:, None], x_ext[edge_src], 0.0)
            if dt is not None:
                # accumulate the scatter in fp32 regardless of activation dtype
                feat = feat.astype(jnp.float32)
            return feat

        # Edge-replicated mode: atoms are replicated and each device holds an
        # edge shard, so the partial sums must be psum'd.
        need_psum = self.graph_axis is not None and halo_send_idx is None

        if self.parity_mode:
            # Union-of-hops aggregation (Q1 semantics): hop chunks 1..K-1 are
            # identically zero, so only the first 2D rows of the kernels see
            # data — compute just those rows.
            if bin_adj is not None and self.graph_axis is None:
                from ..ops.bin_mp import binned_mp_layer, megakernel_enabled

                mk_mode = megakernel_enabled()
                if mk_mode is not None:
                    # Whole-layer Pallas megakernel (ops/bin_mp.py): the
                    # bin's features stay in VMEM through aggregation →
                    # projections → MLP blocks, removing the ~0.2-0.3 ms
                    # HBM round-trip per intermediate that dominates the
                    # unfused step (BASELINE.md round 2 profile).  Param
                    # tree is identical (LinearParams mirrors Linear).
                    # Training dropout runs in-kernel (hash RNG); each
                    # layer module's make_rng key is path-distinct, so
                    # layers draw independent masks.
                    drop_rate = 0.0 if deterministic else self.dropout
                    drop_seed = None
                    if drop_rate > 0.0:
                        drop_seed = jax.random.randint(
                            self.make_rng("dropout"),
                            (1,),
                            -(2**31),
                            2**31 - 1,
                            jnp.int32,
                        )
                    return binned_mp_layer(
                        x,
                        bin_adj,
                        _megakernel_weights(),
                        act=self.activation_type,
                        num_mlp_layers=self.num_mlp_layers,
                        compute_dtype=dt if dt is not None else jnp.float32,
                        interpret=mk_mode == "interpret",
                        dropout=drop_rate,
                        drop_seed=drop_seed,
                    )
                # Bin-packed dense path (data/binning.py): molecules are
                # whole inside ab-atom bins, so the union-of-hops
                # aggregation is one batched MXU matmul with the int8
                # multiplicity adjacency — no gather, no scatter, and XLA
                # differentiates it as the transposed matmul.
                nb, ab, _ = bin_adj.shape
                adt = dt if dt is not None else jnp.float32
                agg = jnp.einsum(
                    "bij,bjd->bid",
                    bin_adj.astype(adt),
                    x.reshape(nb, ab, D).astype(adt),
                    preferred_element_type=jnp.float32,
                ).reshape(A, D)
            elif fused_fwd is not None and self.graph_axis is None:
                # Pallas fused gather+scatter (ops/fused_edge.py): XLA's row
                # gather runs at ~3% of HBM BW and dominates the step; the
                # one-hot MXU formulation replaces both the gather and the
                # scatter.  fp32 accumulation either way; bf16 models use
                # bf16 MXU operands (their activations are bf16 already),
                # fp32 models use 3-pass exact matmuls.
                from ..ops.fused_edge import fused_edge_aggregate

                agg = fused_edge_aggregate(
                    x,
                    fused_fwd,
                    fused_bwd,
                    exact=dt is None,
                    # off-TPU the kernel runs in the pallas interpreter, so
                    # CPU tests exercise the same code path end to end
                    interpret=jax.default_backend() != "tpu",
                )
            else:
                agg = segment_sum(
                    _src_feat(), edge_dst, A, indices_are_sorted=self.edges_dst_sorted
                )
            if need_psum:
                agg = jax.lax.psum(agg, self.graph_axis)
            parts = [x, agg.astype(x.dtype)]  # live (A, 2D) of the (K+1)D input
        else:
            # True per-hop aggregation: scatter into a (K*A, D) buffer keyed
            # by (hop-1)*A + dst, then unstack per hop.
            flat_idx = jnp.where(edge_mask, (edge_hop - 1) * A + edge_dst, K * A)
            agg = segment_sum(_src_feat(), flat_idx, K * A).reshape(K, A, D)
            if need_psum:
                agg = jax.lax.psum(agg, self.graph_axis)
            parts = [x] + [agg[h].astype(x.dtype) for h in range(K)]
        used = D * len(parts)

        def _proj(w, b):
            # The input concat is never materialized: each (A, D) part hits
            # its kernel row-block directly (exact column arithmetic; the
            # fp32 partial sums differ from one fused dot only by add
            # reassociation).  Saves the (A, used) concat + its backward
            # split — ~0.8 ms/step on the flagship batch.
            blocks = [w[i * D : (i + 1) * D] for i in range(len(parts))]
            if dt is not None:
                y = sum(
                    jnp.dot(
                        p.astype(dt), wb.astype(dt),
                        preferred_element_type=jnp.float32,
                    )
                    for p, wb in zip(parts, blocks)
                )
                return y.astype(dt) + b.astype(dt)
            return sum(jnp.dot(p, wb) for p, wb in zip(parts, blocks)) + b

        h = _proj(w_in[:used], b_in)
        h = act(h)
        global_skip = _proj(w_skip[:used], b_skip)

        for i in range(self.num_mlp_layers):
            layer_skip = h
            h = Linear(D, dtype=dt, name=f"mlp_{i}_linear_1")(h)
            h = act(h)
            h = nn.Dropout(self.dropout)(h, deterministic=deterministic)
            h = Linear(D, dtype=dt, name=f"mlp_{i}_linear_2")(h)
            h = h + layer_skip

        return h + global_skip


class LinearBlock(nn.Module):
    """Linear → act → dropout → Linear with optional identity skip
    (reference: src/models/layers.py:170-219; the reference's ``skip_proj``
    branch is unreachable because skip requires input_dim == output_dim)."""

    features: int
    activation_type: str = "silu"
    dropout: float = 0.0
    use_skip: bool = True
    dtype: Any = None  # bf16 compute; params and accumulation stay fp32

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        act = get_activation_function(self.activation_type)
        identity = x
        out = Linear(self.features, dtype=self.dtype, name="linear1")(x)
        out = act(out)
        out = nn.Dropout(self.dropout)(out, deterministic=deterministic)
        out = Linear(self.features, dtype=self.dtype, name="linear2")(out)
        if self.use_skip and x.shape[-1] == self.features:
            out = out + identity.astype(out.dtype)
        return out


class MultiLayerPerceptron(nn.Module):
    """Stack of LinearBlocks (reference: src/models/layers.py:222-267)."""

    hidden_dim: int
    output_dim: int
    num_layers: int = 2
    activation_type: str = "silu"
    dropout: float = 0.0
    use_skip: bool = True
    dtype: Any = None

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True):
        if self.num_layers == 1:
            return LinearBlock(
                self.output_dim, self.activation_type, self.dropout, False,
                self.dtype, name="block_0"
            )(x, deterministic=deterministic)
        x = LinearBlock(
            self.hidden_dim, self.activation_type, self.dropout, False,
            self.dtype, name="block_0"
        )(x, deterministic=deterministic)
        for i in range(self.num_layers - 2):
            x = LinearBlock(
                self.hidden_dim,
                self.activation_type,
                self.dropout,
                self.use_skip,
                self.dtype,
                name=f"block_{i + 1}",
            )(x, deterministic=deterministic)
        return LinearBlock(
            self.output_dim,
            self.activation_type,
            self.dropout,
            False,
            self.dtype,
            name=f"block_{self.num_layers - 1}",
        )(x, deterministic=deterministic)
