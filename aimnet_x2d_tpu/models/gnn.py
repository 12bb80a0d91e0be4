"""The GNN model (reference: src/models/gnn.py:19-780, TPU-native redesign).

Architecture (forward walkthrough mirrors reference gnn.py:197-260):

1. four int-feature embedding lookups → concat (A, 4·emb)
2. embedding_projection → activation → split x_self (70%) / x_other (30%)
   (quirk Q2: x_other_dim = int(0.3·hidden); reference gnn.py:100-101)
3. L × [optional charge equilibration (Q3) → optional stereochemistry (Q6/Q7)
   → shell convolution (Q1 parity) → residual add]
4. concat [x_self, x_other] → concat_self_other       (atom-embedding tap)
5. pooling → (B, H)                                   (mol-embedding tap)
6. post_pooling_projection → FFN (skip MLP)
7. concat [x, skip_transform(x)] → output_layer (B, T or 4T for evidential)

Instead of the reference's forward hooks for embedding extraction
(src/training/extractors.py), the pure function returns all intermediates in
``GNNOutput``.

Dead parameters kept for checkpoint/param-count parity when
``parity_params=True``: ``long_range_projection`` (quirk Q5; reference
gnn.py:146) and ``stereochemical_embedding`` (created at gnn.py:194 but
never used in forward).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn
from flax import struct

from ..data.batching import MolBatch
from ..ops import segment_sum
from ..ops.embed import embed_concat_onehot, embed_concat_onehot_t
from ..utils.activation import get_activation_function
from .layers import Linear, LinearParams, MultiLayerPerceptron, ShellConvolutionLayer
from .pooling import (
    MultiHeadAttentionPooling,
    binned_max_pool,
    binned_mean_pool,
    binned_mean_pool_t,
    binned_sum_pool,
    binned_sum_pool_t,
    max_pool,
    mean_pool,
    sum_pool,
)

# Feature index-space sizes = |vocabulary| + 1 OOV bucket
# (reference: src/main/runner.py:665-670 and src/datasets/constants.py:9-18).
DEFAULT_FEATURE_SIZES: Dict[str, int] = {
    "atom_type": 119,  # atomic numbers 1..118 + OOV
    "hydrogen_count": 9,  # 0..8 (capped)
    "degree": 7,  # 0..5 + OOV
    "hybridization": 7,  # 6 RDKit enums + OOV
}


def _layer_drop_seed(base_seed, l: int):
    """Per-layer dropout seed for the single-layer kernel entry points.

    The in-kernel hash mixes the BLOCK tag into the seed as
    ``seed + block_i·0x9E3779B9`` (ops/bin_mp.py::_dropout_mask), so the
    layer mix here must use a DIFFERENT odd constant: folding
    ``(l+1)·0x9E3779B9`` into the seed made layer l / block i and layer
    l+1 / block i−1 draw identical masks (ADVICE r3 medium finding).
    """
    tag = ((l + 1) * 0x27D4EB2F) & 0xFFFFFFFF
    tag = tag - (1 << 32) if tag >= (1 << 31) else tag
    return base_seed + jnp.int32(tag)


@dataclasses.dataclass(frozen=True)
class GNNConfig:
    """Static model configuration (mirrors reference GNN.__init__ args)."""

    hidden_dim: int = 512
    output_dim: int = 1
    num_shells: int = 3
    num_message_passing_layers: int = 3
    embedding_dim: int = 64
    ffn_hidden_dim: Optional[int] = None
    ffn_num_layers: int = 3
    ffn_dropout: float = 0.05
    pooling_type: str = "attention"
    task_type: str = "regression"
    use_partial_charges: bool = False
    use_stereochemistry: bool = False
    activation_type: str = "silu"
    shell_conv_num_mlp_layers: int = 2
    shell_conv_dropout: float = 0.05
    attention_num_heads: int = 4
    attention_temperature: float = 1.0
    loss_function: str = "l1"
    # TPU-native extensions
    parity_mode: bool = True  # reproduce Q1 hop-collapse semantics
    parity_params: bool = True  # create the reference's dead params
    # Edge-partitioned execution: name of the mesh axis over which edges are
    # sharded (atoms replicated; partial aggregations psum'd per MP layer).
    graph_axis: Optional[str] = None
    # "float32" | "bfloat16": activation dtype on the atom-heavy path
    # (embeddings → MP layers → concat_self_other).  Params, scatter
    # accumulation, pooling softmax, FFN head and loss stay float32.
    compute_dtype: str = "float32"
    # Rematerialize message-passing layers in backward (jax.checkpoint):
    # trades ~1 extra forward of FLOPs for O(layers) less activation HBM,
    # unlocking larger per-chip batches.
    remat: bool = False
    feature_sizes: Tuple[Tuple[str, int], ...] = tuple(DEFAULT_FEATURE_SIZES.items())

    @property
    def x_other_dim(self) -> int:
        return int(0.3 * self.hidden_dim)

    @property
    def x_self_dim(self) -> int:
        return self.hidden_dim - self.x_other_dim

    @property
    def ffn_dim(self) -> int:
        return self.ffn_hidden_dim if self.ffn_hidden_dim is not None else self.hidden_dim

    @property
    def final_output_dim(self) -> int:
        return self.output_dim * 4 if self.loss_function == "evidential" else self.output_dim

    def to_dict(self) -> Dict[str, Any]:
        d = dataclasses.asdict(self)
        d["feature_sizes"] = dict(self.feature_sizes)
        return d

    @staticmethod
    def from_dict(d: Dict[str, Any]) -> "GNNConfig":
        d = dict(d)
        fs = d.get("feature_sizes", DEFAULT_FEATURE_SIZES)
        if isinstance(fs, dict):
            d["feature_sizes"] = tuple(fs.items())
        known = {f.name for f in dataclasses.fields(GNNConfig)}
        return GNNConfig(**{k: v for k, v in d.items() if k in known})


class GNNOutput(struct.PyTreeNode):
    predictions: jax.Array  # (B, T) or (B, 4T) raw outputs
    attention_weights: Optional[jax.Array]  # (H, A) or None
    partial_charges: Optional[jax.Array]  # (A,) or None
    atom_embeddings: jax.Array  # (A, hidden) post concat_self_other
    mol_embeddings: jax.Array  # (B, hidden) pooled


def _xavier_embed_init(key, shape, dtype=jnp.float32):
    # torch xavier_uniform_ on an Embedding weight (num, dim):
    # fan_in = dim, fan_out = num → bound = sqrt(6/(num+dim)).
    bound = (6.0 / (shape[0] + shape[1])) ** 0.5
    return jax.random.uniform(key, shape, dtype, -bound, bound)


class GNN(nn.Module):
    config: GNNConfig

    @nn.compact
    def __call__(
        self, batch: MolBatch, *, deterministic: bool = True,
        train_mode: bool = False,
    ) -> GNNOutput:
        # ``train_mode``: this forward will be differentiated (the train
        # step sets it).  The attention-pool/projection kernel folds
        # default on only there — their win is in the backward, while
        # forward-only contexts (eval/inference/init) pay their much
        # longer Mosaic remote-compiles for <1 ms/batch (policy fns in
        # ops/bin_attnpool.py / ops/bin_mp.py; env overrides for tests).
        cfg = self.config
        if batch.edges_slim and not cfg.parity_mode:
            raise ValueError(
                "slim binned batches drop the flat edge lists; true per-hop "
                "aggregation (parity_mode=False) needs them — load with "
                "slim_edges=False"
            )
        act = get_activation_function(cfg.activation_type)
        feature_sizes = dict(cfg.feature_sizes)
        A = batch.atom_type.shape[0]
        B = batch.total_charge.shape[0]
        # Halo mode (parallel/halo.py): atoms are sharded over graph_axis;
        # MP layers exchange boundary rows, and every atom→molecule
        # reduction (pooling, charge equilibration) psums its per-molecule
        # partials over the axis.  Without halo, graph_axis means the
        # round-1 edge-replicated mode (atoms replicated; no pool psum).
        halo = batch.halo_send_idx is not None
        pool_axis = cfg.graph_axis if halo else None

        # Fully-fused MP stack decision, made EARLY because it selects the
        # feature-major (xT (D, A)) atom datapath end-to-end: when the
        # binned megakernel runs (ops/bin_mp.py), embeddings, the
        # x_self/x_other projections and the linear pools all keep the
        # atom axis on lanes — zero layout transposes between the
        # embedding matmul and the pooled (B, ·) molecule array.
        use_stack = (
            cfg.parity_mode
            and batch.bin_adj is not None
            and cfg.graph_axis is None
            and not cfg.use_partial_charges
            and not cfg.use_stereochemistry
            and cfg.num_message_passing_layers > 1
        )
        mk_mode = None
        if use_stack:
            from ..ops.bin_mp import megakernel_enabled

            mk_mode = megakernel_enabled()
            use_stack = mk_mode is not None
        # Config-3 fast path (charges and/or stereo): the per-layer
        # injections break the single fused stack, but each MP layer still
        # runs as one fused kernel (ops/bin_mp.py ext-agg variant) with the
        # injections as COMPACT feature-major XLA between kernels — the
        # round-3 profile of the row-major per-layer path showed ~200 ms of
        # (A, D)-scale fusions/copies/relayouts at the 32k flagship batch.
        use_inject_stack = (
            cfg.parity_mode
            and batch.bin_adj is not None
            and cfg.graph_axis is None
            and not halo
            and (cfg.use_partial_charges or cfg.use_stereochemistry)
            and (not cfg.use_partial_charges or batch.pool_mat is not None)
            and cfg.num_message_passing_layers >= 1
        )
        ik_mode = None
        if use_inject_stack:
            from ..ops.bin_mp import megakernel_enabled

            ik_mode = megakernel_enabled()
            use_inject_stack = ik_mode is not None
        t_path = use_stack or use_inject_stack
        # Halo-partitioned binned fast path (parallel/halo.py binned=True):
        # per-device fused MP layer kernels with the boundary all_to_all
        # between them, the local per-bin aggregation hoisted to XLA so the
        # collective overlaps with it (ops/halo.py).  Pooling and the head
        # stay on the flat psum path (segment ops are layout-agnostic).
        # Charge/stereo injections (config 3) run feature-major between the
        # kernels: charge-eq psums per-molecule partials over the graph
        # axis, stereo rows are device-local by the partitioner's
        # construction (round-4, VERDICT r3 item 7).
        use_halo_stack = (
            halo
            and cfg.parity_mode
            and batch.bin_adj is not None
            and batch.halo_adj is not None
            and cfg.graph_axis is not None
        )
        hk_mode = None
        if use_halo_stack:
            from ..ops.bin_mp import megakernel_enabled

            hk_mode = megakernel_enabled()
            use_halo_stack = hk_mode is not None

        # 1. Embedding lookups (reference gnn.py:262-274)
        tables, fields = [], []
        for name, field in (
            ("atom_type_embedding", batch.atom_type),
            ("hydrogen_count_embedding", batch.hydrogen_count),
            ("degree_embedding", batch.degree),
            ("hybridization_embedding", batch.hybridization),
        ):
            key = name.replace("_embedding", "")
            tables.append(
                self.param(name, _xavier_embed_init, (feature_sizes[key], cfg.embedding_dim))
            )
            fields.append(field)
        cdt = jnp.bfloat16 if cfg.compute_dtype == "bfloat16" else None
        if t_path:
            # feature-major (4*emb, A); fp32 one-hot matmul == the gather
            # exactly (0/1 products), bf16 rounds where bf16 mode already
            # rounds (the projection below)
            xT = embed_concat_onehot_t(
                tables, fields, dtype=cdt if cdt is not None else jnp.float32
            )
            x = None
            # embedding fold (ops/embed.py::blockdiag_table_t): the fused
            # kernels can take the raw code rows + fp32 block-diag table
            # and run the one-hot matmul in VMEM — when both kernels take
            # it, xT's producer above is DCE'd in the train step
            from ..ops.embed import blockdiag_table_t

            embed_spec = (
                jnp.stack([f.astype(jnp.int32) for f in fields], axis=0),
                blockdiag_table_t(tables),
                tuple(int(t.shape[0]) for t in tables),
            )
        elif cdt is not None:
            # one block-diagonal MXU matmul instead of 4 gathers (+ their
            # scatter backwards); bf16-exact for the 0/1 one-hots.  Pure
            # jnp ops, so it is autodiff- and shard_map-safe.
            x = embed_concat_onehot(tables, fields, dtype=cdt)
        else:
            x = jnp.concatenate(
                [jnp.take(t, f, axis=0) for t, f in zip(tables, fields)], axis=-1
            )  # (A, 4*emb)

        # 2. Project + split (reference gnn.py:224-231).  The kernel is
        # column-sliced so x_self / x_other come from two direct matmuls —
        # no (A, hidden) intermediate + split materialization (exact: the
        # split commutes with the column blocks and the activation).
        in_dim = 4 * cfg.embedding_dim
        k_ep, b_ep = LinearParams(
            cfg.hidden_dim, in_dim, init="xavier", name="embedding_projection"
        )()
        xs = cfg.x_self_dim

        def _proj_cols(k, b):
            if cdt is not None:
                y = jnp.dot(
                    x.astype(cdt), k.astype(cdt), preferred_element_type=jnp.float32
                ).astype(cdt)
            else:
                y = jnp.dot(x, k)
            return act(y + b.astype(y.dtype))

        def _proj_rows_t(k, b):
            # feature-major twin: yT = kᵀ @ xT (same fp32-accumulate →
            # cast → bias-add points as _proj_cols; transpose is exact)
            kT = k.T
            if cdt is not None:
                y = jnp.dot(
                    kT.astype(cdt), xT, preferred_element_type=jnp.float32
                ).astype(cdt)
            else:
                y = jnp.dot(kT, xT)
            return act(y + b.astype(y.dtype)[:, None])

        if t_path:
            x_self = _proj_rows_t(k_ep[:, :xs], b_ep[:xs])  # (xs, A)
            x_other = _proj_rows_t(k_ep[:, xs:], b_ep[xs:])  # (D, A)
        else:
            x_self = _proj_cols(k_ep[:, :xs], b_ep[:xs])
            x_other = _proj_cols(k_ep[:, xs:], b_ep[xs:])

        # Dead params for parity (Q5; reference gnn.py:146,194)
        if cfg.parity_params:
            Linear(cfg.ffn_dim, init="xavier", name="long_range_projection")(
                jax.lax.stop_gradient(jnp.zeros((1, cfg.hidden_dim)))
            )
            if cfg.use_stereochemistry:
                Linear(cfg.hidden_dim, init="xavier", name="stereochemical_embedding")(
                    jax.lax.stop_gradient(jnp.zeros((1, cfg.hidden_dim * 3)))
                )

        # 3. Message passing (reference gnn.py:276-308)
        # The stereochemical projection is a single parameter set shared by
        # every message-passing layer (reference gnn.py:195,327);
        # LinearParams mirrors Linear's tree so checkpoints are identical,
        # and the kernel is row-sliced per stereo part (no (A, 3D) concat).
        stereo_proj = (
            LinearParams(
                cfg.x_other_dim,
                3 * cfg.x_other_dim,
                init="xavier",
                name="stereochemical_embedding_2",
            )()
            if cfg.use_stereochemistry
            else None
        )
        stereo_ctx = (
            self._stereo_context(batch, A, pool_axis, cdt)
            if cfg.use_stereochemistry
            else None
        )
        partial_charges = None
        layer_cls = (
            nn.remat(ShellConvolutionLayer, static_argnums=(6,))
            if cfg.remat
            else ShellConvolutionLayer
        )
        # Fully-fused MP stack (ops/bin_mp.py::binned_mp_stack_t): when no
        # per-layer charge/stereo injection runs between layers, the whole
        # loop is ONE pallas_call — inter-layer activations and residuals
        # never leave VMEM, and none of the per-layer kernel-boundary
        # layout copies exist.  (Remat is moot here: the stack's VJP saves
        # only the stack input and recomputes in VMEM.)
        if use_stack:
            from ..ops.bin_mp import binned_mp_stack_t, stack_proj_enabled
            ws_layers = []
            for layer_idx in range(cfg.num_message_passing_layers):
                ws_layers.append(
                    ShellConvolutionLayer(
                        dim=cfg.x_other_dim,
                        num_hops=cfg.num_shells,
                        dropout=cfg.shell_conv_dropout,
                        activation_type=cfg.activation_type,
                        num_mlp_layers=cfg.shell_conv_num_mlp_layers,
                        parity_mode=cfg.parity_mode,
                        dtype=cdt,
                        name=f"message_passing_layers_{layer_idx}",
                    )(
                        x_other,
                        batch.edge_src,
                        batch.edge_dst,
                        batch.edge_hop,
                        batch.edge_mask,
                        deterministic,
                        weights_only=True,
                    )
                )
            drop_rate = 0.0 if deterministic else cfg.shell_conv_dropout
            drop_seed = None
            if drop_rate > 0.0:
                # per-step seed for the in-kernel hash RNG (PARITY.md:
                # statistically equivalent to nn.Dropout, not bit-equal)
                drop_seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), -(2**31), 2**31 - 1, jnp.int32
                )
            # With the projection fold, the kernel takes embT and computes
            # the pre-MP x_other in VMEM — the (D, A) projection above is
            # then unused here and DCE'd in the train step.  With the
            # embedding fold on top, it takes the raw code rows and even
            # embT's producer is DCE'd.
            from ..ops.bin_attnpool import embed_fold_enabled

            fold_proj = stack_proj_enabled(train_mode)
            fold_embed = fold_proj and embed_fold_enabled()
            x_other = binned_mp_stack_t(
                xT if fold_proj else x_other,
                batch.bin_adj,
                tuple(ws_layers),
                act=cfg.activation_type,
                num_mlp_layers=cfg.shell_conv_num_mlp_layers,
                compute_dtype=cdt if cdt is not None else jnp.float32,
                interpret=mk_mode == "interpret",
                dropout=drop_rate,
                drop_seed=drop_seed,
                proj_weights=(k_ep[:, xs:], b_ep[xs:]) if fold_proj else None,
                embed_spec=embed_spec if fold_embed else None,
                # the train step's jit carries the raised scoped-vmem
                # limit, so its forward can take a wider bin group
                wide=train_mode,
            )
        if use_halo_stack:
            from ..ops.bin_mp import binned_mp_layer_ext_t
            from ..ops.halo import (
                binned_local_agg_t,
                halo_agg_contrib_t,
                halo_exchange_t,
            )

            _, ab_h, _ = batch.bin_adj.shape
            dtc = cdt if cdt is not None else jnp.float32
            ws_layers = [
                ShellConvolutionLayer(
                    dim=cfg.x_other_dim,
                    num_hops=cfg.num_shells,
                    dropout=cfg.shell_conv_dropout,
                    activation_type=cfg.activation_type,
                    num_mlp_layers=cfg.shell_conv_num_mlp_layers,
                    parity_mode=cfg.parity_mode,
                    name=f"message_passing_layers_{l}",
                )(
                    x_other,
                    batch.edge_src,
                    batch.edge_dst,
                    batch.edge_hop,
                    batch.edge_mask,
                    deterministic,
                    weights_only=True,
                )
                for l in range(cfg.num_message_passing_layers)
            ]
            drop_rate = 0.0 if deterministic else cfg.shell_conv_dropout
            base_seed = None
            if drop_rate > 0.0:
                base_seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), -(2**31), 2**31 - 1, jnp.int32
                )
                # the hash RNG keys on LOCAL lane coordinates — fold the
                # device index in so shards draw independent masks
                base_seed = base_seed + jax.lax.axis_index(cfg.graph_axis)
            xT = x_other.astype(dtc).T  # (D, A_loc = nb·ab)
            for l, ws in enumerate(ws_layers):
                if cfg.use_partial_charges:
                    xT = self._charge_equilibration_t_seg(
                        batch, xT, B, cfg.graph_axis
                    )
                if cfg.use_stereochemistry:
                    xT = self._stereochemistry_t(
                        batch, xT, stereo_proj, stereo_ctx
                    )
                # boundary rows for THIS layer's aggregation: the
                # all_to_all and the local per-bin matmuls both depend only
                # on the previous layer's output, so XLA's async collective
                # scheduling overlaps them (SURVEY §7 hard-parts).
                haloT = halo_exchange_t(xT, batch.halo_send_idx, cfg.graph_axis)
                aggT = binned_local_agg_t(xT, batch.bin_adj, dtc)
                aggT = aggT + halo_agg_contrib_t(haloT, batch.halo_adj, dtc)
                xaT = jnp.concatenate([xT, aggT.astype(dtc)], axis=0)
                seed_l = None
                if base_seed is not None:
                    # distinct per-layer seed (the ext kernel tags only
                    # blocks within one layer)
                    seed_l = _layer_drop_seed(base_seed, l)
                yT = binned_mp_layer_ext_t(
                    xaT,
                    ws,
                    ab=ab_h,
                    act=cfg.activation_type,
                    num_mlp_layers=cfg.shell_conv_num_mlp_layers,
                    compute_dtype=dtc,
                    interpret=hk_mode == "interpret",
                    dropout=drop_rate,
                    drop_seed=seed_l,
                )
                xT = yT + xT
            x_other = xT.T.astype(x_other.dtype)
        if use_inject_stack:
            from ..ops.bin_mp import binned_mp_layer_t

            dtc = cdt if cdt is not None else jnp.float32
            ws_layers = [
                ShellConvolutionLayer(
                    dim=cfg.x_other_dim,
                    num_hops=cfg.num_shells,
                    dropout=cfg.shell_conv_dropout,
                    activation_type=cfg.activation_type,
                    num_mlp_layers=cfg.shell_conv_num_mlp_layers,
                    parity_mode=cfg.parity_mode,
                    name=f"message_passing_layers_{l}",
                )(
                    x_other,
                    batch.edge_src,
                    batch.edge_dst,
                    batch.edge_hop,
                    batch.edge_mask,
                    deterministic,
                    weights_only=True,
                )
                for l in range(cfg.num_message_passing_layers)
            ]
            drop_rate = 0.0 if deterministic else cfg.shell_conv_dropout
            base_seed = None
            if drop_rate > 0.0:
                base_seed = jax.random.randint(
                    self.make_rng("dropout"), (1,), -(2**31), 2**31 - 1, jnp.int32
                )
            # Round-5 fused inject path (ops/bin_inject.py): both
            # injections + the layer + the residual run as ONE kernel per
            # layer per direction — the per-stage (D, A) intermediates the
            # XLA inject path materialized to HBM (the round-4 3.9× gap
            # to the flagship) never exist.  Only the both-features-on
            # configuration is fused; others keep the XLA injects.
            fuse_mode = None
            if (
                cfg.use_partial_charges
                and cfg.use_stereochemistry
                and batch.pool_mat is not None
                and batch.tet_bin is not None
                and stereo_ctx.get("stereo_adj") is not None
                and cfg.x_other_dim >= 2
            ):
                from ..ops.bin_inject import inject_fused_enabled

                fuse_mode = inject_fused_enabled()
            xoT = x_other  # (D, A) feature-major from _proj_rows_t
            if fuse_mode is not None:
                from ..ops.bin_inject import binned_inject_mp_layer_t

                k_st, b_st = stereo_proj
                # per-ATOM total-charge map, once per batch (padding 0)
                tca = jnp.where(
                    batch.atom_mask,
                    batch.total_charge[jnp.clip(batch.atom_mol, 0, B - 1)],
                    0.0,
                )
                for l, ws in enumerate(ws_layers):
                    seed_l = None
                    if base_seed is not None:
                        seed_l = _layer_drop_seed(base_seed, l)
                    xoT = binned_inject_mp_layer_t(
                        xoT,
                        tca,
                        batch.pool_mat,
                        batch.tet_bin,
                        stereo_ctx["any_tet"],
                        stereo_ctx["stereo_adj"],
                        batch.bin_adj,
                        k_st,
                        b_st,
                        ws,
                        act=cfg.activation_type,
                        num_mlp_layers=cfg.shell_conv_num_mlp_layers,
                        compute_dtype=dtc,
                        interpret=fuse_mode == "interpret",
                        dropout=drop_rate,
                        drop_seed=seed_l,
                    )
                x_other = xoT
            else:
                for l, ws in enumerate(ws_layers):
                    if cfg.use_partial_charges:
                        xoT = self._charge_equilibration_t(batch, xoT)
                    if cfg.use_stereochemistry:
                        xoT = self._stereochemistry_t(batch, xoT, stereo_proj, stereo_ctx)
                    seed_l = None
                    if base_seed is not None:
                        seed_l = _layer_drop_seed(base_seed, l)
                    # single chip: no collective to overlap, so the per-bin
                    # aggregation stays in VMEM inside the kernel
                    yT = binned_mp_layer_t(
                        xoT,
                        batch.bin_adj,
                        ws,
                        act=cfg.activation_type,
                        num_mlp_layers=cfg.shell_conv_num_mlp_layers,
                        compute_dtype=dtc,
                        interpret=ik_mode == "interpret",
                        dropout=drop_rate,
                        drop_seed=seed_l,
                    )
                    xoT = yT + xoT.astype(dtc)
                x_other = xoT
            if cfg.use_partial_charges and cfg.x_other_dim >= 2:
                partial_charges = x_other[0, :]
        mp_fused = use_stack or use_halo_stack or use_inject_stack
        for layer_idx in range(0 if mp_fused else cfg.num_message_passing_layers):
            if cfg.use_partial_charges:
                x_other = self._charge_equilibration(batch, x_other, B, pool_axis)
            if cfg.use_stereochemistry:
                x_other = self._stereochemistry(
                    batch, x_other, A, stereo_proj, stereo_ctx
                )
            layer = layer_cls(
                dim=cfg.x_other_dim,
                num_hops=cfg.num_shells,
                dropout=cfg.shell_conv_dropout,
                activation_type=cfg.activation_type,
                num_mlp_layers=cfg.shell_conv_num_mlp_layers,
                parity_mode=cfg.parity_mode,
                graph_axis=cfg.graph_axis,
                dtype=cdt,
                edges_dst_sorted=batch.edges_dst_sorted,
                name=f"message_passing_layers_{layer_idx}",
            )
            x_other = (
                layer(
                    x_other,
                    batch.edge_src,
                    batch.edge_dst,
                    batch.edge_hop,
                    batch.edge_mask,
                    deterministic,
                    batch.halo_send_idx,
                    batch.fused_fwd,
                    batch.fused_bwd,
                    batch.bin_adj,
                )
                + x_other
            )

        if (
            cfg.use_partial_charges
            and cfg.x_other_dim >= 2
            and partial_charges is None
        ):
            partial_charges = x_other[:, 0]

        # 4. Combine (reference gnn.py:245-246) — atom-embedding tap point.
        # Row-sliced kernel: the [x_self ‖ x_other] concat is never
        # materialized (fp32 partial sums; reassociation-only difference).
        k_cs, b_cs = LinearParams(
            cfg.hidden_dim, cfg.hidden_dim, init="xavier", name="concat_self_other"
        )()
        binned = batch.pool_mat is not None and pool_axis is None
        xo = x_other.astype(x_self.dtype)
        # atom-embedding tap: the concat is never materialized — each part
        # hits its kernel row-block (exact column arithmetic).  Dead in the
        # train step (pooling commutes past the projection below), so XLA
        # DCEs the whole (A, hidden) computation there.
        xs_dim = cfg.x_self_dim
        if t_path:
            # parts are (d_p, A): contract dim 0 of both → (A, hidden)
            # directly, no transposes (dead in the train step; DCE'd)
            def _cc(pT, kblk):
                kb = kblk.astype(cdt) if cdt is not None else kblk
                return jax.lax.dot_general(
                    pT, kb, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )

            atom_embeddings = _cc(x_self, k_cs[:xs_dim]) + _cc(xo, k_cs[xs_dim:])
            if cdt is not None:
                atom_embeddings = atom_embeddings.astype(cdt) + b_cs.astype(cdt)
            else:
                atom_embeddings = atom_embeddings + b_cs
        elif cdt is not None:
            atom_embeddings = (
                jnp.dot(
                    x_self, k_cs[:xs_dim].astype(cdt),
                    preferred_element_type=jnp.float32,
                )
                + jnp.dot(
                    xo, k_cs[xs_dim:].astype(cdt),
                    preferred_element_type=jnp.float32,
                )
            ).astype(cdt) + b_cs.astype(cdt)
        else:
            atom_embeddings = (
                jnp.dot(x_self, k_cs[:xs_dim]) + jnp.dot(xo, k_cs[xs_dim:]) + b_cs
            )

        # 5. Pooling (reference gnn.py:249) — mol-embedding tap point.
        # Attention/mean/sum pooling are LINEAR in the atom embeddings, so
        # the pool commutes past the concat_self_other projection:
        # pool(x·K + b) = pool(x)·K + b·Σw per molecule, and pooling is
        # columnwise so each concat part pools independently.  Pooling
        # FIRST shrinks the A-sized hidden² matmul to a B-sized one (~27%
        # of the step's matmul FLOPs) and no (A, hidden) array exists in
        # the pooled path at all.  Reassociation is the only numerics
        # change (oracle full-forward parity covers it).  Max pooling is
        # not linear and halo pooling psums per-molecule partials — both
        # keep the post-projection path.
        linear_pool = pool_axis is None and cfg.pooling_type in (
            "attention", "mean", "sum"
        )

        def _pool_then_project(pooled_parts, bias_factor):
            mol = b_cs * bias_factor.astype(jnp.float32)[:, None]
            row = 0
            for pp in pooled_parts:  # (B, d_p) / (d_p, B) — tiny matmuls
                d_p = pp.shape[0] if t_path else pp.shape[-1]
                blk = k_cs[row : row + d_p].astype(x_self.dtype)
                if t_path:  # feature-major parts: contract dim 0 of both
                    mol = mol + jax.lax.dot_general(
                        pp.astype(x_self.dtype), blk, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32,
                    )
                else:
                    mol = mol + jnp.dot(
                        pp.astype(x_self.dtype), blk,
                        preferred_element_type=jnp.float32,
                    )
                row += d_p
            return mol

        attention_weights = None
        if cfg.pooling_type == "attention":
            mol_embeddings, attention_weights = MultiHeadAttentionPooling(
                num_heads=cfg.attention_num_heads,
                initial_temperature=cfg.attention_temperature,
                graph_axis=pool_axis,
                name="pooling",
            )(
                [x_self, xo] if linear_pool else atom_embeddings,
                batch.atom_mol,
                batch.atom_mask,
                B,
                deterministic=deterministic,
                pool_mat=batch.pool_mat if binned else None,
                pre_proj=(k_cs, b_cs) if linear_pool else None,
                feature_major=t_path and linear_pool,
                # feature-major: hand the pool the embedding array + the
                # x_self column block so the fused kernel
                # (ops/bin_attnpool.py) can recompute x_self in VMEM —
                # the (x_self_dim, A) array then never reaches HBM and
                # its XLA producer above is DCE'd in the train step
                proj_spec=(xT, k_ep[:, :xs], b_ep[:xs]) if t_path else None,
                act_name=cfg.activation_type,
                embed_spec=embed_spec if t_path else None,
                train_mode=train_mode,
            )
        elif cfg.pooling_type == "mean":
            if linear_pool:
                if binned and t_path:
                    # per-part pools: ragged widths are sublane dims in
                    # feature-major — no concat materialization needed
                    pooled = [
                        binned_mean_pool_t(p, batch.pool_mat)
                        for p in (x_self, xo)
                    ]
                    cov = (batch.pool_mat.sum(axis=2) > 0).reshape(-1)
                elif binned:
                    # lane-aligned full-width einsum (see pooling.py note)
                    pooled = [
                        binned_mean_pool(
                            jnp.concatenate([x_self, xo], axis=-1), batch.pool_mat
                        )
                    ]
                    cov = (batch.pool_mat.sum(axis=2) > 0).reshape(-1)
                else:
                    # segment pools accumulate at the array dtype — promote
                    # bf16 parts to fp32 like the post-projection path did
                    pooled = [
                        mean_pool(
                            p.astype(jnp.float32), batch.atom_mol, batch.atom_mask, B
                        )
                        for p in (x_self, xo)
                    ]
                    seg = jnp.where(batch.atom_mask, batch.atom_mol, B)
                    cov = segment_sum(batch.atom_mask.astype(jnp.float32), seg, B) > 0
                mol_embeddings = _pool_then_project(pooled, cov)
            else:
                mol_embeddings = mean_pool(
                    atom_embeddings, batch.atom_mol, batch.atom_mask, B, pool_axis
                )
        elif cfg.pooling_type == "max":
            mol_embeddings = (
                binned_max_pool(atom_embeddings, batch.pool_mat)
                if binned
                else max_pool(
                    atom_embeddings, batch.atom_mol, batch.atom_mask, B, pool_axis
                )
            )
        elif cfg.pooling_type == "sum":
            if linear_pool:
                if binned and t_path:
                    pooled = [
                        binned_sum_pool_t(p, batch.pool_mat)
                        for p in (x_self, xo)
                    ]
                    counts = batch.pool_mat.sum(axis=2).reshape(-1)
                elif binned:
                    pooled = [
                        binned_sum_pool(
                            jnp.concatenate([x_self, xo], axis=-1), batch.pool_mat
                        )
                    ]
                    counts = batch.pool_mat.sum(axis=2).reshape(-1)
                else:
                    pooled = [
                        sum_pool(
                            p.astype(jnp.float32), batch.atom_mol, batch.atom_mask, B
                        )
                        for p in (x_self, xo)
                    ]
                    seg = jnp.where(batch.atom_mask, batch.atom_mol, B)
                    counts = segment_sum(batch.atom_mask.astype(jnp.float32), seg, B)
                mol_embeddings = _pool_then_project(pooled, counts)
            else:
                mol_embeddings = sum_pool(
                    atom_embeddings, batch.atom_mol, batch.atom_mask, B, pool_axis
                )
        else:
            raise ValueError(f"Unsupported pooling type: {cfg.pooling_type}")

        # 6. FFN (reference gnn.py:252-253); bf16 mode extends to the FFN
        # (fp32 accumulation), with the output head and loss kept fp32
        h = Linear(cfg.ffn_dim, init="xavier", dtype=cdt, name="post_pooling_projection")(
            mol_embeddings
        )
        h = MultiLayerPerceptron(
            hidden_dim=cfg.ffn_dim,
            output_dim=cfg.ffn_dim,
            num_layers=cfg.ffn_num_layers,
            activation_type=cfg.activation_type,
            dropout=cfg.ffn_dropout,
            use_skip=True,
            dtype=cdt,
            name="ffn",
        )(h, deterministic=deterministic)

        # 7. Output with skip concat (reference gnn.py:256-258)
        skip = Linear(cfg.ffn_dim, init="xavier", dtype=cdt, name="skip_transform")(h)
        final = jnp.concatenate([h, skip], axis=-1).astype(jnp.float32)
        predictions = Linear(cfg.final_output_dim, init="xavier", name="output_layer")(final)

        return GNNOutput(
            predictions=predictions,
            attention_weights=attention_weights,
            partial_charges=partial_charges,
            # extraction paths expect fp32; dead in the train step (DCE'd)
            atom_embeddings=atom_embeddings.astype(jnp.float32),
            mol_embeddings=mol_embeddings,
        )

    # ------------------------------------------------------------------ #

    def _charge_equilibration(
        self, batch: MolBatch, x_other: jax.Array, B: int, graph_axis: str | None = None
    ) -> jax.Array:
        """Partial-charge equilibration (Q3; reference gnn.py:622-658).

        Channels 0/1 of x_other are charge q and electronegativity-like f;
        per-molecule sums Q_u, F_u; correction q += (f/F_u)·(Q_total − Q_u).
        With halo-sharded atoms (``graph_axis``) the per-molecule sums are
        psum'd so split molecules equilibrate globally.
        """
        q = x_other[:, :1]
        f = jnp.clip(x_other[:, 1:2], min=1e-6)
        rest = x_other[:, 2:]

        if batch.pool_mat is not None and graph_axis is None:
            # bin-packed dense path: per-molecule sums and the broadcast
            # back to atoms are small batched matmuls (models/pooling.py).
            nb, mb, ab = batch.pool_mat.shape
            ohf = batch.pool_mat.astype(jnp.float32)
            qf = jnp.concatenate([q, f], axis=-1).reshape(nb, ab, 2)
            QF_u = jnp.einsum("bma,bac->bmc", ohf, qf.astype(jnp.float32))
            F_u = jnp.clip(QF_u[..., 1:2] + 1e-6, min=1e-6)
            dQ = batch.total_charge.reshape(nb, mb, 1) - QF_u[..., 0:1]
            per_atom = jnp.einsum(
                "bma,bmc->bac", ohf, jnp.concatenate([1.0 / F_u, dQ], axis=-1)
            )
            inv_F = per_atom.reshape(-1, 2)[:, 0:1]
            dQ_a = per_atom.reshape(-1, 2)[:, 1:2]
            f_new = f * inv_F
            q_new = q + f_new * dQ_a
            # uncovered (padding) atoms: inv_F = 0 ⇒ f_new = 0, q_new = q —
            # matches the segment path where padding is scatter-dropped
            return jnp.concatenate([q_new, f_new, rest], axis=-1)

        seg = jnp.where(batch.atom_mask, batch.atom_mol, B)
        mask = batch.atom_mask[:, None]
        Q_u = segment_sum(jnp.where(mask, q, 0.0), seg, B)
        F_u = segment_sum(jnp.where(mask, f, 0.0), seg, B)
        if graph_axis is not None:
            Q_u = jax.lax.psum(Q_u, graph_axis)
            F_u = jax.lax.psum(F_u, graph_axis)
        F_u = F_u + 1e-6
        F_u = jnp.clip(F_u, min=1e-6)

        dQ = batch.total_charge[:, None] - Q_u
        f_new = f / F_u[batch.atom_mol]
        q_new = q + f_new * dQ[batch.atom_mol]
        return jnp.concatenate([q_new, f_new, rest], axis=-1)

    def _charge_rows_t(self, batch: MolBatch, xT: jax.Array) -> jax.Array:
        """(2, A) charge-equilibrated q/f rows — the concat-free core of
        :meth:`_charge_equilibration_t` (Q3; reference gnn.py:622-658).
        The fused inject kernel (ops/bin_inject.py) overlays these rows
        in-VMEM instead of materializing a full (D, A) copy."""
        nb, mb, ab = batch.pool_mat.shape
        ohf = batch.pool_mat.astype(jnp.float32)
        q = xT[0:1, :].astype(jnp.float32)
        f = jnp.clip(xT[1:2, :].astype(jnp.float32), min=1e-6)
        qf = jnp.concatenate([q, f], axis=0).reshape(2, nb, ab)
        QF_u = jnp.einsum("bma,cba->bmc", ohf, qf)  # (nb, mb, 2)
        F_u = jnp.clip(QF_u[..., 1:2] + 1e-6, min=1e-6)
        dQ = batch.total_charge.reshape(nb, mb, 1) - QF_u[..., 0:1]
        per_atom = jnp.einsum(
            "bma,bmc->cba", ohf, jnp.concatenate([1.0 / F_u, dQ], axis=-1)
        ).reshape(2, nb * ab)
        f_new = f * per_atom[0:1]
        q_new = q + f_new * per_atom[1:2]
        # uncovered (padding) atoms: inv_F = 0 ⇒ f_new = 0, q_new = q
        return jnp.concatenate(
            [q_new.astype(xT.dtype), f_new.astype(xT.dtype)], axis=0
        )

    def _charge_equilibration_t(self, batch: MolBatch, xT: jax.Array) -> jax.Array:
        """Feature-major twin of the binned charge-equilibration branch
        (Q3; reference gnn.py:622-658): q/f are ROWS 0/1 of xT, so the
        per-molecule sums touch only (2, A)-scale data plus two small
        pool-matrix einsums — no (A, D) slicing/concat round-trips."""
        return jnp.concatenate(
            [self._charge_rows_t(batch, xT), xT[2:]], axis=0
        )

    def _charge_equilibration_t_seg(
        self, batch: MolBatch, xT: jax.Array, B: int, graph_axis: str | None
    ) -> jax.Array:
        """Feature-major charge equilibration via per-molecule SEGMENT sums
        (Q3) — the halo-shard twin of ``_charge_equilibration_t``: halo
        shards carry no pool_mat, and split molecules need their Q_u/F_u
        psum'd over the graph axis so they equilibrate globally
        (reference gnn.py:622-658; per-molecule partials as in the flat
        halo path at ``_charge_equilibration``)."""
        q = xT[0:1, :].astype(jnp.float32)  # (1, A)
        f = jnp.clip(xT[1:2, :].astype(jnp.float32), min=1e-6)
        seg = jnp.where(batch.atom_mask, batch.atom_mol, B)
        mask = batch.atom_mask[None, :]
        Q_u = segment_sum(jnp.where(mask, q, 0.0).T, seg, B)  # (B, 1)
        F_u = segment_sum(jnp.where(mask, f, 0.0).T, seg, B)
        if graph_axis is not None:
            Q_u = jax.lax.psum(Q_u, graph_axis)
            F_u = jax.lax.psum(F_u, graph_axis)
        F_u = jnp.clip(F_u + 1e-6, min=1e-6)
        dQ = batch.total_charge[:, None] - Q_u
        f_new = f * (1.0 / F_u)[batch.atom_mol].T
        q_new = q + f_new * dQ[batch.atom_mol].T
        return jnp.concatenate(
            [q_new.astype(xT.dtype), f_new.astype(xT.dtype), xT[2:]], axis=0
        )

    def _stereochemistry_t(
        self, batch: MolBatch, xT: jax.Array, proj_kb, ctx
    ) -> jax.Array:
        """Feature-major stereochemistry injection (Q6/Q7).  cis/trans is
        one batched matmul against the dense signed per-bin adjacency
        (single-chip binned batches) or the transposed segment scatter
        (halo shards, whose chunked fragments may split a pair across
        bins — same op sequence as the row-major ``_cis_trans_features``);
        the tetrahedral polynomial runs on the small (C, 4, D) gather (one
        (A, D)-scale transpose to return feature-major); the (3D, D)
        projection is row-sliced so no 3D-wide concat exists."""
        from ..ops.halo import binned_local_agg_t

        D, A = xT.shape
        stereo_adj = ctx.get("stereo_adj")
        if stereo_adj is not None:
            cctT = xT + binned_local_agg_t(xT, stereo_adj, xT.dtype).astype(
                xT.dtype
            )
        else:
            # transposed twin of _cis_trans_features' segment path: gather
            # source COLUMNS, scatter into destination columns (pair rows
            # are device-local by the halo partitioner's construction)
            cis_src = jnp.where(
                batch.cis_mask[:, None],
                xT[:, jnp.clip(batch.cis_pairs[:, 0], 0, A - 1)].T,
                0.0,
            )
            trans_src = jnp.where(
                batch.trans_mask[:, None],
                xT[:, jnp.clip(batch.trans_pairs[:, 0], 0, A - 1)].T,
                0.0,
            )
            contrib = segment_sum(
                -cis_src, batch.cis_pairs[:, 1], A
            ) + segment_sum(trans_src, batch.trans_pairs[:, 1], A)
            cctT = xT + contrib.T.astype(xT.dtype)

        # tetrahedral: gather columns, run the row-major polynomial on the
        # small (C, 4, D) block, scatter, transpose the delta back
        nbrs = ctx["tet_nbrs"]  # (C, 4)
        C = nbrs.shape[0]
        emb_raw = xT[:, nbrs.reshape(-1)].T.reshape(C, 4, D)
        mags = jnp.linalg.norm(emb_raw, axis=-1, keepdims=True)
        emb = emb_raw / jnp.maximum(mags, 1e-8)
        squares = emb**2
        s1, s2, s3 = (jnp.roll(squares, -k, axis=1) for k in (1, 2, 3))
        e1, e2, e3 = (jnp.roll(emb, -k, axis=1) for k in (1, 2, 3))
        chir = s1 * (e2 - e3) + s2 * (e3 - e1) + s3 * (e1 - e2)
        chir = chir * jnp.tanh(jnp.mean(mags, axis=1, keepdims=True) / 3.0)
        chir = jnp.where(batch.tet_mask[:, None, None], chir, 0.0)
        deltaT = segment_sum(chir.reshape(-1, D), ctx["tet_flat"], A).T
        tetT = jnp.where(
            ctx["any_tet"],
            jnp.where(
                ctx["tet_nz"][None, :], xT + deltaT.astype(xT.dtype), 0.0
            ).astype(xT.dtype),
            xT,
        )

        k, b = proj_kb
        y = sum(
            jax.lax.dot_general(
                k[i * D : (i + 1) * D].astype(p.dtype),
                p,
                (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
            )
            for i, p in enumerate((xT, cctT, tetT))
        )
        return y.astype(xT.dtype) + b.astype(xT.dtype)[:, None]

    def _stereo_context(self, batch: MolBatch, A: int, graph_axis, cdt):
        """Index-only stereo precomputation, hoisted out of the per-layer
        loop (it is identical for every layer; round-3 profile of
        BASELINE.json config 3 showed the per-layer rebuild + the (A, D)
        cis/trans segment scatters dominating the step).

        Single-chip binned batches additionally get a dense per-bin SIGNED
        adjacency (trans +1, cis −1 multiplicities): the per-layer
        cis/trans contribution becomes one batched MXU matmul instead of
        two row-serial segment scatters.  Exact for whole-in-bin
        molecules; halo shards keep the segment path (chunked fragments
        may put a pair's endpoints in different bins).
        """
        ctx: Dict[str, Any] = {}
        if batch.bin_adj is not None and batch.halo_send_idx is None:
            nb, ab, _ = batch.bin_adj.shape

            def _flat(pairs, mask):
                src, dst = pairs[:, 0], pairs[:, 1]
                ok = mask & (dst < A)
                return jnp.where(
                    ok, (dst // ab) * (ab * ab) + (dst % ab) * ab + src % ab,
                    nb * ab * ab,
                )

            idx = jnp.concatenate(
                [_flat(batch.cis_pairs, batch.cis_mask),
                 _flat(batch.trans_pairs, batch.trans_mask)]
            )
            # counts are small signed integers (±8 per stereo bond incl.
            # the Q7 duplication) — stored int8 like bin_adj (round 5:
            # halves the adjacency's HBM read per layer; every consumer
            # casts to the compute dtype at use)
            vals = jnp.concatenate(
                [jnp.full((batch.cis_pairs.shape[0],), -1.0, jnp.float32),
                 jnp.full((batch.trans_pairs.shape[0],), 1.0, jnp.float32)]
            )
            ctx["stereo_adj"] = (
                segment_sum(vals, idx, nb * ab * ab)
                .reshape(nb, ab, ab)
                .astype(jnp.int8)
            )
        nbrs = jnp.clip(batch.tet_nbrs, 0, A - 1)  # (C, 4)
        flat_idx = jnp.where(batch.tet_mask[:, None], batch.tet_nbrs, A).reshape(-1)
        counts = segment_sum(jnp.ones_like(flat_idx, jnp.float32), flat_idx, A)
        any_tet = jnp.any(batch.tet_mask)
        if graph_axis is not None:
            # "any chiral centers in the BATCH" is global: the reference
            # zeroes ALL non-neighbor atoms when any center exists anywhere
            any_tet = jax.lax.pmax(any_tet.astype(jnp.int32), graph_axis) > 0
        ctx["tet_nbrs"] = nbrs
        ctx["tet_flat"] = flat_idx
        ctx["tet_nz"] = counts > 0  # (A,)
        ctx["any_tet"] = any_tet
        return ctx

    def _stereochemistry(
        self,
        batch: MolBatch,
        x_other: jax.Array,
        A: int,
        proj_kb,
        ctx,
    ) -> jax.Array:
        """Stereochemistry injection (Q6/Q7; reference gnn.py:310-509).

        The [x ‖ cis_trans ‖ tet] concat is never materialized: each part
        hits its row block of the (3D, D) projection kernel directly (fp32
        partial sums; reassociation-only difference — same pattern as
        layers.py ``_proj``)."""
        cis_trans = self._cis_trans_features(batch, x_other, A, ctx)
        tet = self._tetrahedral_features(batch, x_other, A, ctx)
        k, b = proj_kb
        D = x_other.shape[-1]
        y = sum(
            jnp.dot(
                p, k[i * D : (i + 1) * D].astype(p.dtype),
                preferred_element_type=jnp.float32,
            )
            for i, p in enumerate((x_other, cis_trans, tet))
        )
        return y.astype(x_other.dtype) + b.astype(x_other.dtype)

    def _cis_trans_features(
        self, batch: MolBatch, x: jax.Array, A: int, ctx=None
    ) -> jax.Array:
        """Cis/trans scatter: targets accumulate −source (cis) and +source
        (trans) features (reference gnn.py:465-509).  The general scatter
        path equals the reference's empty-input early return, so no special
        case is needed.  Binned batches use the dense signed per-bin
        adjacency from ``_stereo_context`` — one batched matmul."""
        adj = ctx.get("stereo_adj") if ctx is not None else None
        if adj is not None:
            nb, ab, _ = adj.shape
            D = x.shape[-1]
            contrib = jnp.einsum(
                "bij,bjd->bid",
                adj.astype(x.dtype),
                x.reshape(nb, ab, D),
                preferred_element_type=jnp.float32,
            ).reshape(A, D)
            return x + contrib.astype(x.dtype)
        cis_src = jnp.where(batch.cis_mask[:, None], x[jnp.clip(batch.cis_pairs[:, 0], 0, A - 1)], 0.0)
        trans_src = jnp.where(
            batch.trans_mask[:, None], x[jnp.clip(batch.trans_pairs[:, 0], 0, A - 1)], 0.0
        )
        contrib = segment_sum(-cis_src, batch.cis_pairs[:, 1], A) + segment_sum(
            trans_src, batch.trans_pairs[:, 1], A
        )
        return x + contrib

    def _tetrahedral_features(
        self,
        batch: MolBatch,
        x: jax.Array,
        A: int,
        ctx=None,
    ) -> jax.Array:
        """Tetrahedral chirality feature (reference gnn.py:387-462):
        normalize the 4 neighbor embeddings, antisymmetric roll polynomial,
        scale by tanh(mean‖emb‖/3), scatter-add into the neighbors, then
        zero all atoms that are not neighbors of any chiral center.  If the
        batch has no chiral centers the input is returned unchanged.

        Halo mode: rows are device-local (the partitioner co-locates every
        row's atoms), so the polynomial and the counts are local — but the
        "any chiral centers in the BATCH" gate is global (pmax'd in
        ``_stereo_context``: reference semantics zero ALL non-neighbor
        atoms when any center exists anywhere)."""
        if ctx is None:
            ctx = self._stereo_context(batch, A, None, None)
        nbrs = ctx["tet_nbrs"]  # (C, 4) clipped
        emb_raw = x[nbrs]  # (C, 4, D)
        mags = jnp.linalg.norm(emb_raw, axis=-1, keepdims=True)  # (C, 4, 1)
        emb = emb_raw / jnp.maximum(mags, 1e-8)

        squares = emb**2
        s1 = jnp.roll(squares, -1, axis=1)
        s2 = jnp.roll(squares, -2, axis=1)
        s3 = jnp.roll(squares, -3, axis=1)
        e1 = jnp.roll(emb, -1, axis=1)
        e2 = jnp.roll(emb, -2, axis=1)
        e3 = jnp.roll(emb, -3, axis=1)
        chir = s1 * (e2 - e3) + s2 * (e3 - e1) + s3 * (e1 - e2)

        scale = jnp.tanh(jnp.mean(mags, axis=1, keepdims=True) / 3.0)
        chir = chir * scale
        chir = jnp.where(batch.tet_mask[:, None, None], chir, 0.0)

        updated = x + segment_sum(
            chir.reshape(-1, x.shape[-1]), ctx["tet_flat"], A
        )
        zeroed = jnp.where(ctx["tet_nz"][:, None], updated, 0.0)
        return jnp.where(ctx["any_tet"], zeroed, x)
