"""Edge-partitioned (graph-parallel) training.

The reference has no model/graph parallelism at all (SURVEY §2a: DDP only).
This module implements the graph-world analog of sequence parallelism
called for by BASELINE.json: a molecule batch's *edges* are sharded over
the mesh 'graph' axis, each device computes the partial neighborhood
aggregation for its edge shard against the (replicated) atom features, and
the partials are psum'd over ICI inside every message-passing layer
(ShellConvolutionLayer.graph_axis).  The dense compute is replicated over
the graph axis; data parallelism composes on the 'data' axis.

Gradient correctness: the loss is differentiated *through* shard_map, so
JAX's SPMD autodiff inserts the right collective transposes (the edge
gather/scatter contributions are summed over 'graph' exactly once, dense
contributions are not double-counted).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp
import optax
from jax.sharding import Mesh, PartitionSpec as P

from ..models.gnn import GNN
from ..models.losses import create_loss_function


def make_graph_parallel_train_step(
    model: GNN,
    config,  # TrainConfig
    optimizer: optax.GradientTransformation,
    mesh: Mesh,
) -> Callable:
    """Train step over stacked (n_data, n_graph, ...) batches
    (BatchLoader(stack_devices=n_data, edge_shards=n_graph)).

    Signature matches trainer.make_train_step:
    step(params, opt_state, batch, lr, rng) -> (params, opt_state, loss, n).
    """
    gmodel = GNN(dataclasses.replace(model.config, graph_axis="graph"))
    base_loss = create_loss_function(
        config.loss_function,
        config.task_type,
        config.multitask_weights,
        lambda_reg=config.evidential_lambda,
    )

    def shard_loss(params, batch, rng):
        local = jax.tree_util.tree_map(lambda x: x[0, 0], batch)
        # dropout: distinct across 'data', IDENTICAL across 'graph' (the
        # dense compute is replicated over the graph axis)
        key = jax.random.fold_in(rng, jax.lax.axis_index("data"))
        out = gmodel.apply(params, local, deterministic=False, rngs={"dropout": key})
        loss = base_loss(out.predictions, local.targets, local.graph_mask)
        n = jnp.sum(local.graph_mask).astype(jnp.float32)
        loss_sum = jax.lax.psum(loss * n, "data")
        n_tot = jnp.maximum(jax.lax.psum(n, "data"), 1.0)
        return loss_sum / n_tot, n_tot

    # check_vma=False: the replication checker cannot prove the outputs are
    # replicated over 'graph' through the transpose (grad) pass, although
    # they are by construction (dense compute replicated, edge partials
    # psum'd); correctness is asserted against single-device numerics in
    # tests/test_graph_parallel.py.
    smapped = jax.shard_map(
        shard_loss,
        mesh=mesh,
        in_specs=(P(), P(("data",), ("graph",)), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )

    def step(params, opt_state, batch, lr, rng):
        (loss, n), grads = jax.value_and_grad(
            lambda p: smapped(p, batch, rng), has_aux=True
        )(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        params = optax.apply_updates(params, updates)
        return params, opt_state, loss, n

    return jax.jit(step, donate_argnums=(0, 1))
