"""Training loop (reference: src/training/trainer.py:102-474, redesigned).

TPU-native structure:
- one jitted train step (value_and_grad → global-norm clip 1.0 → Adam),
  compiled once per bucket shape; the LR is passed as data so host-side
  schedulers (torch-semantics, see schedulers.py) never trigger recompiles;
- data parallelism is a shard_map over the mesh 'data'/'graph' axes with
  sample-count-weighted psum of loss and grads — the DDP replacement
  (reference: src/utils/distributed.py, src/training/trainer.py:173-181);
- early stopping tracks best val loss on host; best params are kept as a
  device copy and restored at the end (the reference holds a CPU state_dict
  on rank 0 and broadcasts; with replicated jax params a copy suffices);
- transfer learning: pretrained params passed in are *used as-is* — the
  reference accidentally re-initializes weights inside train_gnn (quirk Q4,
  reference src/training/trainer.py:205-209); we fix that and document the
  deviation.
"""

from __future__ import annotations

import dataclasses
import os
import time
from typing import Any, Callable, Dict, List, Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
import optax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..data.batching import MolBatch
from ..data.dataset import BatchLoader
from ..models.gnn import GNN
from ..models.losses import create_loss_function
from .evaluator import evaluate
from .schedulers import create_scheduler


@dataclasses.dataclass
class TrainConfig:
    epochs: int = 50
    learning_rate: float = 0.00025
    loss_function: str = "l1"
    task_type: str = "regression"
    multitask_weights: Optional[Sequence[float]] = None
    evidential_lambda: float = 1.0
    grad_clip: float = 1.0
    early_stopping: bool = False
    patience: int = 25
    lr_scheduler: str = "ReduceLROnPlateau"
    lr_reduce_factor: float = 0.5
    lr_patience: int = 10
    lr_cosine_t_max: int = 10
    lr_step_size: int = 10
    lr_step_gamma: float = 0.1
    lr_exp_gamma: float = 0.95
    layer_wise_lr_decay: bool = False
    lr_decay_factor: float = 0.8
    freeze_patterns: Optional[Sequence[str]] = None  # freeze matching leaves
    unfreeze_patterns: Optional[Sequence[str]] = None  # train ONLY matching
    log_every: int = 0  # epochs between prints; 0 = every epoch


@dataclasses.dataclass
class TrainResult:
    params: Any
    best_val_loss: float
    best_epoch: int
    history: List[Dict[str, float]]
    avg_epoch_seconds: float


def _param_depth(path) -> int:
    """Name depth ≈ the reference's dot-count layer-wise LR grouping
    (reference: src/utils/optimization.py:9-58)."""
    return max(len(path) - 1, 0)


def make_optimizer(config: TrainConfig, params=None) -> optax.GradientTransformation:
    """Global-norm clip + Adam; LR is applied separately inside the step so
    schedulers are free.  With layer_wise_lr_decay, per-leaf scale factors
    decay with parameter name depth like the reference."""
    chain = [optax.clip_by_global_norm(config.grad_clip), optax.scale_by_adam()]
    if params is not None and (config.freeze_patterns or config.unfreeze_patterns):
        from ..utils.optimization import freeze_mask

        if config.unfreeze_patterns:
            mask = freeze_mask(params, config.unfreeze_patterns, freeze=False)
        else:
            mask = freeze_mask(params, config.freeze_patterns, freeze=True)
        chain.append(
            optax.GradientTransformation(
                init=lambda p: optax.EmptyState(),
                update=lambda u, s, p=None: (
                    jax.tree_util.tree_map(lambda g, m: g * m, u, mask),
                    s,
                ),
            )
        )
    if config.layer_wise_lr_decay and params is not None:
        depths = jax.tree_util.tree_map_with_path(
            lambda path, _: config.lr_decay_factor ** _param_depth(path), params
        )
        chain.append(
            optax.GradientTransformation(
                init=lambda p: optax.EmptyState(),
                update=lambda u, s, p=None: (
                    jax.tree_util.tree_map(lambda g, d: g * d, u, depths),
                    s,
                ),
            )
        )
    chain.append(optax.scale(-1.0))
    return optax.chain(*chain)


def make_loss_fn(model: GNN, config: TrainConfig) -> Callable:
    base = create_loss_function(
        config.loss_function,
        config.task_type,
        config.multitask_weights,
        lambda_reg=config.evidential_lambda,
    )

    def loss_fn(params, batch: MolBatch, dropout_rng=None):
        kwargs = {}
        if dropout_rng is not None:
            kwargs = {"rngs": {"dropout": dropout_rng}}
        out = model.apply(
            params, batch, deterministic=dropout_rng is None,
            train_mode=True, **kwargs
        )
        return base(out.predictions, batch.targets, batch.graph_mask)

    return loss_fn


def _tpu_compiler_options():
    """Raise the per-kernel scoped-vmem carve-out on TPU: the default
    16 MB rejects the MP megakernel's backward at its fastest grouping
    (16.93M scoped) even though v5e has far more physical VMEM.  Harmless
    where unsupported (cleared on error by the caller)."""
    import jax

    if jax.default_backend() != "tpu":
        return None
    kib = os.environ.get("AIMNET_SCOPED_VMEM_KIB", "49152")
    return {"xla_tpu_scoped_vmem_limit_kib": kib}


def _jit_step(step):
    import jax

    opts = _tpu_compiler_options()
    if opts is not None:
        try:
            return jax.jit(step, donate_argnums=(0, 1), compiler_options=opts)
        except TypeError:  # older jax without compiler_options
            pass
    return jax.jit(step, donate_argnums=(0, 1))


def make_train_step(
    model: GNN,
    config: TrainConfig,
    optimizer: optax.GradientTransformation,
    mesh: Optional[Mesh] = None,
) -> Callable:
    """Build the jitted train step.

    Signature: step(params, opt_state, batch, lr, rng) -> (params,
    opt_state, loss_mean, n_real).  With a mesh, ``batch`` is a stacked
    (n_devices, ...) pytree from BatchLoader(stack_devices=N) and the step
    is shard_mapped with psum grad reduction over both mesh axes.
    """
    loss_fn = make_loss_fn(model, config)

    def local_grads(params, batch, rng):
        loss, grads = jax.value_and_grad(loss_fn)(params, batch, rng)
        n = jnp.sum(batch.graph_mask).astype(jnp.float32)
        # weight by local real-sample count so the global mean is exact
        grads = jax.tree_util.tree_map(lambda g: g * n, grads)
        return loss * n, grads, n

    def apply_update(params, opt_state, grads, lr):
        updates, opt_state = optimizer.update(grads, opt_state, params)
        updates = jax.tree_util.tree_map(lambda u: u * lr, updates)
        return optax.apply_updates(params, updates), opt_state

    if mesh is None:

        def step(params, opt_state, batch, lr, rng):
            loss_sum, grads, n = local_grads(params, batch, rng)
            n = jnp.maximum(n, 1.0)
            grads = jax.tree_util.tree_map(lambda g: g / n, grads)
            params, opt_state = apply_update(params, opt_state, grads, lr)
            return params, opt_state, loss_sum / n, n

        # donate params/opt_state buffers: the updated pytrees reuse them
        return _jit_step(step)

    shard_map = jax.shard_map

    axes = ("data", "graph")

    def sharded(params, opt_state, batch, lr, rng):
        local_batch = jax.tree_util.tree_map(lambda x: x[0], batch)
        # decorrelate dropout across devices
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axes[0]))
        loss_sum, grads, n = local_grads(params, local_batch, rng)
        loss_sum = jax.lax.psum(loss_sum, axes)
        grads = jax.lax.psum(grads, axes)
        n = jnp.maximum(jax.lax.psum(n, axes), 1.0)
        grads = jax.tree_util.tree_map(lambda g: g / n, grads)
        params, opt_state = apply_update(params, opt_state, grads, lr)
        return params, opt_state, loss_sum / n, n

    step = shard_map(
        sharded,
        mesh=mesh,
        in_specs=(P(), P(), P(axes), P(), P()),
        out_specs=(P(), P(), P(), P()),
    )
    return _jit_step(step)


def prefetch_batches(loader, sharding=None, size: int = 2):
    """Two-stage background prefetch: one thread collates, a second
    `jax.device_put`s (with ``sharding`` when given, so shard_mapped steps
    see correctly-placed inputs) — the pipeline rate is
    max(collate, transfer, device-step) instead of their sum, which
    matters when the host↔device link is slow (remote-attached TPUs:
    BASELINE.md config 4 measured transfer ≈ 4× collate time).

    Yields (device_batch, real_edge_count).  The reference's DataLoader
    worker processes play this role (SURVEY §7: double-buffered host
    prefetch).
    """
    import queue
    import threading

    from ..data.native_batch import SCRATCH_SETS

    # In-flight batches alias loader scratch buffers: 1 being-built +
    # `size` collate-queued + 1 in-transfer + `size` device-queued + 1
    # in-step.  A deeper pipeline than the loaders' scratch rotation
    # silently reintroduces the round-4 buffer-overwrite corruption, so
    # fail loudly instead (ADVICE r4).
    if 2 * size + 3 > SCRATCH_SETS:
        raise ValueError(
            f"prefetch size={size} can hold {2 * size + 3} batches in "
            f"flight but loaders rotate only {SCRATCH_SETS} scratch sets "
            "(aimnet_x2d_tpu/data/native_batch.py::SCRATCH_SETS) — raise "
            "SCRATCH_SETS or lower the prefetch size"
        )

    q_host: "queue.Queue" = queue.Queue(maxsize=size)
    q_dev: "queue.Queue" = queue.Queue(maxsize=size)
    sentinel = object()
    errors: List[BaseException] = []

    def collate_worker():
        try:
            for batch in loader:
                if errors:
                    # transfer died: stop producing (its drain loop keeps
                    # q_host from filling while we get here)
                    break
                if batch.edges_slim:
                    # slim binned batches: real-edge count = Σ multiplicity
                    edges = int(np.asarray(batch.bin_adj, np.int64).sum())
                    if batch.halo_adj is not None:
                        edges += int(np.asarray(batch.halo_adj, np.int64).sum())
                else:
                    edges = int(np.sum(np.asarray(batch.edge_mask)))
                q_host.put((batch, edges))
        except BaseException as e:  # surface collate errors in the main thread
            errors.append(e)
        finally:
            q_host.put(sentinel)

    def transfer_worker():
        saw_sentinel = False
        try:
            while True:
                item = q_host.get()
                if item is sentinel:
                    saw_sentinel = True
                    break
                if errors:
                    break
                batch, edges = item
                if sharding is not None:
                    batch = jax.device_put(batch, sharding)
                else:
                    batch = jax.device_put(batch)
                q_dev.put((batch, edges))
        except BaseException as e:
            errors.append(e)
        finally:
            # Drain q_host until the collate sentinel so a transfer error
            # (e.g. device_put OOM) can't leave the collate worker blocked
            # on a full queue → main-thread join() deadlock (ADVICE r3).
            while not saw_sentinel:
                if q_host.get() is sentinel:
                    saw_sentinel = True
            q_dev.put(sentinel)

    t1 = threading.Thread(target=collate_worker, daemon=True)
    t2 = threading.Thread(target=transfer_worker, daemon=True)
    t1.start()
    t2.start()
    while True:
        item = q_dev.get()
        if item is sentinel:
            break
        yield item
    t1.join()
    t2.join()
    if errors:
        raise errors[0]


def train(
    model: GNN,
    params,
    train_loader: BatchLoader,
    val_loader: BatchLoader,
    config: TrainConfig,
    *,
    mesh: Optional[Mesh] = None,
    rng: Optional[jax.Array] = None,
    pipeline=None,
    verbose: bool = True,
    tracker=None,
    checkpointer=None,
    checkpoint_every: int = 10,
    train_step=None,
) -> TrainResult:
    """Epoch loop with validation, LR scheduling, early stopping, and
    best-model restore (reference: src/training/trainer.py:185-474).

    TPU-native additions the reference lacks: periodic orbax checkpointing
    with resume (``checkpointer``), optional wandb tracking (``tracker``),
    an edges/sec throughput meter, and a pluggable ``train_step`` (e.g.
    the edge-partitioned step from parallel/graph_parallel.py).
    """
    optimizer = make_optimizer(config, params)
    opt_state = optimizer.init(params)
    step = train_step or make_train_step(model, config, optimizer, mesh)

    start_epoch = 0
    restored_aux: Dict[str, float] = {}
    restored_best = None
    if checkpointer is not None:
        restored = checkpointer.restore(params, opt_state)
        if restored is not None:
            start_epoch, params, opt_state, restored_aux, restored_best = restored
            start_epoch += 1
            if verbose:
                print(f"[resume] restored checkpoint at epoch {start_epoch - 1}")
    scheduler = create_scheduler(
        config.lr_scheduler,
        config.learning_rate,
        lr_reduce_factor=config.lr_reduce_factor,
        lr_patience=config.lr_patience,
        lr_cosine_t_max=config.lr_cosine_t_max,
        lr_step_size=config.lr_step_size,
        lr_step_gamma=config.lr_step_gamma,
        lr_exp_gamma=config.lr_exp_gamma,
    )
    rng = rng if rng is not None else jax.random.PRNGKey(0)

    best_val = float("inf")
    best_epoch = -1
    # copy: the jitted step donates its params input, which would otherwise
    # invalidate this alias if validation never improves.  On resume the
    # checkpointed best-so-far weights take over (a run resumed after its
    # best epoch must not lose them).
    best_params = jax.tree_util.tree_map(
        jnp.copy, params if restored_best is None else restored_best
    )
    epochs_no_improve = 0
    history: List[Dict[str, float]] = []
    lr = config.learning_rate
    epoch_times: List[float] = []

    # resume host-side training state (LR, scheduler, early-stop counters)
    if restored_aux:
        lr = restored_aux.get("lr", lr)
        best_val = restored_aux.get("best_val", best_val)
        best_epoch = int(restored_aux.get("best_epoch", best_epoch))
        epochs_no_improve = int(restored_aux.get("epochs_no_improve", 0))
        scheduler.load_state_dict(
            {k[len("sched_"):]: v for k, v in restored_aux.items() if k.startswith("sched_")}
        )

    # Sharding for prefetched stacked batches (leading device axis over the
    # whole mesh); None → default-device placement.  With a real 'graph'
    # axis the batches carry TWO leading device axes, (n_data, n_graph,
    # ...), from the halo / edge-shard loaders — shard axis 0 over 'data'
    # and axis 1 over 'graph' to match the graph-parallel step's in_specs.
    batch_sharding = None
    if mesh is not None:
        if dict(mesh.shape).get("graph", 1) > 1:
            batch_sharding = NamedSharding(mesh, P("data", "graph"))
        else:
            batch_sharding = NamedSharding(mesh, P(tuple(mesh.axis_names)))

    for epoch in range(start_epoch, config.epochs):
        t0 = time.time()
        train_loader.set_epoch(epoch)
        # Per-step (loss, n) stay on device — fetching them every step would
        # force a blocking round-trip per step (round-1 weakness); one
        # device_get at epoch end drains the async dispatch queue instead.
        step_stats: List[Tuple[jax.Array, jax.Array]] = []
        edges = 0
        for batch, batch_edges in prefetch_batches(train_loader, batch_sharding):
            rng, dropout_rng = jax.random.split(rng)
            edges += batch_edges
            params, opt_state, loss, n = step(
                params, opt_state, batch, jnp.float32(lr), dropout_rng
            )
            step_stats.append((loss, n))
        stats = jax.device_get(step_stats)
        train_seconds = time.time() - t0
        loss_sum = sum(float(l) * float(n) for l, n in stats)
        n_sum = sum(float(n) for _, n in stats)
        train_loss = loss_sum / max(n_sum, 1.0)

        val_metrics = evaluate(
            model, params, val_loader, config=config, pipeline=pipeline, mesh=mesh
        )
        val_loss = val_metrics["loss"]
        lr = scheduler.step(epoch, val_loss)
        dt = time.time() - t0
        epoch_times.append(dt)

        record = {
            "epoch": epoch,
            "train_loss": train_loss,
            "val_loss": val_loss,
            "lr": lr,
            "seconds": dt,
            "edges_per_sec": edges / max(train_seconds, 1e-9),
            **{
                f"val_{k}": v
                for k, v in val_metrics.items()
                if k != "loss" and not isinstance(v, dict)
            },
        }
        history.append(record)
        if tracker is not None:
            tracker.log(record, step=epoch)
        if verbose and (config.log_every == 0 or epoch % config.log_every == 0):
            print(
                f"[epoch {epoch:3d}] train {train_loss:.5f}  val {val_loss:.5f}  "
                f"lr {lr:.2e}  ({dt:.1f}s, {record['edges_per_sec']/1e6:.1f}M edges/s)"
            )
        if val_loss < best_val:
            best_val = val_loss
            best_epoch = epoch
            best_params = jax.tree_util.tree_map(jnp.copy, params)
            epochs_no_improve = 0
        else:
            epochs_no_improve += 1

        if checkpointer is not None and (epoch + 1) % checkpoint_every == 0:
            aux = {
                "lr": float(lr),
                "best_val": float(best_val),
                "best_epoch": float(best_epoch),
                "epochs_no_improve": float(epochs_no_improve),
                **{f"sched_{k}": v for k, v in scheduler.state_dict().items()},
            }
            checkpointer.save(epoch, params, opt_state, aux, best_params=best_params)

        if (
            config.early_stopping
            and epochs_no_improve >= config.patience
            and val_loss >= best_val
        ):
            if verbose:
                print(f"[early stop] epoch {epoch}, best {best_val:.5f} @ {best_epoch}")
            break

    return TrainResult(
        params=best_params,
        best_val_loss=best_val,
        best_epoch=best_epoch,
        history=history,
        avg_epoch_seconds=float(np.mean(epoch_times)) if epoch_times else 0.0,
    )
