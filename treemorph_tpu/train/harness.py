"""Training harness: optax AdamW + masked losses + data-parallel jit.

Capability parity with the reference harness
(``/root/reference/Modules/train_utils.py``): per-epoch train/validate loops,
the x50 loss scaling at backward (``train_utils.py:58``), global-norm grad
clipping at 1.0 (``:60`` — torch's ``clip_grad_norm_(params, True)`` casts
``True`` to 1.0), per-epoch cosine-warm-restart LR, early stopping with
best-checkpoint save, and loss logging.

TPU redesign:
- no AMP GradScaler: bf16 on TPU needs no loss scaling (models run f32 by
  default here; mixed precision is a model-level choice);
- one jitted train step per batch-shape bucket; the data layer buckets N so
  recompiles are bounded;
- data parallelism is jit-over-sharded-arrays: the batch is sharded on its
  leading axis over a 1-D ``Mesh``, parameters are replicated, and the
  cross-shard gradient reduction falls out of the masked-mean loss under
  GSPMD (net-new vs the single-GPU reference, SURVEY.md §2.2).
"""

from __future__ import annotations

import logging
import time
from functools import partial
from typing import Any, Callable, Optional

import flax.struct
import jax
import jax.numpy as jnp
import optax

from ..parallel.mesh import pad_batch_to_multiple, replicate, shard_batch

logger = logging.getLogger("treemorph_tpu.train")

LOSS_BACKWARD_SCALE = 50.0  # reference train_utils.py:58
GRAD_CLIP_NORM = 1.0  # reference train_utils.py:60


class TrainState(flax.struct.PyTreeNode):
    params: Any
    batch_stats: Any
    opt_state: Any
    step: jax.Array


def trainable_mask(params, fixed_modules: tuple) -> Any:
    """Bool pytree: False for every leaf under a top-level submodule
    named in ``fixed_modules`` (e.g. ``("backbone",)``)."""
    return {
        k: jax.tree.map(lambda _: k not in fixed_modules, sub)
        for k, sub in params.items()
    }


def make_optimizer(
    weight_decay: float = 1e-3,
    fixed_modules: tuple = (),
) -> optax.GradientTransformation:
    """AdamW with dynamic LR applied in the step (see make_train_step).

    ``fixed_modules`` freezes the named top-level submodules for transfer
    learning — the reference's ``fixed_modules`` constructor arg that sets
    ``requires_grad=False`` on their parameters
    (/root/reference/Modules/TreeLearn/TreeLearn.py:65-87). Frozen leaves
    get zeroed gradients (so they never enter the global-norm clip, like
    absent grads in torch) and are excluded from weight decay.
    """
    fixed = tuple(fixed_modules)
    if not fixed:
        return optax.chain(
            optax.clip_by_global_norm(GRAD_CLIP_NORM),
            optax.scale_by_adam(),
            optax.add_decayed_weights(weight_decay),
            optax.scale(-1.0),
        )
    return optax.chain(
        optax.masked(
            optax.set_to_zero(),
            lambda params: jax.tree.map(
                lambda t: not t, trainable_mask(params, fixed)
            ),
        ),
        optax.clip_by_global_norm(GRAD_CLIP_NORM),
        optax.scale_by_adam(),
        optax.add_decayed_weights(
            weight_decay, mask=lambda params: trainable_mask(params, fixed)
        ),
        optax.scale(-1.0),
    )


def create_train_state(
    variables: dict, tx: optax.GradientTransformation
) -> TrainState:
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    return TrainState(
        params=params,
        batch_stats=batch_stats,
        opt_state=tx.init(params),
        step=jnp.zeros((), jnp.int32),
    )


def make_train_step(
    forward_fn: Callable,
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    fixed_modules: tuple = (),
    mesh=None,
    axis_name: str = "data",
):
    """Build the jitted train step.

    forward_fn(params, batch_stats, batch, train, rng)
        -> (output dict, new_batch_stats)
    loss_fn(output, batch) -> (loss, loss_dict)

    ``fixed_modules`` (pair it with the same arg on
    :func:`make_optimizer`) keeps the named top-level submodules' BN
    running stats untouched — the reference forces fixed modules' BN to
    eval mode during training (TreeLearn.py:79-87). Deviation: the
    forward still *normalizes* with batch statistics; only the running
    stats are pinned.

    With ``mesh`` the step runs under ``shard_map``: each device flattens,
    voxelizes and differentiates ONLY its local batch shard (under plain
    GSPMD the flat point list spans the global batch, so XLA all-gathers
    it and REPLICATES every voxelize/dedup sort on all devices — measured
    in tests/test_sharding_specs.py). Build the family with the same
    ``axis_name`` so the loss means reduce globally; gradients are then
    exact psums of local contributions of the global loss. Deviations
    from the single-device step: BatchNorm normalizes with per-shard
    batch statistics (torch DDP's default non-sync BN), and the running
    stats are pmean'd across shards so the carried state stays
    replicated; the per-device rng is fold_in(rng, axis_index).
    """
    fixed = tuple(fixed_modules)

    def _step_body(state: TrainState, batch, lr, rng):
        def compute(params):
            out, new_bs = forward_fn(
                params, state.batch_stats, batch, True, rng
            )
            loss, loss_dict = loss_fn(out, batch)
            return loss * LOSS_BACKWARD_SCALE, (new_bs, loss, loss_dict)

        grads, (new_bs, loss, loss_dict) = jax.grad(compute, has_aux=True)(
            state.params
        )
        return grads, new_bs, loss, loss_dict

    def _apply(state: TrainState, grads, new_bs, lr):
        if fixed and new_bs:
            new_bs = {
                k: (state.batch_stats[k] if k in fixed else v)
                for k, v in new_bs.items()
            }
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: u * lr, updates)
        new_params = optax.apply_updates(state.params, updates)
        return TrainState(
            params=new_params,
            batch_stats=new_bs,
            opt_state=new_opt,
            step=state.step + 1,
        )

    if mesh is None:

        # donate the carried train state: params/opt-state buffers are
        # reused in place (all call sites reassign `state = step(...)`),
        # saving an HBM copy of every parameter + Adam moment per step
        @partial(jax.jit, donate_argnums=(0,))
        def train_step(state: TrainState, batch, lr, rng):
            grads, new_bs, loss, loss_dict = _step_body(
                state, batch, lr, rng
            )
            new_state = _apply(state, grads, new_bs, lr)
            return new_state, {"loss": loss, **loss_dict}

        return train_step

    from jax.sharding import PartitionSpec as P

    def local_step(state: TrainState, batch, lr, rng):
        # distinct per-device randomness (FPS / shuffle / droppath)
        rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
        grads, new_bs, loss, loss_dict = _step_body(state, batch, lr, rng)
        # loss_fn psums its masked-mean num/den (families built with
        # axis_name), so local grads are this shard's share of the
        # GLOBAL loss gradient — their psum is exact
        grads = jax.lax.psum(grads, axis_name)
        if new_bs:
            new_bs = jax.lax.pmean(new_bs, axis_name)
        new_state = _apply(state, grads, new_bs, lr)
        return new_state, {"loss": loss, **loss_dict}

    sharded = jax.shard_map(
        local_step,
        mesh=mesh,
        in_specs=(P(), P(axis_name), P(), P()),
        out_specs=(P(), P()),
        check_vma=False,
    )
    return jax.jit(sharded, donate_argnums=(0,))


def make_accum_steps(
    forward_fn: Callable,
    loss_fn: Callable,
    tx: optax.GradientTransformation,
    fixed_modules: tuple = (),
    mesh=None,
    axis_name: str = "data",
):
    """Gradient-accumulation step pair for hierarchical streaming training.

    Matches the reference's one-optimizer-step-per-tree-batch semantics
    (``train_utils.py:46-62`` + ``PointNet2.py:296``): each raster
    minibatch's scaled-loss gradient is summed into an accumulator (torch's
    ``.backward()`` accumulation), the global-norm clip inside ``tx`` is
    applied once to the ACCUMULATED gradient, then a single optimizer step.

    Returns ``(accum_step, apply_step)``:

    - ``accum_step(state, batch, rng, grads) -> (state, grads, metrics)``
      runs forward+backward on one minibatch and adds into ``grads``
      (initialise with ``jax.tree.map(jnp.zeros_like, state.params)``);
      batch_stats update as usual per minibatch.
    - ``apply_step(state, grads, lr) -> state`` applies one optimizer step.

    With ``mesh``, ``accum_step`` runs under ``shard_map`` exactly like
    :func:`make_train_step` (local shards, psum'd grads, pmean'd BN
    running stats); the accumulator and ``apply_step`` stay replicated.
    """

    def accum_body(state: TrainState, batch, rng, grads):
        def compute(params):
            out, new_bs = forward_fn(
                params, state.batch_stats, batch, True, rng
            )
            loss, loss_dict = loss_fn(out, batch)
            return loss * LOSS_BACKWARD_SCALE, (new_bs, loss, loss_dict)

        g, (new_bs, loss, loss_dict) = jax.grad(compute, has_aux=True)(
            state.params
        )
        if mesh is not None:
            g = jax.lax.psum(g, axis_name)
            if new_bs:
                new_bs = jax.lax.pmean(new_bs, axis_name)
        if fixed_modules and new_bs:
            new_bs = {
                k: (state.batch_stats[k] if k in fixed_modules else v)
                for k, v in new_bs.items()
            }
        new_grads = jax.tree.map(jnp.add, grads, g)
        return (
            state.replace(batch_stats=new_bs),
            new_grads,
            {"loss": loss, **loss_dict},
        )

    if mesh is None:
        accum_step = jax.jit(accum_body)
    else:
        from jax.sharding import PartitionSpec as P

        def accum_local(state, batch, rng, grads):
            rng = jax.random.fold_in(rng, jax.lax.axis_index(axis_name))
            return accum_body(state, batch, rng, grads)

        accum_step = jax.jit(
            jax.shard_map(
                accum_local,
                mesh=mesh,
                in_specs=(P(), P(axis_name), P(), P()),
                out_specs=(P(), P(), P()),
                check_vma=False,
            )
        )

    @jax.jit
    def apply_step(state: TrainState, grads, lr):
        updates, new_opt = tx.update(grads, state.opt_state, state.params)
        updates = jax.tree.map(lambda u: u * lr, updates)
        return TrainState(
            params=optax.apply_updates(state.params, updates),
            batch_stats=state.batch_stats,
            opt_state=new_opt,
            step=state.step + 1,
        )

    return accum_step, apply_step


def make_eval_step(
    forward_fn: Callable,
    loss_fn: Callable,
    mesh=None,
    axis_name: str = "data",
):
    """Jitted eval step; with ``mesh`` it runs under ``shard_map`` for
    the same per-shard-local reasons as :func:`make_train_step` (the
    loss psums make the metrics exactly the global masked means)."""

    def eval_body(state: TrainState, batch):
        out, _ = forward_fn(
            state.params, state.batch_stats, batch, False, None
        )
        loss, loss_dict = loss_fn(out, batch)
        return {"loss": loss, **loss_dict}

    if mesh is None:
        return jax.jit(eval_body)

    from jax.sharding import PartitionSpec as P

    return jax.jit(
        jax.shard_map(
            eval_body,
            mesh=mesh,
            in_specs=(P(), P(axis_name)),
            out_specs=P(),
            check_vma=False,
        )
    )


def run_training(
    state: TrainState,
    train_step,
    eval_step,
    train_batches: Callable,  # epoch -> iterator of PaddedBatch
    val_batches: Callable,  # epoch -> iterator of PaddedBatch
    epochs: int,
    lr_schedule: Callable,  # epoch -> float
    early_stopper=None,
    mesh=None,
    rng: Optional[jax.Array] = None,
    verbose: bool = False,
    accum_steps: Optional[tuple] = None,
):
    """Epoch loop with per-epoch validation, logging and early stopping.

    Mirrors reference ``run_training`` (train_utils.py:130-197). When a mesh
    is given, batches are padded to the mesh size and sharded on their
    leading axis; the state is replicated once.

    With ``accum_steps=(accum_step, apply_step)`` (built by
    :func:`make_accum_steps`), ``train_batches(epoch)`` must yield
    *groups* — iterables of PaddedBatch minibatches — and each group gets
    gradient accumulation + ONE optimizer step (the reference's
    hierarchical streaming, ``train_utils.py:46-62``); ``train_step`` is
    then unused.
    """
    rng = rng if rng is not None else jax.random.key(0)
    if mesh is not None:
        state = replicate(state, mesh)

    def prepare(batch):
        if mesh is not None:
            batch = pad_batch_to_multiple(batch, mesh.devices.size)
            batch = shard_batch(batch, mesh)
        return batch

    history = []
    for epoch in range(epochs):
        lr = jnp.float32(lr_schedule(epoch))
        t0 = time.time()

        train_metrics = []
        if accum_steps is not None:
            accum_step, apply_step = accum_steps
            for group in train_batches(epoch):
                grads = jax.tree.map(jnp.zeros_like, state.params)
                n_mb = 0
                for batch in group:
                    rng, step_rng = jax.random.split(rng)
                    state, grads, metrics = accum_step(
                        state, prepare(batch), step_rng, grads
                    )
                    train_metrics.append(metrics)
                    n_mb += 1
                if n_mb:
                    state = apply_step(state, grads, lr)
        else:
            for batch in train_batches(epoch):
                rng, step_rng = jax.random.split(rng)
                state, metrics = train_step(state, prepare(batch), lr, step_rng)
                train_metrics.append(metrics)

        val_metrics = []
        for batch in val_batches(epoch):
            val_metrics.append(eval_step(state, prepare(batch)))

        def mean_of(ms, key):
            if not ms:
                return float("nan")
            return float(
                jnp.mean(jnp.stack([jnp.asarray(m[key]) for m in ms]))
            )

        record = {
            "epoch": epoch,
            "lr": float(lr),
            "time": time.time() - t0,
            "train_loss": mean_of(train_metrics, "loss"),
            "train_offset_loss": mean_of(train_metrics, "offset_loss"),
            "train_semantic_loss": mean_of(train_metrics, "semantic_loss"),
            "val_loss": mean_of(val_metrics, "loss"),
            "val_offset_loss": mean_of(val_metrics, "offset_loss"),
            "val_semantic_loss": mean_of(val_metrics, "semantic_loss"),
        }
        history.append(record)
        logger.info(
            "Epoch %d/%d | Train: %.4f Val: %.4f | Off: %.4f/%.4f | "
            "Sem: %.4f/%.4f | %.1fs",
            epoch + 1,
            epochs,
            record["train_loss"],
            record["val_loss"],
            record["train_offset_loss"],
            record["val_offset_loss"],
            record["train_semantic_loss"],
            record["val_semantic_loss"],
            record["time"],
        )
        if verbose:
            print(
                f"Epoch {epoch + 1}/{epochs}  "
                f"train {record['train_loss']:.4f}  "
                f"val {record['val_loss']:.4f}"
            )

        if early_stopper is not None:
            early_stopper(state, record["train_loss"], record["val_loss"])
            if early_stopper.early_stop:
                logger.info("Early stopping at epoch %d", epoch + 1)
                break

    return state, history
