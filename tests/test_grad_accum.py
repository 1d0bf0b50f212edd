"""Gradient accumulation for hierarchical streaming training
(reference train_utils.py:46-62 + PointNet2.py:296: per-minibatch
backward into a shared accumulator, ONE optimizer step per tree batch,
clip applied to the ACCUMULATED gradient)."""

import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from treemorph_tpu.data import make_padded_batch
from treemorph_tpu.data.treeset import TreeSample
from treemorph_tpu.train import create_train_state, make_accum_steps
from treemorph_tpu.train.harness import (
    LOSS_BACKWARD_SCALE,
    make_optimizer,
    run_training,
    make_eval_step,
)


def _linear_family():
    """Analytic family: offsets = coords @ W; masked-mean L2-squared loss.

    No batch norm, so accumulation semantics are exactly testable.
    """

    def forward_fn(params, batch_stats, batch, train, rng):
        pred = jnp.einsum("bnd,de->bne", batch.coords, params["w"])
        return {"offset_predictions": pred}, batch_stats

    def loss_fn(output, batch):
        diff = output["offset_predictions"] - batch.offset_labels
        w = batch.mask_valid.astype(jnp.float32)
        loss = jnp.sum(jnp.sum(diff**2, -1) * w) / jnp.maximum(
            jnp.sum(w), 1.0
        )
        return loss, {"offset_loss": loss, "semantic_loss": 0.0}

    return forward_fn, loss_fn


def _mini_batches(rng, k=3, n=64):
    """k equal-size minibatches of a synthetic linear problem."""
    batches = []
    w_true = rng.normal(size=(3, 3)).astype(np.float32)
    for _ in range(k):
        pts = rng.normal(size=(n, 3)).astype(np.float32)
        sample = TreeSample(
            points=pts,
            feats=np.zeros((n, 4), np.float32),
            offsets=pts @ w_true,
            semantic_label=np.zeros(n, np.int32),
            offset_mask=np.ones(n, bool),
            path="syn",
        )
        batches.append(make_padded_batch([sample], bucket=n))
    return batches


class TestAccumSemantics:
    def test_accumulated_equals_concatenated(self, rng):
        """Σ_mb ∇(50·mean-loss_mb) == K · ∇(50·mean-loss_concat) for K
        equal-sized minibatches (per-minibatch means sum to K× the
        concatenated mean)."""
        forward_fn, loss_fn = _linear_family()
        tx = optax.identity()  # raw gradients, no clip/adam
        accum_step, _ = make_accum_steps(forward_fn, loss_fn, tx)

        k = 3
        batches = _mini_batches(rng, k=k)
        params = {"w": jnp.zeros((3, 3), jnp.float32)}
        state = create_train_state(
            {"params": params, "batch_stats": {}}, tx
        )

        grads = jax.tree.map(jnp.zeros_like, state.params)
        for b in batches:
            state, grads, _ = accum_step(
                state, jax.tree.map(jnp.asarray, b), jax.random.key(0), grads
            )

        # concatenated batch = stack along the batch axis (equal sizes)
        concat = type(batches[0])(
            *(
                np.concatenate([getattr(b, f) for b in batches])
                if getattr(batches[0], f) is not None
                else None
                for f in batches[0]._fields
            )
        )

        def concat_loss(p):
            out, _ = forward_fn(
                p, {}, jax.tree.map(jnp.asarray, concat), True, None
            )
            return loss_fn(out, jax.tree.map(jnp.asarray, concat))[0] * (
                LOSS_BACKWARD_SCALE
            )

        g_concat = jax.grad(concat_loss)(state.params)
        np.testing.assert_allclose(
            np.asarray(grads["w"]),
            k * np.asarray(g_concat["w"]),
            rtol=1e-5,
        )

    def test_clip_applies_to_accumulated_gradient(self, rng):
        """The global-norm clip inside the optimizer must see the summed
        gradient, not per-minibatch gradients (reference clips once,
        train_utils.py:60)."""
        forward_fn, loss_fn = _linear_family()
        tx = make_optimizer()
        accum_step, apply_step = make_accum_steps(forward_fn, loss_fn, tx)

        batches = _mini_batches(rng, k=4)
        params = {"w": jnp.zeros((3, 3), jnp.float32)}
        state = create_train_state({"params": params, "batch_stats": {}}, tx)

        grads = jax.tree.map(jnp.zeros_like, state.params)
        for b in batches:
            state, grads, _ = accum_step(
                state, jax.tree.map(jnp.asarray, b), jax.random.key(0), grads
            )
        # accumulated grad norm far exceeds the clip threshold
        assert float(optax.global_norm(grads)) > 1.0

        new_state = apply_step(state, grads, jnp.float32(1.0))
        # one step happened
        assert int(new_state.step) == 1
        # with adam the update magnitude is bounded regardless; check the
        # params moved and stayed finite
        assert np.isfinite(np.asarray(new_state.params["w"])).all()
        assert not np.allclose(
            np.asarray(new_state.params["w"]), np.asarray(state.params["w"])
        )

    def test_run_training_group_mode_counts_steps(self, rng):
        """run_training(accum_steps=...) consumes groups: optimizer steps
        == number of groups, not minibatches; loss decreases."""
        forward_fn, loss_fn = _linear_family()
        tx = make_optimizer()
        accum_steps = make_accum_steps(forward_fn, loss_fn, tx)
        eval_step = make_eval_step(forward_fn, loss_fn)

        groups_per_epoch = 2
        mbs_per_group = 3
        all_batches = _mini_batches(
            rng, k=groups_per_epoch * mbs_per_group
        )

        def train_batches(epoch):
            for g in range(groups_per_epoch):
                yield iter(
                    all_batches[g * mbs_per_group : (g + 1) * mbs_per_group]
                )

        def val_batches(epoch):
            return iter(all_batches[:1])

        params = {"w": jnp.zeros((3, 3), jnp.float32)}
        state = create_train_state({"params": params, "batch_stats": {}}, tx)
        state, history = run_training(
            state,
            train_step=None,  # unused in accumulation mode
            eval_step=eval_step,
            train_batches=train_batches,
            val_batches=val_batches,
            epochs=3,
            lr_schedule=lambda e: 1e-2,
            accum_steps=accum_steps,
        )
        assert int(state.step) == 3 * groups_per_epoch
        assert history[-1]["val_loss"] < history[0]["val_loss"]
