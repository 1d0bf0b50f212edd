"""Model-family adapters: uniform (forward_fn, loss_fn) pairs for the harness.

The reference exposes a uniform model API — ``model(batch, return_loss)``
returning either ``(loss, loss_dict)`` or a prediction dict (SURVEY.md §1
L3). Here that uniformity lives in small adapter functions so the harness
stays model-agnostic and purely functional.
"""

from __future__ import annotations

from typing import Callable

import jax

import jax.numpy as jnp

from ..models.pointnet2 import PointNet2, pointnet2_loss
from ..models.ptv3 import PointTransformerWithHeads, ptv3_loss
from ..models.treelearn import TreeLearn, treelearn_loss


def pointnet2_family(
    model: PointNet2,
    loss_multiplier_semantic: float = 1.0,
    loss_multiplier_offset: float = 1.0,
    axis_name: str | None = None,
) -> tuple[Callable, Callable]:
    """(forward_fn, loss_fn) for the harness, PointNet2 flavor.

    ``axis_name``: set when the step runs under ``shard_map`` so the
    masked-mean losses reduce over the global batch (see
    :func:`treemorph_tpu.models.loss.point_wise_loss`)."""

    def forward_fn(params, batch_stats, batch, train, rng):
        variables = {"params": params, "batch_stats": batch_stats}
        if train:
            out, mutated = model.apply(
                variables,
                batch.coords,
                batch.feats,
                batch.mask_valid,
                train=True,
                fps_rng=rng,
                mutable=["batch_stats"],
            )
            return out, mutated["batch_stats"]
        out = model.apply(
            variables,
            batch.coords,
            batch.feats,
            batch.mask_valid,
            train=False,
        )
        return out, batch_stats

    def loss_fn(output, batch):
        return pointnet2_loss(
            output,
            batch,
            loss_multiplier_semantic=loss_multiplier_semantic,
            loss_multiplier_offset=loss_multiplier_offset,
            axis_name=axis_name,
        )

    return forward_fn, loss_fn


def init_pointnet2(model: PointNet2, example_batch, rng: jax.Array):
    # jit the init: eager op-by-op dispatch is pathologically slow in some
    # sandboxes, and init is a pure function anyway.
    init = jax.jit(lambda r, c, f, v: model.init(r, c, f, v, train=False))
    return init(
        rng,
        jnp.asarray(example_batch.coords),
        jnp.asarray(example_batch.feats),
        jnp.asarray(example_batch.mask_valid),
    )


def _flatten_padded(batch):
    """PaddedBatch -> flat voxel-model arrays, inside jit (reshape is free)."""
    b, n = batch.coords.shape[:2]
    batch_ids = jnp.repeat(
        jnp.arange(b, dtype=jnp.int32), n, total_repeat_length=b * n
    )
    return {
        "coords": jnp.reshape(batch.coords, (b * n, 3)),
        "feats": jnp.reshape(batch.feats, (b * n, -1)),
        "batch_ids": batch_ids,
        "mask_valid": jnp.reshape(batch.mask_valid, (b * n,)),
        "offset_labels": jnp.reshape(batch.offset_labels, (b * n, 3)),
        "semantic_labels": jnp.reshape(batch.semantic_labels, (b * n,)),
        "mask_off": jnp.reshape(batch.mask_off, (b * n,)),
    }


def treelearn_family(
    model: TreeLearn,
    loss_multiplier_semantic: float = 1.0,
    loss_multiplier_offset: float = 1.0,
    axis_name: str | None = None,
) -> tuple[Callable, Callable]:
    """(forward_fn, loss_fn) for the harness, TreeLearn flavor.

    The harness hands over PaddedBatches; TreeLearn consumes the flat
    voxel-model layout, so the adapter reshapes inside the jitted step.
    """

    def forward_fn(params, batch_stats, batch, train, rng):
        flat = _flatten_padded(batch)
        variables = {"params": params, "batch_stats": batch_stats}
        args = (
            flat["coords"],
            flat["feats"],
            flat["batch_ids"],
            flat["mask_valid"],
        )
        if train:
            out, mutated = model.apply(
                variables, *args, train=True, mutable=["batch_stats"]
            )
            return out, mutated["batch_stats"]
        return model.apply(variables, *args, train=False), batch_stats

    def loss_fn(output, batch):
        return treelearn_loss(
            output,
            _flatten_padded(batch),
            loss_multiplier_semantic=loss_multiplier_semantic,
            loss_multiplier_offset=loss_multiplier_offset,
            axis_name=axis_name,
        )

    return forward_fn, loss_fn


def _flatten_noise(batch):
    """PaddedBatch noise quartet -> flat voxel-model arrays."""
    if batch.noise_coords is None:
        raise ValueError(
            "noise-cloud training requested but this batch carries no "
            "noise clouds — every cloud in the dataset needs a matching "
            ".npy under --noise_root (matched by basename or "
            "'{plot}_{tree}' stem)"
        )
    b, m = batch.noise_coords.shape[:2]
    batch_ids = jnp.repeat(
        jnp.arange(b, dtype=jnp.int32), m, total_repeat_length=b * m
    )
    return {
        "coords": jnp.reshape(batch.noise_coords, (b * m, 3)),
        "feats": jnp.reshape(batch.noise_feats, (b * m, -1)),
        "batch_ids": batch_ids,
        "mask_valid": jnp.reshape(batch.noise_valid, (b * m,)),
        "semantic_labels": jnp.reshape(batch.noise_semantic, (b * m,)),
    }


def treelearn_noise_family(
    model: TreeLearn,
    loss_multiplier_semantic: float = 1.0,
    loss_multiplier_offset: float = 1.0,
    axis_name: str | None = None,
) -> tuple[Callable, Callable]:
    """TreeLearn with the separate noise-cloud semantic pass.

    Matches the reference's noise-cloud training (``TreeLearn.py:98-105``,
    ``137-141``): the backbone runs a second, weight-shared pass over the
    synthetic noise cloud, the semantic head reads that pass, and the
    semantic CE is computed against the noise cloud's labels — whose
    length differs from the main cloud's. The offset loss stays on the
    main cloud. Batches must carry the ``noise_*`` quartet
    (``PaddedBatch`` built from samples with noise clouds).
    """

    def forward_fn(params, batch_stats, batch, train, rng):
        flat = _flatten_padded(batch)
        nflat = _flatten_noise(batch)
        variables = {"params": params, "batch_stats": batch_stats}
        args = (
            flat["coords"],
            flat["feats"],
            flat["batch_ids"],
            flat["mask_valid"],
        )
        kwargs = dict(
            noise_coords=nflat["coords"],
            noise_feats=nflat["feats"],
            noise_batch_ids=nflat["batch_ids"],
            noise_valid=nflat["mask_valid"],
        )
        if train:
            out, mutated = model.apply(
                variables, *args, train=True, mutable=["batch_stats"],
                **kwargs,
            )
            return out, mutated["batch_stats"]
        return (
            model.apply(variables, *args, train=False, **kwargs),
            batch_stats,
        )

    def loss_fn(output, batch):
        from ..models.loss import point_wise_loss

        flat = _flatten_padded(batch)
        nflat = _flatten_noise(batch)
        sem_loss, off_loss = point_wise_loss(
            output["semantic_prediction_logits"],
            output["offset_predictions"],
            nflat["semantic_labels"],
            flat["offset_labels"],
            semantic_mask=nflat["mask_valid"],
            offset_mask=flat["mask_valid"] & flat["mask_off"],
            axis_name=axis_name,
        )
        loss_dict = {
            "semantic_loss": sem_loss * loss_multiplier_semantic,
            "offset_loss": off_loss * loss_multiplier_offset,
        }
        return sum(loss_dict.values()), loss_dict

    return forward_fn, loss_fn


def init_treelearn(model: TreeLearn, example_batch, rng: jax.Array):
    flat = _flatten_padded(
        jax.tree.map(jnp.asarray, example_batch)
    )
    init = jax.jit(
        lambda r, c, f, b, v: model.init(r, c, f, b, v, train=False)
    )
    return init(
        rng,
        flat["coords"],
        flat["feats"],
        flat["batch_ids"],
        flat["mask_valid"],
    )


def ptv3_family(
    model: PointTransformerWithHeads,
    loss_multiplier_semantic: float = 1.0,
    loss_multiplier_offset: float = 1.0,
    axis_name: str | None = None,
) -> tuple[Callable, Callable]:
    """(forward_fn, loss_fn) for the harness, PTv3 flavor.

    Training threads the step rng into order shuffling and stochastic
    depth (the reference's shuffle_orders + DropPath,
    ``PointTransformerV3.py:299``, ``blocks.py:599-601``).
    """

    def forward_fn(params, batch_stats, batch, train, rng):
        flat = _flatten_padded(batch)
        variables = {"params": params, "batch_stats": batch_stats}
        args = (
            flat["coords"],
            flat["feats"],
            flat["batch_ids"],
            flat["mask_valid"],
        )
        if train:
            shuffle_rng, drop_rng = jax.random.split(rng)
            out, mutated = model.apply(
                variables,
                *args,
                train=True,
                shuffle_rng=shuffle_rng,
                mutable=["batch_stats"],
                rngs={"droppath": drop_rng},
            )
            return out, mutated["batch_stats"]
        return model.apply(variables, *args, train=False), batch_stats

    def loss_fn(output, batch):
        return ptv3_loss(
            output,
            _flatten_padded(batch),
            loss_multiplier_semantic=loss_multiplier_semantic,
            loss_multiplier_offset=loss_multiplier_offset,
            axis_name=axis_name,
        )

    return forward_fn, loss_fn


def init_ptv3(model: PointTransformerWithHeads, example_batch, rng: jax.Array):
    flat = _flatten_padded(jax.tree.map(jnp.asarray, example_batch))
    init = jax.jit(
        lambda r, c, f, b, v: model.init(r, c, f, b, v, train=False)
    )
    return init(
        rng,
        flat["coords"],
        flat["feats"],
        flat["batch_ids"],
        flat["mask_valid"],
    )
