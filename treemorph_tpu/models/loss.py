"""Shared point-wise loss for all model families.

Behavioral parity with the reference loss
(``/root/reference/Modules/Loss.py:6-36``):

- semantic: cross-entropy summed over points / number of points (i.e. a
  mean), on 2-class logits;
- offset: mean over points of sqrt(clamp(sum((pred - label)^2), 1e-8)) —
  an epsilon-clamped L2 distance.

TPU formulation: the reference filters predictions with boolean masks before
the loss (dynamic shapes); here the masks are *weights* in a masked mean over
the static padded layout, which is algebraically identical.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

EPS = 1e-8


def point_wise_loss(
    semantic_logits: jax.Array,  # (..., 2) float
    offset_predictions: jax.Array,  # (..., 3) float
    semantic_labels: jax.Array,  # (...,) int
    offset_labels: jax.Array,  # (..., 3) float
    semantic_mask: jax.Array,  # (...,) bool — valid points
    offset_mask: jax.Array,  # (...,) bool — valid & near-surface points
    n_points: int | None = None,
    rng: jax.Array | None = None,
    axis_name: str | None = None,
) -> tuple[jax.Array, jax.Array]:
    """Returns (semantic_loss, offset_loss) scalars (float32).

    ``n_points``: optional random subsample of the loss points (reference
    ``Loss.py:9-13``), implemented as random mask thinning so shapes stay
    static; requires ``rng``.

    ``axis_name``: when the caller runs under ``shard_map`` (data-parallel
    training, one batch shard per device), numerator and denominator of
    each masked mean are ``psum``-ed over that mesh axis, so the result is
    EXACTLY the single-device loss over the concatenated global batch —
    per-shard means weighted by per-shard counts would not be.
    """
    semantic_logits = semantic_logits.astype(jnp.float32)
    offset_predictions = offset_predictions.astype(jnp.float32)
    sem_w = semantic_mask.astype(jnp.float32).reshape(-1)
    off_w = offset_mask.astype(jnp.float32).reshape(-1)

    if n_points is not None:
        assert rng is not None, "n_points subsampling needs an rng key"
        k_sem, k_off = jax.random.split(rng)
        sem_w = _thin_mask(sem_w, n_points, k_sem)
        off_w = _thin_mask(off_w, n_points, k_off)

    logits = semantic_logits.reshape(-1, semantic_logits.shape[-1])
    labels = semantic_labels.reshape(-1).astype(jnp.int32)
    log_probs = jax.nn.log_softmax(logits, axis=-1)
    ce = -jnp.take_along_axis(log_probs, labels[:, None], axis=-1)[:, 0]
    sem_num, sem_den = jnp.sum(ce * sem_w), jnp.sum(sem_w)

    diff = offset_predictions.reshape(-1, 3) - offset_labels.reshape(-1, 3)
    sq = jnp.sum(diff * diff, axis=-1)
    dist = jnp.sqrt(jnp.clip(sq, EPS, None))
    off_num, off_den = jnp.sum(dist * off_w), jnp.sum(off_w)

    if axis_name is not None:
        sem_num, sem_den, off_num, off_den = jax.lax.psum(
            (sem_num, sem_den, off_num, off_den), axis_name
        )
    semantic_loss = sem_num / jnp.maximum(sem_den, 1.0)
    offset_loss = off_num / jnp.maximum(off_den, 1.0)

    return semantic_loss, offset_loss


def _thin_mask(weights: jax.Array, n_points: int, rng: jax.Array) -> jax.Array:
    """Keep at most ``n_points`` of the set weights, uniformly at random."""
    n = weights.shape[0]
    scores = jnp.where(
        weights > 0, jax.random.uniform(rng, (n,)), jnp.inf
    )
    threshold = jnp.sort(scores)[jnp.minimum(n_points, n) - 1]
    keep = (scores <= threshold) & (weights > 0)
    total = jnp.sum(weights)
    # only thin when more than n_points are set (parity with Loss.py:9)
    return jnp.where(total >= n_points, keep.astype(weights.dtype), weights)
