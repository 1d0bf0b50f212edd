"""Device-side neighbor search: grid-bucketed KNN and radius counting.

Replaces the reference's host-side ``scipy.cKDTree`` / sklearn
``NearestNeighbors`` machinery (``/root/reference/Modules/Features.py``,
``Modules/Pipeline/Upsampling.py:92-151``) with a TPU-friendly scheme:

1. quantize points into cubic cells of ``cell_size``;
2. sort points by linearized cell key (stable lexsort-equivalent);
3. for every query, gather up to ``max_per_cell`` candidates from each of
   the 27 adjacent cells via two ``searchsorted`` probes into the sorted
   key array (no hash table, no dynamic shapes);
4. rank candidates by true squared distance with ``lax.top_k``.

Everything is static-shape: candidates per query = 27 * max_per_cell, padded
with +inf distances. Exactness holds whenever the true k-th neighbor lies
within one cell of the query (choose ``cell_size`` >= expected k-NN radius)
and no adjacent cell overflows ``max_per_cell``; both are controllable by
the caller and asserted in tests on the fixture distributions.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

_OFFSETS = [
    (dx, dy, dz)
    for dx in (-1, 0, 1)
    for dy in (-1, 0, 1)
    for dz in (-1, 0, 1)
]


@partial(jax.jit, static_argnames=("k", "max_per_cell"))
def knn(
    points: jax.Array,
    queries: jax.Array,
    valid: jax.Array,
    k: int,
    cell_size: float | jax.Array,
    max_per_cell: int = 16,
) -> tuple[jax.Array, jax.Array]:
    """k nearest neighbors of ``queries`` among valid ``points``.

    Args:
        points: (N, 3) float32 search set.
        queries: (Q, 3) float32 query positions.
        valid: (N,) bool mask over the search set.
        k: neighbors to return.
        cell_size: grid cell edge; should be >= the expected k-NN radius.
        max_per_cell: static candidate cap per adjacent cell.

    Returns:
        (indices (Q, k) int32 into ``points``, sq_dists (Q, k) float32).
        Slots with no candidate carry index 0 and distance +inf.
    """
    n = points.shape[0]
    big = jnp.float32(3.4e38)
    safe_pts = jnp.where(valid[:, None], points, big)

    mins = jnp.min(safe_pts, axis=0)
    mins = jnp.where(jnp.isfinite(mins), mins, 0.0)
    cell = jnp.floor((points - mins) / cell_size).astype(jnp.int32)
    cell = jnp.where(valid[:, None], jnp.maximum(cell, 0), 0)
    extent = jnp.max(jnp.where(valid[:, None], cell, 0), axis=0) + 3

    def linear_key(c):
        # +1 margin so neighbor offsets of boundary cells stay non-negative
        cc = c + 1
        return (cc[..., 0] * extent[1] + cc[..., 1]) * extent[2] + cc[..., 2]

    keys = jnp.where(valid, linear_key(cell), jnp.int32(0x7FFFFFF0))
    order = jnp.argsort(keys)
    sorted_keys = keys[order]

    qcell = jnp.floor((queries - mins) / cell_size).astype(jnp.int32)
    qcell = jnp.maximum(qcell, 0)

    q = queries.shape[0]
    cand_idx = []
    cand_dist = []
    from .sparse import searchsorted_unrolled

    for off in _OFFSETS:
        nkey = linear_key(qcell + jnp.array(off, jnp.int32))
        start = searchsorted_unrolled(sorted_keys, nkey)
        end = searchsorted_unrolled(sorted_keys, nkey + 1)
        count = jnp.minimum(end - start, max_per_cell)
        slots = start[:, None] + jnp.arange(max_per_cell)[None, :]
        in_range = jnp.arange(max_per_cell)[None, :] < count[:, None]
        slots = jnp.clip(slots, 0, n - 1)
        idx = order[slots]  # (Q, max_per_cell)
        diff = queries[:, None, :] - points[idx]
        d2 = jnp.sum(diff * diff, axis=-1)
        d2 = jnp.where(in_range, d2, jnp.inf)
        cand_idx.append(idx)
        cand_dist.append(d2)

    all_idx = jnp.concatenate(cand_idx, axis=1)  # (Q, 27*C)
    all_d2 = jnp.concatenate(cand_dist, axis=1)

    neg_top, top_pos = jax.lax.top_k(-all_d2, k)
    rows = jnp.arange(q)[:, None]
    nbr_idx = all_idx[rows, top_pos].astype(jnp.int32)
    nbr_d2 = -neg_top
    nbr_idx = jnp.where(jnp.isinf(nbr_d2), 0, nbr_idx)
    return nbr_idx, nbr_d2


@partial(jax.jit, static_argnames=("max_per_cell",))
def radius_count(
    points: jax.Array,
    queries: jax.Array,
    valid: jax.Array,
    radius: float | jax.Array,
    max_per_cell: int = 32,
) -> jax.Array:
    """Number of valid points within ``radius`` of each query.

    Device replacement for the reference density feature
    (``Modules/Features.py:161-173``). Uses cells of edge ``radius`` so the
    27-cell stencil covers the ball exactly.
    """
    n = points.shape[0]
    big = jnp.float32(3.4e38)
    safe_pts = jnp.where(valid[:, None], points, big)
    mins = jnp.min(safe_pts, axis=0)
    mins = jnp.where(jnp.isfinite(mins), mins, 0.0)

    cell = jnp.floor((points - mins) / radius).astype(jnp.int32)
    cell = jnp.where(valid[:, None], jnp.maximum(cell, 0), 0)
    extent = jnp.max(jnp.where(valid[:, None], cell, 0), axis=0) + 3

    def linear_key(c):
        cc = c + 1
        return (cc[..., 0] * extent[1] + cc[..., 1]) * extent[2] + cc[..., 2]

    keys = jnp.where(valid, linear_key(cell), jnp.int32(0x7FFFFFF0))
    order = jnp.argsort(keys)
    sorted_keys = keys[order]

    qcell = jnp.maximum(
        jnp.floor((queries - mins) / radius).astype(jnp.int32), 0
    )
    r2 = jnp.square(radius)
    total = jnp.zeros(queries.shape[0], jnp.int32)
    from .sparse import searchsorted_unrolled

    for off in _OFFSETS:
        nkey = linear_key(qcell + jnp.array(off, jnp.int32))
        start = searchsorted_unrolled(sorted_keys, nkey)
        end = searchsorted_unrolled(sorted_keys, nkey + 1)
        count = jnp.minimum(end - start, max_per_cell)
        slots = start[:, None] + jnp.arange(max_per_cell)[None, :]
        in_range = jnp.arange(max_per_cell)[None, :] < count[:, None]
        slots = jnp.clip(slots, 0, n - 1)
        idx = order[slots]
        diff = queries[:, None, :] - points[idx]
        d2 = jnp.sum(diff * diff, axis=-1)
        total = total + jnp.sum(in_range & (d2 <= r2), axis=1)
    return total
