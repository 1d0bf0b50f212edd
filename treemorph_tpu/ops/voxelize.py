"""Static-shape voxelization via sort + segment reduction.

Replaces the reference's spconv ``PointToVoxel`` path
(``/root/reference/Modules/TreeLearn/TreeLearn.py:160-248``): batched point
clouds are quantized per batch element against that element's min corner,
deduplicated into voxels, and per-voxel mean features are computed.

TPU design: there is no dynamic-shape "unique" on device, so the kernel keeps
the *static* upper bound of N voxels (every point its own voxel) and returns
a ``num_voxels`` scalar plus a validity mask. Points are sorted by
(batch, gx, gy, gz) with a stable lexsort; voxel ids are a prefix sum over
boundary flags; per-voxel means use ``jax.ops.segment_sum``. The
``point_to_voxel`` map (the reference's ``v2p_map``) indexes voxel features
back per point for the unprojection in the model head
(``TreeLearn.py:132-144``).

Deviations from the reference (documented, intentional):
- per-voxel mean uses *all* points in the voxel, not spconv's first
  ``max_num_points_per_voxel=10`` with nan-tricks — strictly more accurate.
- voxel coordinate order is (batch, x, y, z); the reference's ZYX/axis-swap
  dance is an spconv artifact.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

INVALID_BATCH = np.int32(0x7FFFFFF0)  # numpy: import must not touch the device


class VoxelizedCloud(NamedTuple):
    """Padded voxel set. Arrays are padded to N (the point count)."""

    voxel_feats: jax.Array  # (N, D) float32, voxel means (padding rows zero)
    voxel_coords: jax.Array  # (N, 4) int32: batch, gx, gy, gz
    point_to_voxel: jax.Array  # (N,) int32: voxel index of every point
    num_voxels: jax.Array  # () int32
    voxel_valid: jax.Array  # (N,) bool
    grid_min: jax.Array  # (B, 3) float32 per-element min corner
    spatial_shape: jax.Array  # (3,) int32 max grid extent over the batch


@partial(jax.jit, static_argnames=("batch_size", "capacity"))
def voxelize(
    coords: jax.Array,
    feats: jax.Array,
    batch_ids: jax.Array,
    valid: jax.Array,
    voxel_size: float | jax.Array,
    batch_size: int,
    capacity: int | None = None,
) -> VoxelizedCloud:
    """Voxelize a flat-concatenated batch of clouds.

    Args:
        coords: (N, 3) float32 point positions.
        feats: (N, D) float32 per-point features to be voxel-averaged.
        batch_ids: (N,) int32 batch element of each point.
        valid: (N,) bool, False for padding points.
        voxel_size: edge length of the cubic voxels.
        batch_size: static number of batch elements.
        capacity: static bound on the voxel count (default N). Dense scans
            dedupe heavily (upsampled pipeline clouds put ~20 points in a
            2 cm voxel), and every downstream sparse-conv cost scales with
            the padded voxel array size — so real deployments should set
            this well below N. Points whose voxel overflows the capacity
            are masked out (``point_to_voxel == capacity``).

    Returns a :class:`VoxelizedCloud`; invalid points map to trailing padding
    voxels (``point_to_voxel`` is clamped in-range so gathers are safe).
    """
    n = coords.shape[0]
    cap = capacity if capacity is not None else n
    batch_ids = jnp.where(valid, batch_ids.astype(jnp.int32), INVALID_BATCH)

    # Per-batch-element min corner (parity with the reference's per-element
    # coors_range, TreeLearn.py:190-191). A static loop of masked column
    # minima: B full-array reductions stream at HBM speed, whereas a
    # segment_min lowers to a scatter-min (~11 ms at 1M points on v5e).
    big = jnp.float32(3.4e38)
    safe_coords = jnp.where(valid[:, None], coords, big)
    grid_min = jnp.stack([
        jnp.min(
            jnp.where((batch_ids == be)[:, None], safe_coords, big), axis=0
        )
        for be in range(batch_size)
    ])
    grid_min = jnp.where(jnp.isfinite(grid_min), grid_min, 0.0)

    # quantize: accumulate each element's min corner with a static
    # where-loop — a (N, 3) gather from the tiny (B, 3) table costs a
    # full random-access pass (~5 ms at 1M rows on v5e), the loop is
    # B streaming passes
    mins = grid_min[batch_size - 1] * jnp.ones_like(coords)
    for be in range(batch_size - 1):
        mins = jnp.where((batch_ids == be)[:, None], grid_min[be], mins)
    grid = jnp.floor((coords - mins) / voxel_size).astype(jnp.int32)
    grid = jnp.maximum(grid, 0)
    grid = jnp.where(valid[:, None], grid, 0)

    # Dedup via ONE 2-key sort of the packed lex keys with a flagged-iota
    # payload (see sparse.sorted_runs): no 1M-row post-sort gathers.
    from .sparse import first_rows_of_runs, sorted_runs

    key4 = jnp.concatenate([batch_ids[:, None], grid], axis=1)
    r = sorted_runs(key4, valid)
    num_voxels = jnp.minimum(r.num, cap)

    # Scatter voxel ids back to original point order; overflow -> cap.
    point_to_voxel = jnp.zeros(n, jnp.int32).at[r.s_orig].set(
        jnp.minimum(r.s_id, cap)
    )

    # Per-voxel mean features: scatter-ADD is the one fast scatter-reduce
    # on TPU; one combined (D+1)-wide segment_sum carries the counts too.
    weights = valid.astype(jnp.float32)
    ext = jnp.concatenate(
        [feats * weights[:, None], weights[:, None]], axis=1
    )
    span = jax.ops.segment_sum(
        ext, point_to_voxel, num_segments=cap + 1
    )[:cap]
    sums, counts = span[:, :-1], span[:, -1]
    voxel_feats = sums / jnp.maximum(counts, 1.0)[:, None]

    # voxel coords: scatter each run's first original row index to its
    # voxel slot, then two cap-sized gathers. Replaces a segment_max
    # that cost 10-16 ms at 1M rows.
    rows = first_rows_of_runs(r, cap)
    voxel_valid = counts > 0
    voxel_coords = jnp.where(
        voxel_valid[:, None],
        jnp.concatenate(
            [batch_ids[rows][:, None], grid[rows]], axis=1
        ),
        -1,
    ).astype(jnp.int32)
    spatial_shape = (
        jnp.max(jnp.where(valid[:, None], grid, 0), axis=0) + 1
    ).astype(jnp.int32)

    return VoxelizedCloud(
        voxel_feats=voxel_feats,
        voxel_coords=voxel_coords,
        point_to_voxel=point_to_voxel,
        num_voxels=num_voxels.astype(jnp.int32),
        voxel_valid=voxel_valid,
        grid_min=grid_min,
        spatial_shape=spatial_shape,
    )


def voxelize_treelearn_features(
    coords: jax.Array,
    feats: jax.Array,
    batch_ids: jax.Array,
    valid: jax.Array,
    voxel_size: float,
    batch_size: int,
    use_coords: bool = False,
    use_feats: bool = True,
    capacity: int | None = None,
) -> VoxelizedCloud:
    """TreeLearn-flavored voxel features: [feats..., coords] layout.

    Parity with reference ``TreeLearn.py:221-225``: voxel-mean of
    ``[coords, feats]``, with either half replaced by ones when unused, then
    reordered to features-first.
    """
    stacked = jnp.concatenate([coords, feats], axis=1)
    out = voxelize(
        coords, stacked, batch_ids, valid, voxel_size, batch_size,
        capacity=capacity,
    )
    vf = out.voxel_feats
    coord_part = vf[:, :3] if use_coords else jnp.ones_like(vf[:, :3])
    feat_part = vf[:, 3:] if use_feats else jnp.ones_like(vf[:, 3:])
    return out._replace(
        voxel_feats=jnp.concatenate([feat_part, coord_part], axis=1)
    )
