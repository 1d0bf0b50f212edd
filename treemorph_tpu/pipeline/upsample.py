"""Stage 2: KNN-midpoint super-sampling, device-side.

Capability parity with the reference upsampler
(``/root/reference/Modules/Pipeline/Upsampling.py:22-168``): iteratively
insert midpoints between each point and a randomly chosen near neighbor
until the cloud reaches ``min_points``; points below ``min_height`` above
the cloud base are left untouched; the ``use_only_original_points`` mode
queries k * 2^i neighbors of the *original* points only, the standard mode
doubles the full set each iteration.

TPU redesign: the reference loops over points with a cKDTree per iteration;
here each iteration is ONE device call — a grid-bucketed k-NN over the
current set followed by a random-neighbor choice and a vectorized midpoint.
The per-point Python loop (reference :100-151) disappears; iteration counts
and array sizes are computed on the host so every device call is
static-shape. The reference visits points in random order, but since its
search tree is fixed within an iteration the order never affects the result
— so the vectorized form is behavior-equivalent in distribution.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.neighbors import knn


@partial(jax.jit, static_argnames=("k",))
def _midpoint_iteration(points, query_points, rng, k: int, cell_size):
    """One round: each query point pairs with a random one of its k nearest
    (excluding self) and emits the midpoint."""
    n = points.shape[0]
    valid = jnp.ones(n, bool)
    idx, d2 = knn(points, query_points, valid, k + 1, cell_size, 32)
    # exclude self / zero-distance duplicates (reference: distances > 1e-9)
    usable = jnp.isfinite(d2) & (d2 > 1e-18)
    scores = jnp.where(
        usable,
        jax.random.uniform(rng, idx.shape),
        -1.0,
    )
    choice = jnp.argmax(scores, axis=1)
    rows = jnp.arange(query_points.shape[0])
    neighbor = points[idx[rows, choice]]
    has_neighbor = scores[rows, choice] > 0
    midpoints = (query_points + neighbor) * 0.5
    return midpoints, has_neighbor


def upsample(
    cloud_data: np.ndarray,
    k_init: int = 10,
    max_iterations: int = 10,
    min_height: float = 0.0,
    use_only_original_points: bool = True,
    min_points: int = 1_000_000,
    rng: np.random.Generator | None = None,
    cell_size: float = 0.2,
) -> np.ndarray:
    """Super-sample a cloud to at least ``min_points`` points.

    Returns the concatenation [below-threshold originals, above-threshold
    originals, new midpoints], matching the reference output layout
    (``Upsampling.py:154-159``).
    """
    rng = rng or np.random.default_rng(0)
    if cloud_data is None or len(cloud_data) == 0:
        return cloud_data
    pts = np.asarray(cloud_data, np.float32)[:, :3]

    min_z = pts[:, 2].min()
    above = pts[pts[:, 2] >= min_z + min_height]
    below = pts[pts[:, 2] < min_z + min_height]
    n0 = len(above)
    if n0 < k_init:
        return pts

    # how many iterations until the target is reached (reference :74-85)
    needed, count = 0, n0
    while count < min_points:
        count = count + n0 if use_only_original_points else count * 2
        needed += 1
    if needed == 0:
        return pts
    iters = min(max_iterations, needed)

    new_points = []
    current = jnp.asarray(above)
    originals = current
    for i in range(iters):
        key = jax.random.key(int(rng.integers(0, 2**31)))
        if use_only_original_points:
            k_i = min(k_init * (2**i), int(current.shape[0]) - 1)
            if k_i < 1:
                break
            midpoints, ok = _midpoint_iteration(
                current, originals, key, k_i, cell_size * (1 + i)
            )
        else:
            midpoints, ok = _midpoint_iteration(
                current, current, key, min(k_init, int(current.shape[0]) - 1),
                cell_size,
            )
        ok_np = np.asarray(ok)
        mids = np.asarray(midpoints)[ok_np]
        if len(mids) == 0:
            break
        new_points.append(mids)
        current = jnp.concatenate([current, jnp.asarray(mids)])

    parts = [below, above] + new_points
    return np.vstack(parts).astype(np.float32)
