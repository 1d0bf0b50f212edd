"""Stage 2: KNN-midpoint super-sampling.

Capability parity with the reference upsampler
(``/root/reference/Modules/Pipeline/Upsampling.py:22-168``): iteratively
insert midpoints between each point and a randomly chosen near neighbor
until the cloud reaches ``min_points``; points below ``min_height`` above
the cloud base are left untouched; the ``use_only_original_points`` mode
queries k * 2^i neighbors of the *original* points only, the standard mode
doubles the full set each iteration.

Unlike the reference's per-point Python loop (:100-151), each iteration is
ONE vectorized batch: a parallel cKDTree k-NN over the current set, a
random-neighbor choice, and a vectorized midpoint. (The reference visits
points in random order, but its search tree is fixed within an iteration,
so order never affects the distribution — the vectorized form is
behavior-equivalent.)

This stage deliberately runs on HOST, not the TPU: it is glue between the
device-heavy stage 1 and the host-driven QSM stage, each pipeline cloud
has a fresh shape (a device k-NN recompiles per cloud), and at upsampling
densities (>=50k pts/m^2) grid-bucket k-NN cells overflow any static
per-cell cap. Measured on a 505k -> 1M doubling: device grid k-NN 324 s
(compile + overflow-degraded), parallel cKDTree ~seconds.
"""

from __future__ import annotations

import numpy as np
from scipy.spatial import cKDTree


def _midpoint_iteration(
    points: np.ndarray,
    query_points: np.ndarray,
    rng: np.random.Generator,
    k: int,
):
    """One round: each query point pairs with a random one of its k nearest
    (excluding self / zero-distance duplicates, reference: d > 1e-9) and
    emits the midpoint."""
    tree = cKDTree(points)
    k_eff = min(k + 1, len(points))
    d, idx = tree.query(query_points, k=k_eff, workers=-1)
    if k_eff == 1:
        d = d[:, None]
        idx = idx[:, None]
    usable = np.isfinite(d) & (d > 1e-9)
    scores = np.where(usable, rng.random(idx.shape), -1.0)
    choice = scores.argmax(axis=1)
    rows = np.arange(len(query_points))
    has_neighbor = scores[rows, choice] > 0
    neighbor = points[np.clip(idx[rows, choice], 0, len(points) - 1)]
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
    cell_size: float = 0.2,  # kept for API compatibility; unused
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
    current = above
    originals = above
    for i in range(iters):
        if use_only_original_points:
            k_i = min(k_init * (2**i), len(current) - 1)
            if k_i < 1:
                break
            midpoints, ok = _midpoint_iteration(
                current, originals, rng, k_i
            )
        else:
            midpoints, ok = _midpoint_iteration(
                current, current, rng, min(k_init, len(current) - 1)
            )
        mids = midpoints[ok].astype(np.float32)
        if len(mids) == 0:
            break
        new_points.append(mids)
        current = np.concatenate([current, mids])

    parts = [below, above] + new_points
    return np.vstack(parts).astype(np.float32)
