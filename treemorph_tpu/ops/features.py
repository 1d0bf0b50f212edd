"""Per-point geometric features on device.

Capability parity with the reference feature extractor
(``/root/reference/Modules/Features.py``): PCA normals (k-NN covariance
smallest eigenvector), curvature (smallest-eigenvalue ratio), density
(radius count), relative height, verticality, and XY distance to center —
but batched on the TPU instead of per-point host loops over a cKDTree.

The eigen-decomposition of the (N, 3, 3) covariance stack uses a closed-form
analytic 3x3 symmetric eigensolver (trigonometric method) — ``jnp.linalg``
factorizations are host-latency-heavy on TPU for huge batches of tiny
matrices, while this formulation is pure VPU arithmetic.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from .neighbors import knn, radius_count


def _sym3x3_smallest_eig(cov: jax.Array) -> tuple[jax.Array, jax.Array]:
    """Smallest eigenvalue + eigenvector and all eigenvalues of 3x3 sym mats.

    Analytic trigonometric eigenvalues (Smith's method), eigenvector via the
    cross product of two rows of (A - lambda I) (most stable pair chosen by
    norm). Returns (eigvec (..., 3), eigvals_ascending (..., 3)).
    """
    a00 = cov[..., 0, 0]
    a01 = cov[..., 0, 1]
    a02 = cov[..., 0, 2]
    a11 = cov[..., 1, 1]
    a12 = cov[..., 1, 2]
    a22 = cov[..., 2, 2]

    q = (a00 + a11 + a22) / 3.0
    b00, b11, b22 = a00 - q, a11 - q, a22 - q
    p2 = (
        b00 * b00
        + b11 * b11
        + b22 * b22
        + 2.0 * (a01 * a01 + a02 * a02 + a12 * a12)
    )
    p = jnp.sqrt(jnp.maximum(p2 / 6.0, 1e-30))

    # det(B)/2 with B = (A - qI)/p
    det = (
        b00 * (b11 * b22 - a12 * a12)
        - a01 * (a01 * b22 - a12 * a02)
        + a02 * (a01 * a12 - b11 * a02)
    )
    r = jnp.clip(det / (2.0 * p * p * p), -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0

    e1 = q + 2.0 * p * jnp.cos(phi)  # largest
    e3 = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)  # smallest
    e2 = 3.0 * q - e1 - e3

    lam = e3
    # rows of A - lam I
    r0 = jnp.stack([a00 - lam, a01, a02], axis=-1)
    r1 = jnp.stack([a01, a11 - lam, a12], axis=-1)
    r2 = jnp.stack([a02, a12, a22 - lam], axis=-1)
    c01 = jnp.cross(r0, r1)
    c02 = jnp.cross(r0, r2)
    c12 = jnp.cross(r1, r2)
    norms = jnp.stack(
        [
            jnp.linalg.norm(c01, axis=-1),
            jnp.linalg.norm(c02, axis=-1),
            jnp.linalg.norm(c12, axis=-1),
        ],
        axis=-1,
    )
    best = jnp.argmax(norms, axis=-1)
    stacked = jnp.stack([c01, c02, c12], axis=-2)  # (..., 3, 3)
    vec = jnp.take_along_axis(
        stacked, best[..., None, None].repeat(3, -1), axis=-2
    )[..., 0, :]
    vec = vec / jnp.maximum(
        jnp.linalg.norm(vec, axis=-1, keepdims=True), 1e-12
    )
    # Degenerate (isotropic) case: any direction works; use +z.
    degenerate = (p2 < 1e-24)[..., None]
    vec = jnp.where(degenerate, jnp.array([0.0, 0.0, 1.0]), vec)
    eigvals = jnp.stack([e3, e2, e1], axis=-1)
    return vec, eigvals


def _neighbor_covariance(
    points: jax.Array, valid: jax.Array, k: int, cell_size, max_per_cell: int
):
    idx, d2 = knn(points, points, valid, k, cell_size, max_per_cell)
    has = jnp.isfinite(d2)  # (N, k)
    nbrs = points[idx]  # (N, k, 3)
    w = has.astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(w, axis=1, keepdims=True), 1.0)
    mean = jnp.sum(nbrs * w[..., None], axis=1, keepdims=True) / cnt[..., None]
    centered = (nbrs - mean) * w[..., None]
    # np.cov uses the unbiased (n-1) normalization (Features.py:25,129)
    denom = jnp.maximum(cnt - 1.0, 1.0)
    cov = jnp.einsum("nkd,nke->nde", centered, centered) / denom[..., None]
    return cov


@partial(jax.jit, static_argnames=("k", "max_per_cell"))
def compute_normals(
    points: jax.Array,
    valid: jax.Array,
    k: int = 15,
    cell_size: float = 0.25,
    max_per_cell: int = 16,
) -> jax.Array:
    """PCA normals: smallest eigenvector of the k-NN covariance.

    Parity with ``Features.py:111-133`` (k defaults to the pipeline's 15,
    ``LabelGenerationCuda.py:198``). Sign is not canonicalized, matching the
    reference (SVD sign is arbitrary there too).
    """
    cov = _neighbor_covariance(points, valid, k, cell_size, max_per_cell)
    vec, _ = _sym3x3_smallest_eig(cov)
    return vec


@partial(jax.jit, static_argnames=("k", "max_per_cell"))
def compute_curvature(
    points: jax.Array,
    valid: jax.Array,
    k: int = 10,
    cell_size: float = 0.25,
    max_per_cell: int = 16,
) -> jax.Array:
    """Curvature = smallest eigenvalue / (sum + 1e-6) (``Features.py:136-158``)."""
    cov = _neighbor_covariance(points, valid, k, cell_size, max_per_cell)
    _, eigvals = _sym3x3_smallest_eig(cov)
    return eigvals[:, 0] / (jnp.sum(eigvals, axis=1) + 1e-6)


def compute_height(points: jax.Array, valid: jax.Array) -> jax.Array:
    """Relative height in [0, 1] (``Features.py:31-40``)."""
    z = points[:, 2]
    z_min = jnp.min(jnp.where(valid, z, jnp.inf))
    z_max = jnp.max(jnp.where(valid, z, -jnp.inf))
    return (z - z_min) / jnp.maximum(z_max - z_min, 1e-12)


def compute_density(
    points: jax.Array, valid: jax.Array, radius: float = 0.1
) -> jax.Array:
    """Neighbor count within ``radius`` of each point, self included
    (``Features.py:42-52``; the reference's per-point sklearn
    radius_neighbors loop, here one tiled device broadcast)."""
    return radius_count(points, points, valid, radius)


def compute_verticality(normals: jax.Array) -> jax.Array:
    """|cos| against +z (``Features.py:54-63``)."""
    return jnp.abs(normals[:, 2])


def compute_distance_to_center(
    points: jax.Array, valid: jax.Array
) -> jax.Array:
    """XY distance to the cloud's XY centroid (``Features.py:65-74``)."""
    w = valid.astype(jnp.float32)
    center = jnp.sum(points[:, :2] * w[:, None], axis=0) / jnp.maximum(
        jnp.sum(w), 1.0
    )
    return jnp.linalg.norm(points[:, :2] - center, axis=1)


def add_features(
    labeled_cloud,
    use_normals: bool = True,
    use_heights: bool = True,
    use_densities: bool = False,
    use_verticalities: bool = False,
    use_distances: bool = False,
    use_curvatures: bool = False,
    cell_size: float = 0.25,
    density_radius: float = 0.1,
):
    """Append selected feature columns to a labeled cloud.

    Host-facing assembler with the reference's column order
    (``Features.py:178-229``): normals (3), curvature, density, height,
    verticality, distance-to-center. Pipeline defaults produce the
    normals+height layout used by label generation
    (``LabelGenerationCuda.py:194-200``).
    """
    import numpy as np

    labeled_cloud = np.asarray(labeled_cloud, dtype=np.float32)
    pts = jnp.asarray(labeled_cloud[:, :3])
    valid = jnp.ones(pts.shape[0], dtype=bool)

    columns = [labeled_cloud]
    normals = None
    if use_normals:
        normals = compute_normals(pts, valid, k=15, cell_size=cell_size)
        columns.append(np.asarray(normals))
    if use_curvatures:
        curv = compute_curvature(pts, valid, k=10, cell_size=cell_size)
        columns.append(np.asarray(curv)[:, None])
    if use_densities:
        dens = radius_count(pts, pts, valid, density_radius)
        columns.append(np.asarray(dens, dtype=np.float32)[:, None])
    if use_heights:
        h = compute_height(pts, valid)
        columns.append(np.asarray(h)[:, None])
    if use_verticalities:
        if normals is None:
            normals = compute_normals(pts, valid, k=15, cell_size=cell_size)
        columns.append(np.asarray(compute_verticality(normals))[:, None])
    if use_distances:
        d = compute_distance_to_center(pts, valid)
        columns.append(np.asarray(d)[:, None])
    return np.concatenate(columns, axis=1)
