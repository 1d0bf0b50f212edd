"""Point-set sampling/grouping primitives for PointNet++-style models.

Behavioral parity with the reference's pure-torch GPU kernels
(``/root/reference/Modules/PointNet2/pointnet2_utils.py``):

- :func:`square_distance` — pairwise squared distances via the matmul
  identity (MXU-friendly on TPU).
- :func:`farthest_point_sample` — the exact sequential FPS recurrence
  (``pointnet2_utils.py:66-89``) as a ``lax.fori_loop``, extended with a
  validity mask so padded points are never selected.
- :func:`query_ball_point` — the reference's semantics exactly
  (``:92-136``): the ``nsample`` *lowest-index* points within the radius
  (not the nearest!), with empty balls falling back to the globally nearest
  point. Implemented with ``lax.top_k`` over an index-keyed score instead of
  a full sort.
- :func:`three_nn_interpolate` — inverse-squared-distance 3-NN feature
  interpolation for feature propagation (``blocks.py:191-204``).

All functions take a ``valid`` mask and keep static shapes; batches are
(B, N, ...) padded tensors.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


def square_distance(src: jax.Array, dst: jax.Array) -> jax.Array:
    """(B, N, M) squared euclidean distances (pointnet2_utils.py:21-42).

    ``precision='highest'`` forces full-f32 MXU passes: the matmul identity
    suffers catastrophic cancellation at bf16 (boundary errors ~1e-2 would
    corrupt radius membership).
    """
    d = -2.0 * jnp.einsum(
        "bnc,bmc->bnm",
        src,
        dst,
        precision="highest",
        preferred_element_type=jnp.float32,
    )
    d = d + jnp.sum(src**2, axis=-1)[:, :, None]
    d = d + jnp.sum(dst**2, axis=-1)[:, None, :]
    return d


def index_points(points: jax.Array, idx: jax.Array) -> jax.Array:
    """Gather (B, N, C) by (B, ...) indices -> (B, ..., C)."""
    return jnp.take_along_axis(
        points,
        idx.reshape(idx.shape[0], -1, 1),
        axis=1,
    ).reshape(*idx.shape, points.shape[-1])


@partial(jax.jit, static_argnames=("npoint",))
def farthest_point_sample(
    xyz: jax.Array,
    valid: jax.Array,
    npoint: int,
    rng: jax.Array | None = None,
) -> jax.Array:
    """Iterative farthest-point sampling over valid points.

    Returns (B, npoint) int32 indices. The first centroid is random among
    valid points when ``rng`` is given (reference behavior,
    pointnet2_utils.py:79), else the first valid point. If npoint exceeds
    the number of valid points, selections repeat (harmless downstream).
    """
    b, n, _ = xyz.shape
    neg = jnp.float32(-1.0)
    init_dist = jnp.where(valid, jnp.float32(1e10), neg)

    if rng is not None:
        scores = jnp.where(valid, jax.random.uniform(rng, (b, n)), -1.0)
        farthest = jnp.argmax(scores, axis=1).astype(jnp.int32)
    else:
        farthest = jnp.argmax(valid, axis=1).astype(jnp.int32)

    centroids = jnp.zeros((b, npoint), jnp.int32)
    rows = jnp.arange(b)

    def body(i, carry):
        dist, farthest, centroids = carry
        centroids = centroids.at[:, i].set(farthest)
        centroid = xyz[rows, farthest][:, None, :]  # (B, 1, 3)
        d = jnp.sum((xyz - centroid) ** 2, axis=-1)
        d = jnp.where(valid, d, neg)
        dist = jnp.minimum(dist, d)
        farthest = jnp.argmax(dist, axis=1).astype(jnp.int32)
        return dist, farthest, centroids

    _, _, centroids = jax.lax.fori_loop(
        0, npoint, body, (init_dist, farthest, centroids)
    )
    return centroids


@partial(jax.jit, static_argnames=("npoint", "buckets"))
def bucketed_farthest_point_sample(
    xyz: jax.Array,
    valid: jax.Array,
    npoint: int,
    rng: jax.Array | None = None,
    buckets: int = 16,
) -> jax.Array:
    """Blocked approximate FPS: ``buckets``-way parallel exact FPS over
    strided subsamples (VERDICT r4 #7; cf. the two-level samplers in
    PAPERS.md).

    The exact recurrence (:func:`farthest_point_sample`) is
    latency-bound on TPU: ``npoint`` sequential (B, N) argmax steps.
    This variant assigns point ``i`` to bucket ``i % buckets`` — each
    bucket is a uniform 1/buckets subsample of the cloud in any input
    order — and runs the exact FPS *inside* every bucket in parallel
    (one vmapped loop of ``ceil(npoint/buckets)`` steps). The union of
    per-bucket farthest-first prefixes approximates the global FPS
    spread; selections that land on padded/invalid rows (possible only
    in valid-starved buckets) are repaired to the first valid point.
    Exact mode (``buckets=1``) remains the parity default
    (reference pointnet2_utils.py:66-89).
    """
    b, n, _ = xyz.shape
    g = max(1, min(buckets, npoint, n))
    if g == 1:
        return farthest_point_sample(xyz, valid, npoint, rng)
    npad = -(-n // g) * g
    if npad != n:
        xyz = jnp.pad(xyz, ((0, 0), (0, npad - n), (0, 0)))
        valid = jnp.pad(valid, ((0, 0), (0, npad - n)))
    m = npad // g
    xb = xyz.reshape(b, m, g, 3).transpose(0, 2, 1, 3).reshape(b * g, m, 3)
    vb = valid.reshape(b, m, g).transpose(0, 2, 1).reshape(b * g, m)
    q = -(-npoint // g)  # per-bucket quota
    sub = farthest_point_sample(xb, vb, q, rng)  # (b*g, q)
    sub = sub.reshape(b, g, q)
    glob = sub * g + jnp.arange(g, dtype=jnp.int32)[None, :, None]
    # FPS-order-major interleave: truncating to npoint drops the LAST
    # (least-far) selection of some buckets, never a whole bucket
    glob = glob.transpose(0, 2, 1).reshape(b, g * q)[:, :npoint]
    ok = jnp.take_along_axis(valid, glob, axis=1)
    first_valid = jnp.argmax(valid, axis=1).astype(jnp.int32)
    glob = jnp.where(ok, glob, first_valid[:, None])
    return glob.astype(jnp.int32)


@partial(jax.jit, static_argnames=("nsample",))
def query_ball_point(
    radius: float,
    nsample: int,
    xyz: jax.Array,
    new_xyz: jax.Array,
    valid: jax.Array,
) -> jax.Array:
    """Indices of up to ``nsample`` lowest-index valid points in each ball.

    (B, S, nsample) int32; empty balls are filled with the globally nearest
    valid point (reference pointnet2_utils.py:92-136).
    """
    n = xyz.shape[1]
    sqr = square_distance(new_xyz, xyz)  # (B, S, N)
    sqr = jnp.where(valid[:, None, :], sqr, jnp.inf)
    in_ball = sqr <= radius**2

    idx_key = jnp.arange(n, dtype=jnp.int32)
    # top_k largest picks the smallest indices among in-ball points
    score = jnp.where(in_ball, -idx_key[None, None, :], jnp.int32(-n - 1))
    k_eff = min(nsample, n)
    top_scores, top_idx = jax.lax.top_k(score, k_eff)
    got = top_scores > -n - 1  # (B, S, k_eff)

    nearest = jnp.argmin(sqr, axis=-1).astype(jnp.int32)  # (B, S)
    first = jnp.where(got[..., 0], top_idx[..., 0], nearest)
    out = jnp.where(got, top_idx, first[..., None]).astype(jnp.int32)
    if k_eff < nsample:  # fewer points than group size: pad with fallback
        pad = jnp.broadcast_to(
            first[..., None], (*first.shape, nsample - k_eff)
        ).astype(jnp.int32)
        out = jnp.concatenate([out, pad], axis=-1)
    return out


def three_nn_interpolate(
    xyz_to: jax.Array,  # (B, N, 3) targets
    xyz_from: jax.Array,  # (B, S, 3) sources
    feats_from: jax.Array,  # (B, S, C)
    valid_from: jax.Array,  # (B, S)
) -> jax.Array:
    """Inverse-squared-distance weighted 3-NN interpolation -> (B, N, C).

    Parity with reference FP interpolation (blocks.py:191-204): weights are
    reciprocals of *squared* distances clamped at 1e-6, over k = min(3, S).
    """
    s = xyz_from.shape[1]
    if s == 1:
        return jnp.broadcast_to(
            feats_from[:, :1, :],
            (xyz_to.shape[0], xyz_to.shape[1], feats_from.shape[-1]),
        )
    k = min(3, s)
    d = square_distance(xyz_to, xyz_from)
    d = jnp.where(valid_from[:, None, :], d, jnp.inf)
    neg_d, idx = jax.lax.top_k(-d, k)  # (B, N, k)
    dk = jnp.clip(-neg_d, 1e-6, None)
    recip = 1.0 / dk
    # guard fully-invalid source rows (all inf -> recip ~ 0)
    recip = jnp.where(jnp.isfinite(recip), recip, 0.0)
    weight = recip / jnp.maximum(
        jnp.sum(recip, axis=-1, keepdims=True), 1e-12
    )
    gathered = index_points(feats_from, idx)  # (B, N, k, C)
    return jnp.sum(gathered * weight[..., None], axis=2)


def sample_and_group(
    npoint: int,
    radius: float,
    nsample: int,
    xyz: jax.Array,
    feats: jax.Array | None,
    valid: jax.Array,
    rng: jax.Array | None = None,
):
    """FPS + ball grouping (reference pointnet2_utils.py:139-167).

    Returns (new_xyz (B,S,3), grouped (B,S,K,3+C), new_valid (B,S)).
    Grouped features are [relative xyz, point feats].
    """
    fps_idx = farthest_point_sample(xyz, valid, npoint, rng)
    new_xyz = index_points(xyz, fps_idx)  # (B, S, 3)
    new_valid = jnp.take_along_axis(valid, fps_idx, axis=1)
    idx = query_ball_point(radius, nsample, xyz, new_xyz, valid)
    grouped_xyz = index_points(xyz, idx) - new_xyz[:, :, None, :]
    if feats is not None:
        grouped_feats = index_points(feats, idx)
        grouped = jnp.concatenate([grouped_xyz, grouped_feats], axis=-1)
    else:
        grouped = grouped_xyz
    return new_xyz, grouped, new_valid
