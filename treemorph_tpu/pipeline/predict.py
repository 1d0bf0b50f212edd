"""Stage 1: model-based offset refinement + denoising.

Capability parity with the reference predictors
(``/root/reference/Modules/Pipeline/ModelPredicting.py``):

- :func:`predict_single` — one forward per tree for the voxel-layout
  families (TreeLearn / PTv3): apply predicted offsets, then drop points
  whose noise-head argmax is class 1 (``:16-95``; class 0 is kept).
- :func:`predict_rasterized` — the PointNet2 path (``:166-250``): cut the
  cloud into overlapping cubes, run each raster through the padded-batch
  model, and average the per-point predictions over all rasters containing
  the point (the reference's streaming scatter-mean,
  ``PointNet2.py:210-327``).

TPU redesign: raster minibatches are static-shape (B_rasters x
bucketed-N) padded tensors; the scatter-mean accumulation happens on the
host in fp32 numpy (one transfer per minibatch), exactly reproducing the
reference's prediction-averaging semantics without its per-raster Python
streaming inside the model.
"""

from __future__ import annotations

import logging

import numpy as np

from ..evaluation.model_loaders import Predictor
from ..data.treeset import pad_to_bucket

logger = logging.getLogger(__name__)


def _pad_flat(points: np.ndarray, feats: np.ndarray, bucket: int = 1024):
    import jax.numpy as jnp

    n = len(points)
    p = pad_to_bucket(n, bucket)
    coords = np.zeros((p, 3), np.float32)
    f = np.zeros((p, feats.shape[1]), np.float32)
    coords[:n] = points
    f[:n] = feats
    valid = np.arange(p) < n
    return (
        jnp.asarray(coords),
        jnp.asarray(f),
        jnp.zeros(p, jnp.int32),
        jnp.asarray(valid),
        n,
    )


def predict_single(
    cloud: np.ndarray,
    offset_model: Predictor | None = None,
    noise_model: Predictor | None = None,
    predict_offset: bool = True,
    denoise: bool = True,
    bucket: int = 1024,
) -> np.ndarray:
    """TreeLearn/PTv3 path: whole-tree forward, offsets then denoise."""
    pts = np.asarray(cloud, np.float32)[:, :3]
    if not predict_offset and not denoise:
        return pts
    feats = (
        np.asarray(cloud, np.float32)[:, 7:11]
        if cloud.shape[1] >= 11
        else np.zeros((len(pts), 4), np.float32)
    )
    coords, f, batch_ids, valid, n = _pad_flat(pts, feats, bucket)

    out = pts.copy()
    if predict_offset and offset_model is not None:
        res = _predict_flat_retry(
            offset_model, coords, f, batch_ids, valid, "offset model"
        )
        out = out + np.asarray(res["offset_predictions"])[:n]
    if denoise and noise_model is not None:
        res = _predict_flat_retry(
            noise_model, coords, f, batch_ids, valid, "noise model"
        )
        logits = np.asarray(res["semantic_prediction_logits"])[:n]
        keep = logits.argmax(axis=1) == 0
        out = out[keep]
    return out


#: per-family capacity settings that cannot overflow on ANY input
#: (divisor 1 = static arrays sized to the worst case; pool_shrink 2 is
#: lossless for stride-2 coarsening). Param trees are cap-independent,
#: so the loaded variables drop straight into the relaxed model.
SAFE_CAP_OVERRIDES = {
    "treelearn": dict(
        voxel_capacity_divisor=1, pencil_divisor=1, brick_divisor=1
    ),
    "pointtransformerv3": dict(dedup_divisor=1, pool_shrink=2),
}


def _overflow_total(res: dict) -> int:
    return sum(
        int(res.get(k, 0) or 0)
        for k in (
            "dropped_points", "dropped_voxels", "dedup_overflow",
            "pool_overflow",
        )
    )


def _predict_flat_retry(model: Predictor, coords, f, batch_ids, valid,
                        what: str) -> dict:
    """Forward with automatic higher-cap retry (VERDICT r3 #6): if the
    tuned static caps drop anything on this cloud, re-run once with the
    family's overflow-proof capacities instead of returning degraded
    predictions."""
    res = model.predict_flat(coords, f, batch_ids, valid)
    n_over = _overflow_total(res)
    if n_over:
        safe = SAFE_CAP_OVERRIDES.get(model.family, {})
        relax = {
            k: v
            for k, v in safe.items()
            if getattr(model.model, k, v) != v
        }
        if relax:
            logger.warning(
                "%s overflowed static caps (%d dropped) — retrying with "
                "safe capacities %s", what, n_over, relax,
            )
            relaxed = Predictor(
                model.family, model.model.clone(**relax), model.variables
            )
            res = relaxed.predict_flat(coords, f, batch_ids, valid)
            n_over = _overflow_total(res)
        if n_over:
            _warn_dropped(res, what)
    return res


def _warn_dropped(res: dict, what: str) -> None:
    """Surface static-cap overflow (dropped voxels silently degrade
    predictions; raise voxel_capacity_divisor / pencil_divisor caps)."""
    total = _overflow_total(res)
    if total:
        logger.warning(
            "%s overflowed static caps even at safe capacities: %d "
            "units dropped — predictions are degraded for this cloud",
            what, total,
        )


def raster_assignments(
    points: np.ndarray, raster_size: float, stride: float
):
    """Group point indices by overlapping cubic rasters.

    Host-side replacement for the reference rasterizer loop
    (``ModelPredicting.py:98-163``): a point at p belongs to every raster
    with origin ``min + j*stride`` satisfying ``origin <= p < origin+size``.
    Returns a list of (raster_key, point_indices) with non-empty rasters
    only, ordered by raster key.
    """
    pts = np.asarray(points, np.float64)[:, :3]
    mins = pts.min(axis=0)
    maxs = pts.max(axis=0)
    n_overlap = max(int(np.ceil(raster_size / stride)), 1)
    # raster-grid extents identical to the reference's arange(min, max, stride)
    n_cells = np.maximum(np.ceil((maxs - mins) / stride), 1).astype(int)

    base = np.floor((pts - mins) / stride).astype(int)
    groups: dict[tuple, list] = {}
    for sx in range(n_overlap):
        for sy in range(n_overlap):
            for sz in range(n_overlap):
                j = base - np.array([sx, sy, sz])
                origin = mins + j * stride
                ok = (
                    (j >= 0).all(axis=1)
                    & (j < n_cells).all(axis=1)
                    & (pts >= origin).all(axis=1)
                    & (pts < origin + raster_size).all(axis=1)
                )
                idx = np.nonzero(ok)[0]
                keys = j[idx]
                if len(idx) == 0:
                    continue
                order = np.lexsort((keys[:, 2], keys[:, 1], keys[:, 0]))
                idx = idx[order]
                keys = keys[order]
                boundaries = np.nonzero(
                    np.any(np.diff(keys, axis=0) != 0, axis=1)
                )[0]
                starts = np.concatenate([[0], boundaries + 1])
                ends = np.concatenate([boundaries + 1, [len(idx)]])
                for s, e in zip(starts, ends):
                    groups.setdefault(tuple(keys[s]), []).append(idx[s:e])
    out = []
    for key in sorted(groups):
        out.append((key, np.concatenate(groups[key])))
    return out


def predict_rasterized(
    cloud: np.ndarray,
    offset_model: Predictor | None = None,
    noise_model: Predictor | None = None,
    predict_offset: bool = True,
    denoise: bool = True,
    raster_size: float = 1.0,
    stride: float = 1.0,
    minibatch_size: int = 60,
    bucket: int = 512,
) -> np.ndarray:
    """PointNet2 path: rasterize -> batched forwards -> scatter-mean."""
    import jax.numpy as jnp

    pts = np.asarray(cloud, np.float32)[:, :3]
    if not predict_offset and not denoise:
        return pts
    feats = (
        np.asarray(cloud, np.float32)[:, 7:11]
        if cloud.shape[1] >= 11
        else np.zeros((len(pts), 4), np.float32)
    )
    rasters = raster_assignments(pts, raster_size, stride)
    if not rasters:
        return pts

    max_pts = pad_to_bucket(max(len(i) for _, i in rasters), bucket)

    def run_model(model: Predictor, want: str):
        dim = 3 if want == "offset_predictions" else 2
        acc = np.zeros((len(pts), dim), np.float64)
        cnt = np.zeros(len(pts), np.int64)
        for start in range(0, len(rasters), minibatch_size):
            chunk = rasters[start : start + minibatch_size]
            b = len(chunk)
            coords = np.zeros((minibatch_size, max_pts, 3), np.float32)
            f = np.zeros((minibatch_size, max_pts, feats.shape[1]), np.float32)
            valid = np.zeros((minibatch_size, max_pts), bool)
            for i, (_, idx) in enumerate(chunk):
                coords[i, : len(idx)] = pts[idx]
                f[i, : len(idx)] = feats[idx]
                valid[i, : len(idx)] = True
            out = model.predict_padded(
                jnp.asarray(coords), jnp.asarray(f), jnp.asarray(valid)
            )
            vals = np.asarray(out[want])
            for i, (_, idx) in enumerate(chunk):
                acc[idx] += vals[i, : len(idx)]
                cnt[idx] += 1
        nz = cnt > 0
        acc[nz] /= cnt[nz, None]
        return acc.astype(np.float32)

    out = pts.copy()
    if predict_offset and offset_model is not None:
        out = out + run_model(offset_model, "offset_predictions")
    if denoise and noise_model is not None:
        logits = run_model(noise_model, "semantic_prediction_logits")
        out = out[logits.argmax(axis=1) == 0]
    return out


def make_raster_shard_fn(
    model, want: str, mesh, minibatch_size: int, n_pad: int, max_pts: int
):
    """Jitted shard_map program of the sharded raster scatter-mean.

    Module-level so the compiled-HLO structure test
    (tests/test_sharding_specs.py) can lower EXACTLY the program the
    pipeline runs: raster tiles sharded on the mesh's data axis, model
    forwards local, one ``psum_scatter`` per accumulator — the point
    list must never be all-gathered.
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    dim = 3 if want == "offset_predictions" else 2
    axis = mesh.axis_names[0]

    def shard_fn(idx_s, vm_s, pts_rep, feats_rep, variables):
        # idx_s: (r_per_dev, max_pts) — this chip's rasters.
        chunks = idx_s.reshape(-1, minibatch_size, max_pts)
        vchunks = vm_s.reshape(-1, minibatch_size, max_pts)

        def body(carry, chunk):
            acc, cnt = carry
            ci, cv = chunk
            coords = pts_rep[ci] * cv[..., None]
            f = feats_rep[ci] * cv[..., None]
            out = model.apply(variables, coords, f, cv, train=False)
            w = cv.astype(jnp.float32).reshape(-1)
            vals = jnp.where(
                cv[..., None], out[want], 0.0
            ).reshape(-1, dim)
            flat = ci.reshape(-1)
            acc = acc.at[flat].add(vals.astype(jnp.float32))
            cnt = cnt.at[flat].add(w)
            return (acc, cnt), None

        acc0 = jnp.zeros((n_pad, dim), jnp.float32)
        cnt0 = jnp.zeros((n_pad,), jnp.float32)
        (acc, cnt), _ = jax.lax.scan(body, (acc0, cnt0), (chunks, vchunks))
        # One collective: every chip keeps its 1/n slice of the sums.
        acc = jax.lax.psum_scatter(
            acc, axis, scatter_dimension=0, tiled=True
        )
        cnt = jax.lax.psum_scatter(
            cnt, axis, scatter_dimension=0, tiled=True
        )
        return acc, cnt

    return jax.jit(
        shard_map(
            shard_fn,
            mesh=mesh,
            in_specs=(P(axis), P(axis), P(), P(), P()),
            out_specs=(P(axis), P(axis)),
            # the model's internal fori_loop carries trip the
            # varying-axes checker; collectives here are explicit
            check_vma=False,
        )
    )


def predict_rasterized_sharded(
    cloud: np.ndarray,
    offset_model: Predictor | None = None,
    noise_model: Predictor | None = None,
    predict_offset: bool = True,
    denoise: bool = True,
    raster_size: float = 1.0,
    stride: float = 1.0,
    minibatch_size: int = 60,
    bucket: int = 512,
    mesh=None,
) -> np.ndarray:
    """Plot-scale inference sharded over the device mesh.

    The TPU scale-out of the reference's raster streaming
    (``PointNet2.py:329-394``, ``RasterizedTreeSet.py:390-459``): raster
    tiles are sharded across the mesh's ``data`` axis with ``shard_map``,
    every chip runs the model over its local minibatches (``lax.scan``),
    scatter-adds predictions into a full-cloud accumulator ON DEVICE, and
    the per-point sums are reassembled with ``psum_scatter`` (each chip
    ends up holding a 1/n slice of the cloud — one cross-chip reduce, no
    host round-trips per minibatch). Per-point results equal
    :func:`predict_rasterized` (same rasters, same forwards, same
    scatter-mean; accumulation is f32 on device vs f64 on host).
    """
    import jax
    import jax.numpy as jnp
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    if mesh is None:
        return predict_rasterized(
            cloud,
            offset_model,
            noise_model,
            predict_offset,
            denoise,
            raster_size=raster_size,
            stride=stride,
            minibatch_size=minibatch_size,
            bucket=bucket,
        )

    pts = np.asarray(cloud, np.float32)[:, :3]
    if not predict_offset and not denoise:
        return pts
    feats = (
        np.asarray(cloud, np.float32)[:, 7:11]
        if cloud.shape[1] >= 11
        else np.zeros((len(pts), 4), np.float32)
    )
    rasters = raster_assignments(pts, raster_size, stride)
    if not rasters:
        return pts

    n_dev = int(mesh.devices.size)
    axis = mesh.axis_names[0]
    max_pts = pad_to_bucket(max(len(i) for _, i in rasters), bucket)

    # Global raster->point gather table, padded so every device gets the
    # same number of whole minibatches.
    r = len(rasters)
    r_per_dev = -(-r // n_dev)
    r_per_dev = -(-r_per_dev // minibatch_size) * minibatch_size
    r_pad = r_per_dev * n_dev
    idx = np.zeros((r_pad, max_pts), np.int32)
    vmask = np.zeros((r_pad, max_pts), bool)
    for i, (_, pidx) in enumerate(rasters):
        idx[i, : len(pidx)] = pidx
        vmask[i, : len(pidx)] = True

    n = len(pts)
    n_pad = -(-n // n_dev) * n_dev
    pts_g = np.zeros((n_pad, 3), np.float32)
    feats_g = np.zeros((n_pad, feats.shape[1]), np.float32)
    pts_g[:n] = pts
    feats_g[:n] = feats

    def run_model(model: Predictor, want: str):
        run = make_raster_shard_fn(
            model.model, want, mesh, minibatch_size, n_pad, max_pts
        )
        acc, cnt = run(
            jnp.asarray(idx),
            jnp.asarray(vmask),
            jnp.asarray(pts_g),
            jnp.asarray(feats_g),
            model.variables,
        )
        acc = np.array(acc[:n])
        cnt = np.array(cnt[:n])
        nz = cnt > 0
        acc[nz] /= cnt[nz, None]
        return acc.astype(np.float32)

    out = pts.copy()
    if predict_offset and offset_model is not None:
        out = out + run_model(offset_model, "offset_predictions")
    if denoise and noise_model is not None:
        logits = run_model(noise_model, "semantic_prediction_logits")
        out = out[logits.argmax(axis=1) == 0]
    return out


def make_predictions(
    cloud: np.ndarray,
    model_type: str,
    offset_model: Predictor | None = None,
    noise_model: Predictor | None = None,
    predict_offset: bool = True,
    denoise: bool = True,
    raster_size: float = 1.0,
    stride: float = 1.0,
    minibatch_size: int = 60,
    mesh=None,
) -> np.ndarray:
    """Dispatch by family (reference Pipeline.py:110-131). With a mesh,
    the raster path shards tiles over the chips."""
    if model_type in ("treelearn", "pointtransformerv3"):
        return predict_single(
            cloud, offset_model, noise_model, predict_offset, denoise
        )
    if model_type == "pointnet2":
        return predict_rasterized_sharded(
            cloud,
            offset_model,
            noise_model,
            predict_offset,
            denoise,
            raster_size=raster_size,
            stride=stride,
            minibatch_size=minibatch_size,
            mesh=mesh,
        )
    if model_type == "no_model":
        return np.asarray(cloud, np.float32)[:, :3]
    raise ValueError(f"unknown model type {model_type!r}")
