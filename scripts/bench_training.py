#!/usr/bin/env python
"""Training-step benchmark for all three families.

The reference's only published numbers are training epoch times at fixed
batch shapes (``Plotting/computational_expenses.py``, unstated single
GPU): TreeLearn 12.96 s/epoch @ 30 trees/batch, PointTransformerV3
39.05 s/epoch @ 4 trees/batch, PointNet2 1384 s/epoch @ 60-raster
hierarchical minibatches. This measures one optimizer step
(fwd+bwd+AdamW) at the same batch shapes and prints a JSON comparison.
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REFERENCE_EPOCH_SECONDS = {
    "treelearn": 12.96,
    "ptv3": 39.05,
    "pointnet2": 1384.07,
}
BATCH_SHAPE = {
    # (elements per batch, points per element)
    "treelearn": (30, 16384),
    "ptv3": (4, 16384),
    "pointnet2": (60, 4096),  # 60 rasters (reference minibatch size)
}


def make_samples(trees, n_points):
    from treemorph_tpu.data.treeset import TreeSample
    from treemorph_tpu.fixtures import synthetic_qsm, synthetic_tree_cloud

    rng = np.random.default_rng(0)
    samples = []
    for _ in range(trees):
        qsm = synthetic_qsm(rng=rng)
        pts, _ = synthetic_tree_cloud(qsm=qsm, points_per_m2=4000, rng=rng)
        if len(pts) >= n_points:
            pts = pts[:n_points]
        else:
            reps = -(-n_points // len(pts))
            pts = np.tile(pts, (reps, 1))[:n_points] + rng.normal(
                0, 0.005, (n_points, 3)
            ).astype(np.float32)
        offs = rng.normal(0, 0.02, (n_points, 3)).astype(np.float32)
        norm = np.linalg.norm(offs, axis=1)
        samples.append(
            TreeSample(
                points=pts,
                feats=rng.normal(size=(n_points, 4)).astype(np.float32),
                offsets=offs,
                semantic_label=(norm > 0.05).astype(np.int32),
                offset_mask=norm <= 0.05,
                path="bench",
            )
        )
    return samples


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--family", default="treelearn",
        choices=["treelearn", "ptv3", "pointnet2"],
    )
    ap.add_argument("--iters", type=int, default=5)
    ap.add_argument(
        "--engine", default="gather",
        help="TreeLearn conv engine (gather/zpack/pencil/brick) or PTv3 "
        "stem_engine (gather/zpack; zpack implies dedup_divisor=4)",
    )
    ap.add_argument(
        "--compute_dtype", default="float32",
        help="PTv3 attention/MLP matmul dtype (float32/bfloat16)",
    )
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_cache/tpu"
    )

    from treemorph_tpu.data import make_padded_batch
    from treemorph_tpu.models import PointNet2, TreeLearn
    from treemorph_tpu.models.ptv3 import PointTransformerWithHeads
    from treemorph_tpu.train import create_train_state, make_train_step
    from treemorph_tpu.train.families import (
        init_pointnet2,
        init_ptv3,
        init_treelearn,
        pointnet2_family,
        ptv3_family,
        treelearn_family,
    )
    from treemorph_tpu.train.harness import make_optimizer

    trees, n_points = BATCH_SHAPE[args.family]
    samples = make_samples(trees, n_points)
    batch = jax.tree.map(
        jnp.asarray, make_padded_batch(samples, bucket=n_points)
    )

    if args.family == "treelearn":
        # honest static voxel cap: the sparse training workload's true
        # unique-voxel count (host-computed), bucketed — divisor=2
        # silently dropped ~1/3 of the voxels here (bench.py has the
        # same accounting + a dropless assert)
        import numpy as _np

        uniq = sum(
            len(_np.unique(
                _np.floor(s.points / 0.02).astype(_np.int64), axis=0
            ))
            for s in samples
        )
        vcap = -(-int(uniq * 1.02) // 8192) * 8192
        model = TreeLearn(
            channels=32, num_blocks=3, dim_feat=4, voxel_size=0.02,
            batch_size=trees, voxel_capacity=vcap,
            engine=args.engine,
        )
        variables = init_treelearn(model, batch, jax.random.key(0))
        forward_fn, loss_fn = treelearn_family(model)
    elif args.family == "ptv3":
        model = PointTransformerWithHeads(
            dim_feat=4, use_feats=True, voxel_size=0.02,
            stem_engine=args.engine,
            dedup_divisor=4 if args.engine == "zpack" else None,
            compute_dtype=args.compute_dtype,
        )
        variables = init_ptv3(model, batch, jax.random.key(0))
        forward_fn, loss_fn = ptv3_family(model)
    else:
        model = PointNet2(depth=5, dim_feat=4)
        variables = init_pointnet2(model, batch, jax.random.key(0))
        forward_fn, loss_fn = pointnet2_family(model)

    tx = make_optimizer()
    state = create_train_state(variables, tx)
    train_step = make_train_step(forward_fn, loss_fn, tx)

    lr = jnp.float32(1e-3)
    state, metrics = train_step(state, batch, lr, jax.random.key(1))
    jax.block_until_ready(metrics["loss"])  # compile + warmup
    float(metrics["loss"])

    # async-pipelined: steps chain through `state`, so dispatching all
    # iters and fetching the final loss forces every step to execute
    # back-to-back on device; a per-step float() sync would add ~250 ms
    # of axon host-tunnel round trip per step (measurement overhead).
    t0 = time.perf_counter()
    for i in range(args.iters):
        state, metrics = train_step(
            state, batch, lr, jax.random.key(2 + i)
        )
    float(metrics["loss"])
    step_seconds = (time.perf_counter() - t0) / args.iters

    points_per_sec = trees * n_points / step_seconds
    print(
        json.dumps(
            {
                "metric": f"{args.family}_train_step_seconds",
                "value": round(step_seconds, 4),
                "unit": "s/step",
                "batch": f"{trees}x{n_points}",
                "points_per_sec": round(points_per_sec, 1),
                "reference_epoch_seconds":
                    REFERENCE_EPOCH_SECONDS[args.family],
            }
        )
    )


if __name__ == "__main__":
    main()
