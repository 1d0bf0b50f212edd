#!/usr/bin/env python
"""Training-step benchmark: TreeLearn fwd+bwd+update on a 30-tree batch.

The reference's only published numbers are training epoch times
(TreeLearn 12.96 s/epoch at 30 trees/batch, unstated single GPU,
``Plotting/computational_expenses.py``). This measures our equivalent
train step on the same batch shape and prints a JSON comparison.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REFERENCE_EPOCH_SECONDS = 12.96  # BASELINE.md
TREES_PER_BATCH = 30


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_cache/tpu"
    )

    from treemorph_tpu.data import make_padded_batch
    from treemorph_tpu.data.treeset import TreeSample
    from treemorph_tpu.fixtures import synthetic_qsm, synthetic_tree_cloud
    from treemorph_tpu.models import TreeLearn
    from treemorph_tpu.train import create_train_state, make_train_step
    from treemorph_tpu.train.families import init_treelearn, treelearn_family
    from treemorph_tpu.train.harness import make_optimizer

    n_points = 16384
    rng = np.random.default_rng(0)
    samples = []
    for _ in range(TREES_PER_BATCH):
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
    batch = make_padded_batch(samples, bucket=n_points)
    batch = jax.tree.map(jnp.asarray, batch)

    model = TreeLearn(
        channels=32,
        num_blocks=3,
        dim_feat=4,
        voxel_size=0.02,
        batch_size=TREES_PER_BATCH,
        voxel_capacity_divisor=2,
    )
    variables = init_treelearn(model, batch, jax.random.key(0))
    tx = make_optimizer()
    state = create_train_state(variables, tx)
    forward_fn, loss_fn = treelearn_family(model)
    train_step = make_train_step(forward_fn, loss_fn, tx)

    lr = jnp.float32(1e-3)
    state, metrics = train_step(state, batch, lr, jax.random.key(1))
    jax.block_until_ready(metrics["loss"])  # compile + warmup

    # async-pipelined: steps chain through `state`, so dispatching all
    # iters and fetching the final loss forces every step to execute
    # back-to-back on device; a per-step float() sync would add ~250 ms
    # of axon host-tunnel round trip per step (measurement overhead).
    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        state, metrics = train_step(
            state, batch, lr, jax.random.key(2 + i)
        )
    float(metrics["loss"])
    step_seconds = (time.perf_counter() - t0) / iters

    points_per_sec = TREES_PER_BATCH * n_points / step_seconds
    print(
        json.dumps(
            {
                "metric": "treelearn_train_step_seconds_30trees",
                "value": round(step_seconds, 4),
                "unit": "s/step",
                "points_per_sec": round(points_per_sec, 1),
                "reference_epoch_seconds": REFERENCE_EPOCH_SECONDS,
                "note": (
                    "reference epoch = 12.96s at 30 trees/batch (unknown "
                    "steps/epoch); our step covers 30 trees x 16384 pts"
                ),
            }
        )
    )


if __name__ == "__main__":
    main()
