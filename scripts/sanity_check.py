#!/usr/bin/env python
"""Synthetic-fixture sanity check: overfit a model on a procedural cylinder.

Parity with reference ``ModelTestingScripts/SanityCheckPointNet2.py``: build
a noisy cylinder with known ground-truth offsets, overfit the chosen model
through the real training path, and plot predicted vs ground-truth offset
quivers in slices. Works for all three families.
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser()
    parser.add_argument(
        "model",
        choices=["treelearn", "pointnet2", "pointtransformerv3"],
        nargs="?",
        default="pointnet2",
    )
    parser.add_argument("--n_points", type=int, default=10000)
    parser.add_argument("--epochs", type=int, default=200)
    parser.add_argument("--lr", type=float, default=1e-3)
    parser.add_argument("--out", type=str, default="sanity_check.png")
    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax
    import numpy as np

    from treemorph_tpu.data import make_padded_batch
    from treemorph_tpu.data.treeset import TreeSample
    from treemorph_tpu.fixtures import synthetic_cylinder_cloud
    from treemorph_tpu.plotting import plot_offset_slices
    from treemorph_tpu.train import (
        create_train_state,
        make_eval_step,
        make_train_step,
        run_training,
    )
    from treemorph_tpu.train import families
    from treemorph_tpu.train.harness import make_optimizer

    rng = np.random.default_rng(0)
    labeled = synthetic_cylinder_cloud(args.n_points, rng=rng)
    norm = np.linalg.norm(labeled[:, 3:6], axis=1)
    sample = TreeSample(
        points=labeled[:, :3],
        feats=labeled[:, 7:],
        offsets=labeled[:, 3:6],
        semantic_label=(norm > 0.05).astype(np.int32),
        offset_mask=norm <= 0.05,
        path="synthetic_cylinder",
    )
    batch = make_padded_batch([sample], bucket=1024)

    if args.model == "pointnet2":
        from treemorph_tpu.models import PointNet2

        model = PointNet2(depth=5)
        fam = families.pointnet2_family(model, loss_multiplier_semantic=0.0)
        variables = families.init_pointnet2(model, batch, jax.random.key(0))
    elif args.model == "treelearn":
        from treemorph_tpu.models import TreeLearn

        model = TreeLearn(
            channels=16, num_blocks=3, dim_feat=4, voxel_size=0.02,
            batch_size=1,
        )
        fam = families.treelearn_family(model, loss_multiplier_semantic=0.0)
        variables = families.init_treelearn(model, batch, jax.random.key(0))
    else:
        from treemorph_tpu.models.ptv3 import PointTransformerWithHeads

        model = PointTransformerWithHeads(
            dim_feat=4, use_feats=True, drop_path=0.0
        )
        fam = families.ptv3_family(model, loss_multiplier_semantic=0.0)
        variables = families.init_ptv3(model, batch, jax.random.key(0))

    forward_fn, loss_fn = fam
    tx = make_optimizer()
    state = create_train_state(variables, tx)
    train_step = make_train_step(forward_fn, loss_fn, tx)
    eval_step = make_eval_step(forward_fn, loss_fn)

    state, history = run_training(
        state,
        train_step,
        eval_step,
        train_batches=lambda e: iter([batch]),
        val_batches=lambda e: iter([batch]),
        epochs=args.epochs,
        lr_schedule=lambda e: args.lr,
        verbose=True,
        rng=jax.random.key(1),
    )
    print(
        f"loss: {history[0]['train_loss']:.4f} -> "
        f"{history[-1]['train_loss']:.4f}"
    )

    out, _ = forward_fn(state.params, state.batch_stats, batch, False, None)
    pred = np.asarray(out["offset_predictions"]).reshape(-1, 3)[
        : args.n_points
    ]
    plot_offset_slices(
        labeled[:, :3],
        labeled[:, 3:6],
        pred,
        args.out,
        slices=((0.0, 0.5), (1.0, 1.5), (2.0, 2.5), (3.5, 4.0), (4.5, 5.0)),
    )
    print(f"slice plot -> {args.out}")


if __name__ == "__main__":
    main()
