#!/usr/bin/env python
"""Unified training CLI for all three model families.

Capability parity with the reference training entry points
(``ModelTrainingScripts/train_TreeLearn.py``, ``train_PointNet2.py``,
``train_PointTransformerV3.py``): per-plot cross-validation over
``--test_plots`` (default 3 4 6 8), AdamW(wd=1e-3) with
CosineAnnealingWarmRestarts(T_0=50, eta_min=1e-4), early stopping with
best-checkpoint saves, loss multipliers, noise-cloud training, and
per-model hyperparameters — one argparse CLI instead of three near-copies.

Checkpoints land in ``{save_dir}/{name}_CV/P{plot}/`` as orbax directories
with metadata manifests (replacing the reference's name-encoded configs).
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def parse_args():
    p = argparse.ArgumentParser(description="Train a tree-morphology model")
    p.add_argument("model", choices=["treelearn", "pointnet2",
                                     "pointtransformerv3"])
    p.add_argument("--data_root", type=str, default=None,
                   help="directory with plot_{n}.json manifests "
                        "(required unless --raster_dir)")
    p.add_argument("--save_dir", type=str, default="ModelSaves")
    p.add_argument("--name", type=str, default=None,
                   help="checkpoint run name (default: model family)")
    p.add_argument("--epochs", type=int, default=1000)
    p.add_argument("--batch_size", type=int, default=4)
    p.add_argument("--bucket", type=int, default=1024,
                   help="pad point counts to multiples of this")
    p.add_argument("--lr", type=float, default=1e-2)
    p.add_argument("--weight_decay", type=float, default=1e-3)
    p.add_argument("--t0", type=int, default=50)
    p.add_argument("--eta_min", type=float, default=1e-4)
    p.add_argument("--patience", type=int, default=20)
    p.add_argument("--noise_distance", type=float, default=0.05)
    p.add_argument("--noise_root", type=str, default=None)
    p.add_argument("--loss_multiplier_semantic", type=float, default=1.0)
    p.add_argument("--loss_multiplier_offset", type=float, default=1.0)
    p.add_argument("--test_plots", type=int, nargs="+", default=[3, 4, 6, 8])
    p.add_argument("--n_devices", type=int, default=None,
                   help="data-parallel devices (default: all)")
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--raster_dir", type=str, default=None,
                   help="train on rasterized crops (flattened mode, the "
                        "reference's PointNet2 raster training) from this "
                        "rasterizer output directory")
    p.add_argument("--hierarchical_json", type=str, nargs="+", default=None,
                   help="train hierarchically/streaming from AABB raster "
                        "metadata JSON(s): every tree's raster minibatches "
                        "become optimizer steps (the reference's "
                        "minibatch-streaming mode)")
    p.add_argument("--minibatch_size", type=int, default=20,
                   help="rasters per minibatch in hierarchical mode")
    p.add_argument("--per_minibatch_steps", action="store_true",
                   help="hierarchical mode: step the optimizer per raster "
                        "minibatch instead of accumulating gradients over "
                        "a tree batch (the reference accumulates; "
                        "train_utils.py:46-62)")
    p.add_argument("--fixed_modules", type=str, nargs="+", default=None,
                   help="freeze named top-level submodules for transfer "
                   "learning (reference TreeLearn fixed_modules)")
    p.add_argument("--debug_nans", action="store_true",
                   help="fail at the first NaN-producing op")
    p.add_argument("--augment", action="store_true",
                   help="apply the default training augmentations "
                        "(z-rotation, xy-flip, scale, target-preserving "
                        "jitter)")
    # family hyperparameters
    p.add_argument("--voxel_size", type=float, default=None)
    p.add_argument("--num_blocks", type=int, default=3)
    p.add_argument("--channels", type=int, default=32)
    p.add_argument("--depth", type=int, default=5, help="pointnet2 depth")
    p.add_argument("--dim_feat", type=int, default=4)
    p.add_argument("--engine", default="gather",
                   choices=["gather", "band", "zpack", "pencil", "brick"],
                   help="TreeLearn conv engine / PTv3 stem_engine "
                   "(band = banded one-hot Pallas MXU conv, the bench "
                   "default; all engines share one param tree, so "
                   "checkpoints stay interchangeable)")
    p.add_argument("--conv_dtype", default="float32",
                   choices=["float32", "bfloat16"],
                   help="conv compute dtype (bfloat16 = MXU rate, f32 "
                   "accumulation; for PTv3 this also sets attention/MLP "
                   "compute_dtype)")
    p.add_argument("--dedup_divisor", type=int, default=None,
                   help="ptv3: run level-0 convs once per unique voxel "
                        "(static cap = points // divisor; overflow is "
                        "reported). Dense clouds: 4 is safe and ~1.8x "
                        "faster; None = off")
    p.add_argument("--verbose", action="store_true")
    return p.parse_args()


def build(args, batch_size: int, axis_name=None):
    from treemorph_tpu.models import PointNet2, TreeLearn
    from treemorph_tpu.models.ptv3 import PointTransformerWithHeads
    from treemorph_tpu.train import families

    if args.model == "treelearn":
        model = TreeLearn(
            channels=args.channels,
            num_blocks=args.num_blocks,
            dim_feat=args.dim_feat,
            voxel_size=args.voxel_size or 0.02,
            batch_size=batch_size,
            engine=args.engine,
            conv_dtype=args.conv_dtype,
        )
        # With a noise_root the semantic head trains on a second backbone
        # pass over the synthetic noise clouds (reference
        # TreeLearn.py:98-105).
        family_fn = (
            families.treelearn_noise_family
            if args.noise_root
            else families.treelearn_family
        )
        fam = family_fn(
            model, args.loss_multiplier_semantic,
            args.loss_multiplier_offset, axis_name=axis_name,
        )
        init = families.init_treelearn
    elif args.model == "pointtransformerv3":
        model = PointTransformerWithHeads(
            dim_feat=args.dim_feat,
            use_feats=True,
            voxel_size=args.voxel_size or 0.02,
            dedup_divisor=args.dedup_divisor,
            stem_engine=args.engine if args.engine != "pencil" else "gather",
            compute_dtype=args.conv_dtype,
        )
        fam = families.ptv3_family(
            model, args.loss_multiplier_semantic,
            args.loss_multiplier_offset, axis_name=axis_name,
        )
        init = families.init_ptv3
    else:
        model = PointNet2(depth=args.depth, dim_feat=args.dim_feat)
        fam = families.pointnet2_family(
            model, args.loss_multiplier_semantic,
            args.loss_multiplier_offset, axis_name=axis_name,
        )
        init = families.init_pointnet2
    return model, fam, init


def main():
    args = parse_args()
    logging.basicConfig(level=logging.INFO)

    import jax
    import numpy as np

    from treemorph_tpu.data import batch_iterator, get_plot_split
    from treemorph_tpu.parallel import make_mesh
    from treemorph_tpu.train import (
        cosine_annealing_warm_restarts,
        create_train_state,
        make_eval_step,
        make_train_step,
        run_training,
    )
    from treemorph_tpu.train.checkpoints import save_model_checkpoint
    from treemorph_tpu.train.harness import make_optimizer
    from treemorph_tpu.utils import EarlyStopper

    if (
        args.data_root is None
        and args.raster_dir is None
        and args.hierarchical_json is None
    ):
        raise SystemExit(
            "one of --data_root / --raster_dir / --hierarchical_json "
            "is required"
        )

    if args.debug_nans:
        from treemorph_tpu.utils.debug import enable_nan_checks

        enable_nan_checks(True)

    name = args.name or args.model
    mesh = make_mesh(args.n_devices) if jax.device_count() > 1 else None

    for plot in args.test_plots:
        logging.info("=== CV fold: test plot %s ===", plot)
        hierarchical = args.hierarchical_json is not None
        if hierarchical:
            # streaming/hierarchical training: every tree's raster
            # minibatches are optimizer steps (reference minibatch-
            # streaming mode, train_PointNet2.py:127-146)
            from treemorph_tpu.data.rasterized import (
                HierarchicalRasterDataset,
                hierarchical_batch_iterator,
            )

            def make_ds(training):
                ds = HierarchicalRasterDataset(
                    args.hierarchical_json,
                    training=training,
                    noise_distance=args.noise_distance,
                    minibatch_size=args.minibatch_size,
                )
                keys = [
                    k
                    for k in ds.tree_keys
                    if (k.split("_")[0] == str(plot)) != training
                ]
                ds.tree_keys = keys
                return ds

            trainset, valset = make_ds(True), make_ds(False)
        elif args.raster_dir:
            # flattened raster training: every crop is its own sample,
            # split by plot prefix (reference train_PointNet2 raster mode)
            from treemorph_tpu.data.rasterized import RasterDataset

            paths = sorted(
                os.path.join(args.raster_dir, f)
                for f in os.listdir(args.raster_dir)
                if f.endswith(".npy")
            )
            test_paths = [
                p
                for p in paths
                if os.path.basename(p).split("_")[0] == str(plot)
            ]
            train_paths = [p for p in paths if p not in set(test_paths)]
            trainset = RasterDataset(
                train_paths, True, noise_distance=args.noise_distance
            )
            valset = RasterDataset(
                test_paths, False, noise_distance=args.noise_distance
            )
        else:
            trainset, valset = get_plot_split(
                args.data_root,
                plot,
                noise_distance=args.noise_distance,
                noise_root=args.noise_root,
            )
        if args.augment:
            from treemorph_tpu.data.augmentations import (
                default_augmentations,
            )

            trainset.augment = default_augmentations()
        rng_np = np.random.default_rng(args.seed)
        if hierarchical:
            from treemorph_tpu.data.rasterized import (
                hierarchical_batch_iterator,
                hierarchical_group_iterator,
            )

            try:
                example = next(
                    hierarchical_batch_iterator(trainset, args.bucket)
                )
            except StopIteration:
                raise SystemExit(
                    f"no training rasters for plot {plot}: the "
                    "hierarchical metadata contains no trees outside "
                    "the held-out plot (check --hierarchical_json vs "
                    "--test_plots)"
                ) from None

            if args.per_minibatch_steps:
                # round-1 behavior: each raster minibatch = one step
                def train_batches(epoch):
                    return hierarchical_batch_iterator(
                        trainset, args.bucket, rng=rng_np
                    )

            else:
                # reference semantics: accumulate grads over a tree-batch's
                # minibatches, ONE optimizer step per tree batch
                # (train_utils.py:46-62, PointNet2.py:296)
                def train_batches(epoch):
                    return hierarchical_group_iterator(
                        trainset,
                        args.bucket,
                        rng=rng_np,
                        trees_per_step=args.batch_size,
                    )

            def val_batches(epoch):
                return hierarchical_batch_iterator(valset, args.bucket)

        else:
            example = next(
                batch_iterator(
                    trainset, args.batch_size, args.bucket, shuffle=False
                )
            )

            def train_batches(epoch):
                return batch_iterator(
                    trainset, args.batch_size, args.bucket, rng=rng_np
                )

            def val_batches(epoch):
                return batch_iterator(
                    valset, args.batch_size, args.bucket, shuffle=False
                )
        model, (forward_fn, loss_fn), init_fn = build(
            args, example.batch_size,
            axis_name="data" if mesh is not None else None,
        )
        variables = init_fn(model, example, jax.random.key(args.seed))
        fixed = tuple(args.fixed_modules or ())
        tx = make_optimizer(args.weight_decay, fixed_modules=fixed)
        state = create_train_state(variables, tx)
        train_step = make_train_step(
            forward_fn, loss_fn, tx, fixed_modules=fixed, mesh=mesh
        )
        eval_step = make_eval_step(forward_fn, loss_fn, mesh=mesh)
        accum_steps = None
        if hierarchical and not args.per_minibatch_steps:
            from treemorph_tpu.train.harness import make_accum_steps

            accum_steps = make_accum_steps(
                forward_fn, loss_fn, tx, fixed_modules=fixed, mesh=mesh
            )

        ckpt_path = os.path.join(args.save_dir, f"{name}_CV", f"P{plot}")
        metadata = {
            "model": args.model,
            "plot": plot,
            # record the RESOLVED voxel size, not the unset CLI default —
            # model_loaders reconstructs the architecture from this
            "voxel_size": args.voxel_size or 0.02,
            "num_blocks": args.num_blocks,
            "channels": args.channels,
            "depth": args.depth,
            "dim_feat": args.dim_feat,
            "noise_distance": args.noise_distance,
        }
        stopper = EarlyStopper(
            patience=args.patience,
            verbose=args.verbose,
            save_fn=lambda s: save_model_checkpoint(ckpt_path, s, metadata),
        )
        state, history = run_training(
            state,
            train_step,
            eval_step,
            train_batches=train_batches,
            val_batches=val_batches,
            epochs=args.epochs,
            lr_schedule=cosine_annealing_warm_restarts(
                args.lr, t_0=args.t0, eta_min=args.eta_min
            ),
            early_stopper=stopper,
            mesh=mesh,
            rng=jax.random.key(args.seed),
            verbose=args.verbose,
            accum_steps=accum_steps,
        )
        logging.info(
            "fold P%s done: best val %.4f", plot, stopper.best_loss
        )


if __name__ == "__main__":
    main()
