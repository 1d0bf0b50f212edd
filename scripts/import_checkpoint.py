#!/usr/bin/env python
"""Convert a reference PyTorch checkpoint (.pt) into our orbax layout.

Usage:
    import_checkpoint.py pointnet2 model_P3.pt out_dir/model_P3 \
        [--depth 5] [--dim_feat 4]
    import_checkpoint.py treelearn model_P3.pt out_dir/model_P3 \
        [--channels 32] [--num_blocks 3] [--flip_kernel]

The output directory loads directly through
``treemorph_tpu.evaluation.model_loaders.load_model`` (name it with the
reference's ``_P{plot}`` convention). PTv3 checkpoints are not
convertible — see ``treemorph_tpu/train/import_torch.py``.
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("family", choices=["pointnet2", "treelearn"])
    ap.add_argument("torch_checkpoint")
    ap.add_argument("output_path")
    ap.add_argument("--depth", type=int, default=5)
    ap.add_argument("--dim_feat", type=int, default=4)
    ap.add_argument("--channels", type=int, default=32)
    ap.add_argument("--num_blocks", type=int, default=3)
    ap.add_argument("--voxel_size", type=float, default=0.02)
    ap.add_argument("--flip_kernel", action="store_true",
                    help="reverse spconv kernel-offset order (see "
                    "import_torch module docstring)")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np

    from treemorph_tpu.evaluation.model_loaders import build_model
    from treemorph_tpu.train.checkpoints import save_checkpoint
    from treemorph_tpu.train.import_torch import (
        convert_pointnet2,
        convert_treelearn,
        load_state_dict,
    )

    sd = load_state_dict(args.torch_checkpoint)

    if args.family == "pointnet2":
        model = build_model(
            "pointnet2", depth=args.depth, dim_feat=args.dim_feat
        )
        n = 256
        template = model.init(
            jax.random.key(0),
            jnp.zeros((1, n, 3)),
            jnp.zeros((1, n, args.dim_feat)),
            jnp.ones((1, n), bool),
            train=False,
        )
        variables = convert_pointnet2(sd, template)
        meta = {"model_type": "pointnet2", "depth": args.depth,
                "dim_feat": args.dim_feat}
    else:
        model = build_model(
            "treelearn",
            channels=args.channels,
            num_blocks=args.num_blocks,
            dim_feat=args.dim_feat,
            voxel_size=args.voxel_size,
        )
        n = 512
        rng = np.random.default_rng(0)
        template = model.init(
            jax.random.key(0),
            jnp.asarray(rng.normal(size=(n, 3)).astype(np.float32)),
            jnp.zeros((n, args.dim_feat)),
            jnp.zeros(n, jnp.int32),
            jnp.ones(n, bool),
            train=False,
        )
        variables = convert_treelearn(
            sd, template, flip_kernel=args.flip_kernel
        )
        meta = {
            "model_type": "treelearn", "channels": args.channels,
            "num_blocks": args.num_blocks, "dim_feat": args.dim_feat,
            "voxel_size": args.voxel_size,
        }

    meta["imported_from"] = os.path.abspath(args.torch_checkpoint)
    save_checkpoint(args.output_path, variables, metadata=meta)
    n_params = sum(
        int(np.prod(v.shape))
        for v in jax.tree_util.tree_leaves(variables["params"])
    )
    print(f"imported {n_params:,} params -> {args.output_path}")


if __name__ == "__main__":
    main()
