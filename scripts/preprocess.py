#!/usr/bin/env python
"""Preprocessing CLI: label generation, noise generation, rasterize, split.

Parity with the reference PreProcessing entry points
(``LabelGenerationCuda.py``, ``NoiseDataGeneration.py``,
``RasterizeClouds.py``, ``DataSplitting.py``, ``CreateQSMTestData.py``) as
subcommands of one CLI.
"""

import argparse
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="Preprocessing tools")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("label", help="project clouds onto QSMs -> labels")
    p.add_argument("--cloudDir", required=True)
    p.add_argument("--cylinderDir", required=True)
    p.add_argument("--labelDir", required=True)
    p.add_argument("--no_features", action="store_true")

    p = sub.add_parser("noise", help="generate synthetic noise clouds")
    p.add_argument("--cylinderDir", required=True)
    p.add_argument("--labelDir", required=True)
    p.add_argument("--density", type=float, default=50.0)

    p = sub.add_parser("rasterize", help="cut clouds into cubic rasters")
    p.add_argument("--dataDir", required=True)
    p.add_argument("--outputDir", default=None)
    p.add_argument("--jsonPath", default=None)
    p.add_argument("--raster_size", type=float, default=1.0)
    p.add_argument("--stride", type=float, default=None)
    p.add_argument("--store_metadata", action="store_true")

    p = sub.add_parser("split", help="train/test + per-plot CV manifests")
    p.add_argument("--data_root", required=True)
    p.add_argument("--test_size", type=float, default=0.15)
    p.add_argument("--raster_metadata", action="store_true")

    p = sub.add_parser("qsmset", help="sample QSM test sets per plot")
    p.add_argument("--dataDir", required=True)
    p.add_argument("--outputDir", required=True)
    p.add_argument("--n_per_plot", type=int, default=10)

    p = sub.add_parser(
        "select-subset",
        help="copy a random external-testset subset with matching QSMs "
        "(reference SelectTestData.py)",
    )
    p.add_argument("--cloudDir", required=True)
    p.add_argument("--qsmDir", required=True)
    p.add_argument("--outCloudDir", required=True)
    p.add_argument("--outQsmDir", required=True)
    p.add_argument("--n", type=int, default=40)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--cloud_suffix", default=".laz")

    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    from treemorph_tpu import preprocess

    if args.command == "label":
        written = preprocess.label_clouds(
            args.cloudDir,
            args.cylinderDir,
            args.labelDir,
            use_features=not args.no_features,
        )
        print(f"labeled {len(written)} clouds")
    elif args.command == "noise":
        written = preprocess.noise_generation(
            args.cylinderDir, args.labelDir, density=args.density
        )
        print(f"generated {len(written)} noise clouds")
    elif args.command == "rasterize":
        paths = sorted(
            os.path.join(args.dataDir, f)
            for f in os.listdir(args.dataDir)
            if f.endswith((".npy", ".las", ".laz", ".txt"))
        )
        meta = preprocess.rasterize_clouds(
            paths,
            output_dir=args.outputDir,
            json_path=args.jsonPath,
            raster_size=args.raster_size,
            stride=args.stride,
            store_metadata=args.store_metadata,
        )
        print(f"rasterized {len(paths)} clouds")
    elif args.command == "split":
        if args.raster_metadata:
            data_dir = os.path.join(args.data_root, "rasters_metadata.json")
        else:
            data_dir = os.path.join(args.data_root, "cloud")
        preprocess.split_dataset(
            data_dir,
            args.data_root,
            test_size=args.test_size,
            raster_metadata=args.raster_metadata,
        )
        print("split complete")
    elif args.command == "qsmset":
        sets = preprocess.create_qsm_test_sets(
            args.dataDir, args.outputDir, n_per_plot=args.n_per_plot
        )
        print(f"created {len(sets)} qsm sets")

    elif args.command == "select-subset":
        from treemorph_tpu.preprocess.splitting import select_test_subset

        copied = select_test_subset(
            args.cloudDir, args.qsmDir, args.outCloudDir,
            args.outQsmDir, n=args.n, seed=args.seed,
            cloud_suffix=args.cloud_suffix,
        )
        print(f"copied {len(copied)} cloud/QSM pairs")


if __name__ == "__main__":
    main()
