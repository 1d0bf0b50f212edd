#!/usr/bin/env python
"""Evaluation CLI: NN-distance eval, QSM-projection eval, predictions.

Parity with the reference ModelTestingScripts
(``test_{model}.py`` -> nn_eval; ``predict_qsm_trees_{model}.py`` /
``predict_all_trees_{model}.py`` -> batch prediction export;
``project_preds_on_qsm.py`` + ``Evaluate_preds_on_qsm.py`` -> QSM
projection comparison) as subcommands of one CLI.
"""

import argparse
import json
import logging
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    parser = argparse.ArgumentParser(description="Evaluation tools")
    sub = parser.add_subparsers(dest="command", required=True)

    p = sub.add_parser("nn", help="NN-distance shrinkage eval")
    p.add_argument("model", choices=["treelearn", "pointnet2",
                                     "pointtransformerv3"])
    p.add_argument("--data_root", required=True)
    p.add_argument("--test_plot", type=int, default=3)
    p.add_argument("--offset_model_dir", required=True)
    p.add_argument("--rasterized", action="store_true")
    p.add_argument("--max_trees", type=int, default=None)
    p.add_argument("--plot_path", default=None)

    p = sub.add_parser("predict", help="export refined clouds for a manifest")
    p.add_argument("model", choices=["treelearn", "pointnet2",
                                     "pointtransformerv3"])
    p.add_argument("--manifest", required=True,
                   help="JSON list of cloud paths (e.g. qsm_set_3.json)")
    p.add_argument("--offset_model_dir", required=True)
    p.add_argument("--noise_model_dir", default=None)
    p.add_argument("--outputDir", required=True)
    p.add_argument("--save_type", default="txt")

    p = sub.add_parser("qsm-distance", help="cloud vs fitted-QSM distances")
    p.add_argument("--cloud", required=True)
    p.add_argument("--pred_cloud", required=True)
    p.add_argument("--qsm_csv", required=True)
    p.add_argument("--plot_path", default=None)

    args = parser.parse_args()
    logging.basicConfig(level=logging.INFO)

    import numpy as np

    from treemorph_tpu.data import TreeDataset, get_plot_split
    from treemorph_tpu.evaluation.model_loaders import load_model
    from treemorph_tpu.evaluation.nn_eval import (
        nn_eval,
        plot_nn_distances,
        summarize_nn_records,
    )

    if args.command == "nn":
        _, testset = get_plot_split(args.data_root, args.test_plot)
        models = load_model(
            args.model, offset_model_dir=args.offset_model_dir
        )
        records = nn_eval(
            models,
            testset,
            model_type=args.model,
            rasterized=args.rasterized or args.model == "pointnet2",
            max_trees=args.max_trees,
        )
        summary = summarize_nn_records(records)
        print(json.dumps(summary, indent=2))
        if args.plot_path:
            plot_nn_distances(records, args.plot_path)
            print(f"plot written to {args.plot_path}")

    elif args.command == "predict":
        from treemorph_tpu.pipeline.predict import make_predictions
        from treemorph_tpu.utils.io import load_cloud, save_cloud

        models = load_model(
            args.model,
            offset_model_dir=args.offset_model_dir,
            noise_model_dir=args.noise_model_dir,
        )
        offset_model = next(
            (models[k] for k in sorted(models) if k.startswith("O")), None
        )
        noise_model = next(
            (models[k] for k in sorted(models) if k.startswith("N")), None
        )
        with open(args.manifest) as f:
            paths = json.load(f)
        os.makedirs(args.outputDir, exist_ok=True)
        for path in paths:
            cloud = load_cloud(path, all_columns=True)
            if cloud is None:
                continue
            base = os.path.splitext(os.path.basename(path))[0]
            pred = make_predictions(
                cloud, args.model, offset_model, None,
                predict_offset=True, denoise=False,
            )
            save_cloud(
                pred,
                os.path.join(args.outputDir, base + "_pred"),
                args.save_type,
            )
            if noise_model is not None:
                denoised = make_predictions(
                    cloud, args.model, offset_model, noise_model,
                    predict_offset=True, denoise=True,
                )
                save_cloud(
                    denoised,
                    os.path.join(args.outputDir, base + "_pred_denoised"),
                    args.save_type,
                )
        print(f"predicted {len(paths)} clouds -> {args.outputDir}")

    elif args.command == "qsm-distance":
        import pandas as pd

        from treemorph_tpu.evaluation.qsm_eval import (
            compare_distance_distributions,
            plot_qsm_distance_comparison,
            project_on_qsm,
        )
        from treemorph_tpu.utils.io import load_cloud

        orig = load_cloud(args.cloud)
        pred = load_cloud(args.pred_cloud)
        qsm = pd.read_csv(args.qsm_csv)
        qsm.columns = qsm.columns.str.strip()
        d_orig = project_on_qsm(orig, qsm)
        d_pred = project_on_qsm(pred, qsm)
        print(json.dumps(
            compare_distance_distributions(d_orig, d_pred), indent=2
        ))
        if args.plot_path:
            plot_qsm_distance_comparison(d_orig, d_pred, args.plot_path)
            print(f"plot written to {args.plot_path}")


if __name__ == "__main__":
    main()
