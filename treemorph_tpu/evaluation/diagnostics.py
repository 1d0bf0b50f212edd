"""Single-tree visual diagnostics.

Parity with reference ``Modules/Testing.py:testModel`` (:20-107, 355-573):
run a model on one labeled tree and produce (a) fixed-slice quiver plots of
ground-truth vs predicted offsets, (b) 1-NN-distance histograms before and
after applying the offsets. Golden-image review by eye, industrialized as
artifact files.
"""

from __future__ import annotations

import os

import numpy as np

from ..evaluation.model_loaders import Predictor
from ..evaluation.nn_eval import nearest_neighbour_distances
from ..pipeline.predict import predict_single
from ..plotting.figures import plot_offset_slices


def test_model(
    predictor: Predictor,
    labeled_cloud: np.ndarray,
    output_dir: str,
    name: str = "tree",
    slices=((0.0, 0.5), (2.0, 2.5), (4.0, 4.5), (6.0, 6.5), (7.5, 8.0)),
) -> dict:
    """Diagnose one labeled (N, 11) cloud; writes plots, returns metrics."""
    os.makedirs(output_dir, exist_ok=True)
    points = labeled_cloud[:, :3].astype(np.float32)
    gt_offsets = labeled_cloud[:, 3:6].astype(np.float32)

    refined = predict_single(
        labeled_cloud, predictor, None, predict_offset=True, denoise=False
    )
    pred_offsets = refined - points

    slice_path = os.path.join(output_dir, f"{name}_offset_slices.png")
    plot_offset_slices(points, gt_offsets, pred_offsets, slice_path,
                       slices=slices)

    nn_before = nearest_neighbour_distances(points)
    nn_after = nearest_neighbour_distances(refined)
    nn_gt = nearest_neighbour_distances(points + gt_offsets)

    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 5))
    bins = np.logspace(-4, 0, 60)
    for d, label in (
        (nn_before, "original"),
        (nn_after, "predicted offsets"),
        (nn_gt, "ground-truth offsets"),
    ):
        ax.hist(np.clip(d, 1e-4, 1.0), bins=bins, histtype="step",
                label=label)
    ax.set_xscale("log")
    ax.set_xlabel("1-NN distance (m)")
    ax.set_ylabel("points")
    ax.legend()
    fig.tight_layout()
    hist_path = os.path.join(output_dir, f"{name}_knn_hist.png")
    fig.savefig(hist_path, dpi=130)
    plt.close(fig)

    return {
        "slice_plot": slice_path,
        "hist_plot": hist_path,
        "nn_before_mean": float(nn_before.mean()),
        "nn_after_mean": float(nn_after.mean()),
        "nn_gt_mean": float(nn_gt.mean()),
        "offset_mae": float(
            np.abs(pred_offsets - gt_offsets).mean()
        ),
    }
