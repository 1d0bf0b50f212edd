"""NN-distance evaluation: does applying predicted offsets shrink the cloud?

Capability parity with reference ``Modules/Evaluation/NN_eval.py``: the
metric is each point's 1-nearest-neighbor distance before vs after applying
the predicted offsets (``nearestNeighbourDistances``, :229-246) — refined
clouds collapse onto cylinder surfaces, so the distribution shifts down.
Predictions run per CV plot on whole trees (:75-122) or through the
rasterized scatter-mean path (:124-225); plotting (:297-688) produces
binned means with a power-law fit.
"""

from __future__ import annotations

import logging
import os

import numpy as np
from scipy.spatial import cKDTree

from ..data.treeset import TreeDataset
from ..pipeline.predict import predict_rasterized, predict_single
from ..utils.fitting import fit_power_law, generate_log_bins

logger = logging.getLogger("treemorph_tpu.eval")


def nearest_neighbour_distances(points: np.ndarray) -> np.ndarray:
    """1-NN distance per point (reference NN_eval.py:229-246)."""
    tree = cKDTree(points)
    dists, _ = tree.query(points, k=2)
    return dists[:, 1]


def plot_of_path(path: str) -> str:
    base = os.path.basename(path)
    return base.split("_")[0]


def nn_eval(
    models: dict,
    dataset: TreeDataset,
    model_type: str = "treelearn",
    rasterized: bool = False,
    max_trees: int | None = None,
):
    """Evaluate NN-distance shrinkage over a dataset.

    ``models``: the per-plot predictor dict from
    :func:`treemorph_tpu.evaluation.model_loaders.load_model` — each tree is
    evaluated with its plot's offset model ("O_P{plot}"), mirroring the
    reference's CV-model routing (NN_eval.py:75-122).

    Returns a list of records: {path, nn_before, nn_after} with the raw
    distance arrays.
    """
    records = []
    for i in range(len(dataset)):
        if max_trees is not None and i >= max_trees:
            break
        sample = dataset[i]
        plot = plot_of_path(sample.path)
        offset_model = models.get(f"O_P{plot}") or next(
            (models[k] for k in sorted(models) if k.startswith("O")), None
        )
        if offset_model is None:
            logger.warning("no offset model for plot %s", plot)
            continue

        cloud = np.concatenate(
            [
                sample.points,
                sample.offsets,
                np.zeros((len(sample.points), 1), np.float32),
                sample.feats,
            ],
            axis=1,
        )
        if rasterized:
            refined = predict_rasterized(
                cloud, offset_model, None, True, False
            )
        else:
            refined = predict_single(cloud, offset_model, None, True, False)

        records.append(
            {
                "path": sample.path,
                "nn_before": nearest_neighbour_distances(sample.points),
                "nn_after": nearest_neighbour_distances(refined),
            }
        )
    return records


def summarize_nn_records(records) -> dict:
    """Aggregate statistics of an nn_eval run."""
    before = np.concatenate([r["nn_before"] for r in records])
    after = np.concatenate([r["nn_after"] for r in records])
    return {
        "n_points": int(len(before)),
        "mean_before": float(before.mean()),
        "mean_after": float(after.mean()),
        "median_before": float(np.median(before)),
        "median_after": float(np.median(after)),
        "shrinkage": float(1.0 - after.mean() / max(before.mean(), 1e-12)),
    }


def binned_mean_transform(
    nn_before: np.ndarray, nn_after: np.ndarray, n_bins: int = 50
):
    """Mean transformed distance per original-distance bin + power-law fit
    (the data behind the reference's diagnostic plot, NN_eval.py:297-688).

    Returns (bin_centers, bin_means, (a, b) power-law coefficients).
    """
    eps = 1e-8
    before = np.clip(nn_before, eps, None)
    bins = generate_log_bins(before.min(), before.max())
    if len(bins) < 3:
        bins = np.linspace(before.min(), before.max(), n_bins)
    idx = np.clip(np.digitize(before, bins) - 1, 0, len(bins) - 2)
    centers, means = [], []
    for b in range(len(bins) - 1):
        mask = idx == b
        if mask.sum() == 0:
            continue
        centers.append(np.sqrt(bins[b] * bins[b + 1]))
        means.append(nn_after[mask].mean())
    centers = np.asarray(centers)
    means = np.asarray(means)
    try:
        _, _, a, b, _, _ = fit_power_law(centers, means)
    except Exception:
        a, b = np.nan, np.nan
    return centers, means, (a, b)


def plot_nn_distances(records, output_path: str, title: str = "NN eval"):
    """Binned-mean diagnostic plot with power-law fit (matplotlib)."""
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    before = np.concatenate([r["nn_before"] for r in records])
    after = np.concatenate([r["nn_after"] for r in records])
    centers, means, (a, b) = binned_mean_transform(before, after)

    fig, ax = plt.subplots(figsize=(7, 5))
    ax.scatter(centers, means, s=18, label="binned mean after offsets")
    if np.isfinite(a):
        xs = np.logspace(
            np.log10(max(centers.min(), 1e-5)), np.log10(centers.max()), 100
        )
        ax.plot(xs, a * xs**b, "r--", label=f"fit a={a:.3g}, b={b:.3g}")
    ax.plot(centers, centers, "k:", alpha=0.5, label="identity")
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("1-NN distance before (m)")
    ax.set_ylabel("1-NN distance after (m)")
    ax.set_title(title)
    ax.legend()
    fig.tight_layout()
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    fig.savefig(output_path, dpi=130)
    plt.close(fig)
    return output_path
