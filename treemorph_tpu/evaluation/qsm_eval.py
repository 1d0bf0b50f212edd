"""QSM-projection evaluation: distance of clouds to fitted QSMs.

Capability parity with the reference eval scripts
``ModelTestingScripts/project_preds_on_qsm.py`` (project refined clouds
onto fitted QSM cylinders, :26-75) and
``ModelTestingScripts/Evaluate_preds_on_qsm.py`` (compare the
|offset-to-QSM| distance distributions of original vs refined clouds with
log-binned proportions and a power-law fit, :54-151). The projection runs
on TPU through :mod:`treemorph_tpu.ops.projection`.
"""

from __future__ import annotations

import os

import numpy as np

from ..ops.projection import cylinders_from_dataframe, closest_cylinder
from ..utils.fitting import fit_power_law, generate_log_bins


def project_on_qsm(cloud: np.ndarray, qsm_df) -> np.ndarray:
    """Distance of every point to the nearest QSM cylinder surface."""
    import jax.numpy as jnp

    cyl = cylinders_from_dataframe(qsm_df)
    pts = np.asarray(cloud, np.float32)[:, :3]
    _, dists, _ = closest_cylinder(jnp.asarray(pts), cyl)
    return np.asarray(dists)


def compare_distance_distributions(
    dists_orig: np.ndarray, dists_pred: np.ndarray
) -> dict:
    """Summary stats of original vs refined QSM distances
    (Evaluate_preds_on_qsm.py semantics)."""
    return {
        "mean_orig": float(np.mean(dists_orig)),
        "mean_pred": float(np.mean(dists_pred)),
        "median_orig": float(np.median(dists_orig)),
        "median_pred": float(np.median(dists_pred)),
        "q95_orig": float(np.quantile(dists_orig, 0.95)),
        "q95_pred": float(np.quantile(dists_pred, 0.95)),
        "improvement": float(
            1.0 - np.mean(dists_pred) / max(np.mean(dists_orig), 1e-12)
        ),
    }


def log_binned_proportions(dists: np.ndarray, eps: float = 1e-8):
    """Histogram proportions over 1-2-...-9 log-decade bins + power fit."""
    d = np.clip(dists, eps, None)
    bins = generate_log_bins(d.min(), d.max())
    counts, edges = np.histogram(d, bins=bins)
    proportions = counts / max(counts.sum(), 1)
    centers = np.sqrt(edges[:-1] * edges[1:])
    keep = proportions > 0
    try:
        _, _, a, b, _, _ = fit_power_law(centers[keep], proportions[keep])
    except Exception:
        a, b = np.nan, np.nan
    return centers, proportions, (a, b)


def plot_qsm_distance_comparison(
    dists_orig, dists_pred, output_path: str, title: str = "QSM distances"
):
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    fig, ax = plt.subplots(figsize=(7, 5))
    for dists, label, color in (
        (dists_orig, "original", "tab:gray"),
        (dists_pred, "refined", "tab:green"),
    ):
        centers, props, (a, b) = log_binned_proportions(dists)
        ax.plot(centers, props, "o-", color=color, ms=4, label=label)
    ax.set_xscale("log")
    ax.set_yscale("log")
    ax.set_xlabel("distance to QSM surface (m)")
    ax.set_ylabel("proportion of points")
    ax.set_title(title)
    ax.legend()
    fig.tight_layout()
    os.makedirs(os.path.dirname(output_path) or ".", exist_ok=True)
    fig.savefig(output_path, dpi=130)
    plt.close(fig)
    return output_path
