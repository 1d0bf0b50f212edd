"""Tests for the evaluation suite + plotting figure generation."""

import os

import numpy as np
import pytest

from treemorph_tpu.evaluation.nn_eval import (
    binned_mean_transform,
    nearest_neighbour_distances,
    summarize_nn_records,
)
from treemorph_tpu.evaluation.qsm_eval import (
    compare_distance_distributions,
    log_binned_proportions,
    project_on_qsm,
)
from treemorph_tpu.fixtures import synthetic_qsm, synthetic_tree_cloud


class TestNNEval:
    def test_nn_distances_match_bruteforce(self, rng):
        pts = rng.uniform(0, 1, size=(200, 3)).astype(np.float32)
        d = nearest_neighbour_distances(pts)
        full = np.linalg.norm(pts[:, None] - pts[None], axis=-1)
        np.fill_diagonal(full, np.inf)
        np.testing.assert_allclose(d, full.min(axis=1), atol=1e-6)

    def test_summary_shrinkage(self, rng):
        before = rng.uniform(0.01, 0.1, 1000)
        after = before * 0.5
        records = [{"nn_before": before, "nn_after": after}]
        s = summarize_nn_records(records)
        assert s["shrinkage"] == pytest.approx(0.5, abs=1e-6)

    def test_binned_transform_powerlaw(self, rng):
        before = rng.uniform(0.001, 0.5, 5000)
        after = 0.3 * before**0.8 * rng.uniform(0.95, 1.05, 5000)
        centers, means, (a, b) = binned_mean_transform(before, after)
        assert len(centers) > 3
        assert a == pytest.approx(0.3, rel=0.25)
        assert b == pytest.approx(0.8, rel=0.15)


class TestQSMEval:
    def test_project_on_qsm_surface_points(self, rng):
        qsm = synthetic_qsm(rng=rng)
        points, _ = synthetic_tree_cloud(
            qsm=qsm, points_per_m2=100, noise_scale=0.002,
            outlier_fraction=0.0, rng=rng,
        )
        dists = project_on_qsm(points, qsm)
        assert np.median(dists) < 0.01

    def test_compare_distributions(self, rng):
        orig = rng.uniform(0.01, 0.2, 1000)
        pred = orig * 0.2
        stats = compare_distance_distributions(orig, pred)
        assert stats["improvement"] == pytest.approx(0.8, abs=1e-6)
        assert stats["mean_pred"] < stats["mean_orig"]

    def test_log_binned_proportions_sum_to_one(self, rng):
        d = rng.lognormal(-3, 1, 2000)
        centers, props, _ = log_binned_proportions(d)
        assert props.sum() == pytest.approx(1.0, abs=1e-6)


class TestPlotting:
    def test_figures_render(self, tmp_path, rng):
        from treemorph_tpu.plotting import (
            plot_distance_heatmap,
            plot_epoch_time_comparison,
            plot_offset_slices,
            plot_upsampling_visual,
            qsm_csv_to_ply,
        )

        out = str(tmp_path)
        p1 = plot_epoch_time_comparison(
            {"treelearn": [12.8, 13.0], "ptv3": [39.0, 39.1]},
            os.path.join(out, "epochs.png"),
        )
        pts = rng.uniform(0, 5, size=(500, 3)).astype(np.float32)
        d = rng.lognormal(-3, 1, 500)
        p2 = plot_distance_heatmap(pts, d, os.path.join(out, "heat.png"))
        offs = rng.normal(0, 0.02, size=(500, 3)).astype(np.float32)
        p3 = plot_offset_slices(
            pts, offs, offs * 0.9, os.path.join(out, "slices.png"),
            slices=((0, 1), (2, 3)),
        )
        p4 = plot_upsampling_visual(
            pts, np.vstack([pts, pts + 0.01]), os.path.join(out, "ups.png")
        )
        for p in (p1, p2, p3, p4):
            assert os.path.getsize(p) > 1000

        qsm = synthetic_qsm(rng=rng)
        csv_path = os.path.join(out, "qsm.csv")
        qsm.to_csv(csv_path, index=False)
        ply = qsm_csv_to_ply(csv_path, os.path.join(out, "qsm.ply"))
        assert open(ply).readline().startswith("ply")


class TestNNEvalEndToEnd:
    def test_nn_eval_with_trained_model(self, tmp_path, rng):
        """Mini integration: label synthetic trees, run nn_eval with a
        fresh (untrained) model — exercises the CV-routing plumbing."""
        import jax

        from treemorph_tpu.data.treeset import TreeDataset
        from treemorph_tpu.evaluation.model_loaders import (
            Predictor,
            build_model,
            _init_variables,
        )
        from treemorph_tpu.evaluation.nn_eval import nn_eval
        from treemorph_tpu.ops.projection import generate_offset_cloud

        qsm = synthetic_qsm(n_branches=2, rng=rng)
        pts, _ = synthetic_tree_cloud(qsm=qsm, points_per_m2=40, rng=rng)
        labeled = generate_offset_cloud(pts, qsm)
        labeled = np.concatenate(
            [labeled, np.ones((len(labeled), 4), np.float32)], axis=1
        )
        path = str(tmp_path / "3_1_labeled.npy")
        np.save(path, labeled)

        ds = TreeDataset([path], training=False, process_json=False)
        model = build_model("treelearn", num_blocks=2)
        variables = _init_variables("treelearn", model)
        predictor = Predictor("treelearn", model, variables)
        records = nn_eval({"O_P3": predictor}, ds)
        assert len(records) == 1
        assert len(records[0]["nn_before"]) == len(labeled)
