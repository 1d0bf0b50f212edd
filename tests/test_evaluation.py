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


class TestQsmComparisonPlots:
    """The C24 long tail: qsm_comp_new* figures, slice plots, and the
    piecewise-scaled NND plot (reference Plotting/qsm_comp_new.py,
    qsm_comp_new_testset_proportion.py, slice_plotting.py,
    NN_eval.py:297-688)."""

    def _projected_dirs(self, tmp_path, rng):
        import os

        orig = tmp_path / "orig"
        model = tmp_path / "model"
        orig.mkdir()
        model.mkdir()
        for tree in ("42_1", "42_2"):
            n = int(rng.integers(200, 400))
            pts = rng.normal(size=(n, 3)).astype(np.float32)
            off_o = rng.normal(scale=0.05, size=(n, 3)).astype(np.float32)
            off_m = off_o * 0.4  # "model" improves distances
            for d, off in ((orig, off_o), (model, off_m)):
                data = np.concatenate(
                    [pts, off, np.zeros((n, 1), np.float32)], axis=1
                )
                np.save(
                    os.path.join(d, f"{tree}_projected.npy"), data
                )
        return str(orig), str(model)

    def test_custom_scale_piecewise(self):
        from treemorph_tpu.plotting.qsm_comparison import (
            custom_label, custom_scale,
        )

        got = custom_scale([0.0, 0.05, 0.1, 0.55, 1.0, 1.05, 2.0, np.inf])
        np.testing.assert_allclose(
            got, [0.0, 5.0, 10.0, 15.0, 20.0, 20.5, 21.0, 21.0]
        )
        assert custom_label(0.0) == "0"
        assert custom_label(0.05) == "5"
        assert custom_label(1.0) == "100"
        assert custom_label(np.inf) == r"$\infty$"

    def test_pairwise_loading_and_comparison_plot(self, tmp_path, rng):
        import os

        from treemorph_tpu.plotting.qsm_comparison import (
            load_pointwise_distance_pairs, mean_distance_and_error,
            plot_qsm_comparison,
        )

        orig, model = self._projected_dirs(tmp_path, rng)
        d_o, d_m = load_pointwise_distance_pairs(orig, model)
        assert len(d_o) == len(d_m) > 0
        assert d_m.mean() < d_o.mean()  # improvement visible

        mean, err, std = mean_distance_and_error(d_m)
        assert 0 < err < std
        imp, imp_err, _ = mean_distance_and_error(d_o - d_m)
        out = plot_qsm_comparison(
            d_o, d_m, [mean], [err], [imp], [imp_err], ["Sp. U-Net"],
            str(tmp_path / "comp.png"),
        )
        assert os.path.getsize(out) > 0

    def test_per_tree_plot(self, tmp_path, rng):
        import os

        from treemorph_tpu.plotting.qsm_comparison import (
            per_tree_mean_distances, plot_per_tree_mean_distances,
        )

        orig, model = self._projected_dirs(tmp_path, rng)
        m_o, m_n, ids = per_tree_mean_distances(orig, model)
        assert ids == ["42_1", "42_2"]
        # one value beyond the 15 cm cap exercises the annotation path
        m_o[0] = 0.30
        out = plot_per_tree_mean_distances(
            m_o, m_n, str(tmp_path / "pertree.png")
        )
        assert os.path.getsize(out) > 0

    def test_transformation_slices(self, tmp_path, rng):
        import os

        from treemorph_tpu.plotting.qsm_comparison import (
            plot_transformation_slices,
        )

        pts = rng.uniform(-1, 1, size=(500, 3)).astype(np.float32)
        offs = rng.normal(scale=0.02, size=(500, 3)).astype(np.float32)
        bounds = ((-1, 1, -1, 1, -1, 0), (-1, 1, -1, 1, 0, 1))
        out = plot_transformation_slices(
            pts, offs, str(tmp_path / "slices.png"),
            bounds=bounds, views=("z", "y"),
        )
        assert os.path.getsize(out) > 0

    def test_scaled_nn_plot_and_subplots(self, tmp_path, rng):
        import os

        from treemorph_tpu.evaluation.nn_eval import (
            plot_nn_distances_scaled, plot_nn_distances_subplots,
        )

        n = 3000
        orig = rng.uniform(0.001, 1.5, n)
        pred = orig * rng.uniform(0.3, 0.6, n)
        plots = list(rng.choice(["3", "4", "6", "8"], n))
        out = plot_nn_distances_scaled(
            orig, pred, str(tmp_path / "nnd.png"),
            tree_plots=plots, color_by_plot=True, show_scatter=True,
            show_fit=True,
        )
        assert os.path.getsize(out) > 0
        out2 = plot_nn_distances_subplots(
            orig, pred, plots, str(tmp_path / "nnd_grid.png")
        )
        assert os.path.getsize(out2) > 0


class TestComputeDensity:
    def test_matches_kdtree_radius_count(self, rng):
        import jax.numpy as jnp
        from scipy.spatial import cKDTree

        from treemorph_tpu.ops import compute_density

        pts = rng.normal(size=(300, 3)).astype(np.float32)
        valid = np.ones(300, bool)
        got = np.asarray(
            compute_density(jnp.asarray(pts), jnp.asarray(valid), 0.35)
        )
        tree = cKDTree(pts)
        want = np.array(
            [len(tree.query_ball_point(p, 0.35)) for p in pts]
        )
        np.testing.assert_array_equal(got, want)


class TestQsmVisualComparison:
    def test_cylinder_overlay_slices(self, tmp_path, rng):
        import os

        import pandas as pd

        from treemorph_tpu.plotting.qsm_comparison import (
            plot_qsm_comparison_slices,
        )

        pts = rng.uniform(-1, 1, size=(800, 3)).astype(np.float32)
        df = pd.DataFrame(
            {
                "startX": [0.0, 0.2], "startY": [0.0, -0.3],
                "startZ": [-0.9, 0.1],
                "endX": [0.0, 0.4], "endY": [0.0, -0.1],
                "endZ": [0.0, 0.6], "radius": [0.15, 0.05],
                "ID": [1, 2],
            }
        )
        out = plot_qsm_comparison_slices(
            pts, df, df, str(tmp_path / "visual.png"),
            bounds=((-1, 1, -1, 1, -1, 0), (-1, 1, -1, 1, 0, 1)),
            views=("z", "y"),
        )
        assert os.path.getsize(out) > 0


class TestTrainCheckpointRoundtrip:
    def test_load_model_accepts_train_cli_naming_and_null_metadata(
        self, tmp_path, rng
    ):
        """train.py saves '{save_dir}/{family}_CV/P{plot}' with a metadata
        manifest; load_model must find the bare 'P{n}' directory and must
        not let null metadata values override family defaults (both were
        broken: discovered by the first real-hardware train->eval run)."""
        import jax
        import jax.numpy as jnp

        from treemorph_tpu.evaluation.model_loaders import (
            build_model, load_model,
        )
        from treemorph_tpu.train.checkpoints import save_checkpoint

        model = build_model(
            "treelearn", channels=8, num_blocks=2, voxel_size=0.02
        )
        n = 256
        pts = jnp.asarray(
            rng.normal(size=(n, 3)).astype(np.float32) * 2
        )
        variables = model.init(
            jax.random.key(0), pts,
            jnp.zeros((n, 4)), jnp.zeros(n, jnp.int32),
            jnp.ones(n, bool), train=False,
        )
        ckpt_dir = tmp_path / "treelearn_CV"
        save_checkpoint(
            str(ckpt_dir / "P3"), variables,
            metadata={
                "model": "treelearn", "plot": 3,
                "voxel_size": None,  # the train CLI default
                "num_blocks": 2, "channels": 8, "depth": None,
                "dim_feat": 4,
            },
        )
        models = load_model("treelearn", offset_model_dir=str(ckpt_dir))
        assert sorted(models) == ["O_P3"]
        pred = models["O_P3"]
        # null voxel_size must not have overridden the 0.02 default
        assert pred.model.voxel_size == 0.02
        out = pred.predict_flat(
            pts, jnp.zeros((n, 4)), jnp.zeros(n, jnp.int32),
            jnp.ones(n, bool),
        )
        assert np.isfinite(
            np.asarray(out["offset_predictions"])
        ).all()

    @pytest.mark.slow
    def test_load_model_ptv3_template_respects_patch(self, tmp_path, rng):
        """PTv3 checkpoints failed to load: the loader's 256-point init
        template violated the 1024-point attention patch (found by the
        first PTv3 pipeline run on hardware)."""
        import jax
        import jax.numpy as jnp

        from treemorph_tpu.evaluation.model_loaders import (
            build_model, load_model,
        )
        from treemorph_tpu.train.checkpoints import save_checkpoint

        model = build_model("pointtransformerv3")
        n = 1024
        pts = jnp.asarray(
            rng.normal(size=(n, 3)).astype(np.float32) * 2
        )
        variables = model.init(
            jax.random.key(0), pts, jnp.zeros((n, 4)),
            jnp.zeros(n, jnp.int32), jnp.ones(n, bool), train=False,
        )
        ckpt_dir = tmp_path / "ptv3_CV"
        save_checkpoint(
            str(ckpt_dir / "P3"), variables,
            metadata={"model": "pointtransformerv3", "plot": 3},
        )
        models = load_model(
            "pointtransformerv3", offset_model_dir=str(ckpt_dir)
        )
        assert sorted(models) == ["O_P3"]


class TestTrainsetPairing:
    def test_prefix_pairing_with_different_suffixes(self, tmp_path, rng):
        """The reference's old-dataset mode pairs '{id}_labeled.npy'
        originals with '{id}_..._projected.npy' model outputs by the
        first two name tokens (qsm_comp_new.py:91-152)."""
        import os

        from treemorph_tpu.plotting.qsm_comparison import (
            load_pointwise_distance_pairs,
        )

        orig = tmp_path / "orig"
        model = tmp_path / "model"
        orig.mkdir()
        model.mkdir()
        n = 200
        pts = rng.normal(size=(n, 3)).astype(np.float32)
        off = rng.normal(scale=0.05, size=(n, 3)).astype(np.float32)
        data_o = np.concatenate([pts, off, np.zeros((n, 1), np.float32)], 1)
        data_m = np.concatenate(
            [pts, off * 0.5, np.zeros((n, 1), np.float32)], 1
        )
        np.save(orig / "42_3_labeled.npy", data_o)
        np.save(
            model / "42_3_labeled_pred_denoised_projected.npy", data_m
        )
        # an unmatched model file (no corresponding original) is skipped
        np.save(
            model / "42_9_labeled_pred_denoised_projected.npy", data_m
        )
        d_o, d_m = load_pointwise_distance_pairs(
            str(orig), str(model),
            suffix="_labeled_pred_denoised_projected.npy",
            orig_suffix="_labeled.npy",
        )
        assert len(d_o) == len(d_m) == n
        assert d_m.mean() < d_o.mean()
