"""End-to-end CLI smoke tests on tiny synthetic data (CPU)."""

import json
import os
import subprocess
import sys

import numpy as np
import pytest
import yaml

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

ENV = {
    **os.environ,
    "JAX_PLATFORMS": "cpu",
    "XLA_FLAGS": "--xla_force_host_platform_device_count=8",
}


def run(args, timeout=900):
    return subprocess.run(
        [sys.executable] + args,
        cwd=REPO,
        env=ENV,
        capture_output=True,
        text=True,
        timeout=timeout,
    )


@pytest.fixture(scope="module")
def data_root(tmp_path_factory):
    """Labeled clouds + splits via the preprocess CLI."""
    from treemorph_tpu.fixtures import synthetic_qsm, synthetic_tree_cloud

    root = tmp_path_factory.mktemp("cli")
    cloud_dir = root / "clouds"
    qsm_dir = root / "qsms"
    cloud_dir.mkdir()
    qsm_dir.mkdir()
    rng = np.random.default_rng(31)
    for plot, tree in [(3, 1), (3, 2), (4, 1), (4, 2)]:
        qsm = synthetic_qsm(n_branches=1, rng=rng)
        pts, _ = synthetic_tree_cloud(qsm=qsm, points_per_m2=40, rng=rng)
        np.save(cloud_dir / f"{plot}_{tree}.npy", pts)
        qsm.to_csv(qsm_dir / f"{plot}_{tree}_000000.csv", index=False)

    r = run(
        [
            "scripts/preprocess.py",
            "label",
            "--cloudDir",
            str(cloud_dir),
            "--cylinderDir",
            str(qsm_dir),
            "--labelDir",
            str(root / "labeled"),
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]

    # split expects labeled clouds under <data_root>/cloud
    (root / "labeled_root").mkdir()
    os.symlink(root / "labeled", root / "labeled_root" / "cloud")
    r = run(
        [
            "scripts/preprocess.py",
            "split",
            "--data_root",
            str(root / "labeled_root"),
            "--test_size",
            "0.25",
        ]
    )
    assert r.returncode == 0, r.stderr[-2000:]
    return root


class TestPreprocessCLI:
    def test_outputs_exist(self, data_root):
        labeled = os.listdir(data_root / "labeled")
        assert len(labeled) == 4
        assert (data_root / "labeled_root" / "trainset.json").exists()
        assert (data_root / "labeled_root" / "plot_3.json").exists()


class TestTrainCLI:
    def test_two_epoch_training_run(self, data_root):
        r = run(
            [
                "scripts/train.py",
                "treelearn",
                "--data_root",
                str(data_root / "labeled_root"),
                "--save_dir",
                str(data_root / "saves"),
                "--epochs",
                "2",
                "--batch_size",
                "2",
                "--bucket",
                "256",
                "--num_blocks",
                "2",
                "--channels",
                "8",
                "--test_plots",
                "3",
                "--patience",
                "5",
            ],
            timeout=1200,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        ckpt = data_root / "saves" / "treelearn_CV" / "P3"
        assert ckpt.exists()
        assert (
            data_root / "saves" / "treelearn_CV" / "P3.metadata.json"
        ).exists()


class TestPipelineCLI:
    def test_exec_pipeline_no_model(self, data_root, tmp_path):
        cfg = {
            "general": {
                "input_dir": str(data_root / "clouds"),
                "output_dir": str(tmp_path / "out"),
                "save_model_predictions": False,
                "save_upsampling": False,
                "save_qsm_cyl_ply": False,
                "save_qsm_sphere_ply": False,
                "save_qsm_cyl_csv": True,
                "cloud_save_type": "npy",
            },
            "stage1": {
                "predict_offset": False,
                "denoise": False,
                "model_type": "no_model",
            },
            "stage2": {
                "upsampling": True,
                "k_init": 5,
                "max_iterations": 2,
                "min_height": 0.0,
                "use_only_original_points": False,
                "min_points": 3000,
            },
            "stage3": {
                "qsm_fitting": True,
                "qsm_verbose": False,
                "qsm_debug": False,
                "qsm_params": {
                    "eps_deg": 20,
                    "min_samples": 5,
                    "seed": 0,
                },
            },
        }
        cfg_path = tmp_path / "cfg.yaml"
        with open(cfg_path, "w") as f:
            yaml.safe_dump(cfg, f)
        r = run(
            ["scripts/exec_pipeline.py", "--config", str(cfg_path)],
            timeout=1200,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        out_dir = tmp_path / "out" / "no_model"
        csvs = [
            f for f in os.listdir(out_dir) if f.endswith("_cylinders.csv")
        ]
        assert csvs, list(os.listdir(out_dir))


class TestHierarchicalTrainCLI:
    def test_streaming_raster_training(self, data_root, tmp_path):
        from treemorph_tpu.preprocess import rasterize_clouds

        labeled_dir = str(data_root / "labeled")
        clouds = sorted(
            os.path.join(labeled_dir, f)
            for f in os.listdir(labeled_dir)
            if f.endswith(".npy")
        )
        json_path = str(tmp_path / "meta.json")
        rasterize_clouds(
            clouds,
            json_path=json_path,
            raster_size=3.0,
            stride=3.0,
            store_metadata=True,
        )
        r = run(
            [
                "scripts/train.py",
                "pointnet2",
                "--hierarchical_json",
                json_path,
                "--save_dir",
                str(tmp_path / "saves"),
                "--epochs",
                "1",
                "--bucket",
                "128",
                "--minibatch_size",
                "4",
                "--depth",
                "2",
                "--test_plots",
                "3",
            ],
            timeout=1200,
        )
        assert r.returncode == 0, r.stderr[-3000:]
        assert (tmp_path / "saves" / "pointnet2_CV" / "P3").exists()
