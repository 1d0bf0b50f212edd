"""End-to-end preprocessing tests: label gen, noise gen, rasterize, splits."""

import json
import os

import numpy as np
import pytest

from treemorph_tpu.fixtures import synthetic_qsm, synthetic_tree_cloud
from treemorph_tpu.preprocess import (
    create_qsm_test_sets,
    label_clouds,
    noise_generation,
    rasterize_clouds,
    split_dataset,
)
from treemorph_tpu.utils.io import LABELED_COLUMNS


@pytest.fixture(scope="module")
def prepared_dirs(tmp_path_factory):
    """A tiny synthetic 'plot': clouds + QSM csvs on disk."""
    root = tmp_path_factory.mktemp("prep")
    cloud_dir = root / "clouds"
    qsm_dir = root / "qsms"
    cloud_dir.mkdir()
    qsm_dir.mkdir()
    rng = np.random.default_rng(21)
    for plot, tree in [(3, 1), (3, 2), (4, 1), (4, 2)]:
        qsm = synthetic_qsm(n_branches=2, rng=rng)
        points, _ = synthetic_tree_cloud(
            qsm=qsm, points_per_m2=60, rng=rng
        )
        np.save(cloud_dir / f"{plot}_{tree}.npy", points)
        qsm.to_csv(qsm_dir / f"{plot}_{tree}_000000.csv", index=False)
    return root, str(cloud_dir), str(qsm_dir)


class TestLabelGeneration:
    def test_labels_match_format(self, prepared_dirs):
        root, cloud_dir, qsm_dir = prepared_dirs
        label_dir = os.path.join(str(root), "labeled")
        written = label_clouds(cloud_dir, qsm_dir, label_dir)
        assert len(written) == 4
        data = np.load(written[0])
        assert data.shape[1] == 11
        # offsets land points on the QSM surface: applying them should
        # reduce distance for near-surface points
        off_norm = np.linalg.norm(data[:, LABELED_COLUMNS["offset"]], axis=1)
        assert np.isfinite(off_norm).all()
        assert (data[:, LABELED_COLUMNS["cylinder_id"]] >= 0).all()
        # feature columns: normals are unit vectors; height in [0, 1]
        normals = data[:, 7:10]
        np.testing.assert_allclose(
            np.linalg.norm(normals, axis=1), 1.0, atol=1e-3
        )
        assert data[:, 10].min() >= 0 and data[:, 10].max() <= 1 + 1e-6


class TestNoiseGeneration:
    def test_noise_clouds_written(self, prepared_dirs, tmp_path):
        _, _, qsm_dir = prepared_dirs
        out = str(tmp_path / "noise")
        written = noise_generation(qsm_dir, out, density=30.0)
        assert len(written) == 4
        data = np.load(written[0])
        assert data.shape[1] == 11
        off = np.linalg.norm(data[:, 3:6], axis=1)
        # lognormal(-3, 0.85) radial noise: offsets spread around ~5 cm,
        # both classes present at the 0.05 threshold
        assert 0.2 < np.mean(off > 0.05) < 0.8


class TestRasterize:
    def test_metadata_layout(self, prepared_dirs, tmp_path):
        root, cloud_dir, qsm_dir = prepared_dirs
        paths = [
            os.path.join(cloud_dir, f)
            for f in sorted(os.listdir(cloud_dir))
        ]
        json_path = str(tmp_path / "meta.json")
        meta = rasterize_clouds(
            paths[:1],
            json_path=json_path,
            raster_size=2.0,
            stride=2.0,
            store_metadata=True,
        )
        assert os.path.exists(json_path)
        tree_id = list(meta)[0]
        assert meta[tree_id]["rasters"]
        bounds = meta[tree_id]["rasters"][0]["bounds"]
        assert len(bounds["min"]) == 3 and len(bounds["max"]) == 3

    def test_raster_files_carry_point_index(self, prepared_dirs, tmp_path):
        root, cloud_dir, _ = prepared_dirs
        paths = [
            os.path.join(cloud_dir, f)
            for f in sorted(os.listdir(cloud_dir))
        ][:1]
        out = str(tmp_path / "rasters")
        rasterize_clouds(paths, output_dir=out, raster_size=2.0, stride=1.0)
        sub = os.path.join(out, "rasterized_R2.0_S1.0")
        files = os.listdir(sub)
        assert files
        raster = np.load(os.path.join(sub, files[0]))
        cloud = np.load(paths[0])
        idx = raster[:, -1].astype(int)
        np.testing.assert_allclose(raster[:, :3], cloud[idx][:, :3])


class TestSplitting:
    def test_random_and_plot_split(self, prepared_dirs, tmp_path):
        root, cloud_dir, qsm_dir = prepared_dirs
        label_dir = os.path.join(str(root), "labeled_split")
        label_clouds(cloud_dir, qsm_dir, label_dir)
        eval_dir = str(tmp_path / "splits")
        out = split_dataset(label_dir, eval_dir, test_size=0.25)
        assert len(out["train"]) + len(out["test"]) == 4
        with open(os.path.join(eval_dir, "trainset.json")) as f:
            assert json.load(f) == out["train"]
        # per-plot manifests
        assert set(out["plots"]) == {"3", "4"}
        assert os.path.exists(os.path.join(eval_dir, "plot_3.json"))

    def test_qsm_test_sets(self, prepared_dirs, tmp_path):
        root, cloud_dir, _ = prepared_dirs
        out_dir = str(tmp_path / "qsmsets")
        sets = create_qsm_test_sets(cloud_dir, out_dir, n_per_plot=1)
        assert set(sets) == {"3", "4"}
        assert all(len(v) == 1 for v in sets.values())


class TestDatasetIntegration:
    def test_treedataset_reads_labeled_output(self, prepared_dirs, tmp_path):
        from treemorph_tpu.data import TreeDataset, batch_iterator

        root, cloud_dir, qsm_dir = prepared_dirs
        label_dir = os.path.join(str(root), "labeled_ds")
        label_clouds(cloud_dir, qsm_dir, label_dir)
        eval_dir = str(tmp_path / "ds_splits")
        split_dataset(label_dir, eval_dir, test_size=0.25)

        ds = TreeDataset(
            os.path.join(eval_dir, "trainset.json"), training=True
        )
        assert len(ds) == 3
        sample = ds[0]
        assert sample.points.shape[1] == 3
        assert sample.feats.shape[1] == 4
        batches = list(batch_iterator(ds, batch_size=2, bucket=256))
        assert batches
        b = batches[0]
        assert b.coords.shape[0] == 2
        assert b.coords.shape[1] % 256 == 0
        assert b.mask_valid.any()


class TestSelectTestSubset:
    def test_copies_matching_pairs(self, tmp_path, rng):
        from treemorph_tpu.preprocess.splitting import select_test_subset

        cloud_dir = tmp_path / "clouds"
        qsm_dir = tmp_path / "qsms"
        cloud_dir.mkdir()
        qsm_dir.mkdir()
        for i in range(6):
            (cloud_dir / f"P{i}_tree_{i}_scan.laz").write_bytes(b"x")
            if i != 4:  # one cloud without a QSM
                (qsm_dir / f"P{i}_tree_{i}_qsm.csv").write_bytes(b"y")
        out_c = tmp_path / "sub_clouds"
        out_q = tmp_path / "sub_qsms"
        copied = select_test_subset(
            str(cloud_dir), str(qsm_dir), str(out_c), str(out_q), n=6,
            seed=3,
        )
        assert len(copied) == 5  # the unmatched cloud is skipped
        import os

        for cloud, qsm in copied:
            assert os.path.exists(out_c / cloud)
            assert os.path.exists(out_q / qsm)
            assert qsm.startswith("_".join(cloud.split("_")[:3]))
