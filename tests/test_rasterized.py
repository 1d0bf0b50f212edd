import json
import os

import numpy as np
import pytest

from treemorph_tpu.data.rasterized import (
    HierarchicalRasterDataset,
    RasterDataset,
    raster_dataset_from_dir,
)
from treemorph_tpu.fixtures import synthetic_qsm, synthetic_tree_cloud
from treemorph_tpu.ops.projection import generate_offset_cloud
from treemorph_tpu.preprocess import rasterize_clouds


@pytest.fixture(scope="module")
def raster_setup(tmp_path_factory):
    root = tmp_path_factory.mktemp("rasters")
    rng = np.random.default_rng(17)
    qsm = synthetic_qsm(n_branches=2, rng=rng)
    pts, _ = synthetic_tree_cloud(qsm=qsm, points_per_m2=80, rng=rng)
    labeled = generate_offset_cloud(pts, qsm)
    labeled = np.concatenate(
        [labeled, np.ones((len(labeled), 4), np.float32)], axis=1
    )
    cloud_path = str(root / "5_1_labeled.npy")
    np.save(cloud_path, labeled)

    json_path = str(root / "meta.json")
    rasterize_clouds(
        [cloud_path],
        output_dir=str(root),
        json_path=json_path,
        raster_size=2.0,
        stride=2.0,
        store_metadata=True,
    )
    return root, cloud_path, json_path, labeled


class TestRasterDataset:
    def test_flattened_samples(self, raster_setup):
        root, _, _, labeled = raster_setup
        raster_dir = os.path.join(str(root), "rasterized_R2.0_S2.0")
        ds = raster_dataset_from_dir(raster_dir, training=False)
        assert len(ds) > 1
        total = sum(len(ds[i].points) for i in range(len(ds)))
        assert total == len(labeled)  # stride == size -> partition
        s = ds[0]
        assert s.feats.shape[1] == 4
        assert s.offset_mask.dtype == bool


class TestHierarchicalDataset:
    def test_tree_expansion(self, raster_setup):
        _, _, json_path, labeled = raster_setup
        ds = HierarchicalRasterDataset([json_path], minibatch_size=3)
        assert len(ds) == 1
        tree = ds[0]
        assert tree.cloud_length == len(labeled)
        covered = np.concatenate(tree.raster_point_ids)
        assert sorted(covered) == list(range(len(labeled)))

    def test_minibatches_padded(self, raster_setup):
        _, _, json_path, _ = raster_setup
        ds = HierarchicalRasterDataset([json_path], minibatch_size=2)
        tree = ds[0]
        batches = list(ds.minibatches(tree, bucket=128))
        assert batches
        for batch, point_ids in batches:
            assert batch.coords.shape[0] <= 2
            assert batch.coords.shape[1] % 128 == 0
            for i, ids in enumerate(point_ids):
                n = len(ids)
                assert batch.mask_valid[i, :n].all()
                assert not batch.mask_valid[i, n:].any()
                np.testing.assert_allclose(
                    batch.coords[i, :n], tree.points[ids]
                )

    def test_single_sample_mode(self, raster_setup):
        _, _, json_path, _ = raster_setup
        ds = HierarchicalRasterDataset([json_path], single_sample=True)
        assert len(ds) == 1


class TestGraftEntry:
    def test_entry_compiles(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import jax

        import __graft_entry__ as g

        fn, args = g.entry()
        out = jax.jit(fn)(*args)
        assert out[0].shape[-1] == 3
        assert out[1].shape[-1] == 2

    def test_dryrun_multichip(self):
        import sys

        sys.path.insert(0, "/root/repo")
        import __graft_entry__ as g

        g.dryrun_multichip(8)
