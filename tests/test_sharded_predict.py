"""Sharded plot-scale inference == single-device raster streaming.

The shard_map + psum_scatter path (predict_rasterized_sharded) must
produce per-point predictions equal to the host-accumulated single-device
path (predict_rasterized), which itself mirrors the reference's streaming
scatter-mean (PointNet2.py:329-394)."""

import jax
import numpy as np
import pytest

from treemorph_tpu.evaluation.model_loaders import (
    Predictor,
    _init_variables,
    build_model,
)
from treemorph_tpu.fixtures import synthetic_qsm, synthetic_tree_cloud
from treemorph_tpu.parallel import make_mesh
from treemorph_tpu.pipeline.predict import (
    predict_rasterized,
    predict_rasterized_sharded,
)


@pytest.fixture(scope="module")
def cloud():
    rng = np.random.default_rng(7)
    qsm = synthetic_qsm(n_branches=2, rng=rng)
    pts, _ = synthetic_tree_cloud(qsm=qsm, points_per_m2=160, rng=rng)
    return pts.astype(np.float32)


@pytest.fixture(scope="module")
def predictor():
    model = build_model("pointnet2", depth=2)
    variables = _init_variables("pointnet2", model)
    return Predictor("pointnet2", model, variables)


class TestShardedPredict:
    def test_offsets_match_single_device(self, cloud, predictor):
        mesh = make_mesh(8)
        kw = dict(
            offset_model=predictor,
            predict_offset=True,
            denoise=False,
            raster_size=2.0,
            stride=2.0,
            minibatch_size=4,
            bucket=128,
        )
        single = predict_rasterized(cloud, **kw)
        sharded = predict_rasterized_sharded(cloud, mesh=mesh, **kw)
        assert sharded.shape == single.shape
        np.testing.assert_allclose(sharded, single, atol=2e-4, rtol=1e-4)

    def test_denoise_matches_single_device(self, cloud, predictor):
        mesh = make_mesh(8)
        kw = dict(
            noise_model=predictor,
            predict_offset=False,
            denoise=True,
            raster_size=2.0,
            stride=2.0,
            minibatch_size=4,
            bucket=128,
        )
        single = predict_rasterized(cloud, **kw)
        sharded = predict_rasterized_sharded(cloud, mesh=mesh, **kw)
        np.testing.assert_allclose(sharded, single, atol=2e-4, rtol=1e-4)

    def test_fewer_rasters_than_devices(self, predictor):
        # a tiny cloud producing < 8 rasters must still work on the mesh
        rng = np.random.default_rng(3)
        pts = rng.normal(scale=0.3, size=(200, 3)).astype(np.float32)
        cloud = np.concatenate(
            [pts, np.zeros((200, 8), np.float32)], axis=1
        )
        mesh = make_mesh(8)
        kw = dict(
            offset_model=predictor,
            predict_offset=True,
            denoise=False,
            raster_size=5.0,
            stride=5.0,
            minibatch_size=4,
            bucket=128,
        )
        single = predict_rasterized(cloud, **kw)
        sharded = predict_rasterized_sharded(cloud, mesh=mesh, **kw)
        np.testing.assert_allclose(sharded, single, atol=2e-4, rtol=1e-4)

    def test_mesh_none_falls_back(self, cloud, predictor):
        kw = dict(
            offset_model=predictor,
            predict_offset=True,
            denoise=False,
            raster_size=2.0,
            stride=2.0,
            minibatch_size=4,
            bucket=128,
        )
        a = predict_rasterized(cloud, **kw)
        b = predict_rasterized_sharded(cloud, mesh=None, **kw)
        np.testing.assert_array_equal(a, b)
