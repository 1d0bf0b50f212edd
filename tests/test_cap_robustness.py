"""Static-cap robustness on adversarial clouds (VERDICT r3 #6).

The bench-tuned capacity divisors (voxel_capacity_divisor=5,
dedup_divisor=4, pool_shrink=4) are sized for dense upsampled surface
clouds. These tests sweep shapes that break that assumption — sparse
canopies (one point per voxel), heavy outliers, mixed scales, tall
narrow plots — and assert the contract: either nothing is dropped, or
the overflow counters report it (never silent degradation), and
:func:`treemorph_tpu.pipeline.predict.predict_single` automatically
retries with overflow-proof capacities instead of returning degraded
predictions.
"""

import logging

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from treemorph_tpu.models import TreeLearn
from treemorph_tpu.models.ptv3 import PointTransformerWithHeads

TINY_PTV3 = dict(
    enc_depths=(1, 1, 1),
    enc_channels=(16, 32, 64),
    enc_num_head=(2, 4, 8),
    enc_patch_size=(64, 64, 64),
    dec_depths=(1, 1),
    dec_channels=(16, 32),
    dec_num_head=(2, 4),
    dec_patch_size=(64, 64),
    drop_path=0.0,
)


@pytest.fixture
def rng():
    return np.random.default_rng(23)


def adversarial_clouds(rng, n=1024):
    """Named adversarial shapes, each (n, 3) float32."""
    sparse_canopy = rng.uniform(0, 30, (n, 3)).astype(np.float32)
    dense = rng.normal(0, 0.5, (n, 3)).astype(np.float32)
    outliers = dense.copy()
    k = n // 5
    outliers[:k] = rng.uniform(-200, 200, (k, 3)).astype(np.float32)
    tall = np.stack(
        [
            rng.uniform(0, 0.5, n),
            rng.uniform(0, 0.5, n),
            rng.uniform(0, 80, n),
        ],
        axis=1,
    ).astype(np.float32)
    mixed = np.concatenate(
        [dense[: n // 2], sparse_canopy[: n - n // 2]]
    ).astype(np.float32)
    return {
        "sparse_canopy": sparse_canopy,
        "outliers_20pct": outliers,
        "tall_narrow": tall,
        "mixed_scale": mixed,
    }


class TestOverflowReporting:
    @pytest.mark.parametrize(
        "shape",
        ["sparse_canopy", "outliers_20pct", "tall_narrow", "mixed_scale"],
    )
    def test_treelearn_counters_match_reality(self, rng, shape):
        """dropped_voxels > 0 exactly when the real voxel count exceeds
        the static cap — overflow is never silent, never spurious."""
        pts = adversarial_clouds(rng)[shape]
        n = len(pts)
        feats = rng.normal(size=(n, 4)).astype(np.float32)
        model = TreeLearn(
            channels=8, num_blocks=2, dim_feat=4, voxel_size=0.02,
            batch_size=1, voxel_capacity_divisor=5, engine="band",
            conv_dtype="bfloat16",
        )
        args = (
            jnp.asarray(pts), jnp.asarray(feats),
            jnp.zeros(n, jnp.int32), jnp.ones(n, bool),
        )
        var = model.init(jax.random.key(0), *args, train=False)
        out = model.apply(var, *args, train=False)

        cap = max(n // 5, 256)
        cells = np.floor(
            (pts - pts.min(0)) / np.float32(0.02)
        ).astype(np.int64)
        n_unique = len(np.unique(cells, axis=0))
        if n_unique > cap:
            assert int(out["dropped_voxels"]) > 0 or int(
                out["dropped_points"]
            ) > 0, (shape, n_unique, cap)
        else:
            assert int(out["dropped_voxels"]) == 0, shape
            assert int(out["dropped_points"]) == 0, shape

    @pytest.mark.parametrize("shape", ["sparse_canopy", "outliers_20pct"])
    def test_ptv3_counters_match_reality(self, rng, shape):
        pts = adversarial_clouds(rng, n=512)[shape]
        n = len(pts)
        feats = rng.normal(size=(n, 4)).astype(np.float32)
        model = PointTransformerWithHeads(
            dim_feat=4, use_feats=True, voxel_size=0.02,
            dedup_divisor=4, dedup_tokens=True, pool_shrink=4,
            **TINY_PTV3,
        )
        args = (
            jnp.asarray(pts), jnp.asarray(feats),
            jnp.zeros(n, jnp.int32), jnp.ones(n, bool),
        )
        var = model.init(jax.random.key(0), *args, train=False)
        out = model.apply(var, *args, train=False)
        cells = np.floor(
            (pts - pts.min(0)) / np.float32(0.02)
        ).astype(np.int64)
        n_unique = len(np.unique(cells, axis=0))
        cap_u = max(-(-(n // 4) // 64) * 64, 64)
        if n_unique > cap_u:
            assert int(out["dedup_overflow"]) > 0, (shape, n_unique, cap_u)
        else:
            assert int(out["dedup_overflow"]) == 0, shape


class TestAutomaticRetry:
    def test_predict_single_retries_to_safe_caps(self, rng, caplog):
        """A cloud that overflows the tuned caps must produce the SAME
        predictions as a safe-cap model — the retry path, not a warning
        plus degraded offsets."""
        from treemorph_tpu.evaluation.model_loaders import Predictor
        from treemorph_tpu.pipeline.predict import predict_single

        pts = adversarial_clouds(rng)["sparse_canopy"]
        n = len(pts)
        cloud = np.zeros((n, 11), np.float32)
        cloud[:, :3] = pts
        cloud[:, 7:11] = rng.normal(size=(n, 4)).astype(np.float32)

        kwargs = dict(
            channels=8, num_blocks=2, dim_feat=4, voxel_size=0.02,
            batch_size=1,
        )
        tight = TreeLearn(voxel_capacity_divisor=5, **kwargs)
        safe = TreeLearn(voxel_capacity_divisor=1, **kwargs)
        n_pad = -(-n // 1024) * 1024
        var = tight.init(
            jax.random.key(0),
            jnp.zeros((n_pad, 3)),
            jnp.zeros((n_pad, 4)),
            jnp.zeros(n_pad, jnp.int32),
            jnp.ones(n_pad, bool),
            train=False,
        )
        # premise: the tuned cap really overflows on this cloud
        args = (
            jnp.asarray(np.pad(pts, ((0, n_pad - n), (0, 0)))),
            jnp.asarray(
                np.pad(cloud[:, 7:11], ((0, n_pad - n), (0, 0)))
            ),
            jnp.zeros(n_pad, jnp.int32),
            jnp.asarray(np.arange(n_pad) < n),
        )
        out_tight = tight.apply(var, *args, train=False)
        assert (
            int(out_tight["dropped_voxels"])
            + int(out_tight["dropped_points"])
        ) > 0

        with caplog.at_level(logging.WARNING):
            got = predict_single(
                cloud,
                Predictor("treelearn", tight, var),
                noise_model=None,
                denoise=False,
            )
        assert any("retrying" in r.message for r in caplog.records)
        want = predict_single(
            cloud,
            Predictor("treelearn", safe, var),
            noise_model=None,
            denoise=False,
        )
        np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
