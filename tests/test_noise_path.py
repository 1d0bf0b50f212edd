"""End-to-end noise-cloud training path (reference TreeSet.py:111-121 +
TreeLearn.py:98-105): separate synthetic noise clouds whose point counts
DIFFER from the main clouds drive the semantic head via a second
backbone pass."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from treemorph_tpu.data import make_padded_batch
from treemorph_tpu.data.treeset import TreeDataset, TreeSample
from treemorph_tpu.fixtures import synthetic_cylinder_cloud
from treemorph_tpu.models import TreeLearn
from treemorph_tpu.train import create_train_state, make_train_step
from treemorph_tpu.train.families import (
    init_treelearn,
    treelearn_noise_family,
)
from treemorph_tpu.train.harness import make_optimizer


def _labeled(n, seed):
    return synthetic_cylinder_cloud(n, rng=np.random.default_rng(seed))


def _sample(n, m, seed):
    main = _labeled(n, seed)
    noise = _labeled(m, seed + 100)
    norm = np.linalg.norm(main[:, 3:6], axis=1)
    nnorm = np.linalg.norm(noise[:, 3:6], axis=1)
    return TreeSample(
        points=main[:, :3],
        feats=main[:, 7:],
        offsets=main[:, 3:6],
        semantic_label=(norm > 0.05).astype(np.int32),
        offset_mask=norm <= 0.05,
        path=f"syn_{seed}",
        noise_points=noise[:, :3],
        noise_feats=noise[:, 7:],
        noise_semantic=(nnorm > 0.05).astype(np.int32),
    )


class TestNoiseDataset:
    def test_getitem_carries_mismatched_noise_cloud(self, tmp_path):
        # main cloud 200 points, noise cloud 137 points — the reference
        # workflow always has different counts.
        cloud_dir = tmp_path / "clouds"
        noise_dir = tmp_path / "noise"
        cloud_dir.mkdir()
        noise_dir.mkdir()
        main = _labeled(200, 1).astype(np.float32)
        noise = _labeled(137, 2).astype(np.float32)
        np.save(cloud_dir / "tree_1.npy", main)
        np.save(noise_dir / "tree_1.npy", noise)

        ds = TreeDataset(
            [str(cloud_dir / "tree_1.npy")],
            training=False,
            process_json=False,
            noise_root=str(noise_dir),
        )
        s = ds[0]
        assert len(s.points) == 200
        assert s.noise_points is not None and len(s.noise_points) == 137
        assert len(s.noise_semantic) == 137
        np.testing.assert_allclose(s.noise_points, noise[:, :3])
        exp = (np.linalg.norm(noise[:, 3:6], axis=1) > 0.05).astype(np.int32)
        np.testing.assert_array_equal(s.noise_semantic, exp)
        # main semantic stays aligned with the main cloud
        assert len(s.semantic_label) == 200

    def test_getitem_without_noise_root(self, tmp_path):
        p = tmp_path / "t.npy"
        np.save(p, _labeled(64, 3).astype(np.float32))
        ds = TreeDataset([str(p)], training=False, process_json=False)
        assert ds[0].noise_points is None

    def test_padded_batch_separate_noise_bucket(self):
        batch = make_padded_batch(
            [_sample(200, 137, 0), _sample(150, 410, 1)], bucket=128
        )
        assert batch.coords.shape == (2, 256, 3)
        assert batch.noise_coords.shape == (2, 512, 3)  # independent bucket
        assert batch.noise_valid.sum() == 137 + 410
        assert batch.noise_semantic.shape == (2, 512)

    def test_mixed_batch_raises(self):
        main_only = TreeSample(
            points=np.zeros((10, 3), np.float32),
            feats=np.zeros((10, 4), np.float32),
            offsets=np.zeros((10, 3), np.float32),
            semantic_label=np.zeros(10, np.int32),
            offset_mask=np.ones(10, bool),
            path="plain",
        )
        with pytest.raises(ValueError, match="mixed batch"):
            make_padded_batch([_sample(20, 30, 0), main_only], bucket=16)


class TestNoiseFamily:
    def test_train_step_with_mismatched_lengths(self):
        batch = make_padded_batch(
            [_sample(300, 180, 0), _sample(250, 420, 1)], bucket=128
        )
        model = TreeLearn(
            channels=8,
            num_blocks=2,
            dim_feat=4,
            voxel_size=0.05,
            batch_size=batch.batch_size,
        )
        variables = init_treelearn(model, batch, jax.random.key(0))
        forward_fn, loss_fn = treelearn_noise_family(model)

        # Semantic logits come from the noise pass: (B*M, 2), not (B*N, 2).
        out, _ = forward_fn(
            variables["params"],
            variables["batch_stats"],
            jax.tree.map(jnp.asarray, batch),
            False,
            jax.random.key(1),
        )
        b, n = batch.coords.shape[:2]
        m = batch.noise_coords.shape[1]
        assert out["semantic_prediction_logits"].shape == (b * m, 2)
        assert out["offset_predictions"].shape == (b * n, 3)

        tx = make_optimizer()
        state = create_train_state(variables, tx)
        train_step = make_train_step(forward_fn, loss_fn, tx)
        losses = []
        for i in range(3):
            state, metrics = train_step(
                state, batch, jnp.float32(1e-3), jax.random.key(i)
            )
            losses.append(float(metrics["loss"]))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]

    def test_semantic_loss_reads_noise_labels(self):
        batch = make_padded_batch([_sample(100, 70, 5)], bucket=64)
        model = TreeLearn(
            channels=8,
            num_blocks=2,
            dim_feat=4,
            voxel_size=0.05,
            batch_size=1,
        )
        variables = init_treelearn(model, batch, jax.random.key(0))
        forward_fn, loss_fn = treelearn_noise_family(model)
        jbatch = jax.tree.map(jnp.asarray, batch)
        out, _ = forward_fn(
            variables["params"],
            variables["batch_stats"],
            jbatch,
            False,
            jax.random.key(1),
        )
        _, parts = loss_fn(out, jbatch)
        flipped = jbatch._replace(noise_semantic=1 - jbatch.noise_semantic)
        _, parts_flipped = loss_fn(out, flipped)
        assert float(parts["semantic_loss"]) != pytest.approx(
            float(parts_flipped["semantic_loss"])
        )
        # the offset loss ignores the noise labels entirely
        assert float(parts["offset_loss"]) == pytest.approx(
            float(parts_flipped["offset_loss"])
        )
