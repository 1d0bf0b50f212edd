import jax.numpy as jnp
import numpy as np

from treemorph_tpu.ops import voxelize, voxelize_treelearn_features


def _brute_force_voxels(coords, feats, batch_ids, voxel_size):
    """Host oracle: dict keyed by (b, gx, gy, gz) -> mean feats."""
    out = {}
    mins = {}
    for b in np.unique(batch_ids):
        mins[b] = coords[batch_ids == b].min(axis=0)
    for i in range(len(coords)):
        b = batch_ids[i]
        g = tuple(np.floor((coords[i] - mins[b]) / voxel_size).astype(int))
        out.setdefault((b, *g), []).append(feats[i])
    return {k: np.mean(v, axis=0) for k, v in out.items()}


class TestVoxelize:
    def test_matches_brute_force(self, rng):
        coords = rng.uniform(0, 2, size=(400, 3)).astype(np.float32)
        feats = rng.normal(size=(400, 5)).astype(np.float32)
        batch_ids = rng.integers(0, 3, size=400).astype(np.int32)
        valid = np.ones(400, bool)

        out = voxelize(
            jnp.asarray(coords),
            jnp.asarray(feats),
            jnp.asarray(batch_ids),
            jnp.asarray(valid),
            0.25,
            batch_size=3,
        )
        oracle = _brute_force_voxels(coords, feats, batch_ids, 0.25)
        nv = int(out.num_voxels)
        assert nv == len(oracle)

        vc = np.asarray(out.voxel_coords)[:nv]
        vf = np.asarray(out.voxel_feats)[:nv]
        for row, f in zip(vc, vf):
            key = tuple(int(v) for v in row)
            assert key in oracle
            np.testing.assert_allclose(f, oracle[key], atol=1e-5)

    def test_point_to_voxel_consistency(self, rng):
        coords = rng.uniform(0, 1, size=(200, 3)).astype(np.float32)
        feats = coords.copy()
        batch_ids = np.zeros(200, np.int32)
        valid = np.ones(200, bool)
        out = voxelize(
            jnp.asarray(coords),
            jnp.asarray(feats),
            jnp.asarray(batch_ids),
            jnp.asarray(valid),
            0.2,
            batch_size=1,
        )
        p2v = np.asarray(out.point_to_voxel)
        vc = np.asarray(out.voxel_coords)
        mins = coords.min(axis=0)
        grid = np.floor((coords - mins) / 0.2).astype(int)
        # every point's voxel row must carry that point's grid coordinate
        np.testing.assert_array_equal(vc[p2v][:, 1:], grid)
        assert p2v.max() < int(out.num_voxels)

    def test_padding_points_excluded(self, rng):
        coords = rng.uniform(0, 1, size=(100, 3)).astype(np.float32)
        feats = rng.normal(size=(100, 2)).astype(np.float32)
        batch_ids = np.zeros(100, np.int32)
        valid = np.arange(100) < 60

        out_masked = voxelize(
            jnp.asarray(coords),
            jnp.asarray(feats),
            jnp.asarray(batch_ids),
            jnp.asarray(valid),
            0.3,
            batch_size=1,
        )
        out_trunc = voxelize(
            jnp.asarray(coords[:60]),
            jnp.asarray(feats[:60]),
            jnp.asarray(batch_ids[:60]),
            jnp.ones(60, bool),
            0.3,
            batch_size=1,
        )
        assert int(out_masked.num_voxels) == int(out_trunc.num_voxels)
        nv = int(out_trunc.num_voxels)
        # same voxel set and features (order may match since both sorted)
        np.testing.assert_array_equal(
            np.asarray(out_masked.voxel_coords)[:nv],
            np.asarray(out_trunc.voxel_coords)[:nv],
        )
        np.testing.assert_allclose(
            np.asarray(out_masked.voxel_feats)[:nv],
            np.asarray(out_trunc.voxel_feats)[:nv],
            atol=1e-6,
        )

    def test_treelearn_feature_layout(self, rng):
        coords = rng.uniform(0, 1, size=(50, 3)).astype(np.float32)
        feats = rng.normal(size=(50, 4)).astype(np.float32)
        batch_ids = np.zeros(50, np.int32)
        valid = np.ones(50, bool)
        out = voxelize_treelearn_features(
            jnp.asarray(coords),
            jnp.asarray(feats),
            jnp.asarray(batch_ids),
            jnp.asarray(valid),
            0.2,
            batch_size=1,
            use_coords=False,
            use_feats=True,
        )
        vf = np.asarray(out.voxel_feats)
        assert vf.shape[1] == 7  # 4 feats + 3 coord slots
        nv = int(out.num_voxels)
        # coords disabled -> ones in the trailing 3 columns
        np.testing.assert_array_equal(vf[:nv, 4:], 1.0)
