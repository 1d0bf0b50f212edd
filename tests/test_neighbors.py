import jax.numpy as jnp
import numpy as np
from scipy.spatial import cKDTree

from treemorph_tpu.fixtures import synthetic_tree_cloud
from treemorph_tpu.ops import (
    compute_curvature,
    compute_height,
    compute_normals,
    knn,
    radius_count,
)


class TestKNN:
    def test_matches_kdtree_uniform(self, rng):
        pts = rng.uniform(0, 1, size=(600, 3)).astype(np.float32)
        valid = np.ones(600, bool)
        k = 8
        idx, d2 = knn(
            jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(valid), k, 0.25, 32
        )
        tree = cKDTree(pts)
        ref_d, ref_i = tree.query(pts, k=k)
        # sets of neighbor distances must agree (ties may permute indices)
        np.testing.assert_allclose(
            np.sqrt(np.sort(np.asarray(d2), axis=1)),
            np.sort(ref_d, axis=1),
            atol=1e-4,
        )

    def test_matches_kdtree_tree_fixture(self, rng):
        pts, _ = synthetic_tree_cloud(points_per_m2=150, rng=rng)
        pts = pts[:2000]
        valid = np.ones(len(pts), bool)
        idx, d2 = knn(
            jnp.asarray(pts),
            jnp.asarray(pts),
            jnp.asarray(valid),
            8,
            0.3,
            64,
        )
        tree = cKDTree(pts)
        ref_d, _ = tree.query(pts, k=8)
        d = np.sqrt(np.asarray(d2))
        # allow rare misses where a cell overflows the candidate cap
        mismatch = np.abs(np.sort(d, 1) - np.sort(ref_d, 1)) > 1e-3
        assert mismatch.mean() < 0.01

    def test_invalid_points_excluded(self, rng):
        pts = rng.uniform(0, 1, size=(100, 3)).astype(np.float32)
        valid = np.arange(100) < 50
        idx, d2 = knn(
            jnp.asarray(pts), jnp.asarray(pts[:50]), jnp.asarray(valid), 4, 0.5, 64
        )
        assert np.asarray(idx).max() < 50

    def test_radius_count_matches_kdtree(self, rng):
        pts = rng.uniform(0, 1, size=(500, 3)).astype(np.float32)
        valid = np.ones(500, bool)
        counts = radius_count(
            jnp.asarray(pts), jnp.asarray(pts), jnp.asarray(valid), 0.1, 64
        )
        tree = cKDTree(pts)
        ref = np.array([len(tree.query_ball_point(p, 0.1)) for p in pts])
        np.testing.assert_array_equal(np.asarray(counts), ref)


class TestFeatures:
    def test_normals_on_plane(self, rng):
        # points on z=0 plane -> normals ±z
        xy = rng.uniform(0, 1, size=(400, 2)).astype(np.float32)
        pts = np.concatenate([xy, np.zeros((400, 1), np.float32)], axis=1)
        valid = np.ones(400, bool)
        normals = compute_normals(
            jnp.asarray(pts), jnp.asarray(valid), k=10, cell_size=0.2
        )
        nz = np.abs(np.asarray(normals)[:, 2])
        np.testing.assert_allclose(nz, 1.0, atol=1e-3)

    def test_normals_on_cylinder_radial(self, rng):
        theta = rng.uniform(0, 2 * np.pi, 2000)
        z = rng.uniform(0, 2, 2000)
        r = 0.5
        pts = np.stack(
            [r * np.cos(theta), r * np.sin(theta), z], axis=1
        ).astype(np.float32)
        valid = np.ones(len(pts), bool)
        normals = np.asarray(
            compute_normals(
                jnp.asarray(pts), jnp.asarray(valid), k=15, cell_size=0.15
            )
        )
        radial = pts[:, :2] / np.linalg.norm(pts[:, :2], axis=1, keepdims=True)
        alignment = np.abs(np.sum(normals[:, :2] * radial, axis=1))
        assert np.median(alignment) > 0.97

    def test_curvature_plane_vs_corner(self, rng):
        xy = rng.uniform(0, 1, size=(500, 2)).astype(np.float32)
        plane = np.concatenate([xy, np.zeros((500, 1), np.float32)], axis=1)
        blob = rng.uniform(0, 0.3, size=(500, 3)).astype(np.float32)
        valid = np.ones(500, bool)
        c_plane = np.asarray(
            compute_curvature(jnp.asarray(plane), jnp.asarray(valid), k=10,
                              cell_size=0.2)
        )
        c_blob = np.asarray(
            compute_curvature(jnp.asarray(blob), jnp.asarray(valid), k=10,
                              cell_size=0.15)
        )
        assert np.median(c_plane) < 0.01
        assert np.median(c_blob) > 0.05

    def test_height_normalized(self, rng):
        pts = rng.uniform(0, 1, size=(100, 3)).astype(np.float32)
        pts[:, 2] = np.linspace(5, 15, 100)
        h = np.asarray(
            compute_height(jnp.asarray(pts), jnp.ones(100, bool))
        )
        assert h.min() == 0.0 and h.max() == 1.0
