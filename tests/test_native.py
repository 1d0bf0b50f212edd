"""Native C++ QSM core vs sklearn / Python reference implementations."""

import numpy as np
import pytest

from treemorph_tpu import native


def _canon(labels):
    """Canonical relabeling so partitions can be compared directly."""
    mapping, out = {}, []
    for x in labels:
        if x == -1:
            out.append(-1)
            continue
        if x not in mapping:
            mapping[x] = len(mapping)
        out.append(mapping[x])
    return out


@pytest.mark.skipif(not native.available(), reason="g++ not available")
class TestNativeQSMCore:
    def test_dbscan_matches_sklearn(self, rng):
        from sklearn.cluster import DBSCAN

        pts = rng.normal(size=(150, 3)).astype(np.float32)
        d = np.linalg.norm(pts[:, None] - pts[None], axis=-1).astype(
            np.float32
        )
        ours = native.dbscan_precomputed(d, 0.5, 4)
        sk = DBSCAN(eps=0.5, min_samples=4, metric="precomputed")\
            .fit_predict(d)
        assert ((ours == -1) == (sk == -1)).all()
        assert _canon(ours) == _canon(sk)

    def test_angular_cluster_two_directions(self, rng):
        # two tight direction bundles -> two clusters
        a = rng.normal(size=(40, 3)) * 0.05 + np.array([1, 0, 0])
        b = rng.normal(size=(40, 3)) * 0.05 + np.array([0, 0, 1])
        u = np.vstack([a, b]).astype(np.float32)
        u /= np.linalg.norm(u, axis=1, keepdims=True)
        labels = native.angular_cluster(u, 0.3, 5)
        assert len(set(labels[:40])) == 1
        assert len(set(labels[40:])) == 1
        assert labels[0] != labels[40]

    def test_euclidean_cluster_matches_python(self, rng):
        from treemorph_tpu.pipeline.qsm.geometry import (
            cluster_labels_euclidian,
        )

        pts = np.vstack(
            [
                rng.normal(size=(50, 3)) * 0.02,
                rng.normal(size=(50, 3)) * 0.02 + 5.0,
            ]
        ).astype(np.float32)
        ours = native.euclidean_cluster(pts, 0.2, 5)
        ref = cluster_labels_euclidian(pts, 0.2, 5)
        assert _canon(ours) == _canon(ref)


class TestAngularClusterLargeShell:
    def test_kdtree_path_matches_matrix_path(self, rng):
        """Above the matrix cap the chord-metric KD-tree DBSCAN must give
        the same clusters (angle<=eps <=> chord<=2sin(eps/2) is exact)."""
        from treemorph_tpu import native

        # two well-separated direction bundles + scattered noise
        n = 2000
        a = rng.normal(size=(n // 2, 3)) * 0.08 + np.array([1.0, 0, 0])
        b = rng.normal(size=(n // 2 - 50, 3)) * 0.08 + np.array([0, 1.0, 0])
        c = rng.normal(size=(50, 3))
        u = np.concatenate([a, b, c])
        u /= np.linalg.norm(u, axis=1, keepdims=True)
        u = u.astype(np.float32)

        eps, min_samples = 0.2, 5
        big = native.angular_cluster(u, eps, min_samples)  # kd path
        old_cap = native.ANGULAR_MATRIX_MAX
        try:
            native.ANGULAR_MATRIX_MAX = 10**9  # force matrix path
            small = native.angular_cluster(u, eps, min_samples)
        finally:
            native.ANGULAR_MATRIX_MAX = old_cap

        # same noise set and same cluster PARTITION (ids may differ)
        np.testing.assert_array_equal(big == -1, small == -1)
        from collections import defaultdict

        def groups(labels):
            g = defaultdict(set)
            for i, lab in enumerate(labels):
                if lab != -1:
                    g[lab].add(i)
            return sorted(
                (tuple(sorted(s)) for s in g.values()), key=len
            )

        assert groups(big) == groups(small)


class TestAngularDBSCANGrid:
    """Grid-accelerated angular DBSCAN == sklearn chord-metric DBSCAN."""

    @staticmethod
    def _unit(v):
        return v / np.linalg.norm(v, axis=1, keepdims=True)

    @staticmethod
    def _sk(u, eps, ms):
        from sklearn.cluster import DBSCAN

        chord = 2.0 * np.sin(min(eps, np.pi) / 2.0)
        return DBSCAN(
            eps=chord, min_samples=ms, algorithm="kd_tree"
        ).fit_predict(u.astype(np.float64))

    @staticmethod
    def _grid(u, eps, ms):
        from treemorph_tpu.native import _load

        lib = _load()
        if lib is None:
            pytest.skip("native library unavailable")
        labels = np.empty(len(u), np.int32)
        lib.angular_dbscan_grid(
            np.ascontiguousarray(u, np.float32), len(u), float(eps),
            int(ms), labels,
        )
        return labels

    @pytest.mark.parametrize(
        "eps,ms", [(0.15, 4), (0.05, 3), (0.3, 10)]
    )
    def test_exact_on_random_sphere(self, rng, eps, ms):
        u = self._unit(rng.normal(size=(4000, 3)))
        np.testing.assert_array_equal(
            self._grid(u, eps, ms), self._sk(u, eps, ms)
        )

    @pytest.mark.parametrize("eps,ms", [(0.12, 5), (0.2, 20)])
    def test_exact_on_tight_clusters_plus_noise(self, rng, eps, ms):
        """The 100k-shell regime in miniature: dense direction blobs
        (where sklearn's neighbor materialization blows up) + noise."""
        centers = self._unit(rng.normal(size=(6, 3)))
        parts = [
            self._unit(c + 0.01 * rng.normal(size=(3000, 3)))
            for c in centers
        ]
        parts.append(self._unit(rng.normal(size=(800, 3))))
        u = np.concatenate(parts)
        u = u[rng.permutation(len(u))]
        np.testing.assert_array_equal(
            self._grid(u, eps, ms), self._sk(u, eps, ms)
        )

    def test_routed_for_large_shells(self, rng):
        """angular_cluster dispatches shells > ANGULAR_MATRIX_MAX to the
        grid path and still matches sklearn."""
        from treemorph_tpu.native import ANGULAR_MATRIX_MAX, angular_cluster

        n = ANGULAR_MATRIX_MAX + 500
        u = self._unit(rng.normal(size=(n, 3)))
        got = angular_cluster(u, 0.15, 4)
        np.testing.assert_array_equal(got, self._sk(u, 0.15, 4))
