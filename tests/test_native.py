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
