import jax
import jax.numpy as jnp
import numpy as np

from treemorph_tpu.ops.sampling import (
    farthest_point_sample,
    index_points,
    query_ball_point,
    square_distance,
    three_nn_interpolate,
)


class TestSquareDistance:
    def test_matches_numpy(self, rng):
        a = rng.normal(size=(2, 10, 3)).astype(np.float32)
        b = rng.normal(size=(2, 7, 3)).astype(np.float32)
        d = np.asarray(square_distance(jnp.asarray(a), jnp.asarray(b)))
        ref = ((a[:, :, None] - b[:, None]) ** 2).sum(-1)
        np.testing.assert_allclose(d, ref, atol=1e-4)


class TestFPS:
    def test_exact_recurrence_matches_oracle(self, rng):
        xyz = rng.normal(size=(1, 64, 3)).astype(np.float32)
        valid = np.ones((1, 64), bool)
        got = np.asarray(
            farthest_point_sample(jnp.asarray(xyz), jnp.asarray(valid), 8)
        )[0]

        # host oracle with the same deterministic start (index 0)
        dist = np.full(64, 1e10)
        farthest = 0
        expected = []
        for _ in range(8):
            expected.append(farthest)
            d = ((xyz[0] - xyz[0, farthest]) ** 2).sum(-1)
            dist = np.minimum(dist, d)
            farthest = int(dist.argmax())
        np.testing.assert_array_equal(got, expected)

    def test_never_selects_invalid(self, rng):
        xyz = rng.normal(size=(2, 100, 3)).astype(np.float32)
        valid = np.zeros((2, 100), bool)
        valid[:, :30] = True
        idx = np.asarray(
            farthest_point_sample(jnp.asarray(xyz), jnp.asarray(valid), 16)
        )
        assert idx.max() < 30

    def test_spread_quality(self, rng):
        # FPS points should be well spread: min pairwise distance much
        # larger than random selection's.
        xyz = rng.uniform(0, 1, size=(1, 500, 3)).astype(np.float32)
        valid = np.ones((1, 500), bool)
        idx = np.asarray(
            farthest_point_sample(jnp.asarray(xyz), jnp.asarray(valid), 32)
        )[0]
        sel = xyz[0, idx]
        d = np.linalg.norm(sel[:, None] - sel[None], axis=-1)
        np.fill_diagonal(d, np.inf)
        rand_sel = xyz[0, rng.choice(500, 32, replace=False)]
        dr = np.linalg.norm(rand_sel[:, None] - rand_sel[None], axis=-1)
        np.fill_diagonal(dr, np.inf)
        assert d.min() > dr.min()


class TestBucketedFPS:
    """Blocked approximate FPS (VERDICT r4 #7): parallel per-bucket
    exact FPS over strided subsamples."""

    def test_buckets_one_is_exact(self, rng):
        from treemorph_tpu.ops.sampling import (
            bucketed_farthest_point_sample,
        )

        xyz = rng.normal(size=(2, 128, 3)).astype(np.float32)
        valid = np.ones((2, 128), bool)
        a = np.asarray(farthest_point_sample(
            jnp.asarray(xyz), jnp.asarray(valid), 16
        ))
        b = np.asarray(bucketed_farthest_point_sample(
            jnp.asarray(xyz), jnp.asarray(valid), 16, buckets=1
        ))
        np.testing.assert_array_equal(a, b)

    def test_never_selects_invalid_and_in_range(self, rng):
        from treemorph_tpu.ops.sampling import (
            bucketed_farthest_point_sample,
        )

        # n not divisible by buckets (padding path) + starved validity
        xyz = rng.normal(size=(2, 100, 3)).astype(np.float32)
        valid = np.zeros((2, 100), bool)
        valid[0, :30] = True
        valid[1, 5:9] = True  # fewer valid than npoint
        idx = np.asarray(bucketed_farthest_point_sample(
            jnp.asarray(xyz), jnp.asarray(valid), 16, buckets=16
        ))
        assert idx.min() >= 0 and idx.max() < 100
        assert valid[np.arange(2)[:, None], idx].all()

    def test_spread_quality_near_exact(self, rng):
        from treemorph_tpu.ops.sampling import (
            bucketed_farthest_point_sample,
        )

        xyz = rng.uniform(0, 10, size=(1, 2048, 3)).astype(np.float32)
        valid = np.ones((1, 2048), bool)
        ex = np.asarray(farthest_point_sample(
            jnp.asarray(xyz), jnp.asarray(valid), 100
        ))[0]
        bu = np.asarray(bucketed_farthest_point_sample(
            jnp.asarray(xyz), jnp.asarray(valid), 100, buckets=16
        ))[0]
        assert len(np.unique(bu)) == 100

        def mean_nn(sel):
            d = np.linalg.norm(sel[:, None] - sel[None], axis=-1)
            np.fill_diagonal(d, np.inf)
            return d.min(axis=1).mean()

        # the approximation keeps at least half the exact FPS spacing
        # (measured ~0.56x on this workload)
        assert mean_nn(xyz[0, bu]) > 0.45 * mean_nn(xyz[0, ex])

    def test_model_runs_with_buckets(self, rng):
        import jax

        from treemorph_tpu.models import PointNet2

        model = PointNet2(depth=5, dim_feat=4, fps_buckets=16)
        coords = jnp.asarray(rng.normal(size=(2, 256, 3)), jnp.float32)
        feats = jnp.asarray(rng.normal(size=(2, 256, 4)), jnp.float32)
        valid = jnp.ones((2, 256), bool)
        variables = model.init(
            jax.random.key(0), coords, feats, valid, train=False
        )
        out = model.apply(variables, coords, feats, valid, train=False)
        assert out["offset_predictions"].shape == (2, 256, 3)
        assert np.isfinite(np.asarray(out["offset_predictions"])).all()


class TestBallQuery:
    def test_lowest_index_semantics(self, rng):
        xyz = rng.uniform(0, 1, size=(1, 50, 3)).astype(np.float32)
        q = xyz[:, :5]
        valid = np.ones((1, 50), bool)
        radius, k = 0.4, 8
        idx = np.asarray(
            query_ball_point(radius, k, jnp.asarray(xyz), jnp.asarray(q),
                             jnp.asarray(valid))
        )[0]
        d = ((q[0][:, None] - xyz[0][None]) ** 2).sum(-1)
        for s in range(5):
            inside = np.where(d[s] <= radius**2)[0]
            expected = inside[:k]
            got_unique = idx[s][: len(expected)]
            np.testing.assert_array_equal(np.sort(got_unique), expected)
            if len(inside) < k:
                # fill value is the first in-ball point
                assert np.all(idx[s][len(inside):] == expected[0])

    def test_empty_ball_falls_back_to_nearest(self):
        xyz = jnp.array([[[0.0, 0, 0], [5.0, 0, 0], [9.0, 0, 0]]])
        q = jnp.array([[[8.9, 0, 0]]])
        valid = jnp.ones((1, 3), bool)
        idx = np.asarray(query_ball_point(0.01, 4, xyz, q, valid))
        assert np.all(idx == 2)

    def test_excludes_invalid(self, rng):
        xyz = rng.uniform(0, 0.1, size=(1, 20, 3)).astype(np.float32)
        valid = np.zeros((1, 20), bool)
        valid[0, :10] = True
        idx = np.asarray(
            query_ball_point(1.0, 32, jnp.asarray(xyz),
                             jnp.asarray(xyz[:, :4]), jnp.asarray(valid))
        )
        assert idx.max() < 10


class TestInterpolate:
    def test_exact_at_source_points(self, rng):
        xyz2 = rng.normal(size=(1, 20, 3)).astype(np.float32)
        feats2 = rng.normal(size=(1, 20, 4)).astype(np.float32)
        valid2 = np.ones((1, 20), bool)
        out = np.asarray(
            three_nn_interpolate(
                jnp.asarray(xyz2), jnp.asarray(xyz2),
                jnp.asarray(feats2), jnp.asarray(valid2)
            )
        )
        # at a source point the nearest neighbor distance is ~0 -> clamped
        # weights still dominated by the point itself
        np.testing.assert_allclose(out, feats2, atol=1e-2)

    def test_single_source_broadcasts(self, rng):
        xyz1 = rng.normal(size=(1, 10, 3)).astype(np.float32)
        xyz2 = rng.normal(size=(1, 1, 3)).astype(np.float32)
        feats2 = rng.normal(size=(1, 1, 4)).astype(np.float32)
        out = np.asarray(
            three_nn_interpolate(
                jnp.asarray(xyz1), jnp.asarray(xyz2), jnp.asarray(feats2),
                jnp.ones((1, 1), bool)
            )
        )
        np.testing.assert_allclose(out, np.broadcast_to(feats2, (1, 10, 4)))

    def test_index_points(self, rng):
        pts = rng.normal(size=(2, 10, 3)).astype(np.float32)
        idx = rng.integers(0, 10, size=(2, 4, 5))
        out = np.asarray(index_points(jnp.asarray(pts), jnp.asarray(idx)))
        for b in range(2):
            np.testing.assert_allclose(out[b], pts[b][idx[b]])
