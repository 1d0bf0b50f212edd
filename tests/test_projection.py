"""Golden tests for the cylinder-projection kernel.

The oracle is an independent numpy implementation of the exact distance to a
capped cylinder (mantle + cap discs), which is what the reference kernel's
auxiliary-axis construction computes (see docstring of
treemorph_tpu/ops/projection.py).
"""

import jax.numpy as jnp
import numpy as np
import pytest

from treemorph_tpu.fixtures import (
    synthetic_cylinder_cloud,
    synthetic_qsm,
    synthetic_tree_cloud,
)
from treemorph_tpu.ops import (
    closest_cylinder,
    cylinders_from_dataframe,
    generate_offset_cloud,
)
from treemorph_tpu.ops.projection import make_cylinders


def oracle_capped_cylinder(points, start, end, radius):
    """Exact distance from each point to each capped cylinder's surface.

    Independent formulation: decompose into axial/radial coordinates.
    """
    points = np.asarray(points, np.float64)
    start = np.asarray(start, np.float64)
    end = np.asarray(end, np.float64)
    radius = np.asarray(radius, np.float64)

    axis = end - start
    length = np.linalg.norm(axis, axis=1)
    unit = axis / np.maximum(length, 1e-12)[:, None]

    rel = points[:, None, :] - start[None, :, :]  # (N, M, 3)
    t = np.einsum("nmd,md->nm", rel, unit)  # axial coordinate
    radial_vec = rel - t[..., None] * unit[None]
    d_rad = np.linalg.norm(radial_vec, axis=-1)

    inside_axial = (t >= 0) & (t <= length[None])
    dist_mantle = np.abs(d_rad - radius[None])
    axial_excess = np.maximum(np.maximum(-t, t - length[None]), 0.0)
    radial_excess = np.maximum(d_rad - radius[None], 0.0)
    dist_cap = np.sqrt(axial_excess**2 + radial_excess**2)
    return np.where(inside_axial, dist_mantle, dist_cap)


class TestClosestCylinder:
    def test_distance_matches_oracle(self, rng):
        qsm = synthetic_qsm(rng=rng)
        start = qsm[["startX", "startY", "startZ"]].to_numpy()
        end = qsm[["endX", "endY", "endZ"]].to_numpy()
        radius = qsm["radius"].to_numpy()

        points = rng.uniform(-3, 9, size=(500, 3)).astype(np.float32)
        cyl = cylinders_from_dataframe(qsm)
        ids, dists, offsets = closest_cylinder(
            jnp.asarray(points), cyl, tile=128
        )

        oracle = oracle_capped_cylinder(points, start, end, radius)
        oracle_dist = oracle.min(axis=1)
        # The reference kernel's perpendicular test has a 1e-3 tolerance
        # band where cap logic applies to barely-inside points, so allow a
        # matching slack.
        np.testing.assert_allclose(
            np.asarray(dists), oracle_dist, atol=2e-3, rtol=1e-4
        )

    def test_ids_match_oracle_argmin(self, rng):
        qsm = synthetic_qsm(rng=rng)
        start = qsm[["startX", "startY", "startZ"]].to_numpy()
        end = qsm[["endX", "endY", "endZ"]].to_numpy()
        radius = qsm["radius"].to_numpy()
        points = rng.uniform(-2, 8, size=(300, 3)).astype(np.float32)

        cyl = cylinders_from_dataframe(qsm)
        ids, dists, _ = closest_cylinder(jnp.asarray(points), cyl, tile=64)

        oracle = oracle_capped_cylinder(points, start, end, radius)
        oracle_ids = oracle.argmin(axis=1)
        # Only check points where the argmin is unambiguous.
        sorted_d = np.sort(oracle, axis=1)
        clear = (sorted_d[:, 1] - sorted_d[:, 0]) > 1e-3
        np.testing.assert_array_equal(
            np.asarray(ids)[clear], oracle_ids[clear]
        )

    def test_offsets_move_to_surface_vertical_cylinder(self, rng):
        # Points beside the mantle of a single vertical cylinder: offsets
        # must equal the analytic radial correction exactly.
        labeled = synthetic_cylinder_cloud(2000, rng=rng)
        points, gt_offsets = labeled[:, :3], labeled[:, 3:6]
        cyl = make_cylinders(
            start=np.array([[0.0, 0.0, 0.0]]),
            end=np.array([[0.0, 0.0, 5.0]]),
            radius=np.array([0.1]),
        )
        _, dists, offsets = closest_cylinder(jnp.asarray(points), cyl)
        np.testing.assert_allclose(
            np.asarray(offsets), gt_offsets, atol=1e-5
        )
        np.testing.assert_allclose(
            np.asarray(dists), np.linalg.norm(gt_offsets, axis=1), atol=1e-5
        )

    def test_cap_case_moves_to_rim(self):
        # A point above the top cap, off-axis: with move_to_mantle the
        # offset target must be on the rim (radius r from the axis, at the
        # cap height).
        cyl = make_cylinders(
            start=np.array([[0.0, 0.0, 0.0]]),
            end=np.array([[0.0, 0.0, 1.0]]),
            radius=np.array([0.5]),
        )
        p = np.array([[0.1, 0.0, 1.3]], np.float32)
        _, dist, off = closest_cylinder(jnp.asarray(p), cyl)
        target = p[0] + np.asarray(off)[0]
        assert target[2] == pytest.approx(1.0, abs=1e-6)
        assert np.hypot(target[0], target[1]) == pytest.approx(0.5, abs=1e-5)
        # distance is to the cap disc (axial excess), not to the rim
        assert float(dist[0]) == pytest.approx(0.3, abs=1e-5)

    def test_padded_cylinders_never_win(self, rng):
        qsm = synthetic_qsm(rng=rng)
        points = rng.uniform(-2, 8, size=(100, 3)).astype(np.float32)
        cyl_nopad = cylinders_from_dataframe(qsm)
        cyl_pad = cylinders_from_dataframe(qsm, pad_to=64)
        ids_a, d_a, off_a = closest_cylinder(jnp.asarray(points), cyl_nopad)
        ids_b, d_b, off_b = closest_cylinder(jnp.asarray(points), cyl_pad)
        np.testing.assert_array_equal(np.asarray(ids_a), np.asarray(ids_b))
        np.testing.assert_allclose(np.asarray(d_a), np.asarray(d_b))
        np.testing.assert_allclose(np.asarray(off_a), np.asarray(off_b))

    def test_generate_offset_cloud_format(self, rng):
        points, qsm = synthetic_tree_cloud(rng=rng)
        out = generate_offset_cloud(points, qsm)
        assert out.shape == (len(points), 7)
        np.testing.assert_allclose(out[:, :3], points, atol=1e-6)
        # offsets for on-surface points should be small; cylinder ids valid
        assert out[:, 6].min() >= 0
        assert out[:, 6].max() < len(qsm)

    def test_column_name_variants(self, rng):
        qsm = synthetic_qsm(rng=rng)
        renamed = qsm.rename(
            columns={
                "startX": "start.x",
                "startY": "start.y",
                "startZ": "start.z",
                "endX": "end_x",
                "endY": "end_y",
                "endZ": "end_z",
                "ID": "extension",
            }
        )
        cyl = cylinders_from_dataframe(renamed)
        assert cyl.start.shape == (len(qsm), 3)

    def test_missing_column_raises(self, rng):
        qsm = synthetic_qsm(rng=rng).drop(columns=["radius"])
        with pytest.raises(KeyError):
            cylinders_from_dataframe(qsm)


class TestFixtures:
    def test_synthetic_cylinder_offsets_restore_surface(self, rng):
        labeled = synthetic_cylinder_cloud(1000, rng=rng)
        restored = labeled[:, :3] + labeled[:, 3:6]
        r = np.hypot(restored[:, 0], restored[:, 1])
        np.testing.assert_allclose(r, 0.1, atol=1e-5)

    def test_synthetic_tree_cloud_near_surface(self, rng):
        points, qsm = synthetic_tree_cloud(
            outlier_fraction=0.0, noise_scale=0.005, rng=rng
        )
        oracle = oracle_capped_cylinder(
            points,
            qsm[["startX", "startY", "startZ"]].to_numpy(),
            qsm[["endX", "endY", "endZ"]].to_numpy(),
            qsm["radius"].to_numpy(),
        )
        # most points should be within a few noise sigmas of some surface
        assert np.quantile(oracle.min(axis=1), 0.95) < 0.03


class TestHostMirror:
    def test_host_matches_device_kernel(self, rng):
        """closest_cylinder_host (the QSM engine's per-iteration path)
        must match the jnp tile bit-for-bit up to argmin tie-breaks."""
        import jax.numpy as jnp

        from treemorph_tpu.ops.projection import (
            closest_cylinder, closest_cylinder_host, make_cylinders,
        )

        m = 12
        start = rng.normal(size=(m, 3)).astype(np.float32) * 2
        end = start + rng.normal(size=(m, 3)).astype(np.float32)
        radius = rng.uniform(0.05, 0.3, m).astype(np.float32)
        pts = rng.normal(size=(500, 3)).astype(np.float32) * 3

        cyl = make_cylinders(start, end, radius)
        d_ids, d_dist, d_off = closest_cylinder(
            jnp.asarray(pts), cyl, tile=512
        )
        h_ids, h_dist, h_off = closest_cylinder_host(
            pts, start, end, radius
        )
        np.testing.assert_allclose(
            h_dist, np.asarray(d_dist), rtol=1e-5, atol=1e-6
        )
        same = h_ids == np.asarray(d_ids)
        assert same.mean() > 0.99  # fp ties only
        np.testing.assert_allclose(
            h_off[same], np.asarray(d_off)[same], rtol=1e-4, atol=1e-5
        )
