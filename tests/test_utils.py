import numpy as np
import pytest

from treemorph_tpu.utils import (
    EarlyStopper,
    fit_circle_2d,
    fit_power_law,
    generate_log_bins,
    load_cloud,
    save_cloud,
)


class TestIO:
    def test_npy_roundtrip(self, tmp_path, rng):
        cloud = rng.normal(size=(100, 11)).astype(np.float32)
        path = save_cloud(cloud, str(tmp_path / "cloud"), "npy")
        loaded = load_cloud(path)
        assert loaded.shape == (100, 3)
        np.testing.assert_allclose(loaded, cloud[:, :3], rtol=1e-6)
        full = load_cloud(path, all_columns=True)
        assert full.shape == (100, 11)

    def test_txt_roundtrip(self, tmp_path, rng):
        cloud = rng.normal(size=(50, 3)).astype(np.float32)
        path = save_cloud(cloud, str(tmp_path / "cloud"), "txt")
        loaded = load_cloud(path)
        np.testing.assert_allclose(loaded, cloud, atol=1e-5)

    def test_laz_roundtrip(self, tmp_path, rng):
        cloud = (rng.normal(size=(50, 3)) * 10).astype(np.float32)
        path = save_cloud(cloud, str(tmp_path / "cloud"), "laz")
        loaded = load_cloud(path)
        assert loaded is not None
        np.testing.assert_allclose(loaded, cloud, atol=1e-2)

    def test_las_roundtrip_native_codec(self, tmp_path, rng):
        # the pure-numpy LAS 1.4 codec (utils/las.py): mm-scale fidelity
        # at survey-plot extents, intensity carried through
        from treemorph_tpu.utils.las import read_las, write_las

        cloud = (rng.uniform(0, 1, (200, 3)) * [50.0, 50.0, 30.0]).astype(
            np.float64
        ) + [3.5e5, 5.7e6, 120.0]  # UTM-magnitude coordinates
        inten = rng.integers(0, 65535, 200).astype(np.uint16)
        path = write_las(str(tmp_path / "cloud.las"), cloud, intensity=inten)
        out = read_las(path)
        assert out["version"] == (1, 4)
        assert out["point_format"] == 3
        np.testing.assert_allclose(out["xyz"], cloud, atol=5.1e-4)
        np.testing.assert_array_equal(out["intensity"], inten)

    def test_las_via_save_load_cloud(self, tmp_path, rng):
        cloud = (rng.normal(size=(64, 3)) * 10).astype(np.float32)
        path = save_cloud(cloud, str(tmp_path / "cloud"), "las")
        assert path.endswith(".las")
        loaded = load_cloud(path)
        assert loaded is not None and loaded.shape == (64, 3)
        np.testing.assert_allclose(loaded, cloud, atol=1e-2)

    def test_read_las_format0_handbuilt(self, tmp_path):
        # decode a LAS 1.2 / point-format-0 file built field-by-field
        # here (independent of the writer) — pins the header offsets
        import struct

        from treemorph_tpu.utils.las import read_las

        xyz_int = np.array([[1000, -2000, 3000], [4000, 5000, -6000]],
                           dtype=np.int32)
        header = bytearray(227)
        header[0:4] = b"LASF"
        header[24], header[25] = 1, 2
        struct.pack_into("<H", header, 94, 227)
        struct.pack_into("<I", header, 96, 227)
        struct.pack_into("<BH", header, 104, 0, 20)
        struct.pack_into("<I", header, 107, 2)
        struct.pack_into("<3d", header, 131, 0.01, 0.01, 0.01)
        struct.pack_into("<3d", header, 155, 100.0, 200.0, 300.0)
        recs = b""
        for X, Y, Z in xyz_int:
            recs += struct.pack("<iiiHBBbBH", X, Y, Z, 7, 0, 0, 0, 0, 0)
        out = read_las(bytes(header) + recs)
        np.testing.assert_allclose(
            out["xyz"],
            xyz_int.astype(np.float64) * 0.01 + [100.0, 200.0, 300.0],
        )
        assert out["point_format"] == 0
        np.testing.assert_array_equal(out["intensity"], [7, 7])

    def test_read_las_rejects_bad_input(self):
        import struct

        import pytest as _pytest

        from treemorph_tpu.utils.las import read_las

        with _pytest.raises(ValueError):
            read_las(b"NOPE" + b"\x00" * 300)
        header = bytearray(227)
        header[0:4] = b"LASF"
        header[24], header[25] = 1, 2
        struct.pack_into("<H", header, 94, 227)
        struct.pack_into("<I", header, 96, 227)
        struct.pack_into("<BH", header, 104, 0x80 | 3, 34)  # laz bit
        with _pytest.raises(ValueError):
            read_las(bytes(header))

    def test_missing_file(self, tmp_path):
        assert load_cloud(str(tmp_path / "nope.npy")) is None

    def test_unsupported_extension(self, tmp_path):
        p = tmp_path / "cloud.xyz"
        p.write_text("1 2 3")
        assert load_cloud(str(p)) is None


class TestFitting:
    def test_power_law_recovery(self, rng):
        a_true, b_true = 2.5, 0.7
        x = np.logspace(-3, 1, 200)
        y = a_true * x**b_true
        _, _, a, b, a_err, b_err = fit_power_law(x, y)
        assert a == pytest.approx(a_true, rel=1e-3)
        assert b == pytest.approx(b_true, rel=1e-3)

    def test_log_bins_cover_range(self):
        bins = generate_log_bins(0.015, 3.7)
        assert bins[0] <= 0.015
        assert bins[-1] >= 3.7
        assert np.all(np.diff(bins) > 0)

    def test_circle_fit_exact(self, rng):
        center = np.array([1.5, -2.0])
        radius = 0.8
        theta = rng.uniform(0, 2 * np.pi, 100)
        pts = center + radius * np.stack([np.cos(theta), np.sin(theta)], 1)
        c, r = fit_circle_2d(pts)
        np.testing.assert_allclose(c, center, atol=1e-6)
        assert r == pytest.approx(radius, abs=1e-6)

    def test_circle_fit_degenerate(self):
        c, r = fit_circle_2d(np.zeros((2, 2)))
        assert np.all(np.isnan(c)) and np.isnan(r)


class TestEarlyStopper:
    def test_stops_after_patience(self):
        saved = []
        stopper = EarlyStopper(patience=3, save_fn=saved.append)
        stopper("s0", 1.0, 1.0)
        assert saved == ["s0"]
        for i in range(3):
            stopper(f"s{i + 1}", 1.0, 2.0)  # no improvement
        assert stopper.early_stop
        assert saved == ["s0"]
        assert stopper.get_scores() == (1.0, 1.0)

    def test_improvement_resets_counter(self):
        stopper = EarlyStopper(patience=2)
        stopper(None, 1.0, 1.0)
        stopper(None, 1.0, 2.0)
        stopper(None, 0.9, 0.5)
        assert stopper.counter == 0
        assert not stopper.early_stop


class TestAugmentations:
    def test_offsets_stay_consistent(self, rng):
        """Every augmentation must keep (points + offsets) equal to the
        transformed surface targets."""
        from treemorph_tpu.data.augmentations import (
            default_augmentations,
            random_jitter,
            random_rotation_z,
        )
        from treemorph_tpu.fixtures import synthetic_cylinder_cloud

        labeled = synthetic_cylinder_cloud(500, rng=rng)
        points, offsets = labeled[:, :3], labeled[:, 3:6]
        targets = points + offsets

        aug = default_augmentations()
        g = np.random.default_rng(0)
        new_pts, new_offs = aug(points, offsets, g)
        new_targets = new_pts + new_offs
        # targets transform rigidly+scale: radial distance to the z axis
        # over the target set keeps its ratio structure
        r_old = np.hypot(targets[:, 0], targets[:, 1])
        r_new = np.hypot(new_targets[:, 0], new_targets[:, 1])
        ratio = r_new / np.maximum(r_old, 1e-9)
        np.testing.assert_allclose(ratio, ratio[0], rtol=1e-4)

    def test_jitter_preserves_targets_exactly(self, rng):
        from treemorph_tpu.data.augmentations import random_jitter

        pts = rng.normal(size=(100, 3)).astype(np.float32)
        offs = rng.normal(size=(100, 3)).astype(np.float32)
        aug = random_jitter(sigma=0.01)
        g = np.random.default_rng(1)
        p2, o2 = aug(pts, offs, g)
        np.testing.assert_allclose(p2 + o2, pts + offs, atol=1e-6)
        assert not np.allclose(p2, pts)

    def test_rotation_preserves_norms(self, rng):
        from treemorph_tpu.data.augmentations import random_rotation_z

        pts = rng.normal(size=(100, 3)).astype(np.float32)
        offs = rng.normal(size=(100, 3)).astype(np.float32)
        p2, o2 = random_rotation_z()(pts, offs, np.random.default_rng(2))
        np.testing.assert_allclose(
            np.linalg.norm(p2, axis=1), np.linalg.norm(pts, axis=1),
            rtol=1e-5,
        )
        np.testing.assert_allclose(p2[:, 2], pts[:, 2], atol=1e-6)
