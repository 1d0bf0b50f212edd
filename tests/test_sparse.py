"""Golden tests for the submanifold sparse conv engine (spconv replacement)."""

import jax.numpy as jnp
import numpy as np
import pytest

from treemorph_tpu.ops.sparse import (
    build_downsample,
    build_rulebook,
    build_table,
    down_conv_apply,
    inverse_conv_apply,
    kernel_offsets,
    lookup,
    subm_conv_apply,
)


def random_voxels(rng, n_active=80, pad_to=128, grid=8, batches=2):
    """Unique random voxel coords (b, x, y, z), padded."""
    seen = set()
    rows = []
    while len(rows) < n_active:
        b = int(rng.integers(0, batches))
        xyz = tuple(int(v) for v in rng.integers(0, grid, 3))
        if (b, *xyz) not in seen:
            seen.add((b, *xyz))
            rows.append((b, *xyz))
    coords = np.zeros((pad_to, 4), np.int32)
    coords[:n_active] = rows
    valid = np.zeros(pad_to, bool)
    valid[:n_active] = True
    return coords, valid


class TestLookup:
    def test_finds_all_voxels(self, rng):
        coords, valid = random_voxels(rng)
        table = build_table(jnp.asarray(coords), jnp.asarray(valid))
        found = np.asarray(lookup(table, jnp.asarray(coords[:80])))
        np.testing.assert_array_equal(found, np.arange(80))

    def test_misses_return_minus_one(self, rng):
        coords, valid = random_voxels(rng, grid=8)
        table = build_table(jnp.asarray(coords), jnp.asarray(valid))
        absent = np.array([[0, 100, 100, 100], [1, 50, 50, 50]], np.int32)
        found = np.asarray(lookup(table, jnp.asarray(absent)))
        np.testing.assert_array_equal(found, [-1, -1])

    def test_padding_not_found(self, rng):
        coords, valid = random_voxels(rng, n_active=10, pad_to=32)
        table = build_table(jnp.asarray(coords), jnp.asarray(valid))
        # padded rows are all zeros; query (0,0,0,0) must match only if an
        # ACTIVE voxel has that coordinate
        q = np.zeros((1, 4), np.int32)
        found = int(np.asarray(lookup(table, jnp.asarray(q)))[0])
        active_has_origin = any(
            (coords[i] == 0).all() for i in range(10)
        )
        if not active_has_origin:
            assert found == -1


class TestRulebook:
    def test_matches_dict_oracle(self, rng):
        coords, valid = random_voxels(rng)
        rb = np.asarray(
            build_rulebook(jnp.asarray(coords), jnp.asarray(valid), 3)
        )
        offs = np.asarray(kernel_offsets(3))
        table = {tuple(coords[i]): i for i in range(80)}
        m = len(coords)
        for i in range(80):
            for k, off in enumerate(offs):
                target = (
                    coords[i][0],
                    coords[i][1] + off[0],
                    coords[i][2] + off[1],
                    coords[i][3] + off[2],
                )
                expected = table.get(target, m)
                assert rb[i, k] == expected, (i, k, target)
        # padding rows are all-missing
        assert np.all(rb[80:] == m)

    def test_center_offset_is_self(self, rng):
        coords, valid = random_voxels(rng)
        rb = np.asarray(
            build_rulebook(jnp.asarray(coords), jnp.asarray(valid), 3)
        )
        center = 13  # (0,0,0) in a 3x3x3 kernel
        np.testing.assert_array_equal(rb[:80, center], np.arange(80))


class TestSubmConv:
    def test_matches_dense_conv_oracle(self, rng):
        coords, valid = random_voxels(rng, n_active=60, pad_to=100, grid=6,
                                      batches=1)
        cin, cout = 4, 5
        feats = rng.normal(size=(100, cin)).astype(np.float32)
        feats[~valid] = 0
        weights = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1

        rb = build_rulebook(jnp.asarray(coords), jnp.asarray(valid), 3)
        out = np.asarray(
            subm_conv_apply(
                jnp.asarray(feats), jnp.asarray(weights), rb,
                jnp.asarray(valid)
            )
        )

        offs = np.asarray(kernel_offsets(3))
        table = {tuple(coords[i]): i for i in range(60)}
        for i in range(60):
            acc = np.zeros(cout, np.float32)
            for k, off in enumerate(offs):
                key = (
                    coords[i][0],
                    coords[i][1] + off[0],
                    coords[i][2] + off[1],
                    coords[i][3] + off[2],
                )
                j = table.get(key)
                if j is not None:
                    acc += feats[j] @ weights[k]
            np.testing.assert_allclose(out[i], acc, atol=1e-4)
        np.testing.assert_array_equal(out[60:], 0.0)


class TestDownsample:
    def test_coarse_set_is_unique_halved(self, rng):
        coords, valid = random_voxels(rng)
        ds = build_downsample(jnp.asarray(coords), jnp.asarray(valid))
        nc = int(ds.num_coarse)
        expected = {
            (coords[i][0], coords[i][1] // 2, coords[i][2] // 2,
             coords[i][3] // 2)
            for i in range(80)
        }
        assert nc == len(expected)
        got = {
            tuple(np.asarray(ds.coarse_coords)[j]) for j in range(nc)
        }
        assert got == expected

    def test_parent_consistency(self, rng):
        coords, valid = random_voxels(rng)
        ds = build_downsample(jnp.asarray(coords), jnp.asarray(valid))
        parent = np.asarray(ds.parent)
        cc = np.asarray(ds.coarse_coords)
        for i in range(80):
            p = parent[i]
            assert cc[p][0] == coords[i][0]
            assert cc[p][1] == coords[i][1] // 2
            assert cc[p][2] == coords[i][2] // 2
            assert cc[p][3] == coords[i][3] // 2

    def test_down_then_inverse_roundtrip_shapes(self, rng):
        coords, valid = random_voxels(rng, n_active=50, pad_to=64)
        cin, cmid = 3, 6
        feats = rng.normal(size=(64, cin)).astype(np.float32)
        w_down = rng.normal(size=(8, cin, cmid)).astype(np.float32)
        w_up = rng.normal(size=(8, cmid, cin)).astype(np.float32)

        ds = build_downsample(jnp.asarray(coords), jnp.asarray(valid))
        coarse = down_conv_apply(
            jnp.asarray(feats), jnp.asarray(w_down), ds, jnp.asarray(valid)
        )
        assert coarse.shape == (64, cmid)
        # oracle for one coarse voxel
        parent = np.asarray(ds.parent)
        octant = np.asarray(ds.child_offset)
        j = parent[0]
        children = [i for i in range(50) if parent[i] == j]
        acc = np.zeros(cmid, np.float32)
        for i in children:
            acc += feats[i] @ w_down[octant[i]]
        np.testing.assert_allclose(np.asarray(coarse)[j], acc, atol=1e-4)

        fine = inverse_conv_apply(
            coarse, jnp.asarray(w_up), ds, jnp.asarray(valid)
        )
        assert fine.shape == (64, cin)
        expected0 = np.asarray(coarse)[j] @ w_up[octant[0]]
        np.testing.assert_allclose(np.asarray(fine)[0], expected0, atol=1e-4)


class TestBf16Conv:
    def test_bfloat16_close_to_f32(self, rng):
        import jax.numpy as jnp

        coords, valid = random_voxels(rng, n_active=80, pad_to=128)
        cin, cout = 8, 8
        feats = rng.normal(size=(128, cin)).astype(np.float32)
        feats[~valid] = 0
        weights = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.2
        rb = build_rulebook(jnp.asarray(coords), jnp.asarray(valid), 3)
        ref = np.asarray(
            subm_conv_apply(
                jnp.asarray(feats), jnp.asarray(weights), rb,
                jnp.asarray(valid)
            )
        )
        low = np.asarray(
            subm_conv_apply(
                jnp.asarray(feats), jnp.asarray(weights), rb,
                jnp.asarray(valid), compute_dtype=jnp.bfloat16,
            )
        )
        assert low.dtype == np.float32  # f32 accumulation
        scale = np.abs(ref).max()
        np.testing.assert_allclose(low, ref, atol=0.05 * scale)
