"""Dense-tile conv engine oracles against the gather engine."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from treemorph_tpu.ops.sparse import build_rulebook, subm_conv_apply
from treemorph_tpu.ops.tiles import (
    build_tiles,
    from_dense,
    halo_expand,
    tile_subm_conv,
    to_dense,
)


def _sparse_coords(rng, m, batches=2, span=40, pad=0):
    """Random unique (b, x, y, z) coords, lex-sorted with padding last
    (the invariant every voxel level satisfies)."""
    seen = set()
    rows = []
    while len(rows) < m:
        b = int(rng.integers(0, batches))
        xyz = tuple(int(v) for v in rng.integers(0, span, 3))
        if (b, *xyz) not in seen:
            seen.add((b, *xyz))
            rows.append((b, *xyz))
    rows.sort()
    coords = np.array(rows, np.int32)
    if pad:
        coords = np.concatenate([coords, np.zeros((pad, 4), np.int32)])
    valid = np.arange(m + pad) < m
    return jnp.asarray(coords), jnp.asarray(valid)


class TestBuildTiles:
    def test_roundtrip_dense(self, rng):
        coords, valid = _sparse_coords(rng, 300, pad=50)
        ts = build_tiles(coords, valid, cap=256, tile=8)
        assert int(ts.overflow) == 0
        feats = jnp.asarray(
            rng.normal(size=(coords.shape[0], 16)), jnp.float32
        )
        dense = to_dense(feats * valid[:, None], ts, 8)
        back = from_dense(dense, ts, valid)
        np.testing.assert_allclose(
            np.asarray(back[valid]), np.asarray((feats * valid[:, None])[valid])
        )
        # zero tile row stays zero; active mask matches valid count
        assert float(jnp.abs(dense[-1]).max()) == 0.0
        assert int(ts.active.sum()) == 300

    def test_neighbor_table_matches_coords(self, rng):
        coords, valid = _sparse_coords(rng, 200, span=24)
        cap = 128
        ts = build_tiles(coords, valid, cap=cap, tile=4)
        tiles = np.asarray(ts.tile_coords)
        tvalid = np.asarray(ts.tile_valid)
        nbr = np.asarray(ts.nbr)
        lut = {
            tuple(tiles[i]): i for i in range(cap) if tvalid[i]
        }
        offs = [
            (dx, dy, dz)
            for dx in (-1, 0, 1)
            for dy in (-1, 0, 1)
            for dz in (-1, 0, 1)
        ]
        for i in range(cap):
            if not tvalid[i]:
                continue
            b, tx, ty, tz = tiles[i]
            for o, (dx, dy, dz) in enumerate(offs):
                want = lut.get((b, tx + dx, ty + dy, tz + dz), cap + 1)
                assert nbr[i, o] == want, (i, o)

    def test_overflow_counted_and_dumped(self, rng):
        coords, valid = _sparse_coords(rng, 200, span=40)
        ts = build_tiles(coords, valid, cap=4, tile=4)
        assert int(ts.overflow) > 0
        feats = jnp.ones((coords.shape[0], 8), jnp.float32)
        dense = to_dense(feats, ts, 4)
        back = from_dense(dense, ts, valid)
        kept = int((np.asarray(back).sum(1) > 0).sum())
        assert kept == 200 - int(ts.overflow)


class TestTileConvOracle:
    @pytest.mark.parametrize("tile", [4, 8])
    @pytest.mark.parametrize("impl", ["conv", "slice"])
    def test_matches_gather_engine(self, rng, tile, impl):
        coords, valid = _sparse_coords(rng, 500, span=30, pad=60)
        m = coords.shape[0]
        cin, cout = 16, 24
        feats = jnp.asarray(rng.normal(size=(m, cin)), jnp.float32)
        feats = feats * valid[:, None]
        w = jnp.asarray(rng.normal(size=(27, cin, cout)) * 0.2, jnp.float32)

        rb = build_rulebook(coords, valid, 3, verify_coords=True)
        want = subm_conv_apply(feats, w, rb, valid)

        ts = build_tiles(coords, valid, cap=512, tile=tile)
        assert int(ts.overflow) == 0
        dense = to_dense(feats, ts, tile)
        out = tile_subm_conv(dense, w, ts, impl=impl)
        got = from_dense(out, ts, valid)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), atol=2e-4
        )

    def test_batch_boundaries_do_not_leak(self, rng):
        # two batch elements sharing spatial coords must not see each other
        base = np.array(
            [[0, 1, 1, 1], [0, 1, 1, 2], [1, 1, 1, 1], [1, 1, 1, 3]],
            np.int32,
        )
        coords = jnp.asarray(base)
        valid = jnp.ones(4, bool)
        feats = jnp.eye(4, dtype=jnp.float32)
        w = jnp.zeros((27, 4, 4), jnp.float32).at[:].set(
            jnp.eye(4)[None]
        )
        ts = build_tiles(coords, valid, cap=8, tile=4)
        dense = to_dense(feats, ts, 4)
        out = from_dense(tile_subm_conv(dense, w, ts), ts, valid)
        # row 0 must sum feats of rows {0, 1} only (same batch, adjacent z)
        np.testing.assert_allclose(
            np.asarray(out[0]), [1, 1, 0, 0], atol=1e-6
        )
        np.testing.assert_allclose(
            np.asarray(out[2]), [0, 0, 1, 0], atol=1e-6
        )

    def test_gradients_match_gather_engine(self, rng):
        coords, valid = _sparse_coords(rng, 200, span=16, pad=30)
        m = coords.shape[0]
        cin = cout = 8
        feats = jnp.asarray(rng.normal(size=(m, cin)), jnp.float32)
        feats = feats * valid[:, None]
        w = jnp.asarray(rng.normal(size=(27, cin, cout)) * 0.2, jnp.float32)
        rb = build_rulebook(coords, valid, 3, verify_coords=True)
        ts = build_tiles(coords, valid, cap=256, tile=4)

        def loss_gather(feats, w):
            return jnp.sum(subm_conv_apply(feats, w, rb, valid) ** 2)

        def loss_tile(feats, w):
            dense = to_dense(feats, ts, 4)
            out = tile_subm_conv(dense, w, ts)
            return jnp.sum(from_dense(out, ts, valid) ** 2)

        ga = jax.grad(loss_gather, argnums=(0, 1))(feats, w)
        gt = jax.grad(loss_tile, argnums=(0, 1))(feats, w)
        np.testing.assert_allclose(
            np.asarray(gt[0]), np.asarray(ga[0]), atol=5e-4
        )
        np.testing.assert_allclose(
            np.asarray(gt[1]), np.asarray(ga[1]), atol=5e-4
        )

    def test_halo_contains_neighbor_features(self, rng):
        coords = jnp.asarray(
            [[0, 3, 2, 2], [0, 4, 2, 2]], jnp.int32
        )  # straddles the tile-4 x-boundary
        valid = jnp.ones(2, bool)
        feats = jnp.asarray([[1.0], [2.0]])
        ts = build_tiles(coords, valid, cap=8, tile=4)
        dense = to_dense(feats, ts, 4)
        halo = halo_expand(dense, ts)
        t0 = int(ts.tile_of_voxel[0])
        # voxel (4,2,2) sits at halo coord (5, 3, 3) of voxel-0's tile
        assert float(halo[t0, 5, 3, 3, 0]) == 2.0
