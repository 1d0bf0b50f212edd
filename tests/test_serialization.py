import jax.numpy as jnp
import numpy as np

from treemorph_tpu.ops.serialization import (
    ORDERS,
    decode,
    encode,
    hilbert_decode_np,
    hilbert_encode,
    serialized_order,
    z_order_decode_np,
    z_order_encode,
)


def _to_u64(hi, lo):
    return (np.asarray(hi, np.uint64) << np.uint64(32)) | np.asarray(
        lo, np.uint64
    )


class TestZOrder:
    def test_known_small_codes(self):
        # bit i of x -> 3i+2, y -> 3i+1, z -> 3i
        grid = jnp.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [0, 0, 1], [1, 1, 1]])
        hi, lo = z_order_encode(grid, depth=4)
        np.testing.assert_array_equal(np.asarray(lo), [0, 4, 2, 1, 7])
        np.testing.assert_array_equal(np.asarray(hi), 0)

    def test_roundtrip(self, rng):
        grid = rng.integers(0, 2**16, size=(500, 3))
        hi, lo = z_order_encode(jnp.asarray(grid, jnp.int32), depth=16)
        decoded = z_order_decode_np(np.asarray(hi), np.asarray(lo), depth=16)
        np.testing.assert_array_equal(decoded, grid)

    def test_bijective_on_grid(self):
        g = np.stack(
            np.meshgrid(*[np.arange(8)] * 3, indexing="ij"), -1
        ).reshape(-1, 3)
        hi, lo = z_order_encode(jnp.asarray(g, jnp.int32), depth=4)
        codes = _to_u64(hi, lo)
        assert len(np.unique(codes)) == len(g)
        assert codes.max() == len(g) - 1  # dense: covers [0, 8^3)


class TestHilbert:
    def test_roundtrip(self, rng):
        grid = rng.integers(0, 2**16, size=(500, 3))
        hi, lo = hilbert_encode(jnp.asarray(grid, jnp.int32), depth=16)
        decoded = hilbert_decode_np(np.asarray(hi), np.asarray(lo), depth=16)
        np.testing.assert_array_equal(decoded, grid)

    def test_bijective_and_dense(self):
        g = np.stack(
            np.meshgrid(*[np.arange(8)] * 3, indexing="ij"), -1
        ).reshape(-1, 3)
        hi, lo = hilbert_encode(jnp.asarray(g, jnp.int32), depth=3)
        codes = _to_u64(hi, lo)
        assert len(np.unique(codes)) == len(g)
        assert codes.max() == len(g) - 1

    def test_curve_continuity(self):
        # Consecutive codes along a Hilbert curve differ by exactly one
        # grid step — the defining property, and one z-order lacks.
        n_bits = 4
        g = np.stack(
            np.meshgrid(*[np.arange(2**n_bits)] * 3, indexing="ij"), -1
        ).reshape(-1, 3)
        hi, lo = hilbert_encode(jnp.asarray(g, jnp.int32), depth=n_bits)
        codes = _to_u64(hi, lo)
        order = np.argsort(codes)
        path = g[order]
        steps = np.abs(np.diff(path, axis=0)).sum(axis=1)
        assert np.all(steps == 1)


class TestEncodeDispatch:
    def test_trans_swaps_xy(self, rng):
        grid = jnp.asarray(rng.integers(0, 1024, size=(100, 3)), jnp.int32)
        _, hi_a, lo_a = encode(grid, depth=10, order="z-trans")
        swapped = grid[:, jnp.array([1, 0, 2])]
        _, hi_b, lo_b = encode(swapped, depth=10, order="z")
        np.testing.assert_array_equal(np.asarray(lo_a), np.asarray(lo_b))
        np.testing.assert_array_equal(np.asarray(hi_a), np.asarray(hi_b))

    def test_batch_is_primary_sort_key(self, rng):
        grid = jnp.asarray(rng.integers(0, 64, size=(200, 3)), jnp.int32)
        batch = jnp.asarray(rng.integers(0, 4, size=200), jnp.int32)
        perm, inverse = serialized_order(grid, batch, depth=6, order="hilbert")
        perm = np.asarray(perm)
        sorted_batch = np.asarray(batch)[perm]
        assert np.all(np.diff(sorted_batch) >= 0)
        np.testing.assert_array_equal(
            perm[np.asarray(inverse)], np.arange(200)
        )

    def test_decode_roundtrips_every_order(self, rng):
        # Parity surface of reference serialization/default.py:26-38: the
        # dispatch-level decode inverts encode for all four curve orders,
        # including the x/y un-swap of the -trans variants.
        grid = rng.integers(0, 2**10, size=(200, 3))
        batch = rng.integers(0, 3, size=200)
        for order in ORDERS:
            b, hi, lo = encode(
                jnp.asarray(grid, jnp.int32),
                jnp.asarray(batch, jnp.int32),
                depth=10,
                order=order,
            )
            dec_grid, dec_batch = decode(
                np.asarray(b), np.asarray(hi), np.asarray(lo),
                depth=10, order=order,
            )
            np.testing.assert_array_equal(dec_grid, grid)
            np.testing.assert_array_equal(dec_batch, batch)

    def test_order_matches_packed_int64_reference_semantics(self, rng):
        # Independently pack batch<<3*depth | z-code into int64 on host and
        # argsort — must agree with the lexsort-based device ordering.
        depth = 10
        grid_np = rng.integers(0, 2**depth, size=(300, 3))
        batch_np = rng.integers(0, 5, size=300)
        grid = jnp.asarray(grid_np, jnp.int32)
        batch = jnp.asarray(batch_np, jnp.int32)

        hi, lo = z_order_encode(grid, depth=depth)
        code = _to_u64(hi, lo).astype(np.int64)
        packed = (batch_np.astype(np.int64) << (3 * depth)) | code
        expected = np.argsort(packed, kind="stable")

        perm, _ = serialized_order(grid, batch, depth=depth, order="z")
        np.testing.assert_array_equal(np.asarray(perm), expected)
