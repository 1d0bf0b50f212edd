"""Dense-brick conv engine vs the gather engine (must match exactly)."""

import jax.numpy as jnp
import numpy as np
import pytest

from treemorph_tpu.ops.bricks import (
    brick_subm_conv,
    brickize,
    from_dense,
    to_dense,
)
from treemorph_tpu.ops.sparse import build_rulebook, subm_conv_apply

from tests.test_sparse import random_voxels


class TestBrickize:
    def test_assignment_consistency(self, rng):
        coords, valid = random_voxels(rng, n_active=120, pad_to=160, grid=16)
        bs = brickize(jnp.asarray(coords), jnp.asarray(valid), cap=160)
        bid = np.asarray(bs.brick_id)
        cell = np.asarray(bs.cell)
        bcoords = np.asarray(bs.brick_coords)
        for i in range(120):
            assert bid[i] < int(bs.num_bricks)
            b = bcoords[bid[i]]
            assert b[0] == coords[i][0]
            np.testing.assert_array_equal(b[1:] * 4 + cell[i], coords[i][1:])

    def test_neighbor_bricks(self, rng):
        coords, valid = random_voxels(rng, n_active=120, pad_to=160, grid=16)
        bs = brickize(jnp.asarray(coords), jnp.asarray(valid), cap=160)
        nb = int(bs.num_bricks)
        bcoords = np.asarray(bs.brick_coords)[:nb]
        table = {tuple(bcoords[j]): j for j in range(nb)}
        nbrs = np.asarray(bs.brick_nbrs)
        from treemorph_tpu.ops.bricks import _DIRS

        cap = bs.brick_coords.shape[0]
        for j in range(nb):
            for k, d in enumerate(_DIRS):
                key = (
                    bcoords[j][0],
                    bcoords[j][1] + d[0],
                    bcoords[j][2] + d[1],
                    bcoords[j][3] + d[2],
                )
                assert nbrs[j, k] == table.get(key, cap)

    def test_dense_roundtrip(self, rng):
        coords, valid = random_voxels(rng, n_active=100, pad_to=128, grid=12)
        feats = rng.normal(size=(128, 8)).astype(np.float32)
        feats[~valid] = 0
        bs = brickize(jnp.asarray(coords), jnp.asarray(valid), cap=128)
        dense = to_dense(jnp.asarray(feats), bs)
        back = np.asarray(from_dense(dense, bs))
        np.testing.assert_allclose(back[valid], feats[valid], atol=1e-6)


class TestBrickConv:
    @pytest.mark.parametrize("grid", [8, 16])
    def test_matches_gather_engine(self, rng, grid):
        coords, valid = random_voxels(
            rng, n_active=150, pad_to=192, grid=grid
        )
        cin, cout = 8, 16
        feats = rng.normal(size=(192, cin)).astype(np.float32)
        feats[~valid] = 0
        weights = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.2

        rb = build_rulebook(jnp.asarray(coords), jnp.asarray(valid), 3)
        ref = np.asarray(
            subm_conv_apply(
                jnp.asarray(feats), jnp.asarray(weights), rb,
                jnp.asarray(valid)
            )
        )

        bs = brickize(jnp.asarray(coords), jnp.asarray(valid), cap=192)
        active = to_dense(
            jnp.asarray(valid.astype(np.float32))[:, None], bs
        )
        dense = to_dense(jnp.asarray(feats), bs)
        out = brick_subm_conv(dense, jnp.asarray(weights), bs, active)
        flat = np.asarray(from_dense(out, bs))

        np.testing.assert_allclose(flat[valid], ref[valid], atol=2e-4)

    @pytest.mark.parametrize("grid", [8, 16])
    def test_xslab_matches_conv_impl(self, rng, grid):
        """The banded x-slab matmul schedule must equal the lax.conv
        schedule (and hence the gather engine) to float tolerance."""
        coords, valid = random_voxels(
            rng, n_active=150, pad_to=192, grid=grid
        )
        cin, cout = 8, 16
        feats = rng.normal(size=(192, cin)).astype(np.float32)
        feats[~valid] = 0
        weights = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.2

        bs = brickize(jnp.asarray(coords), jnp.asarray(valid), cap=192)
        active = to_dense(
            jnp.asarray(valid.astype(np.float32))[:, None], bs
        )
        dense = to_dense(jnp.asarray(feats), bs)
        ref = np.asarray(
            brick_subm_conv(dense, jnp.asarray(weights), bs, active)
        )
        got = np.asarray(
            brick_subm_conv(
                dense, jnp.asarray(weights), bs, active, impl="xslab"
            )
        )
        np.testing.assert_allclose(got, ref, atol=2e-4)

    def test_xslab_gradients_match_conv_impl(self, rng):
        import jax

        coords, valid = random_voxels(rng, n_active=120, pad_to=160, grid=12)
        cin, cout = 8, 8
        feats = rng.normal(size=(160, cin)).astype(np.float32)
        feats[~valid] = 0
        weights = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.2
        bs = brickize(jnp.asarray(coords), jnp.asarray(valid), cap=160)
        active = to_dense(
            jnp.asarray(valid.astype(np.float32))[:, None], bs
        )
        dense = to_dense(jnp.asarray(feats), bs)
        cot = jnp.asarray(
            rng.normal(size=np.asarray(
                brick_subm_conv(dense, jnp.asarray(weights), bs, active)
            ).shape).astype(np.float32)
        )

        def loss(impl, d, w):
            return jnp.vdot(
                brick_subm_conv(d, w, bs, active, impl=impl), cot
            )

        gd_c, gw_c = jax.grad(loss, argnums=(1, 2))(
            "conv", dense, jnp.asarray(weights)
        )
        gd_x, gw_x = jax.grad(loss, argnums=(1, 2))(
            "xslab", dense, jnp.asarray(weights)
        )
        np.testing.assert_allclose(np.asarray(gd_x), np.asarray(gd_c),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw_x), np.asarray(gw_c),
                                   rtol=1e-4, atol=1e-4)

    def test_treelearn_brick_xslab_engine_forward(self, rng):
        import jax

        from treemorph_tpu.models import TreeLearn

        n = 512
        pts = rng.uniform(0, 2, (n, 3)).astype(np.float32)
        feats = rng.normal(size=(n, 4)).astype(np.float32)
        batch_ids = np.zeros(n, np.int32)
        valid = np.arange(n) < 450
        kw = dict(
            channels=8, num_blocks=2, dim_feat=4, voxel_size=0.05,
            batch_size=1, engine="brick", brick_divisor=1,
        )
        args = (
            jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(batch_ids),
            jnp.asarray(valid),
        )
        model_c = TreeLearn(**kw)
        model_x = TreeLearn(**kw, brick_impl="xslab")
        variables = jax.jit(
            lambda r, c, f, b, v: model_c.init(r, c, f, b, v, train=False)
        )(jax.random.key(0), *args)
        out_c = jax.jit(
            lambda p, c, f, b, v: model_c.apply(p, c, f, b, v, train=False)
        )(variables, *args)
        out_x = jax.jit(
            lambda p, c, f, b, v: model_x.apply(p, c, f, b, v, train=False)
        )(variables, *args)
        np.testing.assert_allclose(
            np.asarray(out_x["offset_predictions"]),
            np.asarray(out_c["offset_predictions"]),
            rtol=1e-3, atol=1e-4,
        )

    def test_treelearn_brick_engine_forward(self, rng):
        import jax

        from treemorph_tpu.models import TreeLearn

        n = 1024
        pts = rng.uniform(0, 2, (n, 3)).astype(np.float32)
        feats = rng.normal(size=(n, 4)).astype(np.float32)
        batch_ids = np.zeros(n, np.int32)
        valid = np.arange(n) < 900
        model = TreeLearn(
            channels=8, num_blocks=2, dim_feat=4, voxel_size=0.05,
            batch_size=1, engine="brick", brick_divisor=1,
        )
        args = (
            jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(batch_ids),
            jnp.asarray(valid),
        )
        init = jax.jit(
            lambda r, c, f, b, v: model.init(r, c, f, b, v, train=False)
        )
        variables = init(jax.random.key(0), *args)
        apply = jax.jit(
            lambda p, c, f, b, v: model.apply(p, c, f, b, v, train=False)
        )
        out = apply(variables, *args)
        off = np.asarray(out["offset_predictions"])
        assert np.isfinite(off).all()
        np.testing.assert_array_equal(off[900:], 0.0)


class TestBrickConvGradient:
    def test_custom_vjp_matches_xla_conv_grad(self, rng):
        """The Pallas kernel's VJP must equal autodiff through the
        equivalent XLA dense conv on the same halo'd bricks."""
        import jax

        from treemorph_tpu.ops.brick_conv import brick_conv

        b, cin, cout = 5, 8, 16
        padded = jnp.asarray(
            rng.normal(size=(b, 6, 6, 6, cin)).astype(np.float32)
        )
        weights = jnp.asarray(
            rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.2
        )
        cot = jnp.asarray(
            rng.normal(size=(b, 4, 4, 4, cout)).astype(np.float32)
        )

        def loss_pallas(p, w):
            return jnp.vdot(brick_conv(p, w), cot)

        def loss_xla(p, w):
            out = jax.lax.conv_general_dilated(
                p, w.reshape(3, 3, 3, cin, cout),
                window_strides=(1, 1, 1), padding="VALID",
                dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
                preferred_element_type=jnp.float32,
            )
            return jnp.vdot(out, cot)

        gp_p, gw_p = jax.grad(loss_pallas, argnums=(0, 1))(padded, weights)
        gp_x, gw_x = jax.grad(loss_xla, argnums=(0, 1))(padded, weights)
        np.testing.assert_allclose(np.asarray(gp_p), np.asarray(gp_x),
                                   rtol=1e-4, atol=1e-4)
        np.testing.assert_allclose(np.asarray(gw_p), np.asarray(gw_x),
                                   rtol=1e-4, atol=1e-4)
