"""Golden tests for the pencil-layout submanifold conv engine
(ops/pencil.py) against the gather engine it must match exactly."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from treemorph_tpu.ops.pencil import (
    CELLS,
    build_pencils,
    from_pencil,
    pencil_conv_apply,
    to_pencil,
)
from treemorph_tpu.ops.sparse import (
    build_rulebook,
    dedup_sort_perm,
    subm_conv_apply,
)


def lex_sorted_voxels(rng, n_active=120, pad_to=160, grid=10, batches=2,
                      zmax=40):
    """Unique voxel coords in dedup_sort_perm (lex) order, padded last —
    the order every real level arrives in."""
    seen = set()
    while len(seen) < n_active:
        b = int(rng.integers(0, batches))
        x, y = (int(v) for v in rng.integers(0, grid, 2))
        z = int(rng.integers(0, zmax))
        seen.add((b, x, y, z))
    coords = np.zeros((pad_to, 4), np.int32)
    coords[:n_active] = sorted(seen)
    valid = np.zeros(pad_to, bool)
    valid[:n_active] = True
    # canonical engine order
    perm = np.asarray(
        dedup_sort_perm(jnp.asarray(coords), jnp.asarray(valid))
    )
    return coords[perm], valid[perm]


class TestStructure:
    def test_roundtrip(self, rng):
        coords, valid = lex_sorted_voxels(rng)
        ps = build_pencils(jnp.asarray(coords), jnp.asarray(valid), cap=480)
        feats = rng.normal(size=(len(coords), 8)).astype(np.float32)
        feats[~valid] = 0.0
        core = to_pencil(jnp.asarray(feats), ps)
        back = np.asarray(from_pencil(core, ps))
        np.testing.assert_array_equal(back[valid], feats[valid])

    def test_sibling_flags(self, rng):
        coords, valid = lex_sorted_voxels(rng)
        ps = build_pencils(jnp.asarray(coords), jnp.asarray(valid), cap=480)
        keys = np.asarray(ps.keys)
        hasp = np.asarray(ps.has_prev)
        hasn = np.asarray(ps.has_next)
        nump = int(ps.num_pencils)
        pset = {tuple(k) for k in keys[:nump]}
        for p in range(nump):
            b, x, y, t = keys[p]
            assert hasp[p] == (((b, x, y, t - 1) in pset)), p
            assert hasn[p] == (((b, x, y, t + 1) in pset)), p
            if hasp[p]:
                assert tuple(keys[p - 1]) == (b, x, y, t - 1)
            if hasn[p]:
                assert tuple(keys[p + 1]) == (b, x, y, t + 1)

    def test_overflow_counted(self, rng):
        coords, valid = lex_sorted_voxels(rng, n_active=120)
        ps_big = build_pencils(
            jnp.asarray(coords), jnp.asarray(valid), cap=480
        )
        nump = int(ps_big.num_pencils)
        assert int(ps_big.overflow) == 0
        cap = max(nump // 2, 1)
        ps = build_pencils(jnp.asarray(coords), jnp.asarray(valid), cap=cap)
        assert int(ps.overflow) > 0
        # dropped voxels hit the dump slot; kept ones still roundtrip
        slot = np.asarray(ps.slot)
        dropped = slot == cap * CELLS
        assert dropped.sum() == int(ps.overflow) + (~valid).sum()


class TestPencilConv:
    @pytest.mark.parametrize("cin,cout,cells", [(8, 8, 4), (8, 16, 4),
                                                (8, 8, 16), (8, 8, 2)])
    def test_matches_gather_engine(self, rng, cin, cout, cells):
        coords, valid = lex_sorted_voxels(rng)
        cj, vj = jnp.asarray(coords), jnp.asarray(valid)
        feats = rng.normal(size=(len(coords), cin)).astype(np.float32)
        w = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1

        rb = build_rulebook(cj, vj, 3, verify_coords=True)
        want = np.asarray(
            subm_conv_apply(jnp.asarray(feats), jnp.asarray(w), rb, vj)
        )

        ps = build_pencils(cj, vj, cap=480, cells=cells,
                           verify_coords=True)
        core = to_pencil(jnp.asarray(feats) * vj[:, None], ps)
        out = pencil_conv_apply(core, jnp.asarray(w), ps)
        got = np.asarray(from_pencil(out, ps)) * valid[:, None]
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_vjp_matches_gather_engine(self, rng):
        cin = cout = 8
        coords, valid = lex_sorted_voxels(rng, n_active=80, pad_to=96)
        cj, vj = jnp.asarray(coords), jnp.asarray(valid)
        feats = jnp.asarray(
            rng.normal(size=(len(coords), cin)).astype(np.float32)
        )
        w = jnp.asarray(
            rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1
        )
        cot = jnp.asarray(
            rng.normal(size=(len(coords), cout)).astype(np.float32)
        )

        rb = build_rulebook(cj, vj, 3, verify_coords=True)
        ps = build_pencils(cj, vj, cap=288, verify_coords=True)

        def loss_gather(f, weights):
            return jnp.sum(subm_conv_apply(f, weights, rb, vj) * cot)

        def loss_pencil(f, weights):
            core = to_pencil(f * vj[:, None], ps)
            out = pencil_conv_apply(core, weights, ps)
            return jnp.sum(from_pencil(out, ps) * vj[:, None] * cot)

        gf_ref, gw_ref = jax.grad(loss_gather, argnums=(0, 1))(feats, w)
        gf, gw = jax.grad(loss_pencil, argnums=(0, 1))(feats, w)
        np.testing.assert_allclose(
            np.asarray(gf) * valid[:, None],
            np.asarray(gf_ref) * valid[:, None],
            rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(gw), np.asarray(gw_ref), rtol=2e-4, atol=2e-4
        )

    def test_bfloat16_close_to_f32(self, rng):
        cin = cout = 8
        coords, valid = lex_sorted_voxels(rng)
        cj, vj = jnp.asarray(coords), jnp.asarray(valid)
        feats = rng.normal(size=(len(coords), cin)).astype(np.float32)
        w = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1
        ps = build_pencils(cj, vj, cap=480)
        core = to_pencil(jnp.asarray(feats) * vj[:, None], ps)
        f32 = np.asarray(pencil_conv_apply(core, jnp.asarray(w), ps))
        bf16 = np.asarray(
            pencil_conv_apply(
                core, jnp.asarray(w), ps, compute_dtype=jnp.bfloat16
            )
        )
        scale = np.abs(f32).max()
        np.testing.assert_allclose(bf16, f32, atol=0.05 * scale)


class TestModelIntegration:
    def test_treelearn_pencil_engine_forward(self, rng):
        from treemorph_tpu.models.treelearn import TreeLearn

        n = 512
        pts = rng.normal(size=(n, 3)).astype(np.float32) * 2.0
        feats = rng.normal(size=(n, 4)).astype(np.float32)
        batch_ids = np.zeros(n, np.int32)
        valid = np.ones(n, bool)
        valid[-40:] = False

        kwargs = dict(
            channels=8, num_blocks=2, dim_feat=4, voxel_size=0.3,
            batch_size=1, pencil_divisor=1,
        )
        args = (
            jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(batch_ids),
            jnp.asarray(valid),
        )
        mg = TreeLearn(engine="gather", **kwargs)
        vars_g = mg.init(jax.random.PRNGKey(0), *args, train=False)
        out_g = mg.apply(vars_g, *args, train=False)

        mp = TreeLearn(engine="pencil", **kwargs)
        vars_p = mp.init(jax.random.PRNGKey(0), *args, train=False)
        # param trees must be engine-interchangeable
        sg = jax.tree_util.tree_structure(vars_g)
        sp = jax.tree_util.tree_structure(vars_p)
        assert sg == sp
        out_p = mp.apply(vars_g, *args, train=False)

        np.testing.assert_allclose(
            np.asarray(out_p["offset_predictions"]),
            np.asarray(out_g["offset_predictions"]),
            rtol=2e-4, atol=2e-4,
        )
        assert int(out_p["dropped_points"]) == 0
        # this gaussian blob coarsens <2x, so the shared downsample cap
        # drops voxels — identically in both engines (now visible thanks
        # to the counters); the pencil engine itself must add none
        assert int(out_p["dropped_voxels"]) == int(out_g["dropped_voxels"])
        np.testing.assert_allclose(
            np.asarray(out_p["semantic_prediction_logits"]),
            np.asarray(out_g["semantic_prediction_logits"]),
            rtol=2e-4, atol=2e-4,
        )

    def test_overflow_surfaced_in_outputs(self, rng):
        """Tiny static caps must be REPORTED, not silently dropped
        (VERDICT r2 weak-item 4)."""
        from treemorph_tpu.models.treelearn import TreeLearn

        n = 512
        pts = rng.normal(size=(n, 3)).astype(np.float32) * 2.0
        feats = rng.normal(size=(n, 4)).astype(np.float32)
        args = (
            jnp.asarray(pts), jnp.asarray(feats),
            jnp.zeros(n, jnp.int32), jnp.ones(n, bool),
        )
        kwargs = dict(
            channels=8, num_blocks=2, dim_feat=4, voxel_size=0.3,
            batch_size=1,
        )
        # voxel capacity far below the real voxel count -> dropped points
        m = TreeLearn(voxel_capacity_divisor=128, **kwargs)
        out = m.apply(m.init(jax.random.PRNGKey(0), *args), *args)
        assert int(out["dropped_points"]) > 0

        # pencil caps far below the pencil count -> dropped voxels
        m = TreeLearn(engine="pencil", pencil_divisor=24, **kwargs)
        out = m.apply(m.init(jax.random.PRNGKey(0), *args), *args)
        assert int(out["dropped_voxels"]) > 0
