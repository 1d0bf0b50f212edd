"""Banded-window conv engine vs the gather engine (exact-math oracle).

The banded formulation (ops/bandconv.py::build_band_plan /
band_subm_conv_apply) must reproduce the gather engine's submanifold
conv — the reference semantics (spconv SubMConv3d,
/root/reference/Modules/TreeLearn/blocks.py:44-81) — on lex-sorted voxel
sets, and must fall back to the exact gather engine whenever the banded
window premise fails (plan.ok False).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from treemorph_tpu.ops.bandconv import (
    ALIGN,
    TILE,
    BandPlan,
    band_subm_conv_apply,
    build_band_plan,
)
from treemorph_tpu.ops.sparse import (
    build_rulebook,
    subm_conv_apply,
)

from test_zpack import brute_force_subm_conv, lex_sorted_voxels


@pytest.fixture
def rng():
    return np.random.default_rng(7)


class TestBandPlan:
    def test_plan_ok_on_lex_sorted_sets(self, rng):
        coords, valid = lex_sorted_voxels(rng, m=700, cap=768)
        cj, vj = jnp.asarray(coords), jnp.asarray(valid)
        rb = build_rulebook(cj, vj, 3, verify_coords=True)
        plan = build_band_plan(rb, vj)
        assert bool(plan.ok)

    def test_windows_or_residuals_cover_all_found_neighbors(self, rng):
        coords, valid = lex_sorted_voxels(rng, m=700, cap=768)
        cj, vj = jnp.asarray(coords), jnp.asarray(valid)
        rb = build_rulebook(cj, vj, 3, verify_coords=True)
        plan = build_band_plan(rb, vj)
        m = rb.shape[0]
        rbn = np.asarray(plan.rulebook)  # (Mp, K)
        starts = np.asarray(plan.starts).T  # (G, n_tiles) -> (n_tiles, G)
        live = np.asarray(plan.res_valid)
        rr = np.asarray(plan.res_rows)[live]
        rrb = np.asarray(plan.res_rb)[live]
        m_ = rb.shape[0]
        res = {
            (int(r), k)
            for r, rowrb in zip(rr, rrb)
            for k in np.nonzero(rowrb < m_)[0]
        }
        win = plan.wmark.shape[0]
        n_tiles = starts.shape[0]
        for t in range(n_tiles):
            rows = rbn[t * TILE : (t + 1) * TILE]  # (TILE, K)
            for gi in range(9):
                base = starts[t, gi] * ALIGN
                for dz in range(3):
                    col = rows[:, gi * 3 + dz]
                    for pos in np.nonzero(col < m)[0]:
                        j = int(col[pos])
                        in_win = base <= j < base + win
                        in_res = (
                            t * TILE + pos, gi * 3 + dz
                        ) in res
                        assert in_win != in_res  # exactly one covers it

    def test_residual_entries_consistent_with_rulebook(self, rng):
        coords, valid = lex_sorted_voxels(rng, m=700, cap=768)
        cj, vj = jnp.asarray(coords), jnp.asarray(valid)
        rb = build_rulebook(cj, vj, 3, verify_coords=True)
        plan = build_band_plan(rb, vj)
        rbn = np.asarray(rb)
        m = rbn.shape[0]
        live = np.asarray(plan.res_valid)
        for r, rowrb in zip(
            np.asarray(plan.res_rows)[live],
            np.asarray(plan.res_rb)[live],
        ):
            for k, s in enumerate(rowrb):
                # each kept entry must mirror the rulebook; masked = m
                assert s == m or s == rbn[r, k]


class TestBandConv:
    @pytest.mark.parametrize(
        "k,cin,cout", [(3, 8, 8), (3, 8, 16), (5, 4, 32)]
    )
    def test_matches_gather_engine(self, rng, k, cin, cout):
        coords, valid = lex_sorted_voxels(rng, m=700, cap=768)
        cj, vj = jnp.asarray(coords), jnp.asarray(valid)
        feats = jnp.asarray(
            rng.normal(size=(len(coords), cin)).astype(np.float32)
        )
        w = jnp.asarray(
            rng.normal(size=(k**3, cin, cout)).astype(np.float32) * 0.1
        )
        rb = build_rulebook(cj, vj, k, verify_coords=True)
        want = np.asarray(subm_conv_apply(feats, w, rb, vj))
        plan = build_band_plan(rb, vj)
        assert bool(plan.ok)
        got = np.asarray(band_subm_conv_apply(feats, w, plan, vj))
        # hi/lo bf16 split: ~2^-16 relative on features
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_matches_brute_force_small(self, rng):
        coords, valid = lex_sorted_voxels(rng, m=150, cap=160, span=6)
        cj, vj = jnp.asarray(coords), jnp.asarray(valid)
        cin, cout = 3, 5
        feats = rng.normal(size=(len(coords), cin)).astype(np.float32)
        w = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1
        rb = build_rulebook(cj, vj, 3, verify_coords=True)
        plan = build_band_plan(rb, vj)
        got = np.asarray(
            band_subm_conv_apply(
                jnp.asarray(feats), jnp.asarray(w), plan, vj
            )
        )
        bf = brute_force_subm_conv(coords, valid, feats, w, 3)
        np.testing.assert_allclose(got, bf, rtol=3e-4, atol=3e-4)

    def test_fallback_when_plan_not_ok(self, rng):
        """A plan whose windows cannot cover the neighbor spread must
        route to the exact gather engine (identical output)."""
        coords, valid = lex_sorted_voxels(rng, m=700, cap=768)
        cj, vj = jnp.asarray(coords), jnp.asarray(valid)
        cin, cout = 8, 8
        feats = jnp.asarray(
            rng.normal(size=(len(coords), cin)).astype(np.float32)
        )
        w = jnp.asarray(
            rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1
        )
        rb = build_rulebook(cj, vj, 3, verify_coords=True)
        plan = build_band_plan(rb, vj)
        forced = plan._replace(ok=jnp.asarray(False))
        want = np.asarray(subm_conv_apply(feats, w, rb, vj))
        got = np.asarray(band_subm_conv_apply(feats, w, forced, vj))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_wide_band_repaired_by_residuals(self, rng):
        """A voxel set whose neighbor band exceeds the 2-TILE window
        (adjacent x-planes with wildly different row lengths) must
        produce live residual entries AND still match the gather engine
        exactly — forward and gradients."""
        rows = [(0, 1, 1, z) for z in range(1, 101)]
        rows += [(0, 1, 3, z) for z in range(1, 29)]
        rows += [(0, 2, 1, z) for z in range(1, 101)]
        rows += [(0, 2, 2, z) for z in range(1, 701)]
        rows += [(0, 2, 3, z) for z in range(1, 29)]
        m = len(rows)
        cap = -(-m // 256) * 256
        coords = np.zeros((cap, 4), np.int32)
        coords[:m] = sorted(rows)
        valid = np.zeros(cap, bool)
        valid[:m] = True
        from treemorph_tpu.ops.sparse import dedup_sort_perm

        perm = np.asarray(
            dedup_sort_perm(jnp.asarray(coords), jnp.asarray(valid))
        )
        coords, valid = coords[perm], valid[perm]
        cj, vj = jnp.asarray(coords), jnp.asarray(valid)
        cin = cout = 8
        feats = jnp.asarray(
            rng.normal(size=(cap, cin)).astype(np.float32)
        )
        w = jnp.asarray(
            rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1
        )
        rb = build_rulebook(cj, vj, 3, verify_coords=True)
        plan = build_band_plan(rb, vj)
        assert bool(plan.ok)
        assert int(jnp.sum(plan.res_valid)) > 0  # premise: band too wide
        want = np.asarray(subm_conv_apply(feats, w, rb, vj))
        got = np.asarray(band_subm_conv_apply(feats, w, plan, vj))
        np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)

        tgt = jnp.asarray(
            rng.normal(size=(cap, cout)).astype(np.float32)
        )
        gf, gw = jax.grad(
            lambda f, w: jnp.sum(
                (subm_conv_apply(f, w, rb, vj) - tgt) ** 2
            ),
            argnums=(0, 1),
        )(feats, w)
        bf_, bw = jax.grad(
            lambda f, w: jnp.sum(
                (band_subm_conv_apply(f, w, plan, vj) - tgt) ** 2
            ),
            argnums=(0, 1),
        )(feats, w)
        np.testing.assert_allclose(
            np.asarray(bf_), np.asarray(gf), rtol=3e-3, atol=3e-3
        )
        np.testing.assert_allclose(
            np.asarray(bw), np.asarray(gw), rtol=3e-3, atol=3e-3
        )

    def test_gradients_match_gather_engine(self, rng):
        coords, valid = lex_sorted_voxels(rng, m=300, cap=320)
        cj, vj = jnp.asarray(coords), jnp.asarray(valid)
        cin = cout = 6
        feats = jnp.asarray(
            rng.normal(size=(len(coords), cin)).astype(np.float32)
        )
        w = jnp.asarray(
            rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1
        )
        rb = build_rulebook(cj, vj, 3, verify_coords=True)
        plan = build_band_plan(rb, vj)
        assert bool(plan.ok)
        tgt = jnp.asarray(
            rng.normal(size=(len(coords), cout)).astype(np.float32)
        )

        def loss_gather(f, w):
            return jnp.sum((subm_conv_apply(f, w, rb, vj) - tgt) ** 2)

        def loss_band(f, w):
            return jnp.sum(
                (band_subm_conv_apply(f, w, plan, vj) - tgt) ** 2
            )

        gf, gw = jax.grad(loss_gather, argnums=(0, 1))(feats, w)
        bf_, bw = jax.grad(loss_band, argnums=(0, 1))(feats, w)
        np.testing.assert_allclose(
            np.asarray(bf_), np.asarray(gf), rtol=2e-3, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(bw), np.asarray(gw), rtol=2e-3, atol=2e-3
        )

    def test_gradients_blocked_mode_with_residuals(self, rng):
        """Fused backward kernel in BLOCKED select mode (cin=cout=32 ->
        blk=4) with a deliberately tiny window so the residual d_w /
        d_feats repair path carries real out-of-window entries."""
        coords, valid = lex_sorted_voxels(rng, m=600, cap=640)
        cj, vj = jnp.asarray(coords), jnp.asarray(valid)
        cin = cout = 32
        feats = jnp.asarray(
            rng.normal(size=(len(coords), cin)).astype(np.float32)
        )
        w = jnp.asarray(
            rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1
        )
        rb = build_rulebook(cj, vj, 3, verify_coords=True)
        plan = build_band_plan(rb, vj, window=128)
        assert bool(plan.ok)
        # the premise: this plan must actually carry residual entries
        assert int(np.asarray(plan.res_valid).sum()) > 0
        tgt = jnp.asarray(
            rng.normal(size=(len(coords), cout)).astype(np.float32)
        )

        def loss_gather(f, w):
            return jnp.sum((subm_conv_apply(f, w, rb, vj) - tgt) ** 2)

        def loss_band(f, w):
            return jnp.sum(
                (band_subm_conv_apply(f, w, plan, vj) - tgt) ** 2
            )

        gf, gw = jax.grad(loss_gather, argnums=(0, 1))(feats, w)
        bf_, bw = jax.grad(loss_band, argnums=(0, 1))(feats, w)
        scale_f = np.abs(np.asarray(gf)).max()
        scale_w = np.abs(np.asarray(gw)).max()
        np.testing.assert_allclose(
            np.asarray(bf_), np.asarray(gf),
            rtol=2e-3, atol=2e-3 * scale_f,
        )
        np.testing.assert_allclose(
            np.asarray(bw), np.asarray(gw),
            rtol=2e-3, atol=2e-3 * scale_w,
        )

    def test_gradients_rectangular_channels(self, rng):
        """cin != cout exercises the d_w lane-block unpack and the
        flipped-kernel transpose together (blk keyed on cout)."""
        coords, valid = lex_sorted_voxels(rng, m=300, cap=320)
        cj, vj = jnp.asarray(coords), jnp.asarray(valid)
        cin, cout = 8, 16
        feats = jnp.asarray(
            rng.normal(size=(len(coords), cin)).astype(np.float32)
        )
        w = jnp.asarray(
            rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1
        )
        rb = build_rulebook(cj, vj, 3, verify_coords=True)
        plan = build_band_plan(rb, vj)
        tgt = jnp.asarray(
            rng.normal(size=(len(coords), cout)).astype(np.float32)
        )

        def loss_gather(f, w):
            return jnp.sum((subm_conv_apply(f, w, rb, vj) - tgt) ** 2)

        def loss_band(f, w):
            return jnp.sum(
                (band_subm_conv_apply(f, w, plan, vj) - tgt) ** 2
            )

        gf, gw = jax.grad(loss_gather, argnums=(0, 1))(feats, w)
        bf_, bw = jax.grad(loss_band, argnums=(0, 1))(feats, w)
        np.testing.assert_allclose(
            np.asarray(bf_), np.asarray(gf), rtol=2e-3, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(bw), np.asarray(gw), rtol=2e-3, atol=2e-3
        )

    def test_bfloat16_close_to_f32(self, rng):
        coords, valid = lex_sorted_voxels(rng, m=300, cap=320)
        cj, vj = jnp.asarray(coords), jnp.asarray(valid)
        cin = cout = 8
        feats = jnp.asarray(
            rng.normal(size=(len(coords), cin)).astype(np.float32)
        )
        w = jnp.asarray(
            rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1
        )
        rb = build_rulebook(cj, vj, 3, verify_coords=True)
        plan = build_band_plan(rb, vj)
        f32 = np.asarray(band_subm_conv_apply(feats, w, plan, vj))
        b16 = np.asarray(
            band_subm_conv_apply(
                feats, w, plan, vj, compute_dtype=jnp.bfloat16
            )
        )
        scale = np.abs(f32).max()
        assert np.abs(b16 - f32).max() < 0.05 * scale


class TestModelIntegration:
    def test_treelearn_band_engine_forward(self, rng):
        """engine='band' matches engine='gather' with the SAME params
        (checkpoint-interchangeable: band reuses the gather blocks)."""
        from treemorph_tpu.models.treelearn import TreeLearn

        n = 512
        pts = rng.normal(size=(n, 3)).astype(np.float32) * 2.0
        feats = rng.normal(size=(n, 4)).astype(np.float32)
        batch_ids = np.zeros(n, np.int32)
        valid = np.ones(n, bool)
        valid[-40:] = False

        kwargs = dict(
            channels=8, num_blocks=2, dim_feat=4, voxel_size=0.3,
            batch_size=1,
        )
        args = (
            jnp.asarray(pts), jnp.asarray(feats), jnp.asarray(batch_ids),
            jnp.asarray(valid),
        )
        mg = TreeLearn(engine="gather", **kwargs)
        vars_g = mg.init(jax.random.PRNGKey(0), *args, train=False)
        out_g = mg.apply(vars_g, *args, train=False)

        mb = TreeLearn(engine="band", **kwargs)
        out_b = mb.apply(vars_g, *args, train=False)
        for key in ("offset_predictions", "semantic_prediction_logits"):
            np.testing.assert_allclose(
                np.asarray(out_b[key]),
                np.asarray(out_g[key]),
                rtol=5e-3, atol=5e-3,
            )


def column_voxels(rng, n_cols=36, zlen=20, cap=768):
    """Lex-sorted voxel set with dense z-columns (surface-cloud shape:
    most dz=0 anchors exist, some runs end). Returns (coords, valid)."""
    rows = []
    for _ in range(n_cols):
        x, y = rng.integers(0, 8, 2)
        z0 = rng.integers(0, 6)
        ln = rng.integers(zlen // 2, zlen)
        rows += [(0, int(x), int(y), int(z0 + t)) for t in range(ln)]
    rows = sorted(set(rows))[: cap - 8]
    m = len(rows)
    coords = np.zeros((cap, 4), np.int32)
    coords[:m] = rows
    valid = np.zeros(cap, bool)
    valid[:m] = True
    return coords, valid


class TestZBandConv:
    """z-packed band engine (one one-hot per (dx, dy) group) vs the
    gather engine oracle — forward, residual repair, gradients, dtypes.

    Matching tests use column-structured sets (the surface-cloud shape
    the engine targets); fully random sparse sets overflow the residual
    cap by design and are covered by the fallback test."""

    @pytest.mark.parametrize(
        "k,cin,cout", [(3, 8, 8), (3, 8, 16), (5, 4, 32)]
    )
    def test_matches_gather_engine(self, rng, k, cin, cout):
        from treemorph_tpu.ops.bandconv import (
            build_zband_plan,
            zband_subm_conv_apply,
        )

        coords, valid = column_voxels(rng)
        cj, vj = jnp.asarray(coords), jnp.asarray(valid)
        feats = jnp.asarray(
            rng.normal(size=(len(coords), cin)).astype(np.float32)
        )
        w = jnp.asarray(
            rng.normal(size=(k**3, cin, cout)).astype(np.float32) * 0.1
        )
        rb = build_rulebook(cj, vj, k, verify_coords=True)
        want = np.asarray(subm_conv_apply(feats, w, rb, vj))
        plan = build_zband_plan(rb, vj)
        assert bool(plan.ok)
        got = np.asarray(zband_subm_conv_apply(feats, w, plan, vj))
        np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)

    def test_matches_brute_force_small(self, rng):
        from treemorph_tpu.ops.bandconv import (
            build_zband_plan,
            zband_subm_conv_apply,
        )

        coords, valid = column_voxels(rng, n_cols=10, zlen=12, cap=160)
        cj, vj = jnp.asarray(coords), jnp.asarray(valid)
        cin, cout = 3, 5
        feats = rng.normal(size=(len(coords), cin)).astype(np.float32)
        w = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1
        rb = build_rulebook(cj, vj, 3, verify_coords=True)
        plan = build_zband_plan(rb, vj)
        assert bool(plan.ok)
        got = np.asarray(
            zband_subm_conv_apply(
                jnp.asarray(feats), jnp.asarray(w), plan, vj
            )
        )
        bf = brute_force_subm_conv(coords, valid, feats, w, 3)
        np.testing.assert_allclose(got, bf, rtol=3e-4, atol=3e-4)

    def test_missing_anchor_entries_repaired(self, rng):
        """Group entries whose dz=0 anchor voxel does not exist must be
        repaired by the residual pass (zq selection cannot reach them)."""
        from treemorph_tpu.ops.bandconv import (
            build_zband_plan,
            zband_subm_conv_apply,
        )

        # column x=2 has gaps at every even z: its odd-z voxels see the
        # x=1 column's even-z voxels only through dz=+-1 entries whose
        # anchor (x=1, same z) is missing
        rows = [(0, 1, 1, z) for z in range(0, 40, 2)]
        rows += [(0, 2, 1, z) for z in range(1, 40, 2)]
        m = len(rows)
        cap = 256
        coords = np.zeros((cap, 4), np.int32)
        coords[:m] = sorted(rows)
        valid = np.zeros(cap, bool)
        valid[:m] = True
        cj, vj = jnp.asarray(coords), jnp.asarray(valid)
        cin = cout = 4
        feats = rng.normal(size=(cap, cin)).astype(np.float32)
        w = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1
        rb = build_rulebook(cj, vj, 3, verify_coords=True)
        plan = build_zband_plan(rb, vj)
        assert bool(plan.ok)
        assert int(jnp.sum(plan.res_valid)) > 0  # premise: anchors missing
        got = np.asarray(
            zband_subm_conv_apply(jnp.asarray(feats), jnp.asarray(w),
                                  plan, vj)
        )
        bf = brute_force_subm_conv(coords, valid, feats, w, 3)
        np.testing.assert_allclose(got, bf, rtol=3e-4, atol=3e-4)

    def test_gradients_match_gather_engine(self, rng):
        from treemorph_tpu.ops.bandconv import (
            build_zband_plan,
            zband_subm_conv_apply,
        )

        coords, valid = column_voxels(rng, n_cols=16, zlen=16, cap=320)
        cj, vj = jnp.asarray(coords), jnp.asarray(valid)
        cin = cout = 6
        feats = jnp.asarray(
            rng.normal(size=(len(coords), cin)).astype(np.float32)
        )
        w = jnp.asarray(
            rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1
        )
        rb = build_rulebook(cj, vj, 3, verify_coords=True)
        plan = build_zband_plan(rb, vj)
        assert bool(plan.ok)
        assert int(jnp.sum(plan.res_valid)) > 0  # run ends go residual
        tgt = jnp.asarray(
            rng.normal(size=(len(coords), cout)).astype(np.float32)
        )

        def loss_gather(f, w):
            return jnp.sum((subm_conv_apply(f, w, rb, vj) - tgt) ** 2)

        def loss_zband(f, w):
            return jnp.sum(
                (zband_subm_conv_apply(f, w, plan, vj) - tgt) ** 2
            )

        gf, gw = jax.grad(loss_gather, argnums=(0, 1))(feats, w)
        bf_, bw = jax.grad(loss_zband, argnums=(0, 1))(feats, w)
        np.testing.assert_allclose(
            np.asarray(bf_), np.asarray(gf), rtol=2e-3, atol=2e-3
        )
        np.testing.assert_allclose(
            np.asarray(bw), np.asarray(gw), rtol=2e-3, atol=2e-3
        )

    def test_fallback_when_plan_not_ok(self, rng):
        from treemorph_tpu.ops.bandconv import (
            build_zband_plan,
            zband_subm_conv_apply,
        )

        coords, valid = lex_sorted_voxels(rng, m=700, cap=768)
        cj, vj = jnp.asarray(coords), jnp.asarray(valid)
        cin = cout = 8
        feats = jnp.asarray(
            rng.normal(size=(len(coords), cin)).astype(np.float32)
        )
        w = jnp.asarray(
            rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1
        )
        rb = build_rulebook(cj, vj, 3, verify_coords=True)
        plan = build_zband_plan(rb, vj)
        forced = plan._replace(ok=jnp.asarray(False))
        want = np.asarray(subm_conv_apply(feats, w, rb, vj))
        got = np.asarray(zband_subm_conv_apply(feats, w, forced, vj))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)

    def test_bfloat16_close_to_f32(self, rng):
        from treemorph_tpu.ops.bandconv import (
            build_zband_plan,
            zband_subm_conv_apply,
        )

        coords, valid = column_voxels(rng, n_cols=16, zlen=16, cap=320)
        cj, vj = jnp.asarray(coords), jnp.asarray(valid)
        cin = cout = 8
        feats = jnp.asarray(
            rng.normal(size=(len(coords), cin)).astype(np.float32)
        )
        w = jnp.asarray(
            rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1
        )
        rb = build_rulebook(cj, vj, 3, verify_coords=True)
        plan = build_zband_plan(rb, vj)
        f32 = np.asarray(zband_subm_conv_apply(feats, w, plan, vj))
        b16 = np.asarray(
            zband_subm_conv_apply(
                feats, w, plan, vj, compute_dtype=jnp.bfloat16
            )
        )
        scale = np.abs(f32).max()
        assert np.abs(b16 - f32).max() < 0.05 * scale

    def test_choose_band_plan_routing(self, rng):
        """Plain band when viable (zband's residual rate on surface
        clouds makes it a non-default), bare rulebook when the level's
        widest conv statically overflows VMEM."""
        from treemorph_tpu.ops.bandconv import choose_band_plan

        coords, valid = lex_sorted_voxels(rng, m=300, cap=320)
        cj, vj = jnp.asarray(coords), jnp.asarray(valid)
        rb = build_rulebook(cj, vj, 3, verify_coords=True)
        assert isinstance(
            choose_band_plan(rb, vj, 32, 32, "bfloat16"), BandPlan
        )
        assert isinstance(
            choose_band_plan(rb, vj, 256, 256, "bfloat16"), BandPlan
        )
        assert choose_band_plan(rb, vj, 512, 512, "bfloat16") is rb


class TestBandTraining:
    def test_band_engine_training_tracks_gather(self, rng):
        """A few AdamW steps with engine='band' follow the gather
        engine's loss trajectory from identical init (VERDICT r3 #4 —
        the engine users reach via scripts/train.py --engine band)."""
        import optax

        from treemorph_tpu.models.loss import point_wise_loss
        from treemorph_tpu.models.treelearn import TreeLearn

        n = 512
        pts = rng.normal(size=(n, 3)).astype(np.float32) * 2.0
        feats = rng.normal(size=(n, 4)).astype(np.float32)
        off_t = rng.normal(size=(n, 3)).astype(np.float32) * 0.05
        sem_t = (rng.random(n) > 0.5).astype(np.int32)
        batch_ids = np.zeros(n, np.int32)
        valid = np.ones(n, bool)
        valid[-40:] = False
        args = (
            jnp.asarray(pts), jnp.asarray(feats),
            jnp.asarray(batch_ids), jnp.asarray(valid),
        )
        off_t, sem_t = jnp.asarray(off_t), jnp.asarray(sem_t)
        vj = args[3]

        kwargs = dict(
            channels=8, num_blocks=2, dim_feat=4, voxel_size=0.3,
            batch_size=1,
        )

        def run(engine):
            model = TreeLearn(engine=engine, **kwargs)
            variables = TreeLearn(engine="gather", **kwargs).init(
                jax.random.PRNGKey(0), *args, train=False
            )
            params = variables["params"]
            rest = {k: v for k, v in variables.items() if k != "params"}
            tx = optax.adamw(1e-3)
            opt = tx.init(params)

            def loss_fn(p):
                out, mut = model.apply(
                    {"params": p, **rest}, *args, train=True,
                    mutable=["batch_stats"],
                )
                sem, off = point_wise_loss(
                    out["semantic_prediction_logits"],
                    out["offset_predictions"],
                    sem_t, off_t,
                    semantic_mask=vj, offset_mask=vj,
                )
                return sem + off

            @jax.jit
            def step(params, opt):
                l, g = jax.value_and_grad(loss_fn)(params)
                up, opt = tx.update(g, opt, params)
                return optax.apply_updates(params, up), opt, l

            losses = []
            for _ in range(4):
                params, opt, l = step(params, opt)
                losses.append(float(l))
            return np.asarray(losses)

        lg = run("gather")
        lb = run("band")
        assert np.all(np.diff(lg) < 0) or lg[-1] < lg[0]  # it learns
        np.testing.assert_allclose(lb, lg, rtol=2e-2, atol=2e-3)
