import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from treemorph_tpu.fixtures import synthetic_cylinder_cloud
from treemorph_tpu.models.ptv3 import (
    PointTransformerWithHeads,
    make_pointset,
    ptv3_loss,
)

# Tiny config: 3 stages, small channels/patches so CPU tests stay fast.
TINY = dict(
    enc_depths=(1, 1, 1),
    enc_channels=(16, 32, 64),
    enc_num_head=(2, 4, 8),
    enc_patch_size=(64, 64, 64),
    dec_depths=(1, 1),
    dec_channels=(16, 32),
    dec_num_head=(2, 4),
    dec_patch_size=(64, 64),
    drop_path=0.0,
)


@pytest.fixture(scope="module")
def flat_batch():
    rng = np.random.default_rng(5)
    labeled = synthetic_cylinder_cloud(700, rng=rng)
    p = 768  # multiple of the 64-point patch
    coords = np.zeros((p, 3), np.float32)
    feats = np.zeros((p, 4), np.float32)
    offs = np.zeros((p, 3), np.float32)
    coords[:700] = labeled[:, :3]
    feats[:700] = labeled[:, 7:]
    offs[:700] = labeled[:, 3:6]
    norm = np.linalg.norm(offs, axis=1)
    valid = np.arange(p) < 700
    batch_ids = np.zeros(p, np.int32)
    batch_ids[350:] = 1
    return {
        "coords": jnp.asarray(coords),
        "feats": jnp.asarray(feats),
        "batch_ids": jnp.asarray(batch_ids),
        "mask_valid": jnp.asarray(valid),
        "offset_labels": jnp.asarray(offs),
        "semantic_labels": jnp.asarray((norm > 0.05).astype(np.int32)),
        "mask_off": jnp.asarray(norm <= 0.05),
    }


class TestPointSet:
    def test_orders_are_permutations(self, flat_batch):
        ps = make_pointset(
            flat_batch["coords"],
            flat_batch["feats"],
            flat_batch["batch_ids"],
            flat_batch["mask_valid"],
            grid_size=0.02,
        )
        p = flat_batch["coords"].shape[0]
        for o in range(4):
            perm = np.asarray(ps.orders[o])
            inv = np.asarray(ps.inverses[o])
            assert sorted(perm) == list(range(p))
            np.testing.assert_array_equal(perm[inv], np.arange(p))

    def test_invalid_points_sort_last(self, flat_batch):
        ps = make_pointset(
            flat_batch["coords"],
            flat_batch["feats"],
            flat_batch["batch_ids"],
            flat_batch["mask_valid"],
            grid_size=0.02,
        )
        valid = np.asarray(flat_batch["mask_valid"])
        n_valid = valid.sum()
        for o in range(4):
            perm = np.asarray(ps.orders[o])
            assert valid[perm[:n_valid]].all()
            assert not valid[perm[n_valid:]].any()

    def test_serialized_locality(self, flat_batch):
        # points adjacent in serialized order should be close in space
        ps = make_pointset(
            flat_batch["coords"],
            flat_batch["feats"],
            flat_batch["batch_ids"],
            flat_batch["mask_valid"],
            grid_size=0.02,
        )
        coords = np.asarray(flat_batch["coords"])
        valid = np.asarray(flat_batch["mask_valid"])
        perm = np.asarray(ps.orders[2])  # hilbert
        path = coords[perm[: valid.sum()]]
        same_batch = np.diff(
            np.asarray(flat_batch["batch_ids"])[perm[: valid.sum()]]
        ) == 0
        steps = np.linalg.norm(np.diff(path, axis=0), axis=1)[same_batch]
        rng = np.random.default_rng(0)
        rand_idx = rng.permutation(valid.sum())
        rand_steps = np.linalg.norm(
            np.diff(coords[perm[: valid.sum()]][rand_idx], axis=0), axis=1
        )
        assert np.median(steps) < 0.3 * np.median(rand_steps)


class TestPTv3:
    def test_forward_shapes_and_masking(self, flat_batch):
        model = PointTransformerWithHeads(dim_feat=4, use_feats=True, **TINY)
        args = (
            flat_batch["coords"],
            flat_batch["feats"],
            flat_batch["batch_ids"],
            flat_batch["mask_valid"],
        )
        init = jax.jit(
            lambda r, c, f, b, v: model.init(r, c, f, b, v, train=False)
        )
        variables = init(jax.random.key(0), *args)
        apply = jax.jit(
            lambda p, c, f, b, v: model.apply(p, c, f, b, v, train=False)
        )
        out = apply(variables, *args)
        p = flat_batch["coords"].shape[0]
        assert out["semantic_prediction_logits"].shape == (p, 2)
        assert out["offset_predictions"].shape == (p, 3)
        assert out["backbone_feats"].shape == (p, TINY["dec_channels"][0])
        feats = np.asarray(out["backbone_feats"])
        assert np.isfinite(feats).all()
        np.testing.assert_array_equal(feats[700:], 0.0)

    def test_use_feats_false_ignores_features(self, flat_batch):
        model = PointTransformerWithHeads(dim_feat=4, use_feats=False, **TINY)
        args = (
            flat_batch["coords"],
            flat_batch["feats"],
            flat_batch["batch_ids"],
            flat_batch["mask_valid"],
        )
        init = jax.jit(
            lambda r, c, f, b, v: model.init(r, c, f, b, v, train=False)
        )
        variables = init(jax.random.key(0), *args)
        apply = jax.jit(
            lambda p, c, f, b, v: model.apply(p, c, f, b, v, train=False)
        )
        out_a = apply(variables, *args)
        out_b = apply(
            variables,
            args[0],
            args[1] * 5.0 + 1.0,  # different features
            args[2],
            args[3],
        )
        np.testing.assert_allclose(
            np.asarray(out_a["offset_predictions"]),
            np.asarray(out_b["offset_predictions"]),
            atol=1e-6,
        )

    def test_overfits_offsets(self, flat_batch):
        model = PointTransformerWithHeads(dim_feat=4, use_feats=True, **TINY)
        args = (
            flat_batch["coords"],
            flat_batch["feats"],
            flat_batch["batch_ids"],
            flat_batch["mask_valid"],
        )
        init = jax.jit(
            lambda r, c, f, b, v: model.init(r, c, f, b, v, train=True)
        )
        variables = init(jax.random.key(0), *args)
        params, batch_stats = variables["params"], variables["batch_stats"]
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, batch_stats, opt_state):
            def loss_fn(p):
                out, mut = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    *args,
                    train=True,
                    mutable=["batch_stats"],
                )
                loss, _ = ptv3_loss(
                    out, flat_batch, loss_multiplier_semantic=0.0
                )
                return loss, mut["batch_stats"]

            (loss, new_bs), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = tx.update(grads, opt_state)
            return (
                optax.apply_updates(params, updates),
                new_bs,
                opt_state,
                loss,
            )

        losses = []
        for _ in range(20):
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state
            )
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.85, losses


class TestPadPerElement:
    """The reference window-partitioning mode (blocks.py:400-455):
    windows never straddle batch elements; tail windows replicate the
    previous window's points."""

    def test_layout_matches_reference_formula(self):
        import numpy as np

        from treemorph_tpu.models.ptv3 import element_pad_layout

        patch = 8
        counts = [19, 8, 3, 0, 25]  # >K partial, ==K, <K, empty, >K
        batch = np.concatenate(
            [np.full(c, b, np.int32) for b, c in enumerate(counts)]
        )
        p = 64  # static padded size, multiple of patch
        valid = np.zeros(p, bool)
        valid[: len(batch)] = True
        batch_full = np.full(p, 0x7FFF, np.int32)
        batch_full[: len(batch)] = batch

        pad_src, slot_seg, unpad = map(
            np.asarray,
            element_pad_layout(
                jnp.asarray(batch_full), jnp.asarray(valid), 5, patch
            ),
        )

        # reference formula, transcribed (blocks.py:411-447)
        n = np.array(counts)
        m = -(-n // patch) * patch
        start_src = np.concatenate([[0], np.cumsum(n)[:-1]])
        start_pad = np.concatenate([[0], np.cumsum(m)[:-1]])
        for b, (nb, mb) in enumerate(zip(n, m)):
            for r in range(mb):
                j = start_pad[b] + r
                assert slot_seg[j] in (b, -1)
                if r < nb:
                    assert slot_seg[j] == b
                    assert pad_src[j] == start_src[b] + r
                elif nb > patch:
                    # replicated from the previous window
                    assert slot_seg[j] == b
                    assert pad_src[j] == start_src[b] + r - patch
                else:
                    assert slot_seg[j] == -1  # masked (short element)
        # slots beyond all allotments are dead
        assert (slot_seg[int(start_pad[-1] + m[-1]):] == -1).all()
        # unpad round-trips every real sorted position
        for b, nb in enumerate(n):
            for r in range(nb):
                assert unpad[start_src[b] + r] == start_pad[b] + r

    def test_windows_never_straddle_elements(self, rng):
        import numpy as np

        from treemorph_tpu.models.ptv3 import element_pad_layout

        patch = 16
        counts = rng.integers(1, 60, 6)
        batch = np.concatenate(
            [np.full(c, b, np.int32) for b, c in enumerate(counts)]
        )
        p = -(-len(batch) // patch) * patch
        valid = np.zeros(p, bool)
        valid[: len(batch)] = True
        batch_full = np.full(p, 0x7FFF, np.int32)
        batch_full[: len(batch)] = batch
        _, slot_seg, _ = map(
            np.asarray,
            element_pad_layout(
                jnp.asarray(batch_full), jnp.asarray(valid), 6, patch
            ),
        )
        for w in slot_seg.reshape(-1, patch):
            live = w[w >= 0]
            assert len(np.unique(live)) <= 1

    def test_matches_default_when_elements_are_aligned(self, rng):
        # every element's count a multiple of the patch -> both window
        # partitionings are identical, outputs must match exactly
        import numpy as np

        from treemorph_tpu.models.ptv3 import PointTransformerWithHeads

        patch = 16
        counts = (32, 16, 48)
        pts, feats, bids = [], [], []
        for b, c in enumerate(counts):
            pts.append(rng.normal(size=(c, 3)).astype(np.float32) * 2)
            feats.append(rng.normal(size=(c, 4)).astype(np.float32))
            bids.append(np.full(c, b, np.int32))
        coords = jnp.asarray(np.concatenate(pts))
        fts = jnp.asarray(np.concatenate(feats))
        bid = jnp.asarray(np.concatenate(bids))
        valid = jnp.ones(sum(counts), bool)

        cfg = dict(
            dim_feat=4, use_feats=True, voxel_size=0.3,
            enc_depths=(1, 1), enc_channels=(8, 16),
            enc_num_head=(1, 2), enc_patch_size=(patch, patch),
            dec_depths=(1,), dec_channels=(8,), dec_num_head=(1,),
            dec_patch_size=(patch,), drop_path=0.0,
        )
        outs = []
        for pad_mode in (False, True):
            model = PointTransformerWithHeads(
                pad_per_element=pad_mode, num_elements=3, **cfg
            )
            var = model.init(
                jax.random.key(0), coords, fts, bid, valid, train=False
            )
            out = model.apply(
                var, coords, fts, bid, valid, train=False
            )
            outs.append(np.asarray(out["offset_predictions"]))
        np.testing.assert_allclose(outs[0], outs[1], atol=1e-5)

    def test_unaligned_elements_run_and_differ(self, rng):
        import numpy as np

        from treemorph_tpu.models.ptv3 import PointTransformerWithHeads

        patch = 16
        counts = (23, 9, 40)
        pts = rng.normal(size=(sum(counts), 3)).astype(np.float32) * 2
        fts = rng.normal(size=(sum(counts), 4)).astype(np.float32)
        bid = np.concatenate(
            [np.full(c, b, np.int32) for b, c in enumerate(counts)]
        )
        p = -(-sum(counts) // patch) * patch
        coords = jnp.asarray(
            np.concatenate([pts, np.zeros((p - len(pts), 3), np.float32)])
        )
        fts = jnp.asarray(
            np.concatenate([fts, np.zeros((p - len(bid), 4), np.float32)])
        )
        bid = jnp.asarray(
            np.concatenate([bid, np.zeros(p - len(bid), np.int32)])
        )
        valid = jnp.asarray(np.arange(p) < sum(counts))

        cfg = dict(
            dim_feat=4, use_feats=True, voxel_size=0.3,
            enc_depths=(1, 1), enc_channels=(8, 16),
            enc_num_head=(1, 2), enc_patch_size=(patch, patch),
            dec_depths=(1,), dec_channels=(8,), dec_num_head=(1,),
            dec_patch_size=(patch,), drop_path=0.0,
        )
        model = PointTransformerWithHeads(
            pad_per_element=True, num_elements=3, **cfg
        )
        var = model.init(
            jax.random.key(0), coords, fts, bid, valid, train=False
        )
        out = model.apply(var, coords, fts, bid, valid, train=False)
        off = np.asarray(out["offset_predictions"])
        assert np.isfinite(off[np.asarray(valid)]).all()


class TestPoolShrink:
    def test_tighter_caps_identical_when_counts_fit(self, rng):
        # dense surface: coarse counts fit the shrink-4 caps, so the only
        # change is padding -> outputs must match the lossless default
        import numpy as np

        from treemorph_tpu.fixtures import synthetic_cylinder_cloud
        from treemorph_tpu.models.ptv3 import PointTransformerWithHeads

        cloud = synthetic_cylinder_cloud(
            2048, rng=np.random.default_rng(5)
        )
        coords = jnp.asarray(cloud[:, :3])
        feats = jnp.asarray(cloud[:, 7:11].astype(np.float32))
        bid = jnp.zeros(2048, jnp.int32)
        valid = jnp.ones(2048, bool)
        cfg = dict(
            dim_feat=4, use_feats=True, voxel_size=0.05,
            enc_depths=(1, 1, 1), enc_channels=(8, 16, 16),
            enc_num_head=(1, 2, 2), enc_patch_size=(128, 128, 128),
            dec_depths=(1, 1), dec_channels=(8, 8),
            dec_num_head=(1, 1), dec_patch_size=(128, 128),
            drop_path=0.0,
        )
        outs = []
        for shrink in (2, 4):
            model = PointTransformerWithHeads(pool_shrink=shrink, **cfg)
            var = model.init(
                jax.random.key(0), coords, feats, bid, valid,
                train=False,
            )
            out = model.apply(
                var, coords, feats, bid, valid, train=False
            )
            outs.append(np.asarray(out["offset_predictions"]))
        np.testing.assert_array_equal(outs[0], outs[1])


class TestPadPerElementTraining:
    def test_gradients_flow_through_pad_layout(self, rng):
        import numpy as np

        from treemorph_tpu.models.ptv3 import PointTransformerWithHeads

        patch = 16
        counts = (23, 9)
        pts = rng.normal(size=(sum(counts), 3)).astype(np.float32) * 2
        p = -(-sum(counts) // patch) * patch
        coords = jnp.asarray(np.concatenate(
            [pts, np.zeros((p - len(pts), 3), np.float32)]
        ))
        feats = jnp.asarray(
            rng.normal(size=(p, 4)).astype(np.float32)
        )
        bid = jnp.asarray(np.concatenate(
            [np.full(c, b, np.int32) for b, c in enumerate(counts)]
            + [np.zeros(p - sum(counts), np.int32)]
        ))
        valid = jnp.asarray(np.arange(p) < sum(counts))

        model = PointTransformerWithHeads(
            dim_feat=4, use_feats=True, voxel_size=0.3,
            enc_depths=(1, 1), enc_channels=(8, 16),
            enc_num_head=(1, 2), enc_patch_size=(patch, patch),
            dec_depths=(1,), dec_channels=(8,), dec_num_head=(1,),
            dec_patch_size=(patch,), drop_path=0.0,
            pad_per_element=True, num_elements=2,
        )
        var = model.init(
            jax.random.key(0), coords, feats, bid, valid, train=False
        )

        def loss(params):
            out = model.apply(
                {"params": params, "batch_stats": var["batch_stats"]},
                coords, feats, bid, valid, train=False,
            )
            off = out["offset_predictions"]
            return jnp.sum(jnp.where(valid[:, None], off**2, 0.0))

        g = jax.grad(loss)(var["params"])
        norms = [
            float(jnp.linalg.norm(leaf))
            for leaf in jax.tree_util.tree_leaves(g)
        ]
        assert all(np.isfinite(n) for n in norms)
        assert sum(norms) > 0  # gradients actually flow


class TestRPE:
    def test_rpe_flag_runs_and_changes_output(self, flat_batch):
        # Parity flag for reference RPE (blocks.py:314-333): attention
        # picks up a relative-position score bias; zero-init table means
        # identical-at-init is NOT guaranteed (trunc-normal init), so we
        # assert the flag runs, is differentiable, and masks padding.
        model = PointTransformerWithHeads(
            dim_feat=4, use_feats=True, enable_rpe=True, **TINY
        )
        variables = model.init(
            jax.random.key(0),
            flat_batch["coords"],
            flat_batch["feats"],
            flat_batch["batch_ids"],
            flat_batch["mask_valid"],
            False,
        )
        # the RPE table exists with the reference's geometry:
        # pos_bnd = int((4K)^(1/3) * 2), table (3*(2*pos_bnd+1), H)
        k = TINY["enc_patch_size"][0]
        pos_bnd = int((4 * k) ** (1 / 3) * 2)
        tables = [
            p
            for path, p in jax.tree_util.tree_flatten_with_path(
                variables["params"]
            )[0]
            if "rpe_table" in str(path)
        ]
        assert tables, "no rpe_table params created"
        assert tables[0].shape[0] == 3 * (2 * pos_bnd + 1)

        out = model.apply(
            variables,
            flat_batch["coords"],
            flat_batch["feats"],
            flat_batch["batch_ids"],
            flat_batch["mask_valid"],
            False,
        )
        off = np.asarray(out["offset_predictions"])
        assert np.isfinite(off).all()
        assert np.all(off[~np.asarray(flat_batch["mask_valid"])] == 0)

    def test_rpe_gradients_flow_to_table(self, flat_batch):
        model = PointTransformerWithHeads(
            dim_feat=4, use_feats=True, enable_rpe=True, **TINY
        )
        variables = model.init(
            jax.random.key(0),
            flat_batch["coords"],
            flat_batch["feats"],
            flat_batch["batch_ids"],
            flat_batch["mask_valid"],
            False,
        )

        def loss(params):
            out = model.apply(
                {"params": params,
                 "batch_stats": variables["batch_stats"]},
                flat_batch["coords"],
                flat_batch["feats"],
                flat_batch["batch_ids"],
                flat_batch["mask_valid"],
                False,
            )
            return jnp.sum(out["offset_predictions"] ** 2)

        grads = jax.grad(loss)(variables["params"])
        g = [
            np.abs(np.asarray(p)).sum()
            for path, p in jax.tree_util.tree_flatten_with_path(grads)[0]
            if "rpe_table" in str(path)
        ]
        assert g and sum(g) > 0


class TestPDNorm:
    def test_decoupled_conditions_select_distinct_params(self, rng):
        from treemorph_tpu.models.ptv3 import PDNorm

        x = jnp.asarray(rng.normal(size=(32, 8)), jnp.float32)
        valid = jnp.ones(32, bool)
        m = PDNorm(8, kind="ln", conditions=("a", "b"), decouple=True)
        variables = m.init(jax.random.key(0), x, valid, False, 0)
        # both condition branches materialized at init
        assert set(variables["params"]) == {"norm0", "norm1"}
        y0 = m.apply(variables, x, valid, False, 0)
        # perturb condition-1 params only: condition 0 output unchanged
        import flax

        p = flax.core.unfreeze(variables["params"])
        p["norm1"]["scale"] = p["norm1"]["scale"] + 5.0
        y0b = PDNorm(8, kind="ln", conditions=("a", "b")).apply(
            {"params": p}, x, valid, False, 0
        )
        y1 = PDNorm(8, kind="ln", conditions=("a", "b")).apply(
            {"params": p}, x, valid, False, 1
        )
        np.testing.assert_array_equal(np.asarray(y0), np.asarray(y0b))
        assert not np.allclose(np.asarray(y0), np.asarray(y1))

    def test_adaptive_modulation_matches_formula(self, rng):
        from treemorph_tpu.models.ptv3 import PDNorm

        x = jnp.asarray(rng.normal(size=(16, 4)), jnp.float32)
        ctx = jnp.asarray(rng.normal(size=(16, 6)), jnp.float32)
        valid = jnp.ones(16, bool)
        m = PDNorm(
            4, kind="ln", decouple=False, adaptive=True, context_channels=6
        )
        variables = m.init(jax.random.key(0), x, valid, False, 0, ctx)
        y = m.apply(variables, x, valid, False, 0, ctx)
        # reference formula (blocks.py:308-310):
        # norm(x) * (1 + scale) + shift, (shift, scale) = Linear(SiLU(ctx))
        base = nn_ln = None
        import flax.linen as fnn

        nn_ln = fnn.LayerNorm().apply(
            {"params": variables["params"]["norm"]}, x
        )
        w = variables["params"]["modulation"]["kernel"]
        b = variables["params"]["modulation"]["bias"]
        mod = np.asarray(jax.nn.silu(ctx) @ w + b)
        shift, scale = mod[:, :4], mod[:, 4:]
        expect = np.asarray(nn_ln) * (1.0 + scale) + shift
        np.testing.assert_allclose(np.asarray(y), expect, atol=1e-5)

    def test_backbone_runs_with_pdnorm(self, flat_batch):
        from treemorph_tpu.models.ptv3 import PDNormSpec

        spec = PDNormSpec(bn=True, ln=True, conditions=("TreeSet", "Other"))
        model = PointTransformerWithHeads(
            dim_feat=4, use_feats=True, pdnorm=spec, **TINY
        )
        variables = model.init(
            jax.random.key(0),
            flat_batch["coords"],
            flat_batch["feats"],
            flat_batch["batch_ids"],
            flat_batch["mask_valid"],
            False,
        )
        out = model.apply(
            variables,
            flat_batch["coords"],
            flat_batch["feats"],
            flat_batch["batch_ids"],
            flat_batch["mask_valid"],
            False,
            condition=1,
        )
        assert np.isfinite(np.asarray(out["offset_predictions"])).all()


class TestDedup:
    """Level-0 unique-voxel conv path (``dedup_divisor``)."""

    def _dup_batch(self, rng, n=512, copies=3, voxel=0.05):
        # one point per voxel cell (iterated dedup: subsetting moves the
        # grid origin, see tests/test_import_ptv3.py), then each point
        # repeated `copies` times — duplicates are exact copies
        labeled = synthetic_cylinder_cloud(8 * n, rng=rng)
        c = labeled[:, :3].astype(np.float32)
        f = labeled[:, 7:].astype(np.float32)

        def cells_of(x):
            return np.floor(
                (x - x.min(0)) / np.float32(voxel)
            ).astype(np.int64)

        _, first = np.unique(cells_of(c), axis=0, return_index=True)
        keep = np.sort(first)[:n]
        c, f = c[keep], f[keep]
        while True:
            _, first = np.unique(cells_of(c), axis=0, return_index=True)
            if first.shape[0] == c.shape[0]:
                break
            keep = np.sort(first)
            c, f = c[keep], f[keep]
        n = c.shape[0]
        coords = np.repeat(c, copies, axis=0)
        feats = np.repeat(f, copies, axis=0)
        p = -(-n * copies // 64) * 64
        pad = p - n * copies
        coords = np.pad(coords, ((0, pad), (0, 0))).astype(np.float32)
        feats = np.pad(feats, ((0, pad), (0, 0)))
        valid = np.arange(p) < n * copies
        batch_ids = np.zeros(p, np.int32)
        return (
            jnp.asarray(coords),
            jnp.asarray(feats),
            jnp.asarray(batch_ids),
            jnp.asarray(valid),
        )

    def test_bit_identical_on_duplicate_free_cloud(self, rng):
        # no duplicates -> the tie-break is vacuous and the dedup path
        # must be a pure plumbing identity (per-row conv sums unchanged)
        args = self._dup_batch(rng, n=512, copies=1)
        base = PointTransformerWithHeads(
            dim_feat=4, use_feats=True, voxel_size=0.05, **TINY
        )
        dedup = PointTransformerWithHeads(
            dim_feat=4, use_feats=True, voxel_size=0.05,
            dedup_divisor=1, **TINY
        )
        var = jax.jit(
            lambda r, c, f, b, v: base.init(r, c, f, b, v, train=False)
        )(jax.random.key(0), *args)
        out0 = jax.jit(
            lambda p, c, f, b, v: base.apply(p, c, f, b, v, train=False)
        )(var, *args)
        out1 = jax.jit(
            lambda p, c, f, b, v: dedup.apply(p, c, f, b, v, train=False)
        )(var, *args)
        assert int(out1["dedup_overflow"]) == 0
        np.testing.assert_array_equal(
            np.asarray(out0["offset_predictions"]),
            np.asarray(out1["offset_predictions"]),
        )
        np.testing.assert_array_equal(
            np.asarray(out0["semantic_prediction_logits"]),
            np.asarray(out1["semantic_prediction_logits"]),
        )

    def test_duplicates_consistent_and_close_to_base(self, rng):
        # with duplicates the two paths pick different (equally valid)
        # representatives; duplicates stay separate ATTENTION tokens, so
        # outputs drift slightly — but all convs give duplicate rows one
        # representative, and outputs must stay close to the base engine
        args = self._dup_batch(rng, n=512, copies=3)
        base = PointTransformerWithHeads(
            dim_feat=4, use_feats=True, voxel_size=0.05, **TINY
        )
        dedup = PointTransformerWithHeads(
            dim_feat=4, use_feats=True, voxel_size=0.05,
            dedup_divisor=2, **TINY
        )
        var = base.init(jax.random.key(0), *args, False)
        out0 = base.apply(var, *args, False)
        out1 = dedup.apply(var, *args, False)
        assert int(out1["dedup_overflow"]) == 0
        a = np.asarray(out0["offset_predictions"])
        b = np.asarray(out1["offset_predictions"])
        scale = np.abs(a).max()
        assert np.abs(a - b).max() < 0.25 * scale, (
            np.abs(a - b).max(), scale
        )

    def test_overflow_counted_when_cap_too_small(self, rng):
        args = self._dup_batch(rng, n=2048, copies=1)
        model = PointTransformerWithHeads(
            dim_feat=4, use_feats=True, voxel_size=0.05,
            # cap floors at min(P, 1024) < the ~2048 unique voxels
            dedup_divisor=512, **TINY
        )
        var = model.init(jax.random.key(0), *args, False)
        out = model.apply(var, *args, False)
        assert int(out["dedup_overflow"]) > 0
        assert np.isfinite(np.asarray(out["offset_predictions"])).all()

    def test_gradients_flow_through_dedup_path(self, rng):
        args = self._dup_batch(rng, n=256, copies=2)
        model = PointTransformerWithHeads(
            dim_feat=4, use_feats=True, voxel_size=0.05,
            dedup_divisor=2, **TINY
        )
        var = model.init(jax.random.key(0), *args, False)

        def loss(params):
            out = model.apply(
                {**var, "params": params}, *args, False
            )
            return jnp.sum(out["offset_predictions"] ** 2)

        g = jax.grad(loss)(var["params"])
        stem = g["backbone"]["embedding"]["kernel"]
        assert float(jnp.abs(stem).max()) > 0
        assert all(
            np.isfinite(np.asarray(l)).all()
            for l in jax.tree_util.tree_leaves(g)
        )

    def test_zpack_stem_matches_gather_stem(self, rng):
        args = self._dup_batch(rng, n=512, copies=2)
        outs = []
        for engine in ("gather", "zpack", "band"):
            model = PointTransformerWithHeads(
                dim_feat=4, use_feats=True, voxel_size=0.05,
                dedup_divisor=2, stem_engine=engine, **TINY
            )
            var = model.init(jax.random.key(0), *args, False)
            out = model.apply(var, *args, False)
            assert int(out["dedup_overflow"]) == 0
            outs.append(np.asarray(out["offset_predictions"]))
        # same weights tensor, fp accumulation order differs (k^2 packed
        # dots vs k^3 row dots; band = bf16 hi/lo split MXU one-hots)
        np.testing.assert_allclose(outs[0], outs[1], atol=2e-3)
        np.testing.assert_allclose(outs[0], outs[2], atol=2e-3)

    def test_zpack_trains_with_finite_grads(self, rng):
        """Gradients flow through the z-pack stem + lex-permuted pooled
        levels (storage permutation composes with orders/cluster)."""
        args = self._dup_batch(rng, n=512, copies=2)
        model = PointTransformerWithHeads(
            dim_feat=4, use_feats=True, voxel_size=0.05,
            dedup_divisor=2, stem_engine="zpack", **TINY
        )
        var = model.init(jax.random.key(0), *args, False)
        coords, feats, batch_ids, valid = args
        labels = {
            "semantic_labels": jnp.zeros(coords.shape[0], jnp.int32),
            "offset_labels": jnp.zeros((coords.shape[0], 3), jnp.float32),
            "mask_valid": valid,
            "mask_off": valid,
        }

        def loss_fn(p):
            out, _ = model.apply(
                {"params": p, "batch_stats": var["batch_stats"]},
                *args, train=True, shuffle_rng=jax.random.key(3),
                mutable=["batch_stats"], rngs={"droppath": jax.random.key(4)},
            )
            return ptv3_loss(out, labels)[0]

        g = jax.grad(loss_fn)(var["params"])
        assert all(
            np.isfinite(np.asarray(l)).all()
            for l in jax.tree_util.tree_leaves(g)
        )


class TestBF16Compute:
    """compute_dtype='bfloat16' runs attention/MLP matmuls in bf16."""

    def test_close_to_f32_and_trains(self, flat_batch):
        args = (
            flat_batch["coords"],
            flat_batch["feats"],
            flat_batch["batch_ids"],
            flat_batch["mask_valid"],
        )
        outs = {}
        for dt in ("float32", "bfloat16"):
            model = PointTransformerWithHeads(
                dim_feat=4, use_feats=True, compute_dtype=dt, **TINY
            )
            var = model.init(jax.random.key(0), *args, False)
            out = model.apply(var, *args, False)
            o = np.asarray(out["offset_predictions"])
            assert o.dtype == np.float32
            assert np.isfinite(o).all()
            outs[dt] = o

            def loss_fn(p):
                out, _ = model.apply(
                    {"params": p, "batch_stats": var["batch_stats"]},
                    *args, train=True, mutable=["batch_stats"],
                )
                return ptv3_loss(out, flat_batch)[0]

            g = jax.grad(loss_fn)(var["params"])
            assert all(
                np.isfinite(np.asarray(l)).all()
                and np.asarray(l).dtype == np.float32
                for l in jax.tree_util.tree_leaves(g)
            )
        # identical f32 params; differs only by matmul rounding
        scale = np.abs(outs["float32"]).mean()
        assert np.abs(outs["float32"] - outs["bfloat16"]).mean() < (
            0.1 * scale + 1e-3
        )


class TestDedupTokens:
    """Whole-backbone token dedup (``dedup_tokens``): one token per
    occupied voxel, predictions broadcast back to points."""

    def test_matches_base_on_duplicate_free_cloud(self, rng):
        # no duplicates -> the token set IS the point set (re-stored in
        # lex order); same math modulo fp reduction order
        args = TestDedup._dup_batch(TestDedup(), rng, n=512, copies=1)
        base = PointTransformerWithHeads(
            dim_feat=4, use_feats=True, voxel_size=0.05, **TINY
        )
        tok = PointTransformerWithHeads(
            dim_feat=4, use_feats=True, voxel_size=0.05,
            dedup_divisor=1, dedup_tokens=True, **TINY
        )
        var = jax.jit(
            lambda r, c, f, b, v: base.init(r, c, f, b, v, train=False)
        )(jax.random.key(0), *args)
        out0 = jax.jit(
            lambda p, c, f, b, v: base.apply(p, c, f, b, v, train=False)
        )(var, *args)
        out1 = jax.jit(
            lambda p, c, f, b, v: tok.apply(p, c, f, b, v, train=False)
        )(var, *args)
        assert int(out1["dedup_overflow"]) == 0
        np.testing.assert_allclose(
            np.asarray(out0["offset_predictions"]),
            np.asarray(out1["offset_predictions"]),
            rtol=2e-4, atol=2e-4,
        )
        np.testing.assert_allclose(
            np.asarray(out0["semantic_prediction_logits"]),
            np.asarray(out1["semantic_prediction_logits"]),
            rtol=2e-4, atol=2e-4,
        )

    def test_duplicates_share_predictions(self, rng):
        args = TestDedup._dup_batch(TestDedup(), rng, n=256, copies=3)
        coords, feats, batch_ids, valid = args
        tok = PointTransformerWithHeads(
            dim_feat=4, use_feats=True, voxel_size=0.05,
            dedup_divisor=1, dedup_tokens=True, **TINY
        )
        var = jax.jit(
            lambda r, c, f, b, v: tok.init(r, c, f, b, v, train=False)
        )(jax.random.key(0), *args)
        out = jax.jit(
            lambda p, c, f, b, v: tok.apply(p, c, f, b, v, train=False)
        )(var, *args)
        assert int(out["dedup_overflow"]) == 0
        off = np.asarray(out["offset_predictions"])
        v = np.asarray(valid)
        assert np.all(np.isfinite(off[v]))
        # exact duplicates (every voxel holds 3 copies) -> identical rows
        n = v.sum() // 3
        for k in range(3):
            np.testing.assert_array_equal(
                off[: 3 * n][k::3], off[: 3 * n][0::3]
            )

    def test_gradients_flow(self, rng):
        args = TestDedup._dup_batch(TestDedup(), rng, n=256, copies=3)
        coords, feats, batch_ids, valid = args
        tok = PointTransformerWithHeads(
            dim_feat=4, use_feats=True, voxel_size=0.05,
            dedup_divisor=1, dedup_tokens=True, **TINY
        )
        var = tok.init(
            jax.random.key(0), *args, train=False
        )
        tgt = jnp.asarray(
            np.random.default_rng(3).normal(
                size=(coords.shape[0], 3)
            ).astype(np.float32)
        )

        def loss(params):
            out = tok.apply(
                {"params": params, **{
                    k: v for k, v in var.items() if k != "params"
                }},
                *args, train=False,
            )
            d = (out["offset_predictions"] - tgt) * valid[:, None]
            return jnp.sum(d * d)

        g = jax.grad(loss)(var["params"])
        leaves = jax.tree_util.tree_leaves(g)
        assert all(bool(jnp.all(jnp.isfinite(x))) for x in leaves)
        assert any(float(jnp.abs(x).max()) > 0 for x in leaves)

    def test_param_tree_matches_base(self, rng):
        # token mode must stay checkpoint-interchangeable with the base
        args = TestDedup._dup_batch(TestDedup(), rng, n=256, copies=1)
        base = PointTransformerWithHeads(
            dim_feat=4, use_feats=True, voxel_size=0.05, **TINY
        )
        tok = PointTransformerWithHeads(
            dim_feat=4, use_feats=True, voxel_size=0.05,
            dedup_divisor=1, dedup_tokens=True, **TINY
        )
        v0 = base.init(jax.random.key(0), *args, train=False)
        v1 = tok.init(jax.random.key(0), *args, train=False)
        p0 = jax.tree_util.tree_structure(v0["params"])
        p1 = jax.tree_util.tree_structure(v1["params"])
        assert p0 == p1
