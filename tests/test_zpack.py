"""z-pack conv engine vs the gather engine (exact-math oracle).

The z-pack formulation (ops/sparse.py::build_zplan / subm_conv_zpack_apply)
must reproduce the gather engine's submanifold conv — the reference
semantics (spconv SubMConv3d, /root/reference/Modules/TreeLearn/blocks.py:
44-81) — on lex-sorted voxel sets, including split z-columns (the case
where a neighbor column has voxels at z-1 and z+1 but not z, which the
alignment-fallback ``ext`` encoding exists to cover).
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from treemorph_tpu.ops.sparse import (
    _zconv_impl,
    build_rulebook,
    build_zplan,
    dedup_sort_perm,
    subm_conv_apply,
    subm_conv_zpack_apply,
)


def lex_sorted_voxels(rng, m=700, cap=768, span=14, batches=2, thin=0.5):
    """Random sparse voxel set, lex-sorted with padding last. ``thin``
    drops voxels to create z-gaps and split columns."""
    raw = np.unique(
        np.stack(
            [
                rng.integers(0, batches, m),
                rng.integers(0, span, m),
                rng.integers(0, span, m),
                rng.integers(0, span, m),
            ],
            axis=1,
        ),
        axis=0,
    )
    keep = rng.random(len(raw)) > thin * 0.5
    raw = raw[keep]
    n = len(raw)
    assert n <= cap
    coords = np.zeros((cap, 4), np.int32)
    coords[:n] = raw
    valid = np.zeros(cap, bool)
    valid[:n] = True
    perm = np.asarray(
        dedup_sort_perm(jnp.asarray(coords), jnp.asarray(valid))
    )
    return coords[perm], valid[perm]


def brute_force_subm_conv(coords, valid, feats, w, k):
    """O(M * K^3) numpy oracle with spconv semantics."""
    index = {tuple(c): i for i, c in enumerate(coords) if valid[i]}
    shift = (k - 1) // 2
    m, cin = feats.shape
    cout = w.shape[-1]
    out = np.zeros((m, cout), np.float32)
    ki = 0
    for dx in range(-shift, shift + 1):
        for dy in range(-shift, shift + 1):
            for dz in range(-shift, shift + 1):
                for j in range(m):
                    if not valid[j]:
                        continue
                    b, x, y, z = coords[j]
                    src = index.get((b, x + dx, y + dy, z + dz))
                    if src is not None:
                        out[j] += feats[src] @ w[ki]
                ki += 1
    return out


@pytest.fixture
def rng():
    return np.random.default_rng(0)


class TestZPlan:
    def test_zshift_points_at_true_z_neighbors(self, rng):
        coords, valid = lex_sorted_voxels(rng)
        k = 3
        r = (k - 1) // 2
        plan = build_zplan(
            jnp.asarray(coords), jnp.asarray(valid), k,
            verify_coords=True,
        )
        zshift = np.asarray(plan.zshift)
        dzs = [*range(-2 * r, 0), *range(1, 2 * r + 1)]
        assert zshift.shape[1] == len(dzs)
        index = {
            tuple(c): i for i, c in enumerate(coords) if valid[i]
        }
        for t, dz in enumerate(dzs):
            for j in range(len(coords)):
                if not valid[j]:
                    assert zshift[j, t] == 0
                    continue
                b, x, y, z = coords[j]
                target = index.get((b, x, y, z + dz))
                if target is None:
                    assert zshift[j, t] == 0, (j, dz)
                else:
                    assert j + zshift[j, t] == target, (j, dz)
                    assert zshift[j, t] != 0

    def test_ext_targets_are_window_voxels(self, rng):
        """Every non-missing ext entry must decode to a voxel of the
        right column within alignment reach r."""
        coords, valid = lex_sorted_voxels(rng)
        k, r = 3, 1
        plan = build_zplan(
            jnp.asarray(coords), jnp.asarray(valid), k,
            verify_coords=True,
        )
        ext = np.asarray(plan.ext)
        m = len(coords)
        missing = (2 * r + 1) * m
        from treemorph_tpu.ops.sparse import plane_offsets

        offs = np.asarray(plane_offsets(k))
        index = {
            tuple(c): i for i, c in enumerate(coords) if valid[i]
        }
        for j in range(m):
            if not valid[j]:
                continue
            b, x, y, z = coords[j]
            for o, (dx, dy) in enumerate(offs):
                entry = ext[j, o]
                in_reach = [
                    a
                    for a in range(-r, r + 1)
                    if (b, x + dx, y + dy, z + a) in index
                ]
                if not in_reach:
                    assert entry == missing, (j, o)
                else:
                    a = entry // m - r
                    jp = entry % m
                    assert a in in_reach
                    assert (
                        tuple(coords[jp])
                        == (b, x + dx, y + dy, z + a)
                    )


class TestZPackConv:
    @pytest.mark.parametrize(
        "k,cin,cout", [(3, 8, 8), (3, 8, 16), (5, 4, 32)]
    )
    def test_matches_gather_engine(self, rng, k, cin, cout):
        coords, valid = lex_sorted_voxels(rng)
        cj, vj = jnp.asarray(coords), jnp.asarray(valid)
        feats = jnp.asarray(
            rng.normal(size=(len(coords), cin)).astype(np.float32)
        )
        w = jnp.asarray(
            rng.normal(size=(k**3, cin, cout)).astype(np.float32) * 0.1
        )
        rb = build_rulebook(cj, vj, k, verify_coords=True)
        want = np.asarray(subm_conv_apply(feats, w, rb, vj))
        plan = build_zplan(cj, vj, k, verify_coords=True)
        got = np.asarray(subm_conv_zpack_apply(feats, w, plan, vj))
        np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)

    def test_split_column_case(self):
        """Neighbor column with voxels at z-1 and z+1 but NOT z: both
        must contribute (the case a center-aligned-only packing loses)."""
        coords = np.array(
            [
                [0, 5, 5, 4],  # (dx=1) neighbor at z-1
                [0, 5, 5, 6],  # (dx=1) neighbor at z+1 — no z=5 voxel
                [0, 6, 5, 5],  # output voxel
                [0, 0, 0, 0],
            ],
            np.int32,
        )
        valid = np.array([1, 1, 1, 0], bool)
        cj, vj = jnp.asarray(coords), jnp.asarray(valid)
        feats = jnp.asarray(
            np.array([[1.0], [10.0], [100.0], [0.0]], np.float32)
        )
        w = jnp.asarray(
            np.random.default_rng(1)
            .normal(size=(27, 1, 2))
            .astype(np.float32)
        )
        rb = build_rulebook(cj, vj, 3, verify_coords=True)
        want = np.asarray(subm_conv_apply(feats, w, rb, vj))
        plan = build_zplan(cj, vj, 3, verify_coords=True)
        got = np.asarray(subm_conv_zpack_apply(feats, w, plan, vj))
        np.testing.assert_allclose(got, want, rtol=1e-6, atol=1e-6)
        # sanity vs brute force too
        bf = brute_force_subm_conv(
            coords, valid, np.asarray(feats), np.asarray(w), 3
        )
        np.testing.assert_allclose(want, bf, rtol=1e-5, atol=1e-5)

    def test_matches_brute_force_small(self, rng):
        coords, valid = lex_sorted_voxels(rng, m=150, cap=160, span=6)
        cj, vj = jnp.asarray(coords), jnp.asarray(valid)
        cin, cout = 3, 5
        feats = rng.normal(size=(len(coords), cin)).astype(np.float32)
        w = rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1
        plan = build_zplan(cj, vj, 3, verify_coords=True)
        got = np.asarray(
            subm_conv_zpack_apply(
                jnp.asarray(feats), jnp.asarray(w), plan, vj
            )
        )
        bf = brute_force_subm_conv(coords, valid, feats, w, 3)
        np.testing.assert_allclose(got, bf, rtol=1e-4, atol=1e-4)

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
        plan = build_zplan(cj, vj, 3, verify_coords=True)
        tgt = jnp.asarray(
            rng.normal(size=(len(coords), cout)).astype(np.float32)
        )

        def loss_gather(f, w):
            return jnp.sum((subm_conv_apply(f, w, rb, vj) - tgt) ** 2)

        def loss_zpack(f, w):
            return jnp.sum(
                (subm_conv_zpack_apply(f, w, plan, vj) - tgt) ** 2
            )

        gf, gw = jax.grad(loss_gather, argnums=(0, 1))(feats, w)
        zf, zw = jax.grad(loss_zpack, argnums=(0, 1))(feats, w)
        np.testing.assert_allclose(
            np.asarray(zf), np.asarray(gf), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(zw), np.asarray(gw), rtol=1e-4, atol=1e-4
        )

    def test_custom_vjp_matches_autodiff_of_impl(self, rng):
        coords, valid = lex_sorted_voxels(rng, m=200, cap=256)
        cj, vj = jnp.asarray(coords), jnp.asarray(valid)
        cin, cout = 5, 7
        feats = jnp.asarray(
            rng.normal(size=(len(coords), cin)).astype(np.float32)
        )
        w = jnp.asarray(
            rng.normal(size=(27, cin, cout)).astype(np.float32) * 0.1
        )
        plan = build_zplan(cj, vj, 3, verify_coords=True)

        def loss_custom(f, w):
            return jnp.sum(subm_conv_zpack_apply(f, w, plan, vj) ** 2)

        def loss_auto(f, w):
            out = _zconv_impl(
                jnp.float32, f, w, plan.ext, plan.zshift, vj
            )
            return jnp.sum(out**2)

        cf, cw = jax.grad(loss_custom, argnums=(0, 1))(feats, w)
        af, aw = jax.grad(loss_auto, argnums=(0, 1))(feats, w)
        np.testing.assert_allclose(
            np.asarray(cf), np.asarray(af), rtol=1e-4, atol=1e-4
        )
        np.testing.assert_allclose(
            np.asarray(cw), np.asarray(aw), rtol=1e-4, atol=1e-4
        )


class TestModelIntegration:
    def test_treelearn_zpack_engine_forward(self, rng):
        """engine='zpack' matches engine='gather' with the SAME params
        (checkpoint-interchangeable: zpack reuses the gather blocks)."""
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

        mz = TreeLearn(engine="zpack", **kwargs)
        vars_z = mz.init(jax.random.PRNGKey(0), *args, train=False)
        assert jax.tree_util.tree_structure(
            vars_g
        ) == jax.tree_util.tree_structure(vars_z)
        out_z = mz.apply(vars_g, *args, train=False)

        for key in ("offset_predictions", "semantic_prediction_logits"):
            np.testing.assert_allclose(
                np.asarray(out_z[key]),
                np.asarray(out_g[key]),
                rtol=2e-4, atol=2e-4,
            )
        assert int(out_z["dropped_points"]) == 0
        assert int(out_z["dropped_voxels"]) == int(out_g["dropped_voxels"])
