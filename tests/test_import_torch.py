"""Checkpoint import: reference torch state_dicts -> our flax variables.

PointNet2 is pure torch, so the REAL reference model runs on CPU and the
converted weights must reproduce its forward numerically. TreeLearn's
reference needs spconv (not installed); its converter is validated
against a synthetic state_dict with the reference's exact naming/shapes
(Modules/TreeLearn/TreeLearn.py:51-61, blocks.py:44-151) plus a
linear-path numeric check.
"""

import sys
import types
from unittest import mock

import jax
import jax.numpy as jnp
import numpy as np
import pytest

torch = pytest.importorskip("torch")

from treemorph_tpu.train.import_torch import (  # noqa: E402
    convert_pointnet2,
    convert_treelearn,
    load_state_dict,
)


@pytest.fixture(scope="module")
def ref_pn2():
    if "fastprogress" not in sys.modules:
        fp = types.ModuleType("fastprogress")
        fp.progress_bar = lambda it, parent=None: it
        fp.master_bar = lambda it: it
        sys.modules["fastprogress"] = fp
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from Modules.PointNet2.PointNet2 import PointNet2 as RefPN2

    torch.manual_seed(0)
    m = RefPN2(depth=2, dim_feat=4, use_coords=True, use_features=True)
    m.eval()
    return m


class TestPointNet2Import:
    def test_forward_parity_with_reference(self, rng, ref_pn2, tmp_path):
        from treemorph_tpu.models import PointNet2

        b, n = 1, 1536
        coords = rng.normal(size=(b, n, 3)).astype(np.float32)
        feats = rng.normal(size=(b, n, 4)).astype(np.float32)

        # reference forward on CPU (forward_backbone is wrapped in a
        # .cuda() cast; call the undecorated function), FPS start pinned
        # to index 0 = our valid-first convention
        with torch.no_grad(), mock.patch.object(
            torch, "randint",
            side_effect=lambda *a, **k: torch.zeros(b, dtype=torch.long),
        ):
            # the reference backbone takes channel-first [B, C, N]
            bb = ref_pn2.forward_backbone.__wrapped__(
                ref_pn2,
                coords=torch.tensor(coords).permute(0, 2, 1),
                feats=torch.tensor(feats).permute(0, 2, 1),
            )
            ref_sem = ref_pn2.semantic_linear(bb).permute(0, 2, 1).numpy()
            ref_off = ref_pn2.offset_linear(bb).permute(0, 2, 1).numpy()

        # our model with the converted checkpoint (round-tripped through
        # a .pt file to exercise load_state_dict)
        path = tmp_path / "pn2.pt"
        torch.save({"state_dict": ref_pn2.state_dict()}, path)
        sd = load_state_dict(str(path))

        ours = PointNet2(depth=2, dim_feat=4, use_coords=True,
                         use_features=True)
        template = ours.init(
            jax.random.key(0), jnp.asarray(coords), jnp.asarray(feats),
            jnp.ones((b, n), bool), train=False,
        )
        variables = convert_pointnet2(sd, template)

        out = ours.apply(
            variables, jnp.asarray(coords), jnp.asarray(feats),
            jnp.ones((b, n), bool), train=False,
        )
        got_sem = np.asarray(out["semantic_prediction_logits"])
        got_off = np.asarray(out["offset_predictions"])

        scale = max(np.abs(ref_off).max(), np.abs(ref_sem).max())
        np.testing.assert_allclose(
            got_off, ref_off, atol=2e-3 * scale, rtol=2e-3
        )
        np.testing.assert_allclose(
            got_sem, ref_sem, atol=2e-3 * scale, rtol=2e-3
        )

    def test_structure_mismatch_raises(self, ref_pn2):
        from treemorph_tpu.models import PointNet2

        sd = {
            k: v.numpy() for k, v in ref_pn2.state_dict().items()
        }
        wrong = PointNet2(depth=3, dim_feat=4)  # depth mismatch
        template = wrong.init(
            jax.random.key(0), jnp.zeros((1, 256, 3)),
            jnp.zeros((1, 256, 4)), jnp.ones((1, 256), bool),
            train=False,
        )
        with pytest.raises((ValueError, KeyError)):
            convert_pointnet2(sd, template)


def _synthetic_treelearn_sd(rng, channels=8, num_blocks=3, in_c=7):
    """A state_dict with the reference TreeLearn's exact key naming and
    spconv KRSC shapes (channels progression c, 2c, 3c)."""
    sd = {}

    def bn(prefix, c):
        sd[f"{prefix}.weight"] = rng.normal(size=(c,)).astype(np.float32)
        sd[f"{prefix}.bias"] = rng.normal(size=(c,)).astype(np.float32)
        sd[f"{prefix}.running_mean"] = rng.normal(size=(c,)).astype(
            np.float32
        )
        sd[f"{prefix}.running_var"] = rng.uniform(
            0.5, 2.0, (c,)
        ).astype(np.float32)

    def subm(key, cin, cout, k=3):
        sd[key] = rng.normal(size=(cout, k, k, k, cin)).astype(
            np.float32
        ) * 0.1

    subm("input_conv.0.weight", in_c, channels)

    def ublock(prefix, planes):
        c = planes[0]
        for i in (0, 1):
            g = f"{prefix}.blocks.block{i}"
            bn(f"{g}.conv_branch.0", c)
            subm(f"{g}.conv_branch.2.weight", c, c)
            bn(f"{g}.conv_branch.3", c)
            subm(f"{g}.conv_branch.5.weight", c, c)
        if len(planes) > 1:
            bn(f"{prefix}.conv.0", c)
            subm(f"{prefix}.conv.2.weight", c, planes[1], k=2)
            bn(f"{prefix}.deconv.0", planes[1])
            subm(f"{prefix}.deconv.2.weight", planes[1], c, k=2)
            ublock(f"{prefix}.u", planes[1:])
            for i in (0, 1):
                g = f"{prefix}.blocks_tail.block{i}"
                cin = c * (2 - i)
                bn(f"{g}.conv_branch.0", cin)
                subm(f"{g}.conv_branch.2.weight", cin, c)
                bn(f"{g}.conv_branch.3", c)
                subm(f"{g}.conv_branch.5.weight", c, c)
                if cin != c:
                    sd[f"{g}.i_branch.0.weight"] = rng.normal(
                        size=(c, 1, 1, 1, cin)
                    ).astype(np.float32)

    ublock("unet", [channels * (i + 1) for i in range(num_blocks)])
    bn("output_layer.0", channels)
    for head, out_c in (("semantic_linear", 2), ("offset_linear", 3)):
        sd[f"{head}.0.weight"] = rng.normal(
            size=(channels, channels)
        ).astype(np.float32)
        sd[f"{head}.0.bias"] = rng.normal(size=(channels,)).astype(
            np.float32
        )
        bn(f"{head}.1", channels)
        sd[f"{head}.3.weight"] = rng.normal(
            size=(out_c, channels)
        ).astype(np.float32)
        sd[f"{head}.3.bias"] = rng.normal(size=(out_c,)).astype(
            np.float32
        )
    return sd


class TestTreeLearnImport:
    def test_synthetic_state_dict_converts_exactly(self, rng):
        from treemorph_tpu.models import TreeLearn

        model = TreeLearn(
            channels=8, num_blocks=3, dim_feat=4, use_coords=True,
            voxel_size=0.1,
        )
        n = 256
        pts = jnp.asarray(
            rng.normal(size=(n, 3)).astype(np.float32) * 2
        )
        fts = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
        template = model.init(
            jax.random.key(0), pts, fts, jnp.zeros(n, jnp.int32),
            jnp.ones(n, bool), train=False,
        )
        sd = _synthetic_treelearn_sd(rng)
        variables = convert_treelearn(sd, template)

        # structure identical to the model's own init
        assert jax.tree_util.tree_structure(
            variables
        ) == jax.tree_util.tree_structure(template)

        # spot-check the layout translations
        w = sd["input_conv.0.weight"]  # (8, 3, 3, 3, 7)
        got = np.asarray(
            variables["params"]["backbone"]["input_conv"]["kernel"]
        )
        np.testing.assert_allclose(
            got[13], w[:, 1, 1, 1, :].T  # center offset = flat index 13
        )
        np.testing.assert_allclose(
            np.asarray(
                variables["params"]["semantic_head"]["Dense_0"]["kernel"]
            ),
            sd["semantic_linear.0.weight"].T,
        )
        np.testing.assert_allclose(
            np.asarray(
                variables["batch_stats"]["backbone"]["output_norm"]["var"]
            ),
            sd["output_layer.0.running_var"],
        )
        # octant layout of the strided conv: (dx<<2)|(dy<<1)|dz
        dw = sd["unet.conv.2.weight"]  # (16, 2, 2, 2, 8)
        got_down = np.asarray(
            variables["params"]["backbone"]["unet"]["down_kernel"]
        )
        np.testing.assert_allclose(got_down[0b101], dw[:, 1, 0, 1, :].T)

        # and the model actually runs with the converted weights
        out = model.apply(
            variables, pts, fts, jnp.zeros(n, jnp.int32),
            jnp.ones(n, bool), train=False,
        )
        assert np.isfinite(
            np.asarray(out["offset_predictions"])
        ).all()

    def test_head_numeric_path(self, rng):
        # the head is pure linear algebra: converted weights must produce
        # torch's Linear->BN(eval)->ReLU->Linear result exactly
        from treemorph_tpu.models import TreeLearn

        model = TreeLearn(
            channels=8, num_blocks=3, dim_feat=4, use_coords=True,
            voxel_size=0.1,
        )
        n = 64
        pts = jnp.asarray(
            rng.normal(size=(n, 3)).astype(np.float32) * 2
        )
        fts = jnp.asarray(rng.normal(size=(n, 4)).astype(np.float32))
        template = model.init(
            jax.random.key(0), pts, fts, jnp.zeros(n, jnp.int32),
            jnp.ones(n, bool), train=False,
        )
        sd = _synthetic_treelearn_sd(rng)
        variables = convert_treelearn(sd, template)

        x = rng.normal(size=(5, 8)).astype(np.float32)
        lin = torch.nn.Linear(8, 8)
        lin.weight.data = torch.tensor(sd["offset_linear.0.weight"])
        lin.bias.data = torch.tensor(sd["offset_linear.0.bias"])
        bnorm = torch.nn.BatchNorm1d(8, eps=1e-4)
        bnorm.weight.data = torch.tensor(sd["offset_linear.1.weight"])
        bnorm.bias.data = torch.tensor(sd["offset_linear.1.bias"])
        bnorm.running_mean.data = torch.tensor(
            sd["offset_linear.1.running_mean"]
        )
        bnorm.running_var.data = torch.tensor(
            sd["offset_linear.1.running_var"]
        )
        bnorm.eval()
        out = torch.nn.Linear(8, 3)
        out.weight.data = torch.tensor(sd["offset_linear.3.weight"])
        out.bias.data = torch.tensor(sd["offset_linear.3.bias"])
        with torch.no_grad():
            want = out(
                torch.relu(bnorm(lin(torch.tensor(x))))
            ).numpy()

        from treemorph_tpu.models.treelearn import MLPHead

        head = MLPHead(3)
        head_vars = {
            "params": variables["params"]["offset_head"],
            "batch_stats": variables["batch_stats"]["offset_head"],
        }
        got = np.asarray(
            head.apply(
                head_vars, jnp.asarray(x), jnp.ones(5, bool),
                False,
            )
        )
        np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_permute_spconv_axes_roundtrip_and_selectivity():
    """'zyx' transposes every 5-D spconv weight's spatial axes (its own
    inverse) and leaves non-conv entries untouched (ADVICE r2 #2)."""
    from treemorph_tpu.train.import_torch import permute_spconv_axes

    rng = np.random.default_rng(0)
    w = rng.normal(size=(4, 3, 3, 3, 2)).astype(np.float32)
    lin = rng.normal(size=(4, 8)).astype(np.float32)
    sd = {"conv.weight": w, "linear.weight": lin}

    out = permute_spconv_axes(sd, "zyx")
    np.testing.assert_array_equal(
        out["conv.weight"], np.transpose(w, (0, 3, 2, 1, 4))
    )
    np.testing.assert_array_equal(out["linear.weight"], lin)
    # zyx is an involution
    back = permute_spconv_axes(out, "zyx")
    np.testing.assert_array_equal(back["conv.weight"], w)
    # identity order is a no-op passthrough
    assert permute_spconv_axes(sd, "xyz") is sd
