"""PTv3 checkpoint import: reference torch PTv3 -> our flax variables.

The reference PTv3 needs spconv / torch_scatter / timm / addict (none
installed); this test runs the REAL reference module code on torch-CPU by
stubbing those four libraries with exact functional equivalents sized for
tiny inputs:

- ``spconv.SubMConv3d`` -> brute-force submanifold conv over
  (batch, x, y, z) indices with weight layout ``(out, k, k, k, in)``,
  offset enumeration (dx, dy, dz) dz-fastest (the layout
  ``import_torch._subm_kernel`` assumes; an axis-permuted spconv build
  would need ``flip_kernel`` — undetectable from shapes, documented
  there);
- ``torch_scatter.segment_csr`` -> scatter_reduce equivalent;
- ``timm.models.layers.DropPath`` -> identity at eval;
- ``addict.Dict`` -> attribute-access dict.

Our model runs with ``pad_per_element=True`` (reference window
partitioning) and the reference's serialization depth, so activations are
comparable end-to-end.
"""

import sys
import types

import numpy as np
import pytest

torch = pytest.importorskip("torch")


def _install_stubs():
    if "addict" not in sys.modules:
        class ADict(dict):
            def __init__(self, *args, **kwargs):
                super().__init__()
                for a in args:
                    if a:
                        self.update(a)
                self.update(kwargs)

            def __getattr__(self, k):
                try:
                    return self[k]
                except KeyError:
                    raise AttributeError(k)

            def __setattr__(self, k, v):
                self[k] = v

        addict = types.ModuleType("addict")
        addict.Dict = ADict
        sys.modules["addict"] = addict

    if "timm" not in sys.modules:
        class DropPath(torch.nn.Module):
            def __init__(self, drop_prob=0.0):
                super().__init__()
                self.drop_prob = drop_prob

            def forward(self, x):
                return x

        timm = types.ModuleType("timm")
        models = types.ModuleType("timm.models")
        layers = types.ModuleType("timm.models.layers")
        layers.DropPath = DropPath
        models.layers = layers
        timm.models = models
        sys.modules["timm"] = timm
        sys.modules["timm.models"] = models
        sys.modules["timm.models.layers"] = layers

    if "torch_scatter" not in sys.modules:
        def segment_csr(src, indptr, reduce="max"):
            counts = indptr[1:] - indptr[:-1]
            n = counts.shape[0]
            seg = torch.repeat_interleave(
                torch.arange(n, device=src.device), counts
            )
            shape = (n,) + src.shape[1:]
            idx = seg.view(-1, *([1] * (src.dim() - 1))).expand_as(src)
            if reduce in ("max", "min"):
                init = torch.finfo(src.dtype).min if reduce == "max" \
                    else torch.finfo(src.dtype).max
                out = torch.full(shape, init, dtype=src.dtype)
                out.scatter_reduce_(
                    0, idx, src, "amax" if reduce == "max" else "amin"
                )
            elif reduce == "sum":
                out = torch.zeros(shape, dtype=src.dtype)
                out.scatter_reduce_(0, idx, src, "sum")
            else:  # mean
                out = torch.zeros(shape, dtype=src.dtype)
                out.scatter_reduce_(0, idx, src, "mean",
                                    include_self=False)
            return out

        ts = types.ModuleType("torch_scatter")
        ts.segment_csr = segment_csr
        sys.modules["torch_scatter"] = ts

    if "spconv" not in sys.modules:
        class SparseConvTensor:
            def __init__(self, features, indices, spatial_shape,
                         batch_size):
                self.features = features
                self.indices = indices
                self.spatial_shape = spatial_shape
                self.batch_size = batch_size

            def replace_feature(self, feat):
                return SparseConvTensor(
                    feat, self.indices, self.spatial_shape,
                    self.batch_size,
                )

        class SubMConv3d(torch.nn.Module):
            def __init__(self, in_channels, out_channels, kernel_size=3,
                         bias=False, indice_key=None, padding=0,
                         stride=1):
                super().__init__()
                k = kernel_size
                self.kernel_size = k
                self.weight = torch.nn.Parameter(
                    torch.randn(out_channels, k, k, k, in_channels)
                    * (in_channels * k**3) ** -0.5
                )
                self.bias = (
                    torch.nn.Parameter(torch.zeros(out_channels))
                    if bias else None
                )

            def forward(self, x):
                idx = x.indices.long()  # (N, 4) = (b, gx, gy, gz)
                feats = x.features
                lut = {tuple(r.tolist()): i for i, r in enumerate(idx)}
                k = self.kernel_size
                r = (k - 1) // 2
                out = feats.new_zeros(
                    feats.shape[0], self.weight.shape[0]
                )
                for a in range(k):
                    for b_ in range(k):
                        for c in range(k):
                            w = self.weight[:, a, b_, c, :]  # (out, in)
                            rows, cols = [], []
                            for i, row in enumerate(idx.tolist()):
                                key = (
                                    row[0], row[1] + a - r,
                                    row[2] + b_ - r, row[3] + c - r,
                                )
                                j = lut.get(key)
                                if j is not None:
                                    rows.append(i)
                                    cols.append(j)
                            if rows:
                                out[rows] += feats[cols] @ w.T
                if self.bias is not None:
                    out = out + self.bias
                return x.replace_feature(out)

        pytorch = types.ModuleType("spconv.pytorch")
        pytorch.SubMConv3d = SubMConv3d
        pytorch.SparseConvTensor = SparseConvTensor
        modules = types.ModuleType("spconv.pytorch.modules")
        modules.is_spconv_module = lambda m: isinstance(m, SubMConv3d)
        pytorch.modules = modules
        spconv = types.ModuleType("spconv")
        spconv.pytorch = pytorch
        sys.modules["spconv"] = spconv
        sys.modules["spconv.pytorch"] = pytorch
        sys.modules["spconv.pytorch.modules"] = modules


@pytest.fixture(scope="module")
def ref_ptv3():
    _install_stubs()
    if "/root/reference" not in sys.path:
        sys.path.insert(0, "/root/reference")
    from Modules.PointTransformerV3.PointTransformerV3 import (
        PointTransformerWithHeads as RefPTv3,
    )

    torch.manual_seed(0)
    m = RefPTv3(dim_feat=4, use_feats=True, voxel_size=0.05,
                enable_flash=False)
    m.backbone.shuffle_orders = False
    m.eval()
    return m


TINY_N = 1024  # stub spconv is O(N * k^3); keep it small


def _cloud(rng, n=TINY_N, voxel=0.05):
    """Two ~512-point batch elements, one point per voxel cell.

    Dedup matters: duplicate grid coords make spconv's neighbor choice
    ambiguous (its hash keeps a different duplicate than ours — a real
    tie-breaking difference with no behavioral meaning). Both models
    compute ``floor((coord - coord.min(0)) / voxel)`` in float32
    (IEEE-identical trunc for non-negatives), but subsetting the cloud
    MOVES the min, which can re-merge distinct cells — so dedup must be
    iterated to a fixed point under the subset's own grid origin.

    Element sizes <= patch_size (1024) mean BOTH models attend whole
    elements at every level — attention is permutation-invariant within a
    window, so the serialization-depth difference (ours static 16,
    reference adaptive) cannot affect the comparison.
    """
    from treemorph_tpu.fixtures import synthetic_cylinder_cloud

    labeled = synthetic_cylinder_cloud(8 * n, rng=rng)
    coords = labeled[:, :3].astype(np.float32)
    feats = labeled[:, 7:].astype(np.float32)

    def cells_of(c):
        return np.floor((c - c.min(0)) / np.float32(voxel)).astype(
            np.int64
        )

    _, first = np.unique(cells_of(coords), axis=0, return_index=True)
    keep = np.sort(first)[:n]
    coords, feats = coords[keep], feats[keep]
    while True:
        _, first = np.unique(cells_of(coords), axis=0, return_index=True)
        if first.shape[0] == coords.shape[0]:
            break
        keep = np.sort(first)
        coords, feats = coords[keep], feats[keep]
    m = coords.shape[0]
    assert m > 0.9 * n, "lost too many cells to dedup"
    batch = np.zeros(m, np.int64)
    batch[m // 2:] = 1
    # reference Point requires batch-sorted input
    return coords, feats, batch


def _match_rows(ref_feat, ref_grid, ref_batch, ps):
    """Max |diff| over rows matched by (batch, grid) key; also the count
    of reference rows absent from our level (must be 0)."""
    of = np.asarray(ps.feat)
    og = np.asarray(ps.grid_coord)
    ob = np.asarray(ps.batch)
    ov = np.asarray(ps.valid)
    lut = {
        (ob[i], og[i, 0], og[i, 1], og[i, 2]): i
        for i in range(of.shape[0])
        if ov[i]
    }
    miss, dmax = 0, 0.0
    for j in range(ref_feat.shape[0]):
        i = lut.get(
            (ref_batch[j], ref_grid[j, 0], ref_grid[j, 1], ref_grid[j, 2])
        )
        if i is None:
            miss += 1
            continue
        dmax = max(dmax, float(np.abs(of[i] - ref_feat[j]).max()))
    return miss, dmax


class TestPTv3Import:
    @pytest.mark.slow
    def test_forward_parity_with_reference(self, rng, ref_ptv3, tmp_path):
        """Stage-wise activation parity, reference torch model vs ours
        with converted weights.

        Tolerances follow the measured drift profile
        (scripts/debug_ptv3_parity.py): with identical weights the stem
        matches to 1e-7 and every module matches its reference
        counterpart to <4e-4 GIVEN IDENTICAL INPUTS, but fp accumulation
        differences amplify through 24 random-init pre-norm blocks
        (LayerNorm chains at the 26-row deep levels are chaotic, ~100x
        per stage) — so per-level bounds grow with depth and the final
        heads are checked by correlation, not elementwise equality.
        """
        import jax
        import jax.numpy as jnp

        from treemorph_tpu.models.ptv3 import PointTransformerWithHeads
        from treemorph_tpu.train.import_torch import (
            convert_ptv3,
            load_state_dict,
        )

        coords, feats, batch = _cloud(rng)
        n = coords.shape[0]

        from Modules.PointTransformerV3.blocks import Point

        stages = {}
        with torch.no_grad():
            # bypass the forward()'s hardcoded .to('cuda') casts: build
            # the point dict ourselves, stepwise through the backbone
            point = Point(
                {
                    "coord": torch.tensor(coords),
                    "feat": torch.tensor(feats),
                    "grid_size": ref_ptv3.voxel_size,
                    "batch": torch.tensor(batch),
                }
            )
            point.serialization(
                order=ref_ptv3.backbone.order, shuffle_orders=False
            )
            point.sparsify()
            point = ref_ptv3.backbone.embedding(point)
            stages["stem"] = (
                point.feat.numpy().copy(),
                point.grid_coord.numpy().copy(),
                point.batch.numpy().copy(),
            )
            for s, enc in ref_ptv3.backbone.enc._modules.items():
                for name, sub in enc._modules.items():
                    point = sub(point)
                    stages[f"{s}.{name}"] = (
                        point.feat.numpy().copy(),
                        point.grid_coord.numpy().copy(),
                        point.batch.numpy().copy(),
                    )
            for s, dec in ref_ptv3.backbone.dec._modules.items():
                for name, sub in dec._modules.items():
                    point = sub(point)
                    stages[f"{s}.{name}"] = (
                        point.feat.numpy().copy(),
                        point.grid_coord.numpy().copy(),
                        point.batch.numpy().copy(),
                    )
            out_ref = ref_ptv3.forward_head(point)
        ref_off = out_ref["offset_predictions"].numpy()
        ref_sem = out_ref["semantic_prediction_logits"].numpy()

        path = tmp_path / "ptv3.pt"
        torch.save(ref_ptv3.state_dict(), path)
        sd = load_state_dict(str(path))

        # our model: identical arch constants; pad_per_element reproduces
        # the reference's window partitioning (serialization depth does
        # not matter: whole-element windows, see _cloud docstring)
        model = PointTransformerWithHeads(
            dim_feat=4, use_feats=True, voxel_size=0.05,
            drop_path=0.0, pad_per_element=True, num_elements=2,
        )
        # pad to the attention patch with invalid rows (the standard
        # static-shape batching); compare the first n real rows
        p = -(-n // 1024) * 1024
        pad = p - n
        args = (
            jnp.asarray(np.pad(coords, ((0, pad), (0, 0)))),
            jnp.asarray(np.pad(feats, ((0, pad), (0, 0)))),
            jnp.asarray(np.pad(batch, (0, pad)), jnp.int32),
            jnp.arange(p) < n,
        )
        template = model.init(jax.random.key(0), *args, False)
        variables = convert_ptv3(sd, template)
        out, state = model.apply(
            variables, *args, False, capture_intermediates=True,
            mutable=["intermediates"],
        )
        inter = state["intermediates"]["backbone"]

        def cap_ps(key):
            v = inter
            for part in key.split("/"):
                v = v[part]
            v = v["__call__"][0]
            # PointSet is itself a (named) tuple — check for .feat first
            if hasattr(v, "feat"):
                return v
            return v[0] if isinstance(v, tuple) else v

        # stem: rows are in input order on both sides -> exact compare
        ref_stem = stages["stem"][0]
        got_stem = np.asarray(cap_ps("embedding").feat)[:n]
        np.testing.assert_allclose(got_stem, ref_stem, atol=1e-5)

        # per-level bounds: measured drift x ~3 margin
        checks = [
            ("enc0.block1", "enc0_block1", 1e-2),
            ("enc1.block1", "enc1_block1", 4e-2),
            ("enc2.block1", "enc2_block1", 1e-1),
            ("enc4.block1", "enc4_block1", 1.5e-1),
            ("dec3.up", "dec3_up", 1.5e-1),
        ]
        for ref_key, our_key, tol in checks:
            rf, rg, rb = stages[ref_key]
            miss, dmax = _match_rows(rf, rg, rb, cap_ps(our_key))
            assert miss == 0, f"{ref_key}: {miss} rows unmatched"
            assert dmax < tol, f"{ref_key}: max|diff| {dmax:.3g} > {tol}"

        # heads: chaotic amplification through the decoder rules out
        # elementwise bounds (measured correlation with identical weights
        # is ~0.84 at this depth/seed); the discriminative checks are the
        # per-level bounds above — this is a smoke bound a mis-routed
        # weight family (correlation ~0) cannot pass
        got_off = np.asarray(out["offset_predictions"])[:n]
        got_sem = np.asarray(out["semantic_prediction_logits"])[:n]
        for got, ref in ((got_off, ref_off), (got_sem, ref_sem)):
            r = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
            assert r > 0.6, f"head correlation {r:.4f}"
            scale = np.abs(ref).max()
            assert np.abs(got - ref).max() < scale

    def test_structure_mismatch_raises(self, rng, ref_ptv3):
        import jax
        import jax.numpy as jnp

        from treemorph_tpu.models.ptv3 import PointTransformerWithHeads
        from treemorph_tpu.train.import_torch import convert_ptv3

        sd = {k: v.numpy() for k, v in ref_ptv3.state_dict().items()}
        wrong = PointTransformerWithHeads(
            dim_feat=4,
            enc_depths=(1, 1), enc_channels=(16, 32),
            enc_num_head=(2, 4), enc_patch_size=(64, 64),
            dec_depths=(1,), dec_channels=(16,), dec_num_head=(2,),
            dec_patch_size=(64,),
        )
        n = 128
        template = wrong.init(
            jax.random.key(0),
            jnp.zeros((n, 3)), jnp.zeros((n, 4)),
            jnp.zeros(n, jnp.int32), jnp.ones(n, bool), False,
        )
        with pytest.raises((ValueError, KeyError)):
            convert_ptv3(sd, template)
