#!/usr/bin/env python
"""Stage-by-stage activation diff: reference PTv3 (stubbed deps, CPU)
vs ours with converted weights."""

import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")

import numpy as np
import torch

from test_import_ptv3 import _cloud, _install_stubs

_install_stubs()
if "/root/reference" not in sys.path:
    sys.path.insert(0, "/root/reference")

import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from Modules.PointTransformerV3.PointTransformerV3 import (
    PointTransformerWithHeads as RefPTv3,
)

from treemorph_tpu.models.ptv3 import PointTransformerWithHeads
from treemorph_tpu.train.import_torch import convert_ptv3

rng = np.random.default_rng(0)
torch.manual_seed(0)
ref = RefPTv3(dim_feat=4, use_feats=True, voxel_size=0.05,
              enable_flash=False)
ref.backbone.shuffle_orders = False
ref.eval()

coords, feats, batch = _cloud(rng)
n = coords.shape[0]

# ---- reference, stepwise ----
from Modules.PointTransformerV3.blocks import Point

point_dict = {
    "coord": torch.tensor(coords),
    "feat": torch.tensor(feats),
    "grid_size": 0.05,
    "batch": torch.tensor(batch),
}
stages = {}
with torch.no_grad():
    point = Point(point_dict)
    point.serialization(order=ref.backbone.order, shuffle_orders=False)
    point.sparsify()
    stages["grid_coord"] = point.grid_coord.numpy().copy()
    point = ref.backbone.embedding(point)
    stages["stem"] = point.feat.numpy().copy()
    for s, enc in ref.backbone.enc._modules.items():
        for name, sub in enc._modules.items():
            point = sub(point)
            stages[f"{s}.{name}"] = (
                point.feat.numpy().copy(),
                point.grid_coord.numpy().copy(),
                point.batch.numpy().copy(),
            )
    for s, dec in ref.backbone.dec._modules.items():
        for name, sub in dec._modules.items():
            if s == "dec3" and name == "block0":
                # stepwise through the block internals
                blk = sub
                shortcut = point.feat.clone()
                pt = blk.cpe(point)
                stages["dec3.b0.cpe"] = (
                    pt.feat.numpy().copy(),
                    pt.grid_coord.numpy().copy(),
                    pt.batch.numpy().copy(),
                )
                pt.feat = shortcut + pt.feat
                shortcut = pt.feat.clone()
                pt = blk.norm1(pt)
                stages["dec3.b0.norm1"] = (
                    pt.feat.numpy().copy(),
                    pt.grid_coord.numpy().copy(),
                    pt.batch.numpy().copy(),
                )
                pt = blk.attn(pt)
                stages["dec3.b0.attn"] = (
                    pt.feat.numpy().copy(),
                    pt.grid_coord.numpy().copy(),
                    pt.batch.numpy().copy(),
                )
                pt.feat = shortcut + pt.feat
                shortcut = pt.feat.clone()
                pt = blk.norm2(pt)
                pt = blk.mlp(pt)
                stages["dec3.b0.mlp"] = (
                    pt.feat.numpy().copy(),
                    pt.grid_coord.numpy().copy(),
                    pt.batch.numpy().copy(),
                )
                pt.feat = shortcut + pt.feat
                pt.sparse_conv_feat = pt.sparse_conv_feat.replace_feature(pt.feat)
                point = pt
            else:
                point = sub(point)
            stages[f"{s}.{name}"] = (
                point.feat.numpy().copy(),
                point.grid_coord.numpy().copy(),
                point.batch.numpy().copy(),
            )

sd = {k: v.numpy() for k, v in ref.state_dict().items()}

# ---- ours, stepwise via capture ----
model = PointTransformerWithHeads(
    dim_feat=4, use_feats=True, voxel_size=0.05, drop_path=0.0,
    pad_per_element=True, num_elements=2,
)
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

_, state = model.apply(
    variables, *args, False, capture_intermediates=True,
    mutable=["intermediates"],
)
inter = state["intermediates"]["backbone"]


def walk(d, path=""):
    for k, v in d.items():
        if k == "__call__":
            yield path, v
        elif isinstance(d[k], dict):
            yield from walk(v, f"{path}/{k}")


caps = dict(walk(inter))

# our stem output (Embedding returns a PointSet)
ours_stem = np.asarray(caps["/embedding"][0].feat)
ref_stem = stages["stem"]
# match rows: ours keeps input order; reference keeps input order too
d = np.abs(ours_stem[: ref_stem.shape[0]] - ref_stem)
print(f"stem: ref_n={ref_stem.shape[0]} ours_n={ours_stem.shape[0]} "
      f"max|diff|={d.max():.2e}")


def compare(label, ref_entry, ours_ps):
    ref_feat, ref_grid, ref_batch = ref_entry
    of = np.asarray(ours_ps.feat)
    og = np.asarray(ours_ps.grid_coord)
    ob = np.asarray(ours_ps.batch)
    ov = np.asarray(ours_ps.valid)
    lut = {}
    for i in range(of.shape[0]):
        if ov[i]:
            lut[(ob[i], og[i, 0], og[i, 1], og[i, 2])] = i
    miss, dmax = 0, 0.0
    for j in range(ref_feat.shape[0]):
        key = (ref_batch[j], ref_grid[j, 0], ref_grid[j, 1],
               ref_grid[j, 2])
        i = lut.get(key)
        if i is None:
            miss += 1
            continue
        dmax = max(dmax, float(np.abs(of[i] - ref_feat[j]).max()))
    print(f"{label:14s} ref_n={ref_feat.shape[0]} ours_n={int(ov.sum())} "
          f"miss={miss} max|diff|={dmax:.2e}", flush=True)


# map our capture names to reference stage names
pairs = []
for s in range(5):
    if s > 0:
        pairs.append((f"enc{s}.down", f"/enc{s}_down"))
    depths = (2, 2, 2, 6, 2)
    for i in range(depths[s]):
        pairs.append((f"enc{s}.block{i}", f"/enc{s}_block{i}"))
pairs.append(("dec3.b0.cpe", "/dec3_block0/cpe"))
pairs.append(("dec3.b0.norm1", "/dec3_block0/norm1"))
pairs.append(("dec3.b0.attn", "/dec3_block0/attn"))
pairs.append(("dec3.b0.mlp", "/dec3_block0/mlp"))
for s in (3, 2, 1, 0):
    pairs.append((f"dec{s}.up", f"/dec{s}_up"))
    for i in range(2):
        pairs.append((f"dec{s}.block{i}", f"/dec{s}_block{i}"))

up3 = caps["/dec3_up"][0]
up3 = up3 if hasattr(up3, "feat") else up3[0]

for ref_key, our_key in pairs:
    if ref_key not in stages or our_key not in caps:
        print(f"{ref_key}: missing ({ref_key in stages}, "
              f"{our_key in caps})")
        continue
    out = caps[our_key][0]
    ps = out if hasattr(out, "feat") else (
        out[0] if isinstance(out, tuple) and hasattr(out[0], "feat")
        else out
    )
    if not hasattr(ps, "feat"):
        # raw feat array: borrow row metadata from the dec3_up PointSet
        ps = up3._replace(feat=out)
    compare(ref_key, stages[ref_key], ps)
    if ref_key == "dec3.b0.cpe":
        rf, rg, rb = stages[ref_key]
        of = np.asarray(ps.feat); og = np.asarray(ps.grid_coord)
        ob = np.asarray(ps.batch); ov = np.asarray(ps.valid)
        lut = {(ob[i], og[i,0], og[i,1], og[i,2]): i
               for i in range(of.shape[0]) if ov[i]}
        for j in (0, 5, 12):
            i = lut[(rb[j], rg[j,0], rg[j,1], rg[j,2])]
            print("  ref:", np.round(rf[j][:6], 3))
            print("  our:", np.round(of[i][:6], 3))
