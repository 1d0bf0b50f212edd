"""Sharding-spec proof for the data-parallel train step (VERDICT r2 #8).

CPU wall-clock cannot show weak scaling, so instead we assert the
*compiled program* has the right structure on the 8-device mesh: the
gradient/loss reductions are the ONLY collectives (all-reduce family),
no all-gather / all-to-all / permute appears, and the updated
parameters stay fully replicated. Plain GSPMD fails this: the flat
point list spans the global batch, so XLA all-gathers it and REPLICATES
every voxelize/dedup sort on all devices — the shard_map step in
make_train_step(mesh=...) keeps those local, which is what weak-scales
over ICI on real hardware.
"""

import re

import numpy as np
import pytest

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from treemorph_tpu.models import TreeLearn
from treemorph_tpu.parallel import make_mesh
from treemorph_tpu.parallel.mesh import (
    pad_batch_to_multiple,
    replicate,
    shard_batch,
)
from treemorph_tpu.train import create_train_state, make_train_step
from treemorph_tpu.train import families
from treemorph_tpu.train.harness import make_eval_step, make_optimizer


def _collective_ops(hlo: str) -> dict:
    """Count collective ops in compiled (post-SPMD-partitioning) HLO."""
    counts = {}
    for name in (
        "all-reduce",
        "all-gather",
        "all-to-all",
        "collective-permute",
        "reduce-scatter",
    ):
        counts[name] = len(re.findall(rf"= \S*{name}", hlo)) + len(
            re.findall(rf"\b{name}\(", hlo)
        )
    return counts


@pytest.mark.slow
def test_dp_train_step_collective_structure_and_parity():
    import __graft_entry__ as ge

    n = 8
    assert jax.device_count() >= n
    mesh = make_mesh(n)
    batch = ge._example_batch(n_samples=n, n_points=128, bucket=128)
    batch = pad_batch_to_multiple(batch, n)
    sharded = shard_batch(batch, mesh)

    model = TreeLearn(
        channels=8, num_blocks=2, dim_feat=4, voxel_size=0.05,
        batch_size=batch.batch_size,
    )
    variables = families.init_treelearn(model, batch, jax.random.key(0))
    tx = make_optimizer()
    state = replicate(create_train_state(variables, tx), mesh)
    forward_fn, loss_fn = families.treelearn_family(
        model, axis_name="data"
    )
    train_step = make_train_step(forward_fn, loss_fn, tx, mesh=mesh)

    compiled = train_step.lower(
        state, sharded, jnp.float32(1e-3), jax.random.key(1)
    ).compile()
    counts = _collective_ops(compiled.as_text())

    # the gradient/loss psum must exist...
    assert counts["all-reduce"] > 0, counts
    # ...and be the ONLY cross-device communication: an all-gather /
    # all-to-all / permute would mean data got resharded (e.g. the flat
    # point list re-globalized for a replicated sort)
    for bad in ("all-gather", "all-to-all", "collective-permute"):
        assert counts[bad] == 0, (bad, counts)

    new_state, metrics = compiled(
        state, sharded, jnp.float32(1e-3), jax.random.key(1)
    )
    assert np.isfinite(float(metrics["loss"]))
    # params stay fully replicated (no implicit resharding of the carry)
    for leaf in jax.tree_util.tree_leaves(new_state.params):
        spec = leaf.sharding.spec
        assert all(axis is None for axis in spec), spec
    # and the batch really is spread over all 8 devices
    assert len({d.id for d in sharded.coords.sharding.device_set}) == n

    # numeric parity: the sharded step approximates the single-device
    # step on the identical global batch. The loss reductions are exact
    # (psum'd num/den); the remaining deviation is BatchNorm normalizing
    # with per-shard batch statistics instead of global ones — the torch
    # DDP default (non-sync BN), documented on make_train_step.
    # TreeLearn's forward ignores rng, so fold_in does not bite here.
    fwd1, loss1 = families.treelearn_family(model)
    step1 = make_train_step(fwd1, loss1, tx)
    state1 = create_train_state(variables, tx)
    new_state1, metrics1 = step1(
        state1, jax.tree.map(jnp.asarray, batch), jnp.float32(1e-3),
        jax.random.key(1),
    )
    np.testing.assert_allclose(
        float(metrics["loss"]), float(metrics1["loss"]), rtol=1e-2
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(new_state.params),
        jax.tree_util.tree_leaves(new_state1.params),
    ):
        # one AdamW step moves params by <= lr; BN-stat differences
        # perturb the direction slightly, never the magnitude scale
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=2.5e-3
        )

    # eval has NO per-batch statistics (BN uses running averages), so the
    # sharded eval step must agree with the single-device one to fp
    # reduction order — a tight check that the psum'd masked means are
    # exactly the global means
    eval_mesh = make_eval_step(forward_fn, loss_fn, mesh=mesh)
    eval_one = make_eval_step(fwd1, loss1)
    # evaluate the IDENTICAL (pre-step) params on both paths
    m_mesh = eval_mesh(state, sharded)
    m_one = eval_one(
        create_train_state(variables, tx),
        jax.tree.map(jnp.asarray, batch),
    )
    for k in m_one:
        # not exact: the offset loss is sqrt(clip(sq, 1e-8)) and many
        # synthetic points sit at the clip boundary, where reduction-
        # order fp jitter in sq flips the clip (|d sqrt| ~ 1e-4/point)
        np.testing.assert_allclose(
            float(m_mesh[k]), float(m_one[k]), rtol=5e-4
        )
    # and the sharded eval program itself contains no all-gathers either
    ev_counts = _collective_ops(
        eval_mesh.lower(state, sharded).compile().as_text()
    )
    for bad in ("all-gather", "all-to-all", "collective-permute"):
        assert ev_counts[bad] == 0, (bad, ev_counts)


@pytest.mark.slow
def test_sharded_raster_inference_collective_structure():
    """predict_rasterized_sharded's compiled program (VERDICT r3 #7):
    raster tiles shard over the data axis, the per-point accumulators
    reassemble with ONE psum_scatter each (reduce-scatter family), and
    the point list is never all-gathered."""
    from treemorph_tpu.models import PointNet2
    from treemorph_tpu.pipeline.predict import make_raster_shard_fn

    n = 8
    assert jax.device_count() >= n
    mesh = make_mesh(n)

    model = PointNet2(depth=2, dim_feat=4, use_coords=True,
                      use_features=True)
    max_pts, minibatch, n_pad = 64, 2, 1024
    variables = jax.jit(
        lambda r, c, f, v: model.init(r, c, f, v, train=False)
    )(
        jax.random.key(0),
        jnp.zeros((minibatch, max_pts, 3)),
        jnp.zeros((minibatch, max_pts, 4)),
        jnp.ones((minibatch, max_pts), bool),
    )
    run = make_raster_shard_fn(
        model, "offset_predictions", mesh, minibatch, n_pad, max_pts
    )

    r_pad = 2 * minibatch * n  # 2 minibatches per device
    rng = np.random.default_rng(0)
    idx = jnp.asarray(
        rng.integers(0, n_pad, (r_pad, max_pts)).astype(np.int32)
    )
    vmask = jnp.ones((r_pad, max_pts), bool)
    pts = jnp.asarray(rng.normal(size=(n_pad, 3)).astype(np.float32))
    feats = jnp.asarray(rng.normal(size=(n_pad, 4)).astype(np.float32))

    compiled = run.lower(idx, vmask, pts, feats, variables).compile()
    counts = _collective_ops(compiled.as_text())

    # the two psum_scatters must exist (reduce-scatter, or all-reduce if
    # the backend lowers them that way)...
    assert counts["reduce-scatter"] + counts["all-reduce"] > 0, counts
    # ...and the full point list must never be re-globalized
    assert counts["all-gather"] == 0, counts
    assert counts["all-to-all"] == 0, counts

    acc, cnt = compiled(idx, vmask, pts, feats, variables)
    assert np.all(np.isfinite(np.asarray(acc)))
    # every raster point was counted once per occurrence across chips
    assert float(jnp.sum(cnt)) == pytest.approx(r_pad * max_pts)
