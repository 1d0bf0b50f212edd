"""End-to-end training-harness test on the virtual 8-device CPU mesh."""

import jax
import numpy as np
import pytest

from treemorph_tpu.data import make_padded_batch
from treemorph_tpu.data.treeset import TreeSample
from treemorph_tpu.fixtures import synthetic_cylinder_cloud
from treemorph_tpu.models import PointNet2
from treemorph_tpu.parallel import make_mesh
from treemorph_tpu.train import (
    cosine_annealing_warm_restarts,
    create_train_state,
    make_eval_step,
    make_train_step,
    run_training,
)
from treemorph_tpu.train.checkpoints import restore_checkpoint, save_checkpoint
from treemorph_tpu.train.families import init_pointnet2, pointnet2_family
from treemorph_tpu.train.harness import make_optimizer
from treemorph_tpu.utils import EarlyStopper


def _batch(rng, n_samples=8, n_points=300):
    labeled = synthetic_cylinder_cloud(n_points * n_samples, rng=rng)
    samples = []
    for i in range(n_samples):
        part = labeled[i * n_points : (i + 1) * n_points]
        norm = np.linalg.norm(part[:, 3:6], axis=1)
        samples.append(
            TreeSample(
                points=part[:, :3],
                feats=part[:, 7:],
                offsets=part[:, 3:6],
                semantic_label=(norm > 0.05).astype(np.int32),
                offset_mask=norm <= 0.05,
                path="syn",
            )
        )
    return make_padded_batch(samples, bucket=128)


class TestSchedule:
    def test_matches_torch_formula(self):
        sched = cosine_annealing_warm_restarts(1e-2, t_0=50, eta_min=1e-4)
        assert sched(0) == pytest.approx(1e-2)
        assert sched(50) == pytest.approx(1e-2)  # restart
        assert sched(25) == pytest.approx(
            1e-4 + (1e-2 - 1e-4) * 0.5
        )

    def test_t_mult_growth(self):
        sched = cosine_annealing_warm_restarts(1.0, t_0=10, t_mult=2,
                                               eta_min=0.0)
        assert sched(10) == pytest.approx(1.0)  # first restart at 10
        assert sched(30) == pytest.approx(1.0)  # next cycle is 20 epochs


class TestHarness:
    def test_training_on_mesh_reduces_loss(self, rng):
        assert jax.device_count() >= 8, "tests expect the virtual CPU mesh"
        mesh = make_mesh(8)
        batch = _batch(rng)

        model = PointNet2(depth=5)
        variables = init_pointnet2(model, batch, jax.random.key(0))
        tx = make_optimizer()
        state = create_train_state(variables, tx)

        forward_fn, loss_fn = pointnet2_family(
            model, loss_multiplier_semantic=0.0
        )
        train_step = make_train_step(forward_fn, loss_fn, tx)
        eval_step = make_eval_step(forward_fn, loss_fn)

        saved = []
        stopper = EarlyStopper(patience=10, save_fn=saved.append)
        state, history = run_training(
            state,
            train_step,
            eval_step,
            train_batches=lambda e: iter([batch]),
            val_batches=lambda e: iter([batch]),
            epochs=8,
            lr_schedule=cosine_annealing_warm_restarts(2e-3),
            early_stopper=stopper,
            mesh=mesh,
            rng=jax.random.key(1),
        )
        losses = [h["train_loss"] for h in history]
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0]
        assert len(saved) >= 1  # checkpoint callback fired on improvement

    def test_fixed_modules_freezing(self, rng):
        # Parity with the reference's fixed_modules transfer-learning
        # freeze (/root/reference/Modules/TreeLearn/TreeLearn.py:65-87):
        # frozen submodule params and BN running stats stay bit-identical
        # across optimizer steps while the rest trains.
        import flax.linen as nn
        import jax.numpy as jnp

        class Two(nn.Module):
            @nn.compact
            def __call__(self, x, train):
                x = nn.Sequential([nn.Dense(8)], name="backbone")(x)
                x = nn.BatchNorm(
                    use_running_average=not train, name="backbone_bn"
                )(x)
                return nn.Dense(1, name="head")(x)

        model = Two()
        x = jnp.asarray(rng.normal(size=(16, 4)), jnp.float32)
        y = jnp.asarray(rng.normal(size=(16, 1)), jnp.float32)
        variables = model.init(jax.random.key(0), x, True)

        fixed = ("backbone", "backbone_bn")
        tx = make_optimizer(weight_decay=1e-2, fixed_modules=fixed)
        state = create_train_state(variables, tx)

        def forward_fn(params, batch_stats, batch, train, rng):
            out, mut = model.apply(
                {"params": params, "batch_stats": batch_stats},
                batch["x"], train, mutable=["batch_stats"],
            )
            return {"pred": out}, mut["batch_stats"]

        def loss_fn(out, batch):
            loss = jnp.mean((out["pred"] - batch["y"]) ** 2)
            return loss, {}

        step = make_train_step(forward_fn, loss_fn, tx, fixed_modules=fixed)
        # the train step donates the carried state, so snapshot the
        # initial params/stats host-side before they are consumed
        state = jax.device_get(state)
        new_state = state
        for _ in range(3):
            new_state, _ = step(
                new_state, {"x": x, "y": y}, 1e-2, jax.random.key(1)
            )

        for k in fixed:
            if k in state.params:
                for a, b in zip(
                    jax.tree.leaves(state.params[k]),
                    jax.tree.leaves(new_state.params[k]),
                ):
                    np.testing.assert_array_equal(
                        np.asarray(a), np.asarray(b)
                    )
        for a, b in zip(
            jax.tree.leaves(state.batch_stats["backbone_bn"]),
            jax.tree.leaves(new_state.batch_stats["backbone_bn"]),
        ):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        head_changed = any(
            not np.array_equal(np.asarray(a), np.asarray(b))
            for a, b in zip(
                jax.tree.leaves(state.params["head"]),
                jax.tree.leaves(new_state.params["head"]),
            )
        )
        assert head_changed

    def test_checkpoint_roundtrip(self, tmp_path, rng):
        batch = _batch(rng, n_samples=2, n_points=100)
        model = PointNet2(depth=2)
        variables = init_pointnet2(model, batch, jax.random.key(0))
        tx = make_optimizer()
        state = create_train_state(variables, tx)

        path = str(tmp_path / "ckpt")
        save_checkpoint(path, state, metadata={"model": "pointnet2",
                                               "depth": 2})
        restored = restore_checkpoint(path, state)
        leaves_a = jax.tree.leaves(state.params)
        leaves_b = jax.tree.leaves(restored.params)
        for a, b in zip(leaves_a, leaves_b):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

        from treemorph_tpu.train.checkpoints import load_metadata

        meta = load_metadata(path)
        assert meta == {"model": "pointnet2", "depth": 2}
