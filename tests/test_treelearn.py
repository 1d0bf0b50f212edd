import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from treemorph_tpu.fixtures import synthetic_cylinder_cloud
from treemorph_tpu.models import TreeLearn, treelearn_loss


@pytest.fixture(scope="module")
def flat_batch():
    rng = np.random.default_rng(3)
    labeled = synthetic_cylinder_cloud(800, rng=rng)
    p = 1024  # pad to bucket
    coords = np.zeros((p, 3), np.float32)
    feats = np.zeros((p, 4), np.float32)
    offs = np.zeros((p, 3), np.float32)
    coords[:800] = labeled[:, :3]
    feats[:800] = labeled[:, 7:]
    offs[:800] = labeled[:, 3:6]
    norm = np.linalg.norm(offs, axis=1)
    valid = np.arange(p) < 800
    batch_ids = np.zeros(p, np.int32)
    batch_ids[400:] = 1  # two batch elements
    return {
        "coords": jnp.asarray(coords),
        "feats": jnp.asarray(feats),
        "batch_ids": jnp.asarray(batch_ids),
        "mask_valid": jnp.asarray(valid),
        "offset_labels": jnp.asarray(offs),
        "semantic_labels": jnp.asarray((norm > 0.05).astype(np.int32)),
        "mask_off": jnp.asarray(norm <= 0.05),
    }


class TestTreeLearn:
    def test_forward_shapes_and_masking(self, flat_batch):
        model = TreeLearn(
            channels=8, num_blocks=3, dim_feat=4, voxel_size=0.05,
            batch_size=2
        )
        init = jax.jit(
            lambda r, c, f, b, v: model.init(r, c, f, b, v, train=False)
        )
        variables = init(
            jax.random.key(0),
            flat_batch["coords"],
            flat_batch["feats"],
            flat_batch["batch_ids"],
            flat_batch["mask_valid"],
        )
        apply = jax.jit(
            lambda p, c, f, b, v: model.apply(p, c, f, b, v, train=False)
        )
        out = apply(
            variables,
            flat_batch["coords"],
            flat_batch["feats"],
            flat_batch["batch_ids"],
            flat_batch["mask_valid"],
        )
        p = flat_batch["coords"].shape[0]
        assert out["semantic_prediction_logits"].shape == (p, 2)
        assert out["offset_predictions"].shape == (p, 3)
        assert out["backbone_feats"].shape == (p, 8)
        # padded rows produce zero backbone features
        bb = np.asarray(out["backbone_feats"])
        np.testing.assert_array_equal(bb[800:], 0.0)
        assert np.isfinite(bb).all()
        assert int(out["num_voxels"]) > 0

    def test_voxel_size_controls_resolution(self, flat_batch):
        model_fine = TreeLearn(channels=8, num_blocks=2, voxel_size=0.02,
                               batch_size=2)
        model_coarse = TreeLearn(channels=8, num_blocks=2, voxel_size=0.2,
                                 batch_size=2)
        args = (
            flat_batch["coords"],
            flat_batch["feats"],
            flat_batch["batch_ids"],
            flat_batch["mask_valid"],
        )
        nv = {}
        for name, model in [("fine", model_fine), ("coarse", model_coarse)]:
            init = jax.jit(
                lambda r, c, f, b, v, m=model: m.init(r, c, f, b, v,
                                                      train=False)
            )
            variables = init(jax.random.key(0), *args)
            apply = jax.jit(
                lambda p, c, f, b, v, m=model: m.apply(p, c, f, b, v,
                                                       train=False)
            )
            nv[name] = int(apply(variables, *args)["num_voxels"])
        assert nv["fine"] > nv["coarse"]

    def test_overfits_offsets(self, flat_batch):
        model = TreeLearn(
            channels=8, num_blocks=2, dim_feat=4, voxel_size=0.05,
            batch_size=2
        )
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
        tx = optax.adam(2e-3)
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
                loss, _ = treelearn_loss(
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
        for _ in range(25):
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state
            )
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.8, losses

    def test_noise_cloud_semantic_pass(self, flat_batch):
        model = TreeLearn(channels=8, num_blocks=2, voxel_size=0.05,
                          batch_size=2)
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

        apply_noise = jax.jit(
            lambda p, c, f, b, v: model.apply(
                p, c, f, b, v, train=False,
                noise_coords=c + 0.01, noise_feats=f,
                noise_batch_ids=b, noise_valid=v,
            )
        )
        out = apply_noise(variables, *args)
        assert out["semantic_prediction_logits"].shape[0] == args[0].shape[0]
