import jax
import jax.numpy as jnp
import numpy as np
import optax
import pytest

from treemorph_tpu.data import make_padded_batch
from treemorph_tpu.data.treeset import TreeSample
from treemorph_tpu.fixtures import synthetic_cylinder_cloud
from treemorph_tpu.models import PointNet2, point_wise_loss, pointnet2_loss


def _sample_from_labeled(labeled, noise_distance=0.05):
    off = labeled[:, 3:6]
    norm = np.linalg.norm(off, axis=1)
    return TreeSample(
        points=labeled[:, :3],
        feats=labeled[:, 7:],
        offsets=off,
        semantic_label=(norm > noise_distance).astype(np.int32),
        offset_mask=norm <= noise_distance,
        path="synthetic",
    )


@pytest.fixture(scope="module")
def tiny_batch():
    rng = np.random.default_rng(7)
    labeled = synthetic_cylinder_cloud(600, rng=rng)
    samples = [
        _sample_from_labeled(labeled[:500]),
        _sample_from_labeled(labeled[100:]),
    ]
    return make_padded_batch(samples, bucket=128)


class TestLoss:
    def test_masked_mean_semantics(self, rng):
        n = 50
        logits = rng.normal(size=(n, 2)).astype(np.float32)
        offs = rng.normal(size=(n, 3)).astype(np.float32)
        labels = rng.integers(0, 2, n).astype(np.int32)
        off_labels = rng.normal(size=(n, 3)).astype(np.float32)
        mask = np.ones(n, bool)

        sem, off = point_wise_loss(
            jnp.asarray(logits), jnp.asarray(offs), jnp.asarray(labels),
            jnp.asarray(off_labels), jnp.asarray(mask), jnp.asarray(mask)
        )
        # host oracle
        ex = np.exp(logits - logits.max(1, keepdims=True))
        p = ex / ex.sum(1, keepdims=True)
        ce = -np.log(p[np.arange(n), labels]).mean()
        d = np.sqrt(np.clip(((offs - off_labels) ** 2).sum(1), 1e-8, None))
        assert float(sem) == pytest.approx(ce, rel=1e-5)
        assert float(off) == pytest.approx(d.mean(), rel=1e-5)

    def test_mask_excludes_points(self, rng):
        n = 40
        logits = rng.normal(size=(n, 2)).astype(np.float32)
        offs = np.zeros((n, 3), np.float32)
        labels = np.zeros(n, np.int32)
        off_labels = np.ones((n, 3), np.float32)
        mask = np.zeros(n, bool)
        mask[:10] = True
        _, off_masked = point_wise_loss(
            jnp.asarray(logits), jnp.asarray(offs), jnp.asarray(labels),
            jnp.asarray(off_labels), jnp.asarray(mask), jnp.asarray(mask)
        )
        _, off_first = point_wise_loss(
            jnp.asarray(logits[:10]), jnp.asarray(offs[:10]),
            jnp.asarray(labels[:10]), jnp.asarray(off_labels[:10]),
            jnp.ones(10, bool), jnp.ones(10, bool)
        )
        assert float(off_masked) == pytest.approx(float(off_first), rel=1e-6)


class TestPointNet2:
    @pytest.mark.parametrize("depth", [2, 3])
    def test_forward_shapes(self, tiny_batch, depth):
        model = PointNet2(depth=depth)
        init = jax.jit(lambda r, c, f, v: model.init(r, c, f, v, train=False))
        apply = jax.jit(lambda p, c, f, v: model.apply(p, c, f, v, train=False))
        variables = init(
            jax.random.key(0),
            jnp.asarray(tiny_batch.coords),
            jnp.asarray(tiny_batch.feats),
            jnp.asarray(tiny_batch.mask_valid),
        )
        out = apply(
            variables,
            jnp.asarray(tiny_batch.coords),
            jnp.asarray(tiny_batch.feats),
            jnp.asarray(tiny_batch.mask_valid),
        )
        b, n = tiny_batch.coords.shape[:2]
        assert out["backbone_feats"].shape == (b, n, 128)
        assert out["semantic_prediction_logits"].shape == (b, n, 2)
        assert out["offset_predictions"].shape == (b, n, 3)
        assert np.all(np.isfinite(np.asarray(out["offset_predictions"])))

    def test_msg_depth6_forward(self, tiny_batch):
        model = PointNet2(depth=6)
        init = jax.jit(lambda r, c, f, v: model.init(r, c, f, v, train=False))
        apply = jax.jit(lambda p, c, f, v: model.apply(p, c, f, v, train=False))
        variables = init(
            jax.random.key(0),
            jnp.asarray(tiny_batch.coords),
            jnp.asarray(tiny_batch.feats),
            jnp.asarray(tiny_batch.mask_valid),
        )
        out = apply(
            variables,
            jnp.asarray(tiny_batch.coords),
            jnp.asarray(tiny_batch.feats),
            jnp.asarray(tiny_batch.mask_valid),
        )
        assert out["backbone_feats"].shape[-1] == 128

    def test_overfits_synthetic_cylinder(self, tiny_batch):
        """The reference's sanity check (SanityCheckPointNet2.py): offset
        loss must drop substantially when overfitting one tiny cloud."""
        model = PointNet2(depth=5)
        coords = jnp.asarray(tiny_batch.coords)
        feats = jnp.asarray(tiny_batch.feats)
        valid = jnp.asarray(tiny_batch.mask_valid)

        init = jax.jit(lambda r, c, f, v: model.init(r, c, f, v, train=True))
        variables = init(jax.random.key(0), coords, feats, valid)
        params, batch_stats = variables["params"], variables["batch_stats"]
        tx = optax.adam(1e-3)
        opt_state = tx.init(params)

        @jax.jit
        def step(params, batch_stats, opt_state):
            def loss_fn(p):
                out, updates = model.apply(
                    {"params": p, "batch_stats": batch_stats},
                    coords, feats, valid, train=True,
                    mutable=["batch_stats"],
                )
                loss, ld = pointnet2_loss(
                    out, tiny_batch, loss_multiplier_semantic=0.0
                )
                return loss, (updates["batch_stats"], ld)

            (loss, (new_bs, ld)), grads = jax.value_and_grad(
                loss_fn, has_aux=True
            )(params)
            updates, opt_state = tx.update(grads, opt_state, params)
            params = optax.apply_updates(params, updates)
            return params, new_bs, opt_state, loss

        losses = []
        for _ in range(30):
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state
            )
            losses.append(float(loss))
        assert np.isfinite(losses).all()
        assert losses[-1] < losses[0] * 0.7, losses
