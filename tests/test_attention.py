"""Pallas window-attention kernel vs jnp reference (interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from treemorph_tpu.ops.attention import (
    window_attention,
    window_attention_reference,
)


def _random_inputs(rng, w=3, h=2, k=64, d=16, n_batches=2, pad_frac=0.2):
    q = rng.normal(size=(w, h, k, d)).astype(np.float32)
    kk = rng.normal(size=(w, h, k, d)).astype(np.float32)
    v = rng.normal(size=(w, h, k, d)).astype(np.float32)
    seg = rng.integers(0, n_batches, size=(w, k)).astype(np.int32)
    seg.sort(axis=1)  # serialized order groups batches contiguously
    pad = rng.uniform(size=(w, k)) < pad_frac
    seg[pad] = -1
    return (
        jnp.asarray(q),
        jnp.asarray(kk),
        jnp.asarray(v),
        jnp.asarray(seg),
    )


class TestWindowAttention:
    def test_kernel_matches_reference(self, rng):
        q, k, v, seg = _random_inputs(rng)
        out_kernel = window_attention(q, k, v, seg, interpret=True)
        out_ref = window_attention_reference(q, k, v, seg)
        np.testing.assert_allclose(
            np.asarray(out_kernel), np.asarray(out_ref), atol=2e-5
        )

    def test_padding_rows_zero(self, rng):
        q, k, v, seg = _random_inputs(rng, pad_frac=0.5)
        out = np.asarray(window_attention(q, k, v, seg, interpret=True))
        pad_mask = np.asarray(seg) < 0
        assert np.all(out[:, :, :, :][np.broadcast_to(
            pad_mask[:, None, :, None], out.shape
        )] == 0.0)

    def test_no_cross_batch_attention(self, rng):
        # queries in batch 0 must be unaffected by value changes in batch 1
        q, k, v, seg = _random_inputs(rng, n_batches=2, pad_frac=0.0)
        out_a = np.asarray(window_attention(q, k, v, seg, interpret=True))
        v_mod = np.asarray(v).copy()
        seg_np = np.asarray(seg)
        v_mod[np.broadcast_to(
            (seg_np == 1)[:, None, :, None], v_mod.shape
        )] += 100.0
        out_b = np.asarray(
            window_attention(q, k, jnp.asarray(v_mod), seg, interpret=True)
        )
        mask0 = np.broadcast_to((seg_np == 0)[:, None, :, None], out_a.shape)
        np.testing.assert_allclose(out_a[mask0], out_b[mask0], atol=1e-5)

    def test_reference_matches_dense_softmax(self, rng):
        # single batch, no padding: plain softmax attention oracle
        q, k, v, seg = _random_inputs(rng, w=1, h=1, k=32, n_batches=1,
                                      pad_frac=0.0)
        out = np.asarray(window_attention_reference(q, k, v, seg))[0, 0]
        qn, kn, vn = (np.asarray(x)[0, 0] for x in (q, k, v))
        s = (qn * (qn.shape[-1] ** -0.5)) @ kn.T
        e = np.exp(s - s.max(1, keepdims=True))
        w = e / e.sum(1, keepdims=True)
        np.testing.assert_allclose(out, w @ vn, atol=1e-5)


class TestWindowAttentionGradient:
    def test_vjp_matches_reference_autodiff(self, rng):
        """The Pallas backward kernel (recompute + softmax backward) must
        match autodiff through the jnp reference, including masked
        windows that mix segments and padding."""
        import jax

        from treemorph_tpu.ops.attention import (
            window_attention, window_attention_reference,
        )

        w, h, k, d = 3, 2, 32, 8
        q, kk, v = (
            jnp.asarray(rng.normal(size=(w, h, k, d)).astype(np.float32))
            for _ in range(3)
        )
        seg = jnp.asarray(
            rng.choice([-1, 0, 0, 1, 2], size=(w, k)).astype(np.int32)
        )
        cot = jnp.asarray(
            rng.normal(size=(w, h, k, d)).astype(np.float32)
        )

        def loss_pallas(q, kk, v):
            return jnp.vdot(window_attention(q, kk, v, seg, True), cot)

        def loss_ref(q, kk, v):
            return jnp.vdot(
                window_attention_reference(q, kk, v, seg), cot
            )

        g_p = jax.grad(loss_pallas, argnums=(0, 1, 2))(q, kk, v)
        g_r = jax.grad(loss_ref, argnums=(0, 1, 2))(q, kk, v)
        for a, b in zip(g_p, g_r):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=1e-4, atol=1e-4
            )
