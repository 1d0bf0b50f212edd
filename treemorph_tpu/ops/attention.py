"""Pallas TPU kernel: serialized-window attention for PTv3.

The reference bounds attention cost by attending within contiguous
1024-point windows of a space-filling-curve order, via flash-attn's varlen
CUDA kernel (``PointTransformerV3/blocks.py:493-499``). On TPU a whole
window's (K, K) score tile fits in VMEM (1024^2 f32 = 4 MB), so no online
softmax is needed: one grid cell per (window, head) computes
``softmax(Q K^T / sqrt(d) + mask) V`` entirely on-chip — the scores matrix
never touches HBM (the jnp formulation materializes (W, H, K, K), which is
~8 GB at a million points).

Masking: keys are valid for a query iff both slots are real points of the
same batch element (segment ids), exactly like the jnp reference path in
:class:`treemorph_tpu.models.ptv3.SerializedAttention`.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1e30


def _window_attention_kernel(
    seg_row_ref,  # (1, 1, K) int32 segment ids (-1 = padding)
    seg_col_ref,  # (1, K, 1) int32 — same data, pre-shaped on the host:
    #               Mosaic rejects in-kernel 1D->2D bool reshapes
    q_ref,  # (1, 1, K, D)
    k_ref,  # (1, 1, K, D)
    v_ref,  # (1, 1, K, D)
    o_ref,  # (1, 1, K, D)
    *,
    scale: float,
):
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    seg_row = seg_row_ref[0]  # (1, K)
    seg_col = seg_col_ref[0]  # (K, 1)

    s = jax.lax.dot_general(
        q * scale,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )  # (K, K)

    ok = (seg_col == seg_row) & (seg_col >= 0) & (seg_row >= 0)
    s = jnp.where(ok, s, NEG_INF)

    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    e = jnp.where(ok, e, 0.0)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    w = e / jnp.maximum(denom, 1e-20)

    o = jax.lax.dot_general(
        w,
        v,
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    o_ref[0, 0] = o.astype(o_ref.dtype)


def _window_attention_bwd_kernel(
    seg_row_ref,  # (1, 1, K)
    seg_col_ref,  # (1, K, 1)
    q_ref,  # (1, 1, K, D)
    k_ref,
    v_ref,
    g_ref,  # (1, 1, K, D) output cotangent
    dq_ref,
    dk_ref,
    dv_ref,
    *,
    scale: float,
):
    """Recompute-probabilities softmax-attention backward, one
    (window, head) per grid cell; all (K, K) tiles stay in VMEM."""
    q = q_ref[0, 0].astype(jnp.float32)
    k = k_ref[0, 0].astype(jnp.float32)
    v = v_ref[0, 0].astype(jnp.float32)
    g = g_ref[0, 0].astype(jnp.float32)
    seg_row = seg_row_ref[0]  # (1, K)
    seg_col = seg_col_ref[0]  # (K, 1)

    s = jax.lax.dot_general(
        q * scale,
        k,
        dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ok = (seg_col == seg_row) & (seg_col >= 0) & (seg_row >= 0)
    s = jnp.where(ok, s, NEG_INF)
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    e = jnp.where(ok, e, 0.0)
    denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-20)
    p = e / denom  # (K, K)

    dv_ref[0, 0] = jax.lax.dot_general(
        p, g, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    dp = jax.lax.dot_general(
        g, v, dimension_numbers=(((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32,
    )
    ds = p * (dp - jnp.sum(dp * p, axis=-1, keepdims=True))
    dq_ref[0, 0] = (
        jax.lax.dot_general(
            ds, k, dimension_numbers=(((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
        * scale
    )
    dk_ref[0, 0] = jax.lax.dot_general(
        ds, q * scale, dimension_numbers=(((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )


def _bwd_call(q, k, v, seg, g, interpret):
    w_count, h, kk, d = q.shape
    scale = d**-0.5
    kernel = functools.partial(
        _window_attention_bwd_kernel, scale=scale
    )
    seg_row = seg[:, None, :]
    seg_col = seg[:, :, None]
    io_spec = pl.BlockSpec(
        (1, 1, kk, d), lambda w, hh: (w, hh, 0, 0),
        memory_space=pltpu.VMEM,
    )
    shape = jax.ShapeDtypeStruct((w_count, h, kk, d), jnp.float32)
    return pl.pallas_call(
        kernel,
        out_shape=(shape, shape, shape),
        grid_spec=pl.GridSpec(
            grid=(w_count, h),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, kk), lambda w, hh: (w, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, kk, 1), lambda w, hh: (w, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                io_spec,
                io_spec,
                io_spec,
                io_spec,
            ],
            out_specs=(io_spec, io_spec, io_spec),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(seg_row, seg_col, q, k, v, g)


@functools.partial(jax.custom_vjp, nondiff_argnums=(4,))
def window_attention(
    q: jax.Array,  # (W, H, K, D)
    k: jax.Array,  # (W, H, K, D)
    v: jax.Array,  # (W, H, K, D)
    seg: jax.Array,  # (W, K) int32, -1 for padding slots
    interpret: bool = False,
) -> jax.Array:
    """Masked full-window attention; returns (W, H, K, D) float32.

    Differentiable: the custom VJP recomputes each window's probability
    tile in VMEM and runs the standard softmax-attention backward as a
    second Pallas kernel (without it, reverse-mode through ``pallas_call``
    fails — PTv3 could not train on TPU)."""
    return _window_attention_fwd_impl(q, k, v, seg, interpret)


def _window_attention_fwd_impl(q, k, v, seg, interpret):
    from ..utils.flops import log_pallas_flops

    w_count, h, kk, d = q.shape
    scale = d**-0.5
    # trace-time analytic-FLOP log (utils/flops.py): QK^T and AV are
    # each (K, D) x (D, K) / (K, K) x (K, D) per (window, head)
    log_pallas_flops(
        "window_attention", 4.0 * w_count * h * kk * kk * d
    )

    kernel = functools.partial(_window_attention_kernel, scale=scale)
    seg_row = seg[:, None, :]  # (W, 1, K)
    seg_col = seg[:, :, None]  # (W, K, 1)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((w_count, h, kk, d), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(w_count, h),
            in_specs=[
                pl.BlockSpec(
                    (1, 1, kk), lambda w, hh: (w, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, kk, 1), lambda w, hh: (w, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, kk, d), lambda w, hh: (w, hh, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, kk, d), lambda w, hh: (w, hh, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (1, 1, kk, d), lambda w, hh: (w, hh, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (1, 1, kk, d), lambda w, hh: (w, hh, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel"),
        ),
        interpret=interpret,
    )(seg_row, seg_col, q, k, v)


def _window_attention_fwd(q, k, v, seg, interpret):
    out = _window_attention_fwd_impl(q, k, v, seg, interpret)
    return out, (q, k, v, seg)


def _window_attention_bwd(interpret, res, g):
    q, k, v, seg = res
    dq, dk, dv = _bwd_call(
        q.astype(jnp.float32),
        k.astype(jnp.float32),
        v.astype(jnp.float32),
        seg,
        g.astype(jnp.float32),
        interpret,
    )
    return (
        dq.astype(q.dtype),
        dk.astype(k.dtype),
        dv.astype(v.dtype),
        None,
    )


window_attention.defvjp(_window_attention_fwd, _window_attention_bwd)


def window_attention_reference(q, k, v, seg, bias=None):
    """jnp reference implementation (for tests and CPU fallback).

    ``bias`` (W, H, K, K) is added to the scaled scores before the
    softmax — the RPE path (reference blocks.py:485-486). The Pallas
    kernel does not take a bias; RPE attention routes here.
    """
    d = q.shape[-1]
    s = jnp.einsum(
        "whkd,whjd->whkj",
        q.astype(jnp.float32) * d**-0.5,
        k.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
    if bias is not None:
        s = s + bias.astype(jnp.float32)
    ok = (
        (seg[:, None, :, None] == seg[:, None, None, :])
        & (seg >= 0)[:, None, :, None]
        & (seg >= 0)[:, None, None, :]
    )
    s = jnp.where(ok, s, -jnp.inf)
    m = jnp.max(s, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    e = jnp.where(ok, jnp.exp(s - m), 0.0)
    denom = jnp.maximum(jnp.sum(e, axis=-1, keepdims=True), 1e-20)
    return jnp.einsum(
        "whkj,whjd->whkd",
        e / denom,
        v.astype(jnp.float32),
        preferred_element_type=jnp.float32,
    )
