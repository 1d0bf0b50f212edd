"""EXPERIMENTAL Pallas kernel: 3^3 submanifold conv over halo'd bricks.

Status: numerically exact (tested, incl. the custom VJP) but NOT wired
into the brick engine — Mosaic lowers circular rolls across the 216-cell
axis pathologically in every layout tried (sublane-axis rolls at
(TB, 216, C): 2.9 s per 37k-brick conv; channel-first lane-axis rolls:
Mosaic re-vectorizes the per-brick loop into an unsupported
(C, TB, 216) -> (C, TB*216) shape cast; TB=1: slower still). The XLA
dense conv in ops/bricks.py stays the brick path. Kept as the working
reference for a future shift mechanism (e.g. precomputed shifted copies
via double-buffered DMA).

Design (sound; the wall is purely the roll lowering):

The 6^3 halo'd brick flattens to 216 cells, f = x*36 + y*6 + z. For an
offset (dx, dy, dz) with flat delta D = dx*36 + dy*6 + dz, a circular
roll of the cell axis by -D aligns cell f with its neighbor f+D. For
every CENTER cell (x, y, z in [1, 5)) the component sums stay inside
[0, 6), so the flat arithmetic is exact and no wraparound ever reaches
a center output — the conv over all center cells is then

    out = sum_k roll(h, -D_k, axis=cells) @ W[k]

evaluated on the full 216 cells and sliced to the 4^3 core afterwards
(the 3.4x compute overhead is irrelevant: the op is bandwidth-bound and
rolls are free sublane rotates).

The backward pass reuses the same kernel: with core-masked cotangent g
(zero on halo cells), d_h = kernel(g, W[::-1]^T) exactly (the reversed
offsets' rolls can only deposit wrapped garbage where g is zero), and
d_W[k] contracts the k-shifted input slab against g in plain XLA.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

SIDE = 6  # brick edge + halo
CELLS6 = SIDE**3  # 216
BRICK_TILE = 4  # bricks per grid cell (27 live rolled copies are
# lane-padded to 128, so VMEM caps the tile: 4*216*128*4B ~ 442 KB each)

#: (dx, dy, dz) in the lexicographic order of sparse.kernel_offsets
DIRS27 = [
    (dx, dy, dz)
    for dx in (-1, 0, 1)
    for dy in (-1, 0, 1)
    for dz in (-1, 0, 1)
]


def _conv_kernel(h_ref, w_ref, o_ref, *, tb, cin, cout):
    h = h_ref[:]  # (TB, 216, Cin) float32
    acc = jnp.zeros((tb * CELLS6, cout), jnp.float32)
    for k, (dx, dy, dz) in enumerate(DIRS27):
        delta = dx * 36 + dy * 6 + dz
        shift = (-delta) % CELLS6  # pltpu.roll requires shift >= 0
        shifted = pltpu.roll(h, shift=shift, axis=1) if delta else h
        acc = acc + jnp.dot(
            shifted.reshape(tb * CELLS6, cin),
            w_ref[k],
            preferred_element_type=jnp.float32,
        )
    # write only the 4^3 core — emitting all 216 cells would double the
    # HBM output traffic and footprint for nothing
    core = acc.reshape(tb, SIDE, SIDE, SIDE, cout)[:, 1:5, 1:5, 1:5, :]
    o_ref[:] = core.reshape(tb, 64, cout)


def _full_kernel(h_ref, w_ref, o_ref, *, tb, cin, cout):
    """Variant emitting all 216 cells (backward pass needs halo-cell
    gradients — they flow into neighbor bricks through the halo gather)."""
    h = h_ref[:]
    acc = jnp.zeros((tb * CELLS6, cout), jnp.float32)
    for k, (dx, dy, dz) in enumerate(DIRS27):
        delta = dx * 36 + dy * 6 + dz
        shift = (-delta) % CELLS6
        shifted = pltpu.roll(h, shift=shift, axis=1) if delta else h
        acc = acc + jnp.dot(
            shifted.reshape(tb * CELLS6, cin),
            w_ref[k],
            preferred_element_type=jnp.float32,
        )
    o_ref[:] = acc.reshape(tb, CELLS6, cout)


def _conv_call(h_flat, weights, interpret, core_only=True):
    """(B, 216, Cin) x (27, Cin, Cout) -> (B, 64|216, Cout)."""
    b, _, cin = h_flat.shape
    cout = weights.shape[-1]
    tb = BRICK_TILE
    out_cells = 64 if core_only else CELLS6
    kern = _conv_kernel if core_only else _full_kernel
    kernel = functools.partial(kern, tb=tb, cin=cin, cout=cout)
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((b, out_cells, cout), jnp.float32),
        grid_spec=pl.GridSpec(
            grid=(b // tb,),
            in_specs=[
                pl.BlockSpec(
                    (tb, CELLS6, cin),
                    lambda i: (i, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
                pl.BlockSpec(
                    (27, cin, cout),
                    lambda i: (0, 0, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(
                (tb, out_cells, cout),
                lambda i: (i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ),
        interpret=interpret,
    )(h_flat.astype(jnp.float32), weights.astype(jnp.float32))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def _brick_conv_core(h_flat, weights, interpret=False):
    """(B, 216, Cin) halo'd bricks -> (B, 64, Cout) core conv."""
    return _conv_call(h_flat, weights, interpret)


def _fwd(h_flat, weights, interpret):
    return _conv_call(h_flat, weights, interpret), (h_flat, weights)


def _bwd(interpret, res, g):
    h_flat, weights = res
    cin = h_flat.shape[-1]
    cout = g.shape[-1]
    # embed the core cotangent into the full 6^3 grid (halo cells zero):
    # the reversed rolls' wraparound terms then vanish (module docstring)
    g6 = g.reshape(-1, 4, 4, 4, cout)
    g_full = jnp.pad(
        g6, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0))
    ).reshape(-1, CELLS6, cout)
    w_rev_t = jnp.transpose(weights[::-1], (0, 2, 1))
    d_h = _conv_call(
        g_full, w_rev_t, interpret, core_only=False
    ).astype(h_flat.dtype)
    # dW[k] = (slab shifted by off_k)^T g, contracted over bricks x cells
    h6 = h_flat.reshape(-1, SIDE, SIDE, SIDE, cin)
    g_center = g.reshape(-1, cout)
    d_w = []
    for dx, dy, dz in DIRS27:
        slab = h6[
            :, 1 + dx : 5 + dx, 1 + dy : 5 + dy, 1 + dz : 5 + dz, :
        ].reshape(-1, cin)
        d_w.append(
            jnp.dot(slab.T, g_center, preferred_element_type=jnp.float32)
        )
    return d_h, jnp.stack(d_w).astype(weights.dtype)


_brick_conv_core.defvjp(_fwd, _bwd)


def brick_conv(padded: jax.Array, weights: jax.Array) -> jax.Array:
    """(B, 6, 6, 6, Cin) halo'd bricks x (27, Cin, Cout) -> core conv
    (B, 4, 4, 4, Cout). Pallas on TPU, interpreter elsewhere."""
    b = padded.shape[0]
    cin = padded.shape[-1]
    pad = (-b) % BRICK_TILE
    h_flat = padded.reshape(b, CELLS6, cin)
    if pad:
        h_flat = jnp.concatenate(
            [h_flat, jnp.zeros((pad, CELLS6, cin), h_flat.dtype)]
        )
    interpret = jax.default_backend() != "tpu"
    out = _brick_conv_core(h_flat, weights, interpret)[:b]
    cout = weights.shape[-1]
    return out.reshape(b, 4, 4, 4, cout)
