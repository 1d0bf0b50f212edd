"""Dense-brick submanifold conv engine.

The gather-matmul engine in :mod:`treemorph_tpu.ops.sparse` is bounded by
TPU random-row gather latency: a 3^3 submanifold conv does 27 gathers of M
feature rows (~10 ns/row). This engine exploits spatial coherence instead:

1. **Brickize**: active voxels are grouped into 4x4x4 bricks (brick key =
   coords >> 2). Surface clouds fill ~25% of a crossed brick, so the brick
   count B is ~M/10-M/16.
2. **Dense storage**: per level, features live in a (B, 4, 4, 4, C) dense
   tensor (one scatter in, one gather out per level — not per conv).
3. **Halo exchange**: each conv gathers the 26 neighbor bricks' adjacent
   faces/edges/corners at BRICK granularity — 26 gathers of B rows (2 KB
   face rows), an order of magnitude fewer gather rows than the sparse
   engine.
4. **MXU conv**: the padded (B, 6, 6, 6, C) tensor goes through one dense
   ``lax.conv_general_dilated`` with a 3^3 kernel; submanifold semantics
   are restored by masking outputs to active voxels.

Numerics are identical to :func:`treemorph_tpu.ops.sparse.subm_conv_apply`
(tested against it); only the schedule differs.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .sparse import build_table, dedup_sort_perm, lookup

BRICK = 4  # brick edge in voxels
CELLS = BRICK**3


class BrickStructure(NamedTuple):
    """Static-shape brick decomposition of a voxel set."""

    brick_id: jax.Array  # (M,) int32 voxel -> brick (cap = overflow dump)
    cell: jax.Array  # (M, 3) int32 within-brick cell coords
    brick_coords: jax.Array  # (Bcap, 4) int32 (b, bx, by, bz)
    brick_valid: jax.Array  # (Bcap,) bool
    brick_nbrs: jax.Array  # (Bcap, 27) int32 neighbor brick or Bcap
    num_bricks: jax.Array  # () int32


_DIRS = [
    (dx, dy, dz)
    for dx in (-1, 0, 1)
    for dy in (-1, 0, 1)
    for dz in (-1, 0, 1)
]


@partial(jax.jit, static_argnames=("cap",))
def brickize(
    coords: jax.Array, valid: jax.Array, cap: int
) -> BrickStructure:
    """Group voxels into bricks; build the 27-neighbor brick rulebook."""
    m = coords.shape[0]
    b = coords[:, 0]
    xyz = coords[:, 1:]
    bxyz = xyz >> 2
    cell = xyz & 3

    key4 = jnp.concatenate([b[:, None], bxyz], axis=1)
    perm = dedup_sort_perm(key4, valid)
    sort_b = jnp.where(valid, b, jnp.int32(0x7FFFFFF0))
    key = jnp.concatenate([sort_b[perm][:, None], bxyz[perm]], axis=1)
    s_valid = valid[perm]
    new = jnp.any(key[1:] != key[:-1], axis=1)
    new = jnp.concatenate([jnp.array([True]), new])
    new = jnp.where(s_valid, new, True)
    s_id = jnp.cumsum(new.astype(jnp.int32)) - 1
    num_bricks = jnp.minimum(
        jnp.where(s_valid, s_id + 1, 0).max(), cap
    ).astype(jnp.int32)

    brick_id = jnp.zeros(m, jnp.int32).at[perm].set(jnp.minimum(s_id, cap))
    brick_b = jax.ops.segment_max(
        jnp.where(valid, b, -1), brick_id, num_segments=cap + 1
    )[:cap]
    brick_xyz = jax.ops.segment_max(
        jnp.where(valid[:, None], bxyz, -1), brick_id, num_segments=cap + 1
    )[:cap]
    brick_coords = jnp.concatenate(
        [brick_b[:, None], brick_xyz], axis=1
    ).astype(jnp.int32)
    counts = jax.ops.segment_sum(
        valid.astype(jnp.int32), brick_id, num_segments=cap + 1
    )[:cap]
    brick_valid = counts > 0

    table = build_table(brick_coords, brick_valid)
    offs = jnp.array(_DIRS, jnp.int32)  # (27, 3)
    q = jnp.broadcast_to(
        brick_coords[None, :, :], (27, cap, 4)
    ).at[:, :, 1:].add(offs[:, None, :])
    nbrs = lookup(table, q)  # (27, Bcap)
    nbrs = jnp.where(brick_valid[None, :] & (nbrs >= 0), nbrs, cap)
    return BrickStructure(
        brick_id=brick_id,
        cell=cell,
        brick_coords=brick_coords,
        brick_valid=brick_valid,
        brick_nbrs=nbrs.T.astype(jnp.int32),
        num_bricks=num_bricks,
    )


def to_dense(feats: jax.Array, bs: BrickStructure) -> jax.Array:
    """(M, C) flat features -> (Bcap+1, 4, 4, 4, C) dense (last brick is
    the overflow/missing dump, kept zero)."""
    cap = bs.brick_coords.shape[0]
    c = feats.shape[-1]
    dense = jnp.zeros((cap + 1, BRICK, BRICK, BRICK, c), feats.dtype)
    return dense.at[
        bs.brick_id, bs.cell[:, 0], bs.cell[:, 1], bs.cell[:, 2]
    ].set(feats)


def from_dense(dense: jax.Array, bs: BrickStructure) -> jax.Array:
    """(Bcap+1, 4, 4, 4, C) dense -> (M, C) flat features."""
    return dense[
        bs.brick_id, bs.cell[:, 0], bs.cell[:, 1], bs.cell[:, 2]
    ]


def _halo_pad(dense: jax.Array, bs: BrickStructure) -> jax.Array:
    """(Bcap+1, 4,4,4, C) -> (Bcap, 6,6,6, C) with 1-voxel halos gathered
    from the 26 neighbor bricks (missing neighbors contribute zeros via
    the dump brick).

    Assembled with nested concatenation — a sequence of .at[].set halo
    writes would materialize a full copy of the padded tensor per
    direction (~26x the memory traffic).
    """
    cap = bs.brick_coords.shape[0]

    def src_slice(d):
        # neighbor at direction d contributes its far-side cells
        out = []
        for axis_d in d:
            if axis_d == 1:
                out.append(slice(0, 1))  # neighbor's low face
            elif axis_d == -1:
                out.append(slice(BRICK - 1, BRICK))  # neighbor's high face
            else:
                out.append(slice(0, BRICK))
        return tuple(out)

    def block(d):
        if d == (0, 0, 0):
            return dense[:cap]
        k = _DIRS.index(d)
        nbr = bs.brick_nbrs[:, k]  # (Bcap,), cap = dump (zeros)
        sx, sy, sz = src_slice(d)
        return dense[:, sx, sy, sz, :][nbr]  # (Bcap, wx, wy, wz, C)

    x_slabs = []
    for dx in (-1, 0, 1):
        y_slabs = []
        for dy in (-1, 0, 1):
            z_blocks = [block((dx, dy, dz)) for dz in (-1, 0, 1)]
            y_slabs.append(jnp.concatenate(z_blocks, axis=3))
        x_slabs.append(jnp.concatenate(y_slabs, axis=2))
    return jnp.concatenate(x_slabs, axis=1)  # (Bcap, 6, 6, 6, C)


def _xslab_selector() -> jnp.ndarray:
    """Static 0/1 tensor S (9, 36, 16) mapping a (dy, dz) kernel tap to
    its positions in the x-slab banded matrix: S[dy*3+dz, r, cb] = 1 iff
    r == (yo+dy)*6 + (zo+dz) and cb == yo*4 + zo for some core output
    cell (yo, zo) in [0, 4)^2. XLA constant-folds this."""
    import numpy as np

    s = np.zeros((9, 36, 16), np.float32)
    for dy in range(3):
        for dz in range(3):
            for yo in range(4):
                for zo in range(4):
                    s[dy * 3 + dz, (yo + dy) * 6 + (zo + dz), yo * 4 + zo] = 1
    return jnp.asarray(s)


def _xslab_weights(weights: jax.Array) -> jax.Array:
    """(27, Cin, Cout) kernel -> (3, 36*Cin, 16*Cout) banded x-slab
    matrices (differentiable: the placement is one einsum with a static
    0/1 selector, so weight grads flow through its transpose)."""
    cin, cout = weights.shape[1], weights.shape[2]
    w = weights.reshape(3, 9, cin, cout)
    s = _xslab_selector()  # (9, 36, 16)
    # wb[dx, r, i, cb, o] = sum_j s[j, r, cb] * w[dx, j, i, o]
    wb = jnp.einsum("jrb,xjio->xribo", s, w)
    return wb.reshape(3, 36 * cin, 16 * cout)


def _xslab_conv(padded, weights, compute_dtype):
    """Banded x-slab matmul conv on the halo'd (B, 6, 6, 6, Cin) tensor.

    The (y, z, c) axes fuse into one 36*Cin column axis; for each x-offset
    dx the contribution of input x-plane [dx, dx+4) to all 4^3 core
    outputs is ONE (B*4, 36*Cin) x (36*Cin, 16*Cout) matmul against a
    banded weight matrix (50% structurally dense in y and z). 2x the
    minimum FLOPs but MXU-shaped — ``lax.conv`` at Cin=32 runs far below
    MXU rate on these small channel counts.
    """
    b = padded.shape[0]
    cin = padded.shape[-1]
    wb = _xslab_weights(weights)
    cout = weights.shape[-1]
    dtype = jnp.dtype(compute_dtype or padded.dtype)
    p = padded.reshape(b, 6, 36 * cin).astype(dtype)
    w = wb.astype(dtype)
    out = jnp.zeros((b, 4, 16 * cout), jnp.float32)
    for dx in range(3):
        out = out + jnp.einsum(
            "bxk,kn->bxn",
            p[:, dx : dx + 4, :],
            w[dx],
            preferred_element_type=jnp.float32,
        )
    return out.reshape(b, BRICK, BRICK, BRICK, cout)


def brick_subm_conv(
    dense: jax.Array,  # (Bcap+1, 4,4,4, C) active-masked features
    weights: jax.Array,  # (K=27, Cin, Cout) in kernel_offsets order
    bs: BrickStructure,
    active: jax.Array,  # (Bcap+1, 4,4,4, 1) activity mask
    impl: str = "conv",
    compute_dtype=None,
) -> jax.Array:
    """Submanifold 3^3 conv on the dense brick tensor -> same layout.

    ``weights`` use the (dx, dy, dz) lexicographic order of
    :func:`treemorph_tpu.ops.sparse.kernel_offsets`; out[v] = sum_k
    W[k] @ feat[v + off_k], so the conv kernel must be INDEX-REVERSED
    relative to a correlation: lax.conv computes sum_k W[p] * x[v + p - 1]
    with p in [0, 3)^3, matching off = p - 1 directly.

    ``impl`` selects the conv schedule on the halo'd tensor:
    'conv' = one ``lax.conv_general_dilated``; 'xslab' = 3 banded x-slab
    matmuls (:func:`_xslab_conv`) — identical math, MXU-shaped, and the
    only impl that honors ``compute_dtype`` (bf16 in, f32 accumulate).
    """
    cap = bs.brick_coords.shape[0]
    cin = dense.shape[-1]
    cout = weights.shape[-1]
    padded = _halo_pad(dense, bs)  # (Bcap, 6,6,6, Cin)

    if impl == "xslab":
        out = _xslab_conv(padded, weights, compute_dtype)
    else:
        # NOTE: a Pallas roll-shifted-matmul formulation of this conv
        # exists (ops/brick_conv.py, exact-match + gradient tested) but
        # Mosaic lowers circular rolls across the 216-cell axis
        # pathologically in every layout tried (sublane rolls, lane
        # rolls, per-brick loops): measured 2.9 s per 37k-brick conv vs
        # ~13 ms for the XLA conv here. See ROADMAP #1.
        kernel = weights.reshape(3, 3, 3, cin, cout)
        out = jax.lax.conv_general_dilated(
            padded,
            kernel,
            window_strides=(1, 1, 1),
            padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32,
        )  # (Bcap, 4,4,4, Cout)
    out = jnp.concatenate(
        [out, jnp.zeros((1, BRICK, BRICK, BRICK, cout), out.dtype)], axis=0
    )
    return out * active
