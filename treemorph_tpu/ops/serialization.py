"""Space-filling-curve serialization of voxel grids, TPU-native.

Functional parity with the reference's serialization pack
(``/root/reference/Modules/PointTransformerV3/serialization/``): z-order and
Hilbert codes over 3D grid coordinates, with transposed (xy-swapped) variants,
and batch-aware ordering equivalent to ``batch << 3*depth | code``
(``serialization/default.py:8-24``).

TPU design: the reference builds int64 keys (LUT-based z-order, uint8-view
bit unpacking for Hilbert). XLA on TPU strongly prefers 32-bit integers and
has no bit-view reinterpretation, so codes here are a pair of uint32 words
``(hi, lo)`` holding the 3*depth-bit key; ordering uses a stable lexsort over
``(batch, hi, lo)``, which is exactly the order of the reference's packed
int64 key. The Hilbert transform is the Skilling gray-code algorithm
(Skilling 2004, public domain) in pure integer arithmetic — packed per-axis
int32 bit planes with XOR/mask updates and a prefix-XOR gray decode, all
fused VPU ops.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

ORDERS = ("z", "z-trans", "hilbert", "hilbert-trans")


@partial(jax.jit, static_argnames=("depth",))
def z_order_encode(
    grid_coord: jax.Array, depth: int = 16
) -> tuple[jax.Array, jax.Array]:
    """Morton (z-order) code: interleave bits as [... x_i y_i z_i ...].

    Bit i of x lands at position 3i+2, y at 3i+1, z at 3i (parity with
    reference ``serialization/z_order.py:40-50``). Returns ``(hi, lo)``
    uint32 words of the 3*depth-bit key.
    """
    assert depth <= 16
    x = grid_coord[:, 0].astype(jnp.uint32)
    y = grid_coord[:, 1].astype(jnp.uint32)
    z = grid_coord[:, 2].astype(jnp.uint32)
    hi = jnp.zeros_like(x)
    lo = jnp.zeros_like(x)
    for i in range(depth):
        for dim, c in enumerate((x, y, z)):
            pos = 3 * i + (2 - dim)
            bit = (c >> i) & jnp.uint32(1)
            if pos < 32:
                lo = lo | (bit << pos)
            else:
                hi = hi | (bit << (pos - 32))
    return hi, lo


@partial(jax.jit, static_argnames=("depth",))
def hilbert_encode(
    grid_coord: jax.Array, depth: int = 16
) -> tuple[jax.Array, jax.Array]:
    """Hilbert-curve code via the vectorized Skilling transform.

    Equivalent key order to reference ``serialization/hilbert.py:91-198``.
    Returns ``(hi, lo)`` uint32 words of the 3*depth-bit key.
    """
    assert depth <= 16

    # Skilling transform in pure integer arithmetic: each dimension's bits
    # stay packed in one int32, and "invert/exchange lower bits" becomes
    # XOR against a lower-bit mask. (The previous formulation materialized
    # an (N, 3, depth) bit tensor and updated it with ~6*depth
    # dynamic-update-slices — ~18 ms per 131k-point forward on v5e; this
    # form is a handful of fused VPU int ops per plane and was verified
    # bit-identical at depths 4/8/16.)
    X = [grid_coord[:, d].astype(jnp.int32) for d in range(3)]
    for bit in range(depth - 1):
        shift = depth - 1 - bit
        lower = (1 << shift) - 1
        for dim in range(3):
            d = X[dim]
            m = (d >> shift) & 1  # this plane's bit of dim
            inv = X[0] ^ (m * lower)  # invert dim-0 lower bits where set
            # exchange lower bits between dim and dim 0 where clear
            t = jnp.where(m == 1, 0, (inv ^ d) & lower)
            X[dim] = d ^ t
            X[0] = inv ^ t

    # Interleave the transformed axes exactly like the z-order packing
    # ([bit-plane: d0 d1 d2] MSB-first), then gray-decode with a
    # prefix-XOR scan over the packed 48-bit (hi, lo) pair.
    tx = jnp.stack([x.astype(jnp.uint32) for x in X], axis=1)
    hi = jnp.zeros_like(tx[:, 0])
    lo = jnp.zeros_like(tx[:, 0])
    for i in range(depth):
        for dim in range(3):
            pos = 3 * i + (2 - dim)
            b = (tx[:, dim] >> i) & jnp.uint32(1)
            if pos < 32:
                lo = lo | (b << pos)
            else:
                hi = hi | (b << (pos - 32))
    for s in (1, 2, 4, 8, 16, 32):
        if s < 32:
            hi2 = hi >> s
            lo2 = (lo >> s) | (hi << (32 - s))
        else:
            hi2 = jnp.zeros_like(hi)
            lo2 = hi
        hi = hi ^ hi2
        lo = lo ^ lo2
    return hi, lo


@partial(jax.jit, static_argnames=("depth", "order"))
def encode(
    grid_coord: jax.Array,
    batch: jax.Array | None = None,
    depth: int = 16,
    order: str = "z",
) -> tuple[jax.Array, jax.Array, jax.Array]:
    """Serialize grid coordinates along a space-filling curve.

    Parity with reference ``serialization/default.py:8-24``; the transposed
    orders swap x and y before encoding. Returns ``(batch, hi, lo)`` — the
    three sort keys equivalent to the reference's ``batch << 3*depth | code``.
    """
    assert order in ORDERS
    if order.endswith("-trans"):
        grid_coord = grid_coord[:, jnp.array([1, 0, 2])]
    if order.startswith("z"):
        hi, lo = z_order_encode(grid_coord, depth=depth)
    else:
        hi, lo = hilbert_encode(grid_coord, depth=depth)
    if batch is None:
        batch = jnp.zeros(grid_coord.shape[0], dtype=jnp.int32)
    return batch.astype(jnp.int32), hi, lo


@partial(jax.jit, static_argnames=("depth", "order"))
def serialized_order(
    grid_coord: jax.Array,
    batch: jax.Array | None = None,
    depth: int = 16,
    order: str = "z",
) -> tuple[jax.Array, jax.Array]:
    """(order, inverse) permutations for one curve order.

    ``order[i]`` is the original index of the i-th point in serialized order;
    ``inverse`` undoes it. Matches the reference's ``Point.serialization()``
    argsort semantics (``PointTransformerV3/blocks.py:98-153``).
    """
    b, hi, lo = encode(grid_coord, batch, depth=depth, order=order)
    perm = jnp.lexsort((lo, hi, b))
    inverse = jnp.zeros_like(perm).at[perm].set(
        jnp.arange(perm.shape[0], dtype=perm.dtype)
    )
    return perm, inverse


# ---------------------------------------------------------------------------
# Host-side (numpy) decoders — used for round-trip testing and CSV debugging;
# the device pipeline only ever needs encode + sort.
# ---------------------------------------------------------------------------


def _unpack_bits_msb(hi: np.ndarray, lo: np.ndarray, n_bits: int) -> np.ndarray:
    out = np.zeros((hi.shape[0], n_bits), dtype=np.int64)
    for k in range(n_bits):
        significance = n_bits - 1 - k
        if significance < 32:
            out[:, k] = (lo >> significance) & 1
        else:
            out[:, k] = (hi >> (significance - 32)) & 1
    return out


def z_order_decode_np(
    hi: np.ndarray, lo: np.ndarray, depth: int = 16
) -> np.ndarray:
    hi = hi.astype(np.uint64)
    lo = lo.astype(np.uint64)
    key = (hi << np.uint64(32)) | lo
    coords = np.zeros((key.shape[0], 3), dtype=np.int64)
    for i in range(depth):
        for dim in range(3):
            pos = 3 * i + (2 - dim)
            coords[:, dim] |= ((key >> np.uint64(pos)) & np.uint64(1)).astype(
                np.int64
            ) << i
    return coords


def decode(
    batch: np.ndarray,
    hi: np.ndarray,
    lo: np.ndarray,
    depth: int = 16,
    order: str = "z",
) -> tuple[np.ndarray, np.ndarray]:
    """Invert :func:`encode`: curve codes back to grid coordinates.

    Parity with reference ``serialization/default.py:26-38`` (which strips
    the packed batch bits then dispatches to the curve decoder); here the
    batch id is already a separate key word, so it is returned unchanged.
    Host-side numpy — decoding is a debug/test surface, never on the
    device path. Transposed orders undo the x/y swap applied by
    :func:`encode`.
    """
    assert order in ORDERS
    hi = np.asarray(hi, np.uint32)
    lo = np.asarray(lo, np.uint32)
    if order.startswith("z"):
        grid = z_order_decode_np(hi, lo, depth=depth)
    else:
        grid = hilbert_decode_np(hi, lo, depth=depth)
    if order.endswith("-trans"):
        grid = grid[:, [1, 0, 2]]
    return grid, np.asarray(batch, np.int32)


def hilbert_decode_np(
    hi: np.ndarray, lo: np.ndarray, depth: int = 16
) -> np.ndarray:
    """Inverse Skilling transform (host-side, for tests)."""
    num_dims = 3
    n_bits_total = depth * num_dims
    binary = _unpack_bits_msb(
        np.asarray(hi, np.uint32), np.asarray(lo, np.uint32), n_bits_total
    )
    # binary -> gray
    gray = binary.copy()
    gray[:, 1:] ^= binary[:, :-1]
    bits = gray.reshape(-1, depth, num_dims).swapaxes(1, 2)  # (N, 3, depth)

    for bit in range(depth - 1, -1, -1):
        for dim in range(num_dims - 1, -1, -1):
            mask = bits[:, dim, bit : bit + 1]
            lower0 = bits[:, 0, bit + 1 :]
            lowerd = bits[:, dim, bit + 1 :]
            inverted0 = lower0 ^ mask
            to_flip = (1 - mask) & (inverted0 ^ lowerd)
            bits[:, dim, bit + 1 :] = lowerd ^ to_flip
            bits[:, 0, bit + 1 :] = inverted0 ^ to_flip

    shifts = np.arange(depth - 1, -1, -1)
    return (bits << shifts[None, None, :]).sum(axis=-1)
