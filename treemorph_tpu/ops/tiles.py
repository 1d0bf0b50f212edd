"""Dense-tile submanifold conv engine: MXU convs instead of row gathers.

The gather engine (:mod:`treemorph_tpu.ops.sparse`) pays the measured TPU
gather law — ~max(2.6 ns/row, bytes @ ~110 GB/s) — 26 times per voxel per
conv (~68 ns/voxel at C=32). This engine removes per-voxel gathers from
the conv entirely:

1. **Tileize** (:func:`build_tiles`): active voxels are grouped into
   cubic tiles of ``L^3`` cells (tile key = ``coords >> log2(L)``, same
   sort-dedup machinery as ``build_downsample``), plus a 27-entry
   neighbor-tile table built with the bucketed hash table.
2. **Densify** (:func:`to_dense`): ONE scatter of M rows places voxel
   features in a ``(T+2, L, L, L, C)`` dense array (row T = overflow
   dump, row T+1 = always-zero missing-neighbor tile). Inactive cells
   hold zeros, so dense conv arithmetic IS submanifold arithmetic
   (spconv SubMConv3d semantics, reference
   ``/root/reference/Modules/TreeLearn/blocks.py:44-81``): zero inputs
   contribute nothing, and outputs at inactive sites are re-masked.
3. **Halo'd dense conv** (:func:`tile_subm_conv`): each conv assembles a
   ``(T+2, L+2, L+2, L+2, C)`` halo from 26 *tile-row* slab gathers
   (T rows each — thousands, not millions) + static in-place updates,
   then runs one ``lax.conv_general_dilated`` — all neighbor access
   streams at HBM rate and the arithmetic rides the MXU.

The layout is dense-RESIDENT across a resolution level: residual blocks
run on the dense array (one scatter in / one gather out per block stack),
exactly like the pencil/brick engines in ``models/treelearn.py``.

**Measured outcome (v5e-1, bench workload, 2026-08)**: exact vs the
gather engine (max|diff| = 0.0 at every level/tile size) but SLOWER —
surface clouds fill tiles at only 3-15% (t8 at L0: 4.5%), so the dense
conv pays 7-25x wasted HBM traffic + MXU work per active voxel: L1
80k voxels: gather conv 8.5 ms vs tile8 conv 22 ms (cap 3.5x over-sized;
~7 ms cap-tight — break-even at best, before the to/from_dense
round-trip). The engine is kept as the tested dense-tile baseline; the
fill-fraction math says it can only win on volumetric (not surface)
occupancy. See ROADMAP.md.

Weights layout is the gather engine's ``(27, Cin, Cout)`` in
:func:`treemorph_tpu.ops.sparse.kernel_offsets` enumeration ((dx, dy, dz),
dz fastest) — ``reshape(3, 3, 3, Cin, Cout)`` is exactly the DHWIO kernel
of the VALID conv over the halo, so checkpoints are engine-
interchangeable (oracle-tested against ``subm_conv_apply``).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .sparse import build_table, dedup_sort_perm, lookup


class TileSet(NamedTuple):
    """Static-shape tile structure for one voxel level.

    ``cap`` is the static tile capacity; the dense array carries two
    extra rows — row ``cap`` is the overflow dump (written, never read)
    and row ``cap + 1`` is the zero tile (read for missing neighbors,
    never written).
    """

    tile_of_voxel: jax.Array  # (M,) int32 tile row; cap = overflow
    cell_of_voxel: jax.Array  # (M,) int32 flat cell in [0, L^3)
    tile_coords: jax.Array  # (cap, 4) int32 (b, tx, ty, tz)
    tile_valid: jax.Array  # (cap,) bool
    nbr: jax.Array  # (cap, 27) int32 rows; cap + 1 = missing
    active: jax.Array  # (cap + 2, L, L, L, 1) float32 cell mask
    num_tiles: jax.Array  # () int32
    overflow: jax.Array  # () int32 voxels dropped by the cap


def tile_offsets() -> jnp.ndarray:
    """(27, 3) neighbor-tile offsets, kernel_offsets enumeration."""
    r = (-1, 0, 1)
    return jnp.array(
        [(dx, dy, dz) for dx in r for dy in r for dz in r], jnp.int32
    )


@partial(jax.jit, static_argnames=("cap", "tile"))
def build_tiles(
    coords: jax.Array,  # (M, 4) int32 (b, x, y, z)
    valid: jax.Array,  # (M,)
    cap: int,
    tile: int = 8,
) -> TileSet:
    """Group voxels into ``tile``^3 dense tiles (power-of-two ``tile``).

    Same dedup-sort machinery as ``build_downsample`` (tile rows come out
    lex-sorted by (b, tx, ty, tz)); the neighbor table is one bucketed
    hash build over ``cap`` tile coords + 26 lookups — thousands of rows,
    amortized over every conv at the level.
    """
    m = coords.shape[0]
    assert tile & (tile - 1) == 0, "tile must be a power of two"
    shift = tile.bit_length() - 1
    b = coords[:, 0]
    xyz = coords[:, 1:]
    txyz = xyz >> shift
    local = xyz & (tile - 1)
    cell = ((local[:, 0] * tile) + local[:, 1]) * tile + local[:, 2]

    key4 = jnp.concatenate([b[:, None], txyz], axis=1)
    perm = dedup_sort_perm(key4, valid)
    sort_b = jnp.where(valid, b, jnp.int32(0x7FFFFFF0))
    s_key = jnp.concatenate([sort_b[perm][:, None], txyz[perm]], axis=1)
    s_valid = valid[perm]
    new = jnp.any(s_key[1:] != s_key[:-1], axis=1)
    new = jnp.concatenate([jnp.array([True]), new])
    new = jnp.where(s_valid, new, True)
    s_id = jnp.cumsum(new.astype(jnp.int32)) - 1
    num_tiles = jnp.where(s_valid, s_id + 1, 0).max().astype(jnp.int32)

    tile_full = jnp.zeros(m, jnp.int32).at[perm].set(s_id)
    tile_of_voxel = jnp.minimum(tile_full, cap)
    overflow = jnp.sum(valid & (tile_full >= cap)).astype(jnp.int32)

    tile_b = jax.ops.segment_max(
        jnp.where(valid, b, -1), tile_of_voxel, num_segments=cap + 1
    )[:cap]
    tile_xyz = jax.ops.segment_max(
        jnp.where(valid[:, None], txyz, -1),
        tile_of_voxel,
        num_segments=cap + 1,
    )[:cap]
    tile_coords = jnp.concatenate(
        [tile_b[:, None], tile_xyz], axis=1
    ).astype(jnp.int32)
    counts = jax.ops.segment_sum(
        valid.astype(jnp.int32), tile_of_voxel, num_segments=cap + 1
    )[:cap]
    tile_valid = counts > 0

    table = build_table(tile_coords, tile_valid)
    offs = tile_offsets()  # (27, 3)
    q = jnp.broadcast_to(
        tile_coords[None, :, :], (27, cap, 4)
    ).at[:, :, 1:].add(offs[:, None, :])
    idx = lookup(table, q)  # (27, cap)
    missing = cap + 1
    nbr = jnp.where(
        tile_valid[None, :] & (idx >= 0), idx, missing
    ).T.astype(jnp.int32)
    # the center column is the identity (same exactness story as
    # build_rulebook's center substitution)
    nbr = nbr.at[:, 13].set(
        jnp.where(
            tile_valid, jnp.arange(cap, dtype=jnp.int32), missing
        )
    )

    ones = jnp.ones((m, 1), jnp.float32)
    active = _scatter_dense(
        ones, tile_of_voxel, cell, valid, cap, tile
    )
    return TileSet(
        tile_of_voxel=tile_of_voxel,
        cell_of_voxel=cell,
        tile_coords=tile_coords,
        tile_valid=tile_valid,
        nbr=nbr,
        active=active,
        num_tiles=jnp.minimum(num_tiles, cap),
        overflow=overflow,
    )


def _scatter_dense(feats, tile_of_voxel, cell, valid, cap, tile):
    c = feats.shape[-1]
    l3 = tile * tile * tile
    flat_idx = jnp.where(
        valid, tile_of_voxel * l3 + cell, cap * l3
    )  # overflow + invalid -> dump tile row ``cap``
    flat = jnp.zeros(((cap + 2) * l3, c), feats.dtype)
    flat = flat.at[flat_idx].set(
        jnp.where(valid[:, None], feats, 0), mode="drop"
    )
    return flat.reshape(cap + 2, tile, tile, tile, c)


def to_dense(feats: jax.Array, ts: TileSet, tile: int) -> jax.Array:
    """(M, C) -> (cap + 2, L, L, L, C); ONE scatter of M rows."""
    cap = ts.tile_coords.shape[0]
    return _scatter_dense(
        feats, ts.tile_of_voxel, ts.cell_of_voxel,
        jnp.ones(feats.shape[0], bool), cap, tile,
    )


def from_dense(dense: jax.Array, ts: TileSet, valid: jax.Array) -> jax.Array:
    """(cap + 2, L, L, L, C) -> (M, C); ONE gather of M rows."""
    cap1 = dense.shape[0]
    tile = dense.shape[1]
    l3 = tile * tile * tile
    flat = dense.reshape(cap1 * l3, -1)
    cap = cap1 - 2
    ok = valid & (ts.tile_of_voxel < cap)
    idx = jnp.where(ok, ts.tile_of_voxel * l3 + ts.cell_of_voxel, 0)
    return flat[idx] * ok[:, None]


def halo_expand(dense: jax.Array, ts: TileSet) -> jax.Array:
    """(T+2, L, L, L, C) -> (T+2, L+2, L+2, L+2, C) halo'd tiles.

    26 slab gathers of T rows each (faces 16/4/1 cells wide) + one static
    in-place update chain; total traffic ~1.4x the dense array, streamed.
    Rows ``cap`` (dump) and ``cap + 1`` (zero) keep all-zero halos.
    """
    cap = ts.nbr.shape[0]
    l = dense.shape[1]

    def src_slice(d):
        return {
            -1: slice(l - 1, l), 0: slice(0, l), 1: slice(0, 1)
        }[d]

    def dst_slice(d):
        return {
            -1: slice(0, 1), 0: slice(1, l + 1), 1: slice(l + 1, l + 2)
        }[d]

    halo = jnp.pad(
        dense, ((0, 0), (1, 1), (1, 1), (1, 1), (0, 0))
    )
    offs = [
        (dx, dy, dz)
        for dx in (-1, 0, 1)
        for dy in (-1, 0, 1)
        for dz in (-1, 0, 1)
    ]
    for o, (dx, dy, dz) in enumerate(offs):
        if (dx, dy, dz) == (0, 0, 0):
            continue
        slab = dense[:, src_slice(dx), src_slice(dy), src_slice(dz), :]
        gathered = slab[ts.nbr[:, o]]  # (cap, sx, sy, sz, C)
        halo = halo.at[
            :cap, dst_slice(dx), dst_slice(dy), dst_slice(dz), :
        ].set(gathered)
    return halo


def tile_subm_conv(
    dense: jax.Array,  # (T+2, L, L, L, Cin)
    weights: jax.Array,  # (27, Cin, Cout) — kernel_offsets layout
    ts: TileSet,
    compute_dtype=None,
    impl: str = "conv",
) -> jax.Array:
    """Submanifold conv on dense tiles; output masked to active cells.

    ``impl='conv'`` uses one ``lax.conv_general_dilated`` (MXU);
    ``impl='slice'`` decomposes into 27 static-slice matmuls (fallback if
    the 3D conv lowers badly on some shape).
    """
    dtype = jnp.dtype(compute_dtype or dense.dtype)
    cin = dense.shape[-1]
    cout = weights.shape[-1]
    l = dense.shape[1]
    halo = halo_expand(dense, ts).astype(dtype)
    if impl == "conv":
        ker = weights.reshape(3, 3, 3, cin, cout).astype(dtype)
        out = jax.lax.conv_general_dilated(
            halo,
            ker,
            window_strides=(1, 1, 1),
            padding="VALID",
            dimension_numbers=("NDHWC", "DHWIO", "NDHWC"),
            preferred_element_type=jnp.float32,
        )
    else:
        w = weights.astype(dtype)
        cap2 = dense.shape[0]
        out = jnp.zeros((cap2, l, l, l, cout), jnp.float32)
        for o in range(27):
            dx, dy, dz = o // 9 - 1, (o // 3) % 3 - 1, o % 3 - 1
            slab = halo[
                :,
                1 + dx : 1 + dx + l,
                1 + dy : 1 + dy + l,
                1 + dz : 1 + dz + l,
                :,
            ]
            out = out + jnp.dot(
                slab.reshape(-1, cin), w[o],
                preferred_element_type=jnp.float32,
            ).reshape(cap2, l, l, l, cout)
    return out * ts.active
