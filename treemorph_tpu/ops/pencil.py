"""Pencil-layout submanifold conv engine: the fast TreeLearn/PTv3 conv path.

Same math as the gather engine (:mod:`treemorph_tpu.ops.sparse`,
replacing spconv ``SubMConv3d``; reference
``/root/reference/Modules/TreeLearn/blocks.py:44-151``), reformulated
around the measured TPU gather cost law: random HBM gathers cost ~flat
per ROW up to ~2 KB rows, so fetching one voxel (128 B at C=32) per
gather wastes ~16x of the row budget. This engine stores voxels as
**z-pencils** — groups of ``cells`` (default 4) consecutive-z voxels of
one (b, x, y) column packed into a single ``cells*C`` row — so each
gather row carries several voxels, and a 3x3x3 submanifold conv needs only the
**9 xy-neighbor pencils** per output pencil instead of 27 voxel
neighbors per voxel:

1. Voxel arrays arrive lexicographically sorted by (b, x, y, z)
   (``sparse.dedup_sort_perm`` guarantees this), so a pencil's cells are
   adjacent array rows and a pencil's z±1 sibling pencils are its
   *adjacent pencil rows* — the conv's cross-pencil boundary terms are
   array shifts, not gathers (:func:`extend_rows`).
2. The z-direction of the conv becomes a **banded block-Toeplitz
   matmul**: out cells [4k, 4k+4) of a pencil = (gathered neighbor row
   cells [4k-1, 4k+5)) @ B_j, with B_j a ((BLOCK+2)*Cin, BLOCK*Cout)
   banded matrix assembled from the (27, Cin, Cout) kernel
   (:func:`banded_weights`). The MXU does the z accumulation.
3. Submanifold semantics (outputs only at active sites) are kept by
   masking conv inputs and outputs with the per-cell activity mask.

The backward pass mirrors the gather engine's scatter-free VJP: the
9-offset pencil rulebook has the same antisymmetry
(``rulebook[p, j] == q  <=>  rulebook[q, 8-j] == p``), so d_feats is 9
row *gathers* of the output gradient through the mirrored columns.

Measured (v5e, 262k voxels / 57k pencils, C=32): 9.0 ms vs 18.3 ms for
the gather engine's 27-offset conv, with 13.5x fewer rulebook lookups.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .sparse import build_table, lookup

# Default voxels per pencil (z-extent); E = cells * C floats per row.
# cells=4 measured fastest on 2 cm tree-surface levels (mean z-run 2.8
# voxels): the ~512-768 B gather rows sit at the knee of the measured
# row-rate/bandwidth law; cells=16 wins only on strongly columnar or
# dense volumetric clouds. Must be a power of two.
CELLS = 4
_MAX_BLOCK = 4  # out-cells per banded matmul block


def _block_of(cells: int) -> int:
    return min(_MAX_BLOCK, cells)


class PencilStructure(NamedTuple):
    """Static-shape pencil view of one voxel level.

    ``P`` below is the static pencil capacity; all row arrays carry one
    extra trailing DUMP row (index ``P``) that stays zero / invalid.
    """

    keys: jax.Array  # (P+1, 4) int32 (b, x, y, t); dump row sentinel
    row_valid: jax.Array  # (P+1,) bool; dump row False
    slot: jax.Array  # (M,) int32 voxel -> row*cells + cell; dump slot P*cells
    cell_active: jax.Array  # (P+1, CELLS) float32 1.0 at active cells
    has_prev: jax.Array  # (P+1,) bool: row-1 is this pencil's z-1 sibling
    has_next: jax.Array  # (P+1,) bool
    rulebook: jax.Array  # (P+1, 9) int32 xy-neighbor pencil rows; missing=P
    num_pencils: jax.Array  # () int32
    overflow: jax.Array  # () int32: voxels dropped by the static cap


@partial(jax.jit, static_argnames=("cap", "cells", "verify_coords"))
def build_pencils(
    coords: jax.Array,
    valid: jax.Array,
    cap: int,
    cells: int = CELLS,
    verify_coords: bool = False,
) -> PencilStructure:
    """Group a lex-sorted voxel level into z-pencils, closed under GHOSTS.

    A **ghost pencil** is an all-empty row inserted at t±1 of every pencil
    run, so that a conv center at level t whose xy-neighbor column has
    content only at t±1 still finds a row to gather: the ghost's extended
    row carries exactly the two cross-boundary cells (its array-adjacent
    siblings are the run's real end pencils). Without ghosts those
    boundary contributions are silently lost whenever a neighbor column
    has no pencil at the center's own t. Ghosts at a gap of exactly 2
    (needed from both sides) deduplicate in the sort and end up sandwiched
    between both real siblings, covering both directions at once.

    Args:
        coords: (M, 4) int32 (b, x, y, z), sorted lexicographically with
            all valid rows first (``sparse.dedup_sort_perm`` order — both
            ``voxelize`` and ``build_downsample`` produce this).
        valid: (M,) bool.
        cap: static pencil row capacity (reals + ghosts). Voxels whose
            pencil row exceeds it are dropped (counted in ``overflow``).
    """
    from .sparse import dedup_sort_perm

    assert cells & (cells - 1) == 0, "cells must be a power of two"
    m = coords.shape[0]
    b, z = coords[:, 0], coords[:, 3]
    t = z >> (cells.bit_length() - 1)
    cell = z & (cells - 1)
    pkey = jnp.stack([b, coords[:, 1], coords[:, 2], t], axis=1)  # (M, 4)

    # candidates: every voxel's own pencil key plus its t-1 / t+1 ghost
    # keys; the dedup sort merges duplicates and orders groups lex, so
    # real runs come out contiguous with ghosts at their ends.
    ez = jnp.array([0, 0, 0, 1], jnp.int32)
    cand = jnp.concatenate([pkey, pkey - ez, pkey + ez], axis=0)  # (3M, 4)
    cand_valid = jnp.concatenate([valid, valid & (t >= 1), valid])

    perm = dedup_sort_perm(cand, cand_valid)
    s_key = cand[perm]
    s_valid = cand_valid[perm]
    new = jnp.any(s_key[1:] != s_key[:-1], axis=1)
    new = jnp.concatenate([jnp.array([True]), new])
    new = jnp.where(s_valid, new, True)
    s_gid = jnp.cumsum(new.astype(jnp.int32)) - 1

    num_pencils = jnp.minimum(
        jnp.max(jnp.where(s_valid, s_gid + 1, 0)), cap
    ).astype(jnp.int32)

    # group id of every candidate, back in candidate order
    g_of_cand = jnp.zeros(3 * m, jnp.int32).at[perm].set(
        jnp.minimum(s_gid, cap)
    )
    row = g_of_cand[:m]  # voxel -> pencil row
    in_cap = valid & (row < cap)
    overflow = jnp.sum(valid & ~in_cap).astype(jnp.int32)
    slot = jnp.where(in_cap, row * cells + cell, cap * cells)

    scatter_g = jnp.where(s_valid, jnp.minimum(s_gid, cap), cap)
    keys = jnp.full((cap + 1, 4), -1, jnp.int32).at[scatter_g].set(s_key)
    row_valid = jnp.arange(cap + 1, dtype=jnp.int32) < num_pencils
    # NOTE: ghost rows are ordinary valid rows with all-zero cell_active;
    # no real/ghost flag is needed downstream.

    cell_active = (
        jnp.zeros(((cap + 1) * cells,), jnp.float32)
        .at[slot]
        .set(valid.astype(jnp.float32))
        .reshape(cap + 1, cells)
        .at[cap]
        .set(0.0)
    )

    prev_k, cur_k = keys[:-1], keys[1:]
    sib = (
        jnp.all(prev_k[:, :3] == cur_k[:, :3], axis=1)
        & (prev_k[:, 3] + 1 == cur_k[:, 3])
        & row_valid[:-1]
        & row_valid[1:]
    )
    has_prev = jnp.concatenate([jnp.array([False]), sib])
    has_next = jnp.concatenate([sib, jnp.array([False])])

    table = build_table(keys[:cap], row_valid[:cap])
    cols = []
    arange = jnp.arange(cap + 1, dtype=jnp.int32)
    center = jnp.where(row_valid, arange, cap)
    for dx in (-1, 0, 1):
        for dy in (-1, 0, 1):
            if dx == 0 and dy == 0:
                cols.append(center)
                continue
            q = keys.at[:, 1].add(dx).at[:, 2].add(dy)
            idx = lookup(table, q, verify_coords=verify_coords)
            cols.append(
                jnp.where(row_valid & (idx >= 0), idx, cap).astype(jnp.int32)
            )
    rulebook = jnp.stack(cols, axis=1)

    return PencilStructure(
        keys=keys,
        row_valid=row_valid,
        slot=slot,
        cell_active=cell_active,
        has_prev=has_prev,
        has_next=has_next,
        rulebook=rulebook,
        num_pencils=num_pencils,
        overflow=overflow,
    )


def to_pencil(feats: jax.Array, ps: PencilStructure) -> jax.Array:
    """(M, C) voxel features -> (P+1, cells*C) pencil core (dump row zero)."""
    c = feats.shape[-1]
    cap1, cells = ps.cell_active.shape
    flat = (
        jnp.zeros((cap1 * cells, c), feats.dtype)
        .at[ps.slot]
        .set(feats)
        .reshape(cap1, cells * c)
        .at[-1]
        .set(0.0)  # overflow voxels land in the dump row; keep it zero
    )
    return flat


def from_pencil(core: jax.Array, ps: PencilStructure) -> jax.Array:
    """(P+1, cells*C) pencil core -> (M, C) voxel features."""
    cap1, cells = ps.cell_active.shape
    c = core.shape[1] // cells
    return core.reshape(cap1 * cells, c)[ps.slot]


def extend_rows(
    core: jax.Array, has_prev: jax.Array, has_next: jax.Array, cells: int
) -> jax.Array:
    """(P+1, E) -> (P+1, E+2C): prepend the z-1 sibling's last cell and
    append the z+1 sibling's first cell. Siblings are adjacent rows in the
    lex sort, so this is two shifts — no gather."""
    e = core.shape[1]
    c = e // cells
    last = core[:, e - c :]
    first = core[:, :c]
    prev_last = jnp.concatenate(
        [jnp.zeros((1, c), core.dtype), last[:-1]], axis=0
    ) * has_prev[:, None].astype(core.dtype)
    next_first = jnp.concatenate(
        [first[1:], jnp.zeros((1, c), core.dtype)], axis=0
    ) * has_next[:, None].astype(core.dtype)
    return jnp.concatenate([prev_last, core, next_first], axis=1)


def banded_weights(weights: jax.Array, cells: int = CELLS) -> jax.Array:
    """(27, Cin, Cout) kernel (``sparse.kernel_offsets(3)`` order: dx
    slowest, dz fastest) -> (9, (block+2)*Cin, block*Cout) banded
    block-Toeplitz matrices, one per xy offset.

    Band j row-block r, col-block u holds W[(j, dz=r-u)] when
    0 <= r-u < 3: the gathered window cells [4k-1, 4k+5) hit out cells
    [4k, 4k+4) at z-offset (r-u) - 1. Identical for every k (Toeplitz),
    so one matrix per xy offset serves all cells//block matmuls.
    """
    k, cin, cout = weights.shape
    assert k == 27, "pencil engine covers 3x3x3 kernels"
    block = _block_of(cells)
    w9 = weights.reshape(9, 3, cin, cout)
    rows = []
    for r in range(block + 2):
        cols = []
        for u in range(block):
            dz = r - u
            if 0 <= dz < 3:
                cols.append(w9[:, dz])
            else:
                cols.append(jnp.zeros((9, cin, cout), weights.dtype))
        rows.append(jnp.concatenate(cols, axis=2))
    return jnp.concatenate(rows, axis=1)  # (9, (block+2)Cin, block*Cout)


def pencil_conv_apply(
    core: jax.Array,  # (P+1, cells*Cin)
    weights: jax.Array,  # (27, Cin, Cout)
    ps: PencilStructure,
    compute_dtype=None,
) -> jax.Array:
    """Submanifold 3x3x3 conv on the pencil layout -> (P+1, cells*Cout).

    Masks inputs AND outputs by ``cell_active`` (submanifold semantics:
    empty cells contribute nothing and receive nothing).
    """
    cells = ps.cell_active.shape[1]
    cin = core.shape[1] // cells
    dtype = jnp.dtype(compute_dtype or core.dtype)
    act = ps.cell_active
    masked = (core.reshape(*act.shape, cin) * act[..., None]).reshape(
        core.shape
    )
    banded = banded_weights(weights, cells)
    out = _pencil_conv(
        dtype, cells, masked, banded, ps.rulebook, ps.has_prev,
        ps.has_next, ps.row_valid,
    )
    cout = banded.shape[-1] // _block_of(cells)
    return (out.reshape(*act.shape, cout) * act[..., None]).reshape(
        out.shape[0], -1
    )


def _pencil_conv_impl(dtype, cells, core, banded, rulebook, has_prev,
                      has_next, row_valid):
    p1 = core.shape[0]
    block = _block_of(cells)
    cin = core.shape[1] // cells
    cout = banded.shape[-1] // block
    ext = extend_rows(core, has_prev, has_next, cells).astype(dtype)
    bd = banded.astype(dtype)
    out = jnp.zeros((p1, cells * cout), jnp.float32)
    for j in range(9):
        win = ext[rulebook[:, j]]  # (P+1, E+2C); missing -> zero dump row
        for k in range(cells // block):
            s = win[:, k * block * cin : (k * block + block + 2) * cin]
            out = out.at[:, k * block * cout : (k + 1) * block * cout].add(
                jnp.dot(s, bd[j], preferred_element_type=jnp.float32)
            )
    return out


@partial(jax.custom_vjp, nondiff_argnums=(0, 1))
def _pencil_conv(dtype, cells, core, banded, rulebook, has_prev, has_next,
                 row_valid):
    return _pencil_conv_impl(
        dtype, cells, core, banded, rulebook, has_prev, has_next, row_valid
    )


def _pencil_conv_fwd(dtype, cells, core, banded, rulebook, has_prev,
                     has_next, row_valid):
    out = _pencil_conv_impl(
        dtype, cells, core, banded, rulebook, has_prev, has_next, row_valid
    )
    return out, (core, banded, rulebook, has_prev, has_next, row_valid)


def _pencil_conv_bwd(dtype, cells, res, g):
    core, banded, rulebook, has_prev, has_next, row_valid = res
    p1 = core.shape[0]
    block = _block_of(cells)
    cin = core.shape[1] // cells
    cout = banded.shape[-1] // block
    ec = (cells + 2) * cin
    bd = banded.astype(dtype)

    # rows beyond num_pencils never produced real output; zero their
    # gradient so the mirrored gathers below see exact transposes
    g = (g * row_valid[:, None]).astype(dtype)

    ext = extend_rows(core, has_prev, has_next, cells).astype(dtype)
    d_ext = jnp.zeros((p1, ec), jnp.float32)
    d_banded = jnp.zeros(banded.shape, jnp.float32)
    for j in range(9):
        # d input: gather grads through the MIRRORED xy offset — exact
        # transpose of the forward gather (rulebook antisymmetry), no
        # scatter. Missing neighbors hit the dump row whose grad is zero.
        gj = g[rulebook[:, 8 - j]]  # (P+1, cells*Cout)
        win = ext[rulebook[:, j]]  # recompute forward gather for d_banded
        for k in range(cells // block):
            gblk = gj[:, k * block * cout : (k + 1) * block * cout]
            lo = k * block * cin
            d_ext = d_ext.at[:, lo : lo + (block + 2) * cin].add(
                jnp.dot(gblk, bd[j].T, preferred_element_type=jnp.float32)
            )
            gfwd = g[:, k * block * cout : (k + 1) * block * cout]
            s = win[:, lo : lo + (block + 2) * cin]
            d_banded = d_banded.at[j].add(
                jnp.dot(s.T, gfwd, preferred_element_type=jnp.float32)
            )

    # transpose of extend_rows: un-shift the two boundary columns
    c = cin
    e = cells * cin
    d_core = d_ext[:, c : c + e]
    up = d_ext[:, :c] * has_prev[:, None]  # grad of prev sibling's last
    d_core = d_core.at[:-1, e - c :].add(up[1:])
    down = d_ext[:, c + e :] * has_next[:, None]
    d_core = d_core.at[1:, :c].add(down[:-1])

    return (
        d_core.astype(core.dtype),
        d_banded.astype(banded.dtype),
        None,
        None,
        None,
        None,
    )


_pencil_conv.defvjp(_pencil_conv_fwd, _pencil_conv_bwd)
