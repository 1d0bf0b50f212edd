"""Banded-window submanifold conv: Pallas one-hot gather over DMA'd tiles.

The gather conv engine (:func:`treemorph_tpu.ops.sparse.subm_conv_apply`)
is issue-rate-bound: XLA's row gather retires ~1 row / ~3 cycles, so a
27-offset conv over M voxels costs 27*M row latencies (measured 23 ms at
M=262k, C=32 — ~25x below HBM streaming speed).

This engine exploits the lex-sort invariant every voxel level satisfies
(:func:`treemorph_tpu.ops.sparse.dedup_sort_perm`): adding a fixed kernel
offset preserves lexicographic order, so every rulebook COLUMN is
monotone over its found entries. For a tile of T consecutive output rows,
all found neighbors of one offset therefore lie in a narrow contiguous
index window — and the ksize offsets of one (dx, dy) column differ only
in dz, i.e. by a few rows, so they share one window. The kernel, per
output tile:

1. DMAs, per (dx, dy) group, the WIN-row feature window anchored just
   below the group's first found neighbor, HBM->VMEM in ONE DMA per
   group (``pl.Element`` block indexing; anchors are stored in units of
   8 rows and scaled inside the index map so Mosaic can prove sublane
   alignment; Pallas auto-pipelines the fetches);
2. selects neighbor rows with an MXU one-hot matmul
   ``onehot(local_idx) @ window`` — one-hot rows are exact {0,1}, so
   bf16 products accumulate the selected values exactly in f32;
3. applies each offset's (Cin, Cout) filter and accumulates all K = k^3
   offsets in-register before one output-tile write.

The VPU compare cost of building the one-hots scales with
``K * M * WIN`` and dominates the kernel, so TILE is small (128) and
WIN modest (384): at fixed window size, smaller tiles adapt the anchor
per fewer output rows, collapsing the out-of-window tail (measured on
the 0.02 m bench clouds: 44.7k stragglers at TILE=256/512-row block
windows vs 3.5k at TILE=128/WIN=384 element-anchored; on-chip A/B:
5.7 ms vs the 15.6 ms gather conv at M=210k, C=32, bf16).

float32 features ride the bf16 MXU near-exactly via a hi/lo split
(``f = bf16(f) + bf16(f - bf16(f))`` — both parts selected exactly,
recombined in f32; relative error ~1e-5; the reference itself trains in
fp16 AMP). ``compute_dtype=bfloat16`` skips the split for half the MXU
work.

Exactness: found neighbors whose window misses them (the tail of the
band-width distribution — ~0.1% of entries at the default TILE/WIN) are
repaired by a mini gather-engine pass: plan time compacts the OUTPUT
ROWS owning any out-of-window entry (one small nonzero over M — a
per-ENTRY compaction over the (M, K) mask cost 50 ms at 1M rows and ate
the engine's gains) plus a per-row masked rulebook slice; the kernel's
one-hot match silently drops those entries (their local index falls
outside the iota range), and ``_band_impl`` adds K tiny gather+matmuls
over just those rows, scatter-added back at sorted unique indices. Only
if the violating-row count overflows its cap (``m // 16`` — >30x the
worst level observed) does ``band_subm_conv_apply`` route the whole
conv through the exact gather engine via ``lax.cond``, so the engine is
always exact and fast whenever the banded premise mostly holds.

Replaces spconv ``SubMConv3d`` semantics exactly
(/root/reference/Modules/TreeLearn/blocks.py:44-81; also serves PTv3's
xCPE and k=5 embedding stem, /root/reference/Modules/PointTransformerV3/
blocks.py:536-623,770-800).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

TILE = 128  # output rows per kernel step
WIN = 384  # feature-window rows DMA'd per (dx, dy) group


class BandPlan(NamedTuple):
    """Banded conv schedule for one voxel level (any number of convs).

    The static window size is encoded by ``wmark.shape[0]`` (rows) so it
    survives jit tracing (NamedTuple fields must be arrays)."""

    rulebook: jax.Array  # (M, K) int32, M = missing (gather-engine layout)
    rb_tiles: jax.Array  # (n_tiles, K, TILE) int32 tiled rulebook
    starts: jax.Array  # (n_tiles, G) int32 window anchor per group, /8 rows
    ok: jax.Array  # () bool — rows with out-of-window entries fit the cap
    valid: jax.Array  # (M,) bool
    res_rows: jax.Array  # (R,) int32 output rows owning any such entry
    res_rb: jax.Array  # (R, K) int32 rulebook restricted to those entries
    res_valid: jax.Array  # (R,) bool — live residual rows
    wmark: jax.Array  # (WIN,) zeros — static window-size marker


def build_band_plan(
    rulebook: jax.Array,
    valid: jax.Array,
    window: int = WIN,
) -> BandPlan:
    """Window schedule from an existing rulebook (monotone columns).

    Offsets are grouped by their (dx, dy) plane column — ksize
    consecutive rulebook columns in :func:`kernel_offsets` order (dz
    fastest) share one ``window``-row feature window anchored at the
    8-row-aligned floor of the group's first found neighbor."""
    m, k = rulebook.shape
    ksize = round(k ** (1 / 3))
    g = ksize * ksize
    win = -(-window // 8) * 8
    mp = max(-(-m // TILE), -(-win // TILE)) * TILE
    n_tiles = mp // TILE
    pad = mp - m

    rb = jnp.concatenate(
        [rulebook, jnp.full((pad, k), m, jnp.int32)], axis=0
    )  # (Mp, K); found entries stay < m
    tiles = rb.reshape(n_tiles, TILE, k).swapaxes(1, 2)  # (n_tiles, K, T)
    grouped = tiles.reshape(n_tiles, g, ksize, TILE)
    found = grouped < m
    big = jnp.int32(mp)
    min_idx = jnp.min(
        jnp.where(found, grouped, big), axis=(2, 3)
    )  # (n_tiles, G)
    has = jnp.any(found, axis=(2, 3))
    # anchors in units of 8 rows: the Pallas index map multiplies by 8,
    # which is how Mosaic proves sublane (8-row) alignment of the DMA
    base8 = (
        jnp.clip(jnp.where(has, min_idx, 0), 0, mp - win) // 8
    ).astype(jnp.int32)
    local = grouped - (base8 * 8)[:, :, None, None]
    viol = found & ((local < 0) | (local >= win))
    # compact the output ROWS owning any out-of-window entry (a per-ENTRY
    # nonzero over the (Mp, K) mask cost ~50 ms at 1M rows); each such
    # row carries its rulebook restricted to just those entries, repaired
    # by a mini gather-conv in _band_impl. Worst level observed on 0.02 m
    # bench clouds: ~m/59 entries over fewer rows.
    rcap = max(m // 16, 256)
    row_viol = jnp.any(viol, axis=(1, 2))  # (n_tiles, TILE)
    count = jnp.sum(row_viol)
    # fill rows use m-1 so the compacted list stays ascending (the repair
    # scatter-add passes indices_are_sorted; fill contributions are zero)
    (res_rows,) = jnp.nonzero(
        row_viol.reshape(-1), size=rcap, fill_value=m - 1
    )
    res_valid = jnp.arange(rcap) < count
    res_rows = jnp.where(res_valid, res_rows, m - 1).astype(jnp.int32)
    # (Mp, K) rulebook masked to out-of-window entries, sliced per row:
    # viol is (n_tiles, g, ksize, TILE) == (n_tiles, K, TILE) with K in
    # rulebook column order (dz fastest), so transpose K and TILE back
    viol_mk = viol.reshape(n_tiles, k, TILE).swapaxes(1, 2).reshape(mp, k)
    rb_masked = jnp.where(viol_mk, rb, m)
    res_rb = jnp.where(res_valid[:, None], rb_masked[res_rows], m)
    return BandPlan(
        rulebook=rulebook,
        rb_tiles=tiles,
        starts=base8,
        ok=count <= rcap,
        valid=valid,
        res_rows=res_rows,
        res_rb=res_rb.astype(jnp.int32),
        res_valid=res_valid,
        wmark=jnp.zeros((win,), jnp.int32),
    )


def _band_kernel(m, nsplit, ksize, win, starts_ref, rb_ref, *rest):
    """One output tile: K one-hot gathers from G grouped windows."""
    g = ksize * ksize
    fwins = rest[: nsplit * g]
    w_ref, o_ref = rest[nsplit * g], rest[nsplit * g + 1]
    t = pl.program_id(0)

    cout = o_ref.shape[-1]
    acc = jnp.zeros((TILE, cout), jnp.float32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, win), 1)
    for gi in range(g):
        base = starts_ref[t, gi] * 8
        for dz in range(ksize):
            kk = gi * ksize + dz
            idx = rb_ref[0, kk, :]  # (T,) global neighbor rows
            # fold the found-mask into the index (-1 never matches the
            # iota) — Mosaic cannot reshape 1-D bools to (T, 1)
            local = jnp.where(idx < m, idx - base, -1)
            oh = (iota == local[:, None]).astype(jnp.bfloat16)
            cin = fwins[nsplit * gi].shape[-1]
            sel = jnp.zeros((TILE, cin), jnp.float32)
            for s in range(nsplit):
                sel += jnp.dot(
                    oh, fwins[nsplit * gi + s][...],
                    preferred_element_type=jnp.float32,
                )
            w = w_ref[kk]  # (Cin, Cout)
            acc += jnp.dot(
                sel.astype(w.dtype), w, preferred_element_type=jnp.float32
            )
    o_ref[...] = acc


@partial(jax.jit, static_argnames=("m", "nsplit", "win"))
def _band_conv_padded(
    rb_tiles: jax.Array,  # (n_tiles, K, TILE)
    starts: jax.Array,  # (n_tiles, G) anchors in units of 8 rows
    fparts: tuple[jax.Array, ...],  # nsplit x (Mp, Cin) bf16
    weights: jax.Array,  # (K, Cin, Cout)
    m: int,
    nsplit: int,
    win: int,
) -> jax.Array:
    n_tiles, k, _ = rb_tiles.shape
    mp = n_tiles * TILE
    cin = fparts[0].shape[-1]
    cout = weights.shape[-1]
    ksize = round(k ** (1 / 3))
    g = ksize * ksize

    in_specs = [
        pl.BlockSpec((1, k, TILE), lambda t, s: (t, 0, 0))
    ]
    operands = [rb_tiles]
    # window views ordered per (group, split) — the kernel indexes
    # fwins[nsplit * gi + s]. pl.Element start = anchor * 8 elements.
    for gi in range(g):
        for fp in fparts:
            in_specs.append(
                pl.BlockSpec(
                    (pl.Element(win), pl.Element(cin)),
                    partial(lambda gi, t, s: (s[t, gi] * 8, 0), gi),
                )
            )
            operands.append(fp)
    in_specs.append(
        pl.BlockSpec((k, cin, cout), lambda t, s: (0, 0, 0))
    )
    operands.append(weights)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE, cout), lambda t, s: (t, 0)),
    )
    return pl.pallas_call(
        partial(_band_kernel, m, nsplit, ksize, win),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, cout), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        # CPU (tests / virtual meshes) runs the kernel in interpret mode
        interpret=jax.default_backend() == "cpu",
    )(starts, *operands)


def _split_bf16(feats: jax.Array, nsplit: int) -> tuple[jax.Array, ...]:
    """f32 -> (hi, lo) bf16 parts whose sum is within ~1e-5 relative of
    the f32 value; nsplit=1 is plain bf16 rounding."""
    hi = feats.astype(jnp.bfloat16)
    if nsplit == 1:
        return (hi,)
    lo = (feats - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return (hi, lo)


def _band_impl(feats, weights, plan: BandPlan, valid, nsplit: int):
    m, cin = feats.shape
    mp = plan.rb_tiles.shape[0] * TILE
    masked = feats * valid[:, None]
    pad = jnp.zeros((mp - m, cin), jnp.bfloat16)
    fparts = tuple(
        jnp.concatenate([p, pad], axis=0)
        for p in _split_bf16(masked, nsplit)
    )
    out = _band_conv_padded(
        plan.rb_tiles, plan.starts, fparts, weights, m, nsplit,
        plan.wmark.shape[0],
    )[:m]
    # residual repair: a mini gather-engine conv over just the rows whose
    # windows missed entries — K tiny gathers+matmuls, exact f32, then
    # one scatter-add at sorted (mostly unique) indices.
    feats_pad = jnp.concatenate([masked, jnp.zeros((1, cin), masked.dtype)])
    contrib = jnp.zeros(
        (plan.res_rb.shape[0], weights.shape[-1]), jnp.float32
    )
    for kk in range(weights.shape[0]):
        gathered = feats_pad[jnp.minimum(plan.res_rb[:, kk], m)]
        contrib = contrib + jnp.dot(
            gathered, weights[kk], preferred_element_type=jnp.float32
        )
    contrib = contrib * plan.res_valid[:, None]
    out = out.at[plan.res_rows].add(contrib, indices_are_sorted=True)
    return out * valid[:, None]


def band_subm_conv_apply(
    feats: jax.Array,  # (M, Cin)
    weights: jax.Array,  # (K, Cin, Cout) — kernel_offsets layout
    plan: BandPlan,
    valid: jax.Array,
    compute_dtype=None,
) -> jax.Array:
    """Submanifold conv on the banded engine; same weights layout as
    :func:`treemorph_tpu.ops.sparse.subm_conv_apply` (engine-
    interchangeable checkpoints). Falls back to the exact gather engine
    when the plan's residual cap overflowed (``plan.ok`` false), or —
    statically — when the kernel's VMEM working set (the full weight
    block plus the double-buffered per-group feature windows) would
    blow the ~16 MB scoped limit: deep narrow levels (C >= 256 at k=27)
    OOM the stack, and their voxel counts are tiny, so the gather
    engine is the right tool there anyway."""
    dtype = jnp.dtype(compute_dtype or feats.dtype)
    nsplit = 1 if dtype == jnp.bfloat16 else 2
    k, cin, cout = weights.shape
    g = round(k ** (1 / 3)) ** 2
    win = plan.wmark.shape[0]
    vmem_bytes = k * cin * cout * 4 + g * nsplit * 2 * win * cin * 2
    if vmem_bytes > 12 * 2**20:
        from .sparse import _subm_conv

        return _subm_conv(dtype, feats, weights, plan.rulebook, valid)
    return _band_conv_vjp(
        plan.ok, plan.rulebook, plan.rb_tiles, plan.starts,
        plan.res_rows, plan.res_rb, plan.res_valid,
        plan.wmark, nsplit, feats, weights, valid,
    )


@partial(jax.custom_vjp, nondiff_argnums=(8,))
def _band_conv_vjp(ok, rulebook, rb_tiles, starts, res_rows, res_rb,
                   res_valid, wmark, nsplit, feats, weights, valid):
    plan = BandPlan(
        rulebook, rb_tiles, starts, ok, valid,
        res_rows, res_rb, res_valid, wmark,
    )
    from .sparse import _subm_conv_impl

    return jax.lax.cond(
        ok,
        lambda f, w, v: _band_impl(f, w, plan, v, nsplit),
        lambda f, w, v: _subm_conv_impl(
            jnp.bfloat16 if nsplit == 1 else jnp.float32, f, w, rulebook, v
        ),
        feats, weights, valid,
    )


def _band_conv_fwd(ok, rulebook, rb_tiles, starts, res_rows, res_rb,
                   res_valid, wmark, nsplit, feats, weights, valid):
    out = _band_conv_vjp(
        ok, rulebook, rb_tiles, starts, res_rows, res_rb, res_valid,
        wmark, nsplit, feats, weights, valid,
    )
    return out, (
        ok, rulebook, rb_tiles, starts, res_rows, res_rb, res_valid,
        wmark, feats, weights, valid,
    )


def _band_conv_bwd(nsplit, res, g):
    """d_feats rides the banded engine too: by the rulebook antisymmetry
    (``rulebook[i,k]==j <=> rulebook[j,K-1-k]==i``) the adjoint of the
    conv is the conv of the output grad with the offset-flipped,
    channel-transposed kernel through the SAME rulebook/plan — the
    banded engine with residual repair evaluates that rulebook conv
    EXACTLY (in-window one-hot + residual list is a partition of the
    rulebook's found entries). d_weights recomputes the forward gathers
    via the gather engine's formulation (K gather+matmuls, as the gather
    engine's VJP)."""
    (ok, rulebook, rb_tiles, starts, res_rows, res_rb, res_valid,
     wmark, feats, weights, valid) = res
    m, cin = feats.shape
    k = weights.shape[0]
    dtype = jnp.bfloat16 if nsplit == 1 else jnp.float32

    w_bwd = weights[::-1].swapaxes(-1, -2)  # offs[k] == -offs[K-1-k]
    d_feats = _band_conv_vjp(
        ok, rulebook, rb_tiles, starts, res_rows, res_rb, res_valid,
        wmark, nsplit, g * valid[:, None], w_bwd, valid,
    ).astype(feats.dtype)

    g16 = (g * valid[:, None]).astype(dtype)
    feats_pad = jnp.concatenate(
        [(feats * valid[:, None]).astype(dtype), jnp.zeros((1, cin), dtype)],
        axis=0,
    )
    d_w = []
    for j in range(k):
        gathered = feats_pad[rulebook[:, j]]
        d_w.append(
            jnp.dot(gathered.T, g16, preferred_element_type=jnp.float32)
        )
    d_weights = jnp.stack(d_w).astype(weights.dtype)
    return (None, None, None, None, None, None, None, None,
            d_feats, d_weights, None)


_band_conv_vjp.defvjp(_band_conv_fwd, _band_conv_bwd)
