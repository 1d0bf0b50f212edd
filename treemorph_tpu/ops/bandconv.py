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

from ..utils.flops import log_pallas_flops

TILE = 128  # output rows per kernel step
WIN = 448  # feature-window rows DMA'd per (dx, dy) group
ALIGN = 64  # window-anchor alignment in rows: blocked window views
# (block_rows <= 8 rows per 128-lane block) start at anchor/blk block
# rows, and Mosaic must prove 8-sublane divisibility of that start for
# every blk in {1, 2, 4, 8} -> anchors live on 64-row boundaries


class BandPlan(NamedTuple):
    """Banded conv schedule for one voxel level (any number of convs).

    The static window size is encoded by ``wmark.shape[0]`` (rows) so it
    survives jit tracing (NamedTuple fields must be arrays)."""

    rulebook: jax.Array  # (M, K) int32, M = missing (gather-engine layout)
    rb_tiles: jax.Array  # (n_tiles, K, TILE) int32 tiled rulebook
    # (G, n_tiles) int32 window anchor per group in units of ALIGN=64
    # rows —
    # group-major because the scalar-prefetch SMEM layout pads the MINOR
    # dim to 128 lanes (an (n_tiles, G) layout costs 512 B per tile row
    # and blows the ~1 MB SMEM budget beyond ~2000 tiles / 256k voxels)
    starts: jax.Array
    ok: jax.Array  # () bool — rows with out-of-window entries fit the cap
    valid: jax.Array  # (M,) bool
    res_rows: jax.Array  # (R,) int32 output rows owning any such entry
    res_rb: jax.Array  # (R, K) int32 rulebook restricted to those entries
    res_valid: jax.Array  # (R,) bool — live residual rows
    wmark: jax.Array  # (WIN,) zeros — static window-size marker


def block_rows(c: int) -> int:
    """Window rows the blocked-select kernel packs per one-hot column
    (:func:`_band_kernel`): narrow channels waste MXU lanes, so the
    kernel selects ``blk`` consecutive window rows with ONE one-hot
    column and unpacks the sub-row with a vector mask. Capped at 8 so
    plan anchors (stored in 8-row units) are always block-aligned."""
    return min(8, 128 // c) if 0 < c <= 64 and 128 % c == 0 else 1


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
    win = -(-window // ALIGN) * ALIGN
    mp = max(-(-m // TILE), -(-win // TILE), -(-win // ALIGN)) * TILE
    mp = -(-mp // ALIGN) * ALIGN
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
    # anchors in ALIGN-row units (see ALIGN above); the index map scales
    # back up, so every blocked view start is provably sublane-aligned
    base8 = (
        jnp.clip(jnp.where(has, min_idx, 0), 0, mp - win) // ALIGN
    ).astype(jnp.int32)
    local = grouped - (base8 * ALIGN)[:, :, None, None]
    viol = found & ((local < 0) | (local >= win))
    # compact the output ROWS owning any out-of-window entry (a per-ENTRY
    # nonzero over the (Mp, K) mask cost ~50 ms at 1M rows); each such
    # row carries its rulebook restricted to just those entries, repaired
    # by a mini gather-conv in _band_impl. Worst level observed on 0.02 m
    # bench clouds: ~m/59 entries over fewer rows.
    # static residual capacity: every repair gather/matmul is sized by
    # this, so the margin is paid on EVERY step — worst level observed
    # on 0.02 m bench clouds carries ~m/59 violating ENTRIES (fewer
    # rows), so m//32 keeps >2x headroom; overflow falls back to the
    # exact gather engine (plan.ok), never wrong results
    rcap = max(m // 32, 256)
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
        starts=base8.T,
        ok=count <= rcap,
        valid=valid,
        res_rows=res_rows,
        res_rb=res_rb.astype(jnp.int32),
        res_valid=res_valid,
        wmark=jnp.zeros((win,), jnp.int32),
    )


def _band_kernel(m, nsplit, ksize, win, blk, starts_ref, rb_ref, *rest):
    """One output tile: K blocked one-hot gathers from G group windows.

    Windows arrive pre-reshaped to ``(win/blk, blk*cin)`` (``blk`` =
    :func:`block_rows` window rows per 128-lane block): stage 1 selects
    the block row holding the neighbor with one (TILE, win/blk) one-hot
    matmul — ``blk``x fewer VPU compares and full MXU lane utilization
    for narrow channels — and stage 2 isolates the neighbor's ``cin``
    lanes with a vector mask, feeding a weight matmul against the
    ``blk``-times vertically tiled filter (the masked-off lane blocks
    are zero, so the tiled matmul reproduces ``sel @ w`` exactly)."""
    g = ksize * ksize
    fwins = rest[: nsplit * g]
    w_ref, o_ref = rest[nsplit * g], rest[nsplit * g + 1]
    t = pl.program_id(0)

    cout = o_ref.shape[-1]
    nblk = win // blk
    width = w_ref.shape[1]
    cin = width // blk
    acc = jnp.zeros((TILE, cout), jnp.float32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, nblk), 1)
    if blk > 1:
        lane_blk = (
            jax.lax.broadcasted_iota(jnp.int32, (TILE, width), 1) // cin
        )
    for gi in range(g):
        base = starts_ref[gi, t] * ALIGN
        for dz in range(ksize):
            kk = gi * ksize + dz
            idx = rb_ref[0, kk, :]  # (T,) global neighbor rows
            # fold the found-mask into the index (-1 never matches the
            # iota) — Mosaic cannot reshape 1-D bools to (T, 1)
            local = jnp.where(idx < m, idx - base, -1)
            bi = local // blk  # -1 stays -1 (floor division)
            oh = (iota == bi[:, None]).astype(jnp.bfloat16)
            sel = jnp.zeros((TILE, width), jnp.float32)
            for s in range(nsplit):
                sel += jnp.dot(
                    oh, fwins[nsplit * gi + s][...],
                    preferred_element_type=jnp.float32,
                )
            if blk > 1:
                # zero every lane block except the neighbor's sub-row
                # (missing rows already selected an all-zero sel)
                sub = local - bi * blk
                sel = jnp.where(lane_blk == sub[:, None], sel, 0.0)
            w = w_ref[kk]  # (blk*Cin, Cout) — vertically tiled filter
            acc += jnp.dot(
                sel.astype(w.dtype), w, preferred_element_type=jnp.float32
            )
    o_ref[...] = acc


def _band_bwd_kernel(m, nsplit, ksize, win, blk, starts_ref, rb_ref, *rest):
    """Fused backward tile: d_feats AND d_weights from ONE one-hot pass.

    By the rulebook antisymmetry (``rulebook[i,j]==r <=>
    rulebook[r,K-1-j]==i``) both cotangents are sums over the same
    found-entry set, walked from the output-row side:

    - ``d_feats[r] = sum_k sel_g_k[r] @ w_bwd[k]`` — the banded conv of
      the output gradient with the offset-flipped, channel-transposed
      kernel (the existing backward), and
    - ``d_w[K-1-k] += feats_tile^T @ sel_g_k`` — the SAME selected
      gradient rows contracted against the tile's own feature rows,
      accumulated in a VMEM block across the (sequential) grid.

    This replaces the K separate (M,)-row gathers the old d_weights
    path issued per conv (the dominant cost of the training backward —
    VERDICT r4 #6) with K tiny MXU matmuls per tile that reuse the
    one-hots already built for d_feats. Blocked windows accumulate
    ``d_w`` in lane-block space ``(cin, blk*cout)``; each row
    contributes to exactly one block, so the caller's block-sum is
    exact."""
    g = ksize * ksize
    gwins = rest[: nsplit * g]
    fts = rest[nsplit * g : nsplit * g + nsplit]  # (Cin, TILE) transposed
    w_ref = rest[nsplit * g + nsplit]
    d_ref = rest[nsplit * g + nsplit + 1]
    dw_ref = rest[nsplit * g + nsplit + 2]
    t = pl.program_id(0)

    cin = d_ref.shape[-1]
    nblk = win // blk
    width = w_ref.shape[1]  # blk * cout
    cout = width // blk

    @pl.when(t == 0)
    def _init():
        dw_ref[...] = jnp.zeros_like(dw_ref)

    acc = jnp.zeros((TILE, cin), jnp.float32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, nblk), 1)
    if blk > 1:
        lane_blk = (
            jax.lax.broadcasted_iota(jnp.int32, (TILE, width), 1) // cout
        )
    for gi in range(g):
        base = starts_ref[gi, t] * ALIGN
        for dz in range(ksize):
            kk = gi * ksize + dz
            idx = rb_ref[0, kk, :]
            local = jnp.where(idx < m, idx - base, -1)
            bi = local // blk
            oh = (iota == bi[:, None]).astype(jnp.bfloat16)
            if blk > 1:
                sub = local - bi * blk
            sels = []
            for s in range(nsplit):
                sl = jnp.dot(
                    oh, gwins[nsplit * gi + s][...],
                    preferred_element_type=jnp.float32,
                )
                if blk > 1:
                    sl = jnp.where(lane_blk == sub[:, None], sl, 0.0)
                sels.append(sl)
            sel = sels[0] if nsplit == 1 else sels[0] + sels[1]
            w = w_ref[kk]  # (blk*Cout, Cin) — tiled flipped filter
            acc += jnp.dot(
                sel.astype(w.dtype), w, preferred_element_type=jnp.float32
            )
            # d_w accumulation: per-split sels are EXACT bf16 selections
            # (one-hot rows pick whole bf16 values), so contracting each
            # against each feats split reproduces the hi/lo product.
            # feats arrive pre-transposed (Cin, TILE) so this is a plain
            # row-major MXU matmul, not a dim-0-contracting transpose.
            dwc = jnp.zeros((cin, width), jnp.float32)
            for sl in sels:
                slb = sl.astype(jnp.bfloat16)
                for s in range(nsplit):
                    dwc += jnp.dot(
                        fts[s][...], slb,
                        preferred_element_type=jnp.float32,
                    )
            dw_ref[kk] += dwc
    d_ref[...] = acc


@partial(jax.jit, static_argnames=("m", "nsplit", "win"))
def _band_bwd_padded(
    rb_tiles: jax.Array,  # (n_tiles, K, TILE)
    starts: jax.Array,  # (G, n_tiles)
    gparts: tuple[jax.Array, ...],  # nsplit x (Mp, Cout) bf16 grad parts
    fparts: tuple[jax.Array, ...],  # nsplit x (Cin, Mp) bf16 feat parts,
    # pre-TRANSPOSED so the kernel's d_w contraction is a plain matmul
    w_bwd: jax.Array,  # (K, Cout, Cin) flipped transposed kernel
    m: int,
    nsplit: int,
    win: int,
) -> tuple[jax.Array, jax.Array]:
    """Returns ``(d_feats (Mp, Cin) f32, dw (K, Cin, blk*Cout) f32)``;
    ``dw`` is in kernel-column order (flip) and lane-block space — the
    caller finishes with ``dw.reshape(K, Cin, blk, Cout).sum(2)[::-1]``."""
    n_tiles, k, _ = rb_tiles.shape
    mp = n_tiles * TILE
    cout, cin = w_bwd.shape[1], w_bwd.shape[2]
    ksize = round(k ** (1 / 3))
    g = ksize * ksize
    blk = block_rows(cout)
    log_pallas_flops(
        "band_conv_bwd",
        2.0 * mp * k * (
            nsplit * win * cout
            + blk * cout * cin * (1 + nsplit * nsplit)
        ),
    )
    gparts = tuple(p.reshape(mp // blk, blk * cout) for p in gparts)
    if blk > 1:
        w_bwd = jnp.concatenate([w_bwd] * blk, axis=1)

    in_specs = [pl.BlockSpec((1, k, TILE), lambda t, s: (t, 0, 0))]
    operands = [rb_tiles]
    for gi in range(g):
        for gp in gparts:
            in_specs.append(
                pl.BlockSpec(
                    (pl.Element(win // blk), pl.Element(blk * cout)),
                    partial(
                        lambda gi, t, s: (s[gi, t] * (ALIGN // blk), 0),
                        gi,
                    ),
                )
            )
            operands.append(gp)
    for fp in fparts:
        in_specs.append(pl.BlockSpec((cin, TILE), lambda t, s: (0, t)))
        operands.append(fp)
    in_specs.append(
        pl.BlockSpec((k, blk * cout, cin), lambda t, s: (0, 0, 0))
    )
    operands.append(w_bwd)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=[
            pl.BlockSpec((TILE, cin), lambda t, s: (t, 0)),
            pl.BlockSpec((k, cin, blk * cout), lambda t, s: (0, 0, 0)),
        ],
    )
    return pl.pallas_call(
        partial(_band_bwd_kernel, m, nsplit, ksize, win, blk),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((mp, cin), jnp.float32),
            jax.ShapeDtypeStruct((k, cin, blk * cout), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=jax.default_backend() == "cpu",
    )(starts, *operands)


@partial(jax.jit, static_argnames=("m", "nsplit", "win"))
def _band_conv_padded(
    rb_tiles: jax.Array,  # (n_tiles, K, TILE)
    starts: jax.Array,  # (G, n_tiles) anchors in units of 8 rows
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
    # blocked-select packing (see _band_kernel): blk window rows per
    # 128-lane block; plan anchors are aligned to blk rows, so the
    # reshaped window views start on block boundaries
    blk = block_rows(cin)
    # trace-time analytic-FLOP log for MFU reporting (utils/flops.py):
    # per offset, the blocked one-hot select is a (TILE, win/blk) x
    # (win/blk, blk*cin) matmul per split and the filter apply a
    # (TILE, blk*cin) x (blk*cin, cout) matmul
    log_pallas_flops(
        "band_conv",
        2.0 * mp * k * (nsplit * win * cin + blk * cin * cout),
    )
    fparts = tuple(p.reshape(mp // blk, blk * cin) for p in fparts)
    if blk > 1:
        weights = jnp.concatenate([weights] * blk, axis=1)

    in_specs = [
        pl.BlockSpec((1, k, TILE), lambda t, s: (t, 0, 0))
    ]
    operands = [rb_tiles]
    # window views ordered per (group, split) — the kernel indexes
    # fwins[nsplit * gi + s]. pl.Element start = anchor * 8 elements
    # (exactly divisible by blk: plan anchors are blk-aligned).
    for gi in range(g):
        for fp in fparts:
            in_specs.append(
                pl.BlockSpec(
                    (pl.Element(win // blk), pl.Element(blk * cin)),
                    partial(
                        lambda gi, t, s: (s[gi, t] * (ALIGN // blk), 0),
                        gi,
                    ),
                )
            )
            operands.append(fp)
    in_specs.append(
        pl.BlockSpec((k, blk * cin, cout), lambda t, s: (0, 0, 0))
    )
    operands.append(weights)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE, cout), lambda t, s: (t, 0)),
    )
    return pl.pallas_call(
        partial(_band_kernel, m, nsplit, ksize, win, blk),
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
    out = out.at[plan.res_rows].add(
        _residual_repair(masked, weights, plan, m), indices_are_sorted=True
    )
    return out * valid[:, None]


def _residual_repair(masked, weights, plan, m):
    """Mini gather-engine conv over just the rows whose windows missed
    entries: ONE (R, K) row gather + ONE (R, K*Cin) x (K*Cin, Cout)
    matmul, exact f32. (The earlier K separate gathers+matmuls cost
    ~2 ms per conv at K=27 in pure dispatch/launch overhead.)"""
    cin = masked.shape[1]
    k, _, cout = weights.shape
    feats_pad = jnp.concatenate([masked, jnp.zeros((1, cin), masked.dtype)])
    gathered = feats_pad[jnp.minimum(plan.res_rb, m)]  # (R, K, Cin)
    contrib = jnp.dot(
        gathered.reshape(-1, k * cin),
        weights.reshape(k * cin, cout),
        preferred_element_type=jnp.float32,
    )
    return contrib * plan.res_valid[:, None]


def band_vmem_bytes(
    k: int, cin: int, cout: int, nsplit: int, win: int = WIN,
    zpack: bool = False,
) -> int:
    """Static estimate of the band kernel's VMEM working set: the full
    (blk-tiled) weight block plus the double-buffered per-group feature
    windows. Mosaic pads the lane dimension to 128; the blocked-select
    packing (:func:`_band_kernel`) reshapes windows to
    ``(win/blk, blk*c)`` so narrow channels no longer pay that padding.
    The backward re-enters the kernel with channel-transposed weights
    (windows sized by Cout), so both directions are evaluated and the
    max returned. ``zpack`` windows carry the k z-bands packed per row
    (ksize x the lanes; never blocked)."""
    ksize = round(k ** (1 / 3))
    g = ksize * ksize
    win8 = -(-win // 8) * 8

    def direction(c_win, c_other):
        if zpack:
            lanes, rows = max(ksize * c_win, 128), win8
            blk = 1
        else:
            blk = block_rows(c_win)
            lanes, rows = max(blk * c_win, 128), win8 // blk
        weights = k * blk * c_win * c_other * 4
        return weights + g * nsplit * 2 * rows * lanes * 2

    return max(direction(cin, cout), direction(cout, cin))


def band_viable(
    k: int, cin: int, cout: int, dtype, win: int = WIN,
    zpack: bool = False,
) -> bool:
    """Whether the band kernel statically fits VMEM for this conv shape
    (otherwise :func:`band_subm_conv_apply` routes to the gather engine,
    and building a :class:`BandPlan` for the level is dead compute)."""
    nsplit = 1 if jnp.dtype(dtype) == jnp.bfloat16 else 2
    return band_vmem_bytes(k, cin, cout, nsplit, win, zpack) <= 12 * 2**20


def band_subm_conv_apply(
    feats: jax.Array,  # (M, Cin)
    weights: jax.Array,  # (K, Cin, Cout) — kernel_offsets layout
    plan: BandPlan,
    valid: jax.Array,
    compute_dtype=None,
    needs_feats_grad: bool = True,
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
    win = plan.wmark.shape[0]
    if band_vmem_bytes(k, cin, cout, nsplit, win) > 12 * 2**20:
        from .sparse import _subm_conv

        return _subm_conv(dtype, feats, weights, plan.rulebook, valid)
    return _band_conv_vjp(
        plan.ok, plan.rulebook, plan.rb_tiles, plan.starts,
        plan.res_rows, plan.res_rb, plan.res_valid,
        plan.wmark, nsplit, needs_feats_grad, feats, weights, valid,
    )


@partial(jax.custom_vjp, nondiff_argnums=(8, 9))
def _band_conv_vjp(ok, rulebook, rb_tiles, starts, res_rows, res_rb,
                   res_valid, wmark, nsplit, needs_fg, feats, weights,
                   valid):
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
                   res_valid, wmark, nsplit, needs_fg, feats, weights,
                   valid):
    out = _band_conv_vjp(
        ok, rulebook, rb_tiles, starts, res_rows, res_rb, res_valid,
        wmark, nsplit, needs_fg, feats, weights, valid,
    )
    return out, (
        ok, rulebook, rb_tiles, starts, res_rows, res_rb, res_valid,
        wmark, feats, weights, valid,
    )


def _band_conv_bwd(nsplit, needs_fg, res, g):
    """Fused banded backward: ONE kernel pass over the gradient windows
    yields both cotangents (see :func:`_band_bwd_kernel`); the residual
    (out-of-window) entries are repaired by one shared (R, K) gather
    feeding both a mini conv (d_feats rows) and a contraction against
    the residual rows' features (d_weights). Falls back to the exact
    gather-engine formulation when the plan overflowed (``ok`` false) —
    and statically when the d_w VMEM block would overflow the kernel's
    budget (deep wide levels, which route to the gather engine for the
    forward anyway)."""
    (ok, rulebook, rb_tiles, starts, res_rows, res_rb, res_valid,
     wmark, feats, weights, valid) = res
    m, cin = feats.shape
    k, _, cout = weights.shape
    win = wmark.shape[0]
    dtype = jnp.bfloat16 if nsplit == 1 else jnp.float32
    blk = block_rows(cout)
    fits = (
        band_vmem_bytes(k, cin, cout, nsplit, win)
        + k * cin * blk * cout * 4
    ) <= 12 * 2**20

    feats_m = feats * valid[:, None]
    g_m = g * valid[:, None]

    def band_path(feats_m, g_m, weights):
        w_bwd = weights[::-1].swapaxes(-1, -2)  # offs[j] == -offs[K-1-j]
        mp = rb_tiles.shape[0] * TILE
        gpad = jnp.zeros((mp - m, cout), jnp.bfloat16)
        fpad = jnp.zeros((mp - m, cin), jnp.bfloat16)
        gparts = tuple(
            jnp.concatenate([p, gpad], axis=0)
            for p in _split_bf16(g_m, nsplit)
        )
        fparts = tuple(
            jnp.concatenate([p, fpad], axis=0).T
            for p in _split_bf16(feats_m, nsplit)
        )
        d_f, dw = _band_bwd_padded(
            rb_tiles, starts, gparts, fparts, w_bwd, m, nsplit, win
        )
        d_f = d_f[:m]
        dw = dw.reshape(k, cin, blk, cout).sum(axis=2)[::-1]
        # residual entries (out-of-window at their output row): one
        # shared f32 gather of gradient rows serves both cotangents
        # (full precision, like _residual_repair in the forward)
        g_pad = jnp.concatenate([g_m, jnp.zeros((1, cout), g_m.dtype)])
        gath = g_pad[jnp.minimum(res_rb, m)]  # (R, K, Cout)
        gath = gath * res_valid[:, None, None]
        d_f_res = jnp.dot(
            gath.reshape(-1, k * cout),
            w_bwd.reshape(k * cout, cin),
            preferred_element_type=jnp.float32,
        )
        d_f = d_f.at[res_rows].add(d_f_res, indices_are_sorted=True)
        f_res = feats_m[res_rows] * res_valid[:, None]  # (R, Cin)
        # d_w[K-1-j] += feats[r] (x) g[res_rb[r, j]] over residual
        # entries — contracted as ONE (K*Cout, R) x (R, Cin) matmul
        # (the (R,K,O)x(R,I) batched dot_general lowered as a slow
        # per-offset loop fused into the gather)
        dw_res = jax.lax.dot_general(
            gath.reshape(-1, k * cout), f_res, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        ).reshape(k, cout, cin)
        dw = dw + dw_res.swapaxes(1, 2)[::-1]
        return d_f * valid[:, None], dw

    def gather_path(feats_m, g_m, weights):
        from .sparse import _subm_conv_impl

        w_bwd = weights[::-1].swapaxes(-1, -2)
        d_f = _subm_conv_impl(dtype, g_m, w_bwd, rulebook, valid)
        g16 = g_m.astype(dtype)
        feats_pad = jnp.concatenate(
            [feats_m.astype(dtype), jnp.zeros((1, cin), dtype)], axis=0
        )
        d_w = []
        for j in range(k):
            gathered = feats_pad[rulebook[:, j]]
            d_w.append(
                jnp.dot(gathered.T, g16, preferred_element_type=jnp.float32)
            )
        return d_f, jnp.stack(d_w)

    if not needs_fg:
        # the caller declared d_feats unused (e.g. input/stem convs on
        # raw data): the gather path's d_feats is separate DCE-able XLA
        # ops, and its d_w gathers over a narrow Cin are cheap — the
        # fused kernel would force a useless d_feats computation inside
        # an un-DCE-able pallas_call
        d_feats, d_weights = gather_path(feats_m, g_m, weights)
    elif fits:
        d_feats, d_weights = jax.lax.cond(
            ok, band_path, gather_path, feats_m, g_m, weights
        )
    else:
        d_feats, d_weights = gather_path(feats_m, g_m, weights)
    return (None, None, None, None, None, None, None, None,
            d_feats.astype(feats.dtype), d_weights.astype(weights.dtype),
            None)


_band_conv_vjp.defvjp(_band_conv_fwd, _band_conv_bwd)


# ---------------------------------------------------------------------------
# z-packed band conv: one one-hot select per (dx, dy) group
# ---------------------------------------------------------------------------


class ZBandPlan(NamedTuple):
    """Banded conv schedule with z-packed feature bands.

    The plain band engine builds one (TILE, WIN) one-hot per kernel
    OFFSET — K * M * WIN VPU compares dominate it, and each one-hot's
    select matmul uses only Cin of the MXU's 128 lanes. This variant
    packs the ksize z-bands of every row into one (M, ksize*Cin) array
    ``zq`` (``zq[j]`` band dz = features of the voxel at the same
    (b, x, y) and z_j + dz, or zero — built by pure shifts + compares,
    the lex-order column-contiguity invariant), anchors every (dx, dy)
    group at its dz=0 rulebook column, and selects the whole group with
    ONE one-hot: ksize x fewer compares (k=3: 3x, the k=5 stem: 5x) and
    ksize x the select-matmul lane utilization, at identical total
    select FLOPs and exactly spconv's math.

    Group entries whose dz=0 anchor is missing or out-of-window go to
    the same compacted residual gather-repair as :class:`BandPlan`, so
    the engine stays exact."""

    rulebook: jax.Array  # (M, K) int32 full rulebook (fallback/repair)
    anchors: jax.Array  # (n_tiles, G, TILE) int32 dz=0 neighbor rows
    starts: jax.Array  # (G, n_tiles) int32 window anchor per group, /8
    zoff: jax.Array  # (M, ksize-1) int32 row shift of the z+dz voxel
    # (slots dz = -r..-1, +1..+r), 0 = missing
    ok: jax.Array  # () bool — residual rows fit the cap
    valid: jax.Array  # (M,) bool
    res_rows: jax.Array  # (R,) int32 output rows owning residual entries
    res_rb: jax.Array  # (R, K) int32 rulebook restricted to those entries
    res_valid: jax.Array  # (R,) bool
    wmark: jax.Array  # (win,) zeros — static window-size marker


def build_zband_plan(
    rulebook: jax.Array,
    valid: jax.Array,
    window: int = WIN,
    res_divisor: int = 4,
) -> ZBandPlan:
    """Window schedule anchored at each (dx, dy) group's dz=0 column.

    Shares :func:`build_band_plan`'s premise (lex-sorted level, monotone
    rulebook columns); additionally derives the z-shift table from the
    CENTER group's columns (the (0, 0, dz) neighbors of row i sit at
    rows i+s with abs(s) <= abs(dz) by column contiguity)."""
    m, k = rulebook.shape
    ksize = round(k ** (1 / 3))
    r = (ksize - 1) // 2
    g = ksize * ksize
    win = -(-window // 8) * 8
    mp = max(-(-m // TILE), -(-win // TILE)) * TILE
    n_tiles = mp // TILE
    pad = mp - m

    iota = jnp.arange(m, dtype=jnp.int32)
    gc = (g - 1) // 2  # center (dx=dy=0) group
    zoff_cols = []
    for dz in [*range(-r, 0), *range(1, r + 1)]:
        col = rulebook[:, gc * ksize + (dz + r)]
        zoff_cols.append(jnp.where(col < m, col - iota, 0))
    zoff = jnp.stack(zoff_cols, axis=1)

    rb = jnp.concatenate(
        [rulebook, jnp.full((pad, k), m, jnp.int32)], axis=0
    )
    tiles = rb.reshape(n_tiles, TILE, k).swapaxes(1, 2)  # (n_tiles, K, T)
    grouped = tiles.reshape(n_tiles, g, ksize, TILE)
    found = grouped < m
    anchors = grouped[:, :, r, :]  # (n_tiles, G, TILE)
    anc_found = found[:, :, r, :]
    big = jnp.int32(mp)
    min_idx = jnp.min(
        jnp.where(anc_found, anchors, big), axis=2
    )  # (n_tiles, G)
    has = jnp.any(anc_found, axis=2)
    base8 = (
        jnp.clip(jnp.where(has, min_idx, 0), 0, mp - win) // 8
    ).astype(jnp.int32)
    local = anchors - (base8 * 8)[:, :, None]
    covered = anc_found & (local >= 0) & (local < win)
    viol = found & ~covered[:, :, None, :]

    # missing-anchor groups (a found dz!=0 entry whose dz=0 column is
    # empty — surface slopes produce them at every column end) land in
    # the residual list too, so its cap is much larger than BandPlan's
    rcap = max(m // res_divisor, 256)
    row_viol = jnp.any(viol, axis=(1, 2))  # (n_tiles, TILE)
    count = jnp.sum(row_viol)
    (res_rows,) = jnp.nonzero(
        row_viol.reshape(-1), size=rcap, fill_value=m - 1
    )
    res_valid = jnp.arange(rcap) < count
    res_rows = jnp.where(res_valid, res_rows, m - 1).astype(jnp.int32)
    viol_mk = viol.reshape(n_tiles, k, TILE).swapaxes(1, 2).reshape(mp, k)
    rb_masked = jnp.where(viol_mk, rb, m)
    res_rb = jnp.where(res_valid[:, None], rb_masked[res_rows], m)
    return ZBandPlan(
        rulebook=rulebook,
        anchors=anchors,
        starts=base8.T,
        zoff=zoff,
        ok=count <= rcap,
        valid=valid,
        res_rows=res_rows,
        res_rb=res_rb.astype(jnp.int32),
        res_valid=res_valid,
        wmark=jnp.zeros((win,), jnp.int32),
    )


def _zband_kernel(m, nsplit, ksize, win, starts_ref, anc_ref, *rest):
    """One output tile: G one-hot selects of z-packed group windows."""
    g = ksize * ksize
    zwins = rest[: nsplit * g]
    w_ref, o_ref = rest[nsplit * g], rest[nsplit * g + 1]
    t = pl.program_id(0)

    cout = o_ref.shape[-1]
    e = zwins[0].shape[-1]  # ksize * cin
    acc = jnp.zeros((TILE, cout), jnp.float32)
    iota = jax.lax.broadcasted_iota(jnp.int32, (TILE, win), 1)
    for gi in range(g):
        base = starts_ref[gi, t] * 8
        idx = anc_ref[0, gi, :]  # (T,) dz=0 neighbor rows
        local = jnp.where(idx < m, idx - base, -1)
        oh = (iota == local[:, None]).astype(jnp.bfloat16)
        sel = jnp.zeros((TILE, e), jnp.float32)
        for s in range(nsplit):
            sel += jnp.dot(
                oh, zwins[nsplit * gi + s][...],
                preferred_element_type=jnp.float32,
            )
        w = w_ref[gi]  # (ksize*Cin, Cout)
        acc += jnp.dot(
            sel.astype(w.dtype), w, preferred_element_type=jnp.float32
        )
    o_ref[...] = acc


@partial(jax.jit, static_argnames=("m", "nsplit", "win"))
def _zband_conv_padded(
    anchors: jax.Array,  # (n_tiles, G, TILE)
    starts: jax.Array,  # (G, n_tiles)
    zq_parts: tuple[jax.Array, ...],  # nsplit x (Mp, ksize*Cin) bf16
    w2: jax.Array,  # (G, ksize*Cin, Cout)
    m: int,
    nsplit: int,
    win: int,
) -> jax.Array:
    n_tiles, g, _ = anchors.shape
    mp = n_tiles * TILE
    e = zq_parts[0].shape[-1]
    cout = w2.shape[-1]
    ksize = round((g) ** 0.5)
    # trace-time analytic-FLOP log (utils/flops.py): per (dx, dy) group,
    # one (TILE, win) x (win, ksize*cin) one-hot select per split and a
    # (TILE, ksize*cin) x (ksize*cin, cout) packed-filter matmul
    log_pallas_flops(
        "zband_conv", 2.0 * mp * g * (nsplit * win * e + e * cout)
    )

    in_specs = [pl.BlockSpec((1, g, TILE), lambda t, s: (t, 0, 0))]
    operands = [anchors]
    for gi in range(g):
        for zp in zq_parts:
            in_specs.append(
                pl.BlockSpec(
                    (pl.Element(win), pl.Element(e)),
                    partial(lambda gi, t, s: (s[gi, t] * 8, 0), gi),
                )
            )
            operands.append(zp)
    in_specs.append(pl.BlockSpec((g, e, cout), lambda t, s: (0, 0, 0)))
    operands.append(w2)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((TILE, cout), lambda t, s: (t, 0)),
    )
    return pl.pallas_call(
        partial(_zband_kernel, m, nsplit, ksize, win),
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mp, cout), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("arbitrary",),
        ),
        interpret=jax.default_backend() == "cpu",
    )(starts, *operands)


def _zband_impl(feats, weights, plan: ZBandPlan, valid, nsplit: int):
    m, cin = feats.shape
    k3, _, cout = weights.shape
    ksize = round(k3 ** (1 / 3))
    r = (ksize - 1) // 2
    mp = plan.anchors.shape[0] * TILE
    masked = feats * valid[:, None]

    def shifted(f, s):
        if s > 0:
            return jnp.concatenate(
                [f[s:], jnp.zeros((s, cin), f.dtype)], axis=0
            )
        return jnp.concatenate(
            [jnp.zeros((-s, cin), f.dtype), f[:s]], axis=0
        )

    zq_parts = []
    for p in _split_bf16(masked, nsplit):
        bands = []
        for t, dz in enumerate([*range(-r, 0), *range(1, r + 1)]):
            band = jnp.zeros_like(p)
            step = 1 if dz > 0 else -1
            for s in range(step, dz + step, step):
                band = jnp.where(
                    (plan.zoff[:, t] == s)[:, None], shifted(p, s), band
                )
            bands.append(band)
        zq = jnp.concatenate(bands[:r] + [p] + bands[r:], axis=1)
        pad = jnp.zeros((mp - m, ksize * cin), jnp.bfloat16)
        zq_parts.append(jnp.concatenate([zq, pad], axis=0))

    # (k^3, Cin, Cout) -> (G, ksize*Cin, Cout); kernel_offsets enumerates
    # dz fastest, matching zq's ascending z bands
    g = ksize * ksize
    w2 = weights.reshape(g, ksize * cin, cout)
    out = _zband_conv_padded(
        plan.anchors, plan.starts, tuple(zq_parts), w2, m, nsplit,
        plan.wmark.shape[0],
    )[:m]
    # residual repair: identical fused mini gather-engine pass
    out = out.at[plan.res_rows].add(
        _residual_repair(masked, weights, plan, m), indices_are_sorted=True
    )
    return out * valid[:, None]


def zband_subm_conv_apply(
    feats: jax.Array,  # (M, Cin)
    weights: jax.Array,  # (K, Cin, Cout) — kernel_offsets layout
    plan: ZBandPlan,
    valid: jax.Array,
    compute_dtype=None,
) -> jax.Array:
    """Submanifold conv on the z-packed band engine; same weights layout
    as every other engine (checkpoints stay engine-interchangeable).
    Routes to the exact gather engine when the residual cap overflowed
    or the z-packed windows statically exceed VMEM."""
    dtype = jnp.dtype(compute_dtype or feats.dtype)
    nsplit = 1 if dtype == jnp.bfloat16 else 2
    k, cin, cout = weights.shape
    win = plan.wmark.shape[0]
    if band_vmem_bytes(k, cin, cout, nsplit, win, zpack=True) > 12 * 2**20:
        from .sparse import _subm_conv

        return _subm_conv(dtype, feats, weights, plan.rulebook, valid)
    return _zband_conv_vjp(
        plan.ok, plan.rulebook, plan.anchors, plan.starts, plan.zoff,
        plan.res_rows, plan.res_rb, plan.res_valid, plan.wmark, nsplit,
        feats, weights, valid,
    )


@partial(jax.custom_vjp, nondiff_argnums=(9,))
def _zband_conv_vjp(ok, rulebook, anchors, starts, zoff, res_rows, res_rb,
                    res_valid, wmark, nsplit, feats, weights, valid):
    plan = ZBandPlan(
        rulebook, anchors, starts, zoff, ok, valid,
        res_rows, res_rb, res_valid, wmark,
    )
    from .sparse import _subm_conv_impl

    return jax.lax.cond(
        ok,
        lambda f, w, v: _zband_impl(f, w, plan, v, nsplit),
        lambda f, w, v: _subm_conv_impl(
            jnp.bfloat16 if nsplit == 1 else jnp.float32, f, w, rulebook, v
        ),
        feats, weights, valid,
    )


def _zband_conv_fwd(ok, rulebook, anchors, starts, zoff, res_rows, res_rb,
                    res_valid, wmark, nsplit, feats, weights, valid):
    out = _zband_conv_vjp(
        ok, rulebook, anchors, starts, zoff, res_rows, res_rb, res_valid,
        wmark, nsplit, feats, weights, valid,
    )
    return out, (
        ok, rulebook, anchors, starts, zoff, res_rows, res_rb, res_valid,
        wmark, feats, weights, valid,
    )


def _zband_conv_bwd(nsplit, res, g):
    """Same adjoint structure as :func:`_band_conv_bwd`: d_feats is the
    conv of the output grad with the offset-flipped, channel-transposed
    kernel through the SAME plan (coverage is a property of the rulebook
    entries, not the weights, so the in-window + residual partition is
    identical and the evaluation exact); d_weights recomputes the
    forward gathers via the gather engine's formulation."""
    (ok, rulebook, anchors, starts, zoff, res_rows, res_rb, res_valid,
     wmark, feats, weights, valid) = res
    m, cin = feats.shape
    k = weights.shape[0]
    dtype = jnp.bfloat16 if nsplit == 1 else jnp.float32

    w_bwd = weights[::-1].swapaxes(-1, -2)
    d_feats = _zband_conv_vjp(
        ok, rulebook, anchors, starts, zoff, res_rows, res_rb, res_valid,
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
    return (None, None, None, None, None, None, None, None, None,
            d_feats, d_weights, None)


_zband_conv_vjp.defvjp(_zband_conv_fwd, _zband_conv_bwd)


def choose_band_plan(
    rulebook: jax.Array,
    valid: jax.Array,
    cin: int,
    cout: int,
    dtype,
    window: int = WIN,
):
    """Viable band plan for a level, or the rulebook unchanged (gather
    engine) when the level's widest conv overflows VMEM — skipping the
    plan build entirely in that case.

    The z-packed variant (:func:`build_zband_plan`) is NOT selected by
    default: on real surface clouds ~6% of rulebook entries (40% of
    rows) sit in groups whose dz=0 anchor voxel is missing — surface
    slopes end z-columns constantly — so its residual-repair pass costs
    back what the 3x one-hot reduction saves (measured on the 0.02 m
    bench clouds: residual rows 12.9k of 32.8k)."""
    k = rulebook.shape[1]
    if band_viable(k, cin, cout, dtype, window):
        return build_band_plan(rulebook, valid, window)
    return rulebook
