"""Submanifold sparse 3D convolution engine for TPU.

Replaces spconv (``SubMConv3d`` / ``SparseConv3d`` stride 2 /
``SparseInverseConv3d``) used by the reference TreeLearn U-Net
(``/root/reference/Modules/TreeLearn/blocks.py:44-151``) and PTv3's xCPE
stem. There is no scatter-based GPU rulebook here; the TPU formulation is:

1. **Voxel lookup table**: active voxels (padded to a static M) are placed
   in a bucketed open-addressing hash table. A lookup matches on the probe
   position (hash1, ~log2(T) bits) plus a stored independent 32-bit hash2 —
   a >50-bit probabilistic discriminator (see :func:`lookup`). Pass
   ``verify_coords=True`` (``build_rulebook``/``lookup``) to add an exact
   coordinate-verify gather on every candidate match; this makes lookups
   collision-proof at the cost of one extra (Q, 4) gather and is the mode
   parity tests run under.
2. **Rulebook**: for each voxel and each kernel offset, the index of the
   neighbor voxel (or M, a zero pad row). Built once per level per forward
   and shared by every submanifold conv at that level (the reference's
   ``indice_key`` reuse).
3. **Gather-matmul-accumulate**: ``out = sum_k feats[nbr[:, k]] @ W[k]`` as
   a ``lax.scan`` over kernel offsets — each step is an (M, Cin) x
   (Cin, Cout) MXU matmul; missing neighbors hit the zero pad row.

Strided down-convolution derives the coarse voxel set with the same
sort-unique machinery as :mod:`treemorph_tpu.ops.voxelize` and records the
fine->coarse ``parent`` map plus each fine voxel's child octant, which makes
the inverse (up) convolution a pure gather — no second rulebook.

All shapes are static; ``valid`` masks thread through every step.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import numpy as np
import jax.numpy as jnp

PROBE = 8  # static probe window for hash-collision resolution


def _spatial_hash(coords: jax.Array) -> jax.Array:
    """Mix-hash (b, x, y, z) int32 rows to uint32."""
    c = coords.astype(jnp.uint32)
    h = (
        (c[..., 0] * jnp.uint32(2654435761))
        ^ (c[..., 1] * jnp.uint32(73856093))
        ^ (c[..., 2] * jnp.uint32(19349663))
        ^ (c[..., 3] * jnp.uint32(83492791))
    )
    return h


def _spatial_hash2(coords: jax.Array) -> jax.Array:
    """Independent second hash used as the stored verifier."""
    c = coords.astype(jnp.uint32)
    h = (
        (c[..., 0] * jnp.uint32(40503))
        ^ (c[..., 1] * jnp.uint32(3267000013))
        ^ (c[..., 2] * jnp.uint32(2860486313))
        ^ (c[..., 3] * jnp.uint32(805459861))
    )
    return h


def lex_keys(
    key4: jax.Array, valid: jax.Array
) -> tuple[jax.Array, jax.Array]:
    """(hi, lo) uint32 sort keys realizing lexicographic (b, x, y, z) order.

    EXACT (injective) whenever coords < 2^19 and batch < 2^7 — which every
    realistic voxel grid satisfies (a 10 km plot at 2 cm voxels is 500k <
    2^19 cells per axis); outside that envelope the keys fall back to two
    independent 32-bit hashes (collisions then can only FRAGMENT a dedup
    group, never merge one, because downstream boundary detection compares
    full coordinates; fragmentation additionally needs interleaving under
    the stable sort — ~2^-64 birthday odds).

    Why lexicographic and not hash: the dedup sort's permutation ORDERS
    every voxel/brick/coarse-level array the models build. Hash order made
    every downstream neighbor gather a random HBM walk, and — decisive for
    the pencil conv engine (:mod:`treemorph_tpu.ops.pencil`) — lex order
    with z fastest makes all voxels of one z-pencil adjacent and makes a
    pencil's z±1 sibling pencils its adjacent array ROWS, so the conv's
    cross-pencil boundary terms are shifts instead of gathers.
    """
    c = jnp.where(valid[:, None], key4, 0).astype(jnp.uint32)
    b, x, y, z = c[:, 0], c[:, 1], c[:, 2], c[:, 3]
    # bit layout (64 total): b[7] x[19] y[19] z[19]
    hi = (b << 25) | (x << 6) | (y >> 13)
    lo = (y << 19) | z

    mx = jnp.max(c, axis=0)
    big = jnp.uint32(1 << 19)
    ok = (mx[0] < 128) & (mx[1] < big) & (mx[2] < big) & (mx[3] < big)
    hi = jnp.where(ok, hi, _spatial_hash(key4))
    lo = jnp.where(ok, lo, _spatial_hash2(key4))
    sentinel = jnp.uint32(0xFFFFFFFF)
    return jnp.where(valid, hi, sentinel), jnp.where(valid, lo, sentinel)


def dedup_sort_perm(key4: jax.Array, valid: jax.Array) -> jax.Array:
    """Permutation bringing equal (b, x, y, z) rows adjacent, padding last,
    in lexicographic (b, x, y, z) order — see :func:`lex_keys` for both the
    exactness guarantee and the locality rationale."""
    hi, lo = lex_keys(key4, valid)
    return jnp.lexsort((lo, hi))


class SortedRuns(NamedTuple):
    """Sorted-domain view of a dedup: equal (b, x, y, z) rows adjacent in
    lexicographic order, padding last, plus everything downstream needs
    WITHOUT further 1M-row gathers."""

    s_valid: jax.Array  # (N,) bool — validity per sorted row
    s_orig: jax.Array  # (N,) int32 — original row of each sorted row
    new: jax.Array  # (N,) bool — run-boundary flags (invalid rows: True)
    s_id: jax.Array  # (N,) int32 — run index per sorted row
    num: jax.Array  # () int32 — number of valid runs


def sorted_runs(key4: jax.Array, valid: jax.Array) -> SortedRuns:
    """ONE 2-key sort of the packed lex keys with a flagged-iota payload.

    The sorted keys provide run boundaries and validity directly and the
    payload provides original indices, so callers avoid post-sort row
    gathers entirely (each 1M-row random-access pass costs 5-9 ms on a
    v5e; the 3-operand sort itself is ~2.3 ms). The sort is stable, so a
    run's first sorted row carries its smallest original index.

    Exactness matches :func:`dedup_sort_perm`: on the fast key path
    (coords < 2^19, batch < 128) comparing keys IS comparing coordinates;
    on the hash fallback a double collision can merge two groups
    (~2^-64 per adjacent pair)."""
    n = key4.shape[0]
    hi, lo = lex_keys(key4, valid)
    iota = jnp.arange(n, dtype=jnp.int32)
    payload = jnp.where(valid, iota, iota | jnp.int32(-(2**31)))
    s_hi, s_lo, s_pay = jax.lax.sort((hi, lo, payload), num_keys=2)
    s_valid = s_pay >= 0
    s_orig = (
        jax.lax.bitcast_convert_type(s_pay, jnp.uint32)
        & jnp.uint32(0x7FFFFFFF)
    ).astype(jnp.int32)
    new = (s_hi[1:] != s_hi[:-1]) | (s_lo[1:] != s_lo[:-1])
    new = jnp.concatenate([jnp.array([True]), new])
    # every invalid row is its own run so ids stay monotone
    new = jnp.where(s_valid, new, True)
    s_id = jnp.cumsum(new.astype(jnp.int32)) - 1
    num = jnp.where(s_valid, s_id + 1, 0).max().astype(jnp.int32)
    return SortedRuns(
        s_valid=s_valid, s_orig=s_orig, new=new, s_id=s_id, num=num
    )


def first_rows_of_runs(r: SortedRuns, cap: int) -> jax.Array:
    """(cap,) original row index of each run's first element (run r of
    the sort IS dedup group r). One scatter-set at unique ascending
    indices — the fast scatter shape on TPU."""
    idx = jnp.where(
        r.s_valid & r.new, jnp.minimum(r.s_id, cap), cap
    )
    return jnp.zeros(cap + 1, jnp.int32).at[idx].set(r.s_orig)[:cap]


def run_starts(new: jax.Array, cap: int) -> jax.Array:
    """Start indices of the first ``cap`` runs of a sorted boundary mask.

    ``new[i]`` marks row i as the first of its run; run r's start is the
    r-th True. Rows are compacted with a static-size ``nonzero``; missing
    runs fill with ``len(new)`` (callers gather through a sentinel row).

    Why this exists: every dedup in this module leaves equal keys as
    contiguous runs of a SORTED array, so per-group reductions of values
    constant within a run (coords, batch, first-row picks) are a single
    cap-row gather at the run starts. The scatter-reduce alternative
    (``jax.ops.segment_max``/``min``) costs 10-16 ms per call at 1M rows
    on a v5e chip — it was the dominant cost of voxelize/downsample."""
    (starts,) = jnp.nonzero(new, size=cap, fill_value=new.shape[0])
    return starts.astype(jnp.int32)


SLOTS_PER_BUCKET = 16  # one 128-byte row per bucket


class VoxelTable(NamedTuple):
    """Bucketed hash table over a padded voxel set.

    TPU random gathers are latency-bound per ROW, so the whole bucket is
    one (32 x int32 = 128 B) row: ``rows[b, l]`` holds the stored voxel
    index of lane ``l`` (or -1) and ``rows[b, 16 + l]`` its hash2. A
    lookup is ONE row-gather + vectorized lane matching — the previous
    linear-probing layout needed two dependent row-gathers per query and
    an unrolled 6-probe scan, and the per-level ``build_rulebook`` lookups
    dominated the PTv3 forward (~2.8 ms per offset per 131k voxels).

    At load factor <= 1/8 a bucket holds Poisson(2) voxels; overflow
    beyond 16 (P ~ 1e-12 per bucket) is dropped, identically to the old
    probing build's drop policy.
    """

    coords: jax.Array  # (M, 4) int32 (b, x, y, z)
    valid: jax.Array  # (M,) bool
    rows: jax.Array  # (NB, 2*SLOTS_PER_BUCKET) int32
    mask: int  # NB - 1 (static)


def build_table(coords: jax.Array, valid: jax.Array) -> VoxelTable:
    """Sort-based parallel insertion.

    Voxels argsort by bucket id; each voxel's lane is its rank within its
    bucket (position minus a cummax of bucket-start positions), then one
    scatter writes every (index, hash2) pair. One 32-bit sort replaces
    the previous 6 rounds of million-slot scatter-min claims.
    """
    m = coords.shape[0]
    t = 1 << max(8 * m - 1, 127).bit_length()  # slots >= 8M, load <= 1/8
    nb = t // SLOTS_PER_BUCKET
    mask = nb - 1

    h = _spatial_hash(coords)
    bucket = (h & jnp.uint32(mask)).astype(jnp.int32)

    sort_key = jnp.where(valid, bucket.astype(jnp.uint32),
                         jnp.uint32(0xFFFFFFFF))
    perm = jnp.argsort(sort_key)
    sb = bucket[perm]
    sv = valid[perm]
    arange = jnp.arange(m, dtype=jnp.int32)
    is_first = jnp.concatenate(
        [jnp.array([True]), sb[1:] != sb[:-1]]
    )
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_first, arange, 0)
    )
    lane = arange - seg_start
    ok = sv & (lane < SLOTS_PER_BUCKET)

    width = 2 * SLOTS_PER_BUCKET
    dump = nb * width
    idx_pos = jnp.where(ok, sb * width + lane, dump)
    hash_pos = jnp.where(ok, sb * width + SLOTS_PER_BUCKET + lane, dump)
    hash2 = _spatial_hash2(coords).astype(jnp.int32)

    lane_iota = jnp.arange(nb * width, dtype=jnp.int32) % width
    flat = jnp.where(lane_iota < SLOTS_PER_BUCKET, -1, 0)
    flat = jnp.concatenate([flat, jnp.zeros(1, jnp.int32)])  # dump slot
    flat = flat.at[idx_pos].set(perm.astype(jnp.int32))
    flat = flat.at[hash_pos].set(hash2[perm])
    rows = flat[: nb * width].reshape(nb, width)
    return VoxelTable(coords=coords, valid=valid, rows=rows, mask=mask)


def searchsorted_unrolled(
    sorted_keys: jax.Array, queries: jax.Array
) -> jax.Array:
    """Vectorized lower-bound binary search with a static, unrolled trip
    count — ``jnp.searchsorted``'s scan-based search is ~40x slower on TPU.

    Returns, per query, the number of keys strictly less than it
    (= ``searchsorted(..., side='left')``). Works for any ordered dtype.
    """
    m = sorted_keys.shape[0]
    bits = max(m - 1, 1).bit_length()
    count = jnp.zeros(queries.shape, jnp.int32)
    for shift in range(bits - 1, -1, -1):
        candidate = count + (1 << shift)
        key = sorted_keys[jnp.clip(candidate - 1, 0, m - 1)]
        ok = (candidate <= m) & (key < queries)
        count = jnp.where(ok, candidate, count)
    return count


def lookup(
    table: VoxelTable, query_coords: jax.Array, verify_coords: bool = False
) -> jax.Array:
    """Index of each query coordinate in the table, or -1.

    query_coords: (..., 4) int32. Returns (...,) int32.

    A match requires hash1 agreement (bucket id, ~log2(NB) bits) AND
    stored-hash2 equality (32 bits) — a ~48-bit probabilistic
    discriminator (false-match probability per forward pass is ~1e-7 even
    at 27M queries). With ``verify_coords=True`` each candidate match is
    additionally checked against the stored (b, x, y, z) via one extra
    (Q, 4) gather, making the result exact; parity tests run this mode and
    ``test_sparse.py`` hunts engineered hash1+hash2 double collisions to
    bound the probabilistic mode's risk.
    """
    shape = query_coords.shape[:-1]
    q = query_coords.reshape(-1, 4)
    qh = _spatial_hash(q)
    qh2 = _spatial_hash2(q).astype(jnp.int32)
    bucket = (qh & jnp.uint32(table.mask)).astype(jnp.int32)

    data = table.rows[bucket]  # (Q, 32) — ONE 128-byte row gather
    idx_lanes = data[:, :SLOTS_PER_BUCKET]  # stored indices (or -1)
    hash_lanes = data[:, SLOTS_PER_BUCKET:]  # stored hash2
    match = (idx_lanes >= 0) & (hash_lanes == qh2[:, None])

    if verify_coords:
        # verify EVERY matching lane, not just a chosen one: two stored
        # voxels sharing a bucket AND hash2 would otherwise make the
        # wrong lane win the max and the single verify reject a query
        # that IS in the table (a false negative breaking the exactness
        # guarantee and the rulebook antisymmetry the conv VJP uses)
        safe = jnp.clip(idx_lanes, 0, table.coords.shape[0] - 1)
        stored = table.coords[safe]  # (Q, 16, 4)
        match = match & jnp.all(stored == q[:, None, :], axis=-1)
    found = jnp.max(jnp.where(match, idx_lanes, -1), axis=1)

    # Negative coordinates are never in the table (grid coords are >= 0),
    # and XOR-multiply hashes collide SYSTEMATICALLY under paired sign
    # flips (-a*B ^ -c*C == a*B ^ c*C for odd B, C) — mask them out.
    non_negative = jnp.all(q >= 0, axis=-1)
    return jnp.where(non_negative, found, -1).reshape(shape)


RUN_SLOTS = 5  # octant slots per RunTable bucket (3 lanes each, W=16)


class RunTable(NamedTuple):
    """Octant-run hash table over a LEX-SORTED, duplicate-free voxel set.

    The bucket-row :class:`VoxelTable` answers one voxel per 128 B row
    gather, so a k^3 rulebook costs (k^3 - 1) * M latency-bound row
    fetches — the dominant cost of ``build_rulebook`` on both backbones.
    This table exploits the same lex-sort invariant as the band conv
    engine: voxels of one z-octant-column ``(b, x, y, z >> 3)`` are
    CONSECUTIVE rows with ascending z, so one stored (first_row, zmask)
    pair answers ALL EIGHT z's of the octant — the index of z-bit j is
    ``first_row + popcount(zmask & ((1 << j) - 1))``. A k^3 rulebook
    then needs only 2 row gathers per (dx, dy) offset column per voxel
    (the dz span crosses at most one octant boundary): k=5 does 50
    64-byte fetches per voxel instead of 124 128-byte ones.

    Row layout (W = 16 int32 lanes, 64 B): RUN_SLOTS slots of
    ``[hash2 tag, first_row, zmask]``; ``first_row == -1`` marks an
    empty slot. Bucket count is ~4x the voxel count (an upper bound on
    the octant count), so slot overflow odds are Poisson(<=0.25) beyond
    5 — ~1e-8 per bucket, strictly better than the VoxelTable's drop
    policy. Matching is the same ~(32 + log2 NB)-bit probabilistic
    discriminator as :func:`lookup`; ``verify_coords`` gathers each
    matching slot's first-row coordinates and confirms the octant key,
    making the result exact (the in-octant bit/popcount arithmetic is
    structural, not hashed)."""

    coords: jax.Array  # (M, 4) int32 (b, x, y, z), lex-sorted, unique
    valid: jax.Array  # (M,) bool (True rows form a prefix)
    rows: jax.Array  # (NB, 16) int32
    mask: int  # NB - 1 (static)


def build_run_table(coords: jax.Array, valid: jax.Array) -> RunTable:
    """Build the octant-run table (see :class:`RunTable`).

    Requires ``coords`` lex-sorted by (b, x, y, z), duplicate-free over
    valid rows, with invalid rows at the end — the invariant every
    dedup'd / pooled voxel level already satisfies
    (:func:`dedup_sort_perm`)."""
    m = coords.shape[0]
    nb = 1 << max(4 * m - 1, 127).bit_length()
    mask = nb - 1

    okey = jnp.concatenate(
        [coords[:, :3], coords[:, 3:4] >> 3], axis=1
    )  # (M, 4) octant key per voxel
    neq = jnp.any(okey[1:] != okey[:-1], axis=1)
    is_first = valid & jnp.concatenate([jnp.array([True]), neq])
    oct_id = jnp.cumsum(is_first.astype(jnp.int32)) - 1  # rank per row
    n_oct = jnp.sum(is_first)

    # per-octant zmask: z's are distinct within an octant (unique coords)
    # so OR == SUM of the per-row bits
    bits = jnp.where(valid, 1 << (coords[:, 3] & 7), 0).astype(jnp.int32)
    dump = jnp.where(valid, oct_id, m)
    zmask = jnp.zeros(m + 1, jnp.int32).at[dump].add(bits)[:m]
    firsts = jnp.zeros(m + 1, jnp.int32).at[
        jnp.where(is_first, oct_id, m)
    ].set(jnp.arange(m, dtype=jnp.int32))[:m]

    # bucket insertion over octants (rank-indexed arrays of size M)
    oct_valid = jnp.arange(m) < n_oct
    okeys = okey[firsts]  # (M, 4); garbage rows masked by oct_valid
    h1 = _spatial_hash(okeys)
    h2 = _spatial_hash2(okeys).astype(jnp.int32)
    bucket = (h1 & jnp.uint32(mask)).astype(jnp.int32)

    sort_key = jnp.where(oct_valid, bucket.astype(jnp.uint32),
                         jnp.uint32(0xFFFFFFFF))
    perm = jnp.argsort(sort_key)
    sb = bucket[perm]
    sv = oct_valid[perm]
    arange = jnp.arange(m, dtype=jnp.int32)
    is_start = jnp.concatenate([jnp.array([True]), sb[1:] != sb[:-1]])
    seg_start = jax.lax.associative_scan(
        jnp.maximum, jnp.where(is_start, arange, 0)
    )
    slot = arange - seg_start
    ok = sv & (slot < RUN_SLOTS)

    width = 16
    dump_pos = nb * width
    base = sb * width + slot * 3
    tag_pos = jnp.where(ok, base, dump_pos)
    f_pos = jnp.where(ok, base + 1, dump_pos)
    z_pos = jnp.where(ok, base + 2, dump_pos)

    lane_iota = jnp.arange(nb * width, dtype=jnp.int32) % width
    # empty slots are marked by first_row == -1 (lanes 1, 4, 7, 10, 13)
    flat = jnp.where((lane_iota % 3 == 1) & (lane_iota < 15), -1, 0)
    flat = jnp.concatenate([flat, jnp.zeros(1, jnp.int32)])  # dump slot
    flat = flat.at[tag_pos].set(h2[perm])
    flat = flat.at[f_pos].set(firsts[perm])
    flat = flat.at[z_pos].set(zmask[perm])
    rows = flat[: nb * width].reshape(nb, width)
    return RunTable(coords=coords, valid=valid, rows=rows, mask=mask)


def _popcount8(v: jax.Array) -> jax.Array:
    """Population count of int32 values known to be < 256 (zmask bits)."""
    v = v - ((v >> 1) & 0x55)
    v = (v & 0x33) + ((v >> 2) & 0x33)
    return (v + (v >> 4)) & 0x0F


def _run_rows(table: RunTable, okeys: jax.Array):
    """Gather bucket rows + query hash2 for octant keys (..., 4)."""
    h1 = _spatial_hash(okeys)
    qh2 = _spatial_hash2(okeys).astype(jnp.int32)
    bucket = (h1 & jnp.uint32(table.mask)).astype(jnp.int32)
    return table.rows[bucket], qh2  # (..., 16), (...)


def _run_extract(
    table: RunTable, rows: jax.Array, qh2: jax.Array, zq: jax.Array,
    okeys: jax.Array | None = None,
) -> jax.Array:
    """Voxel index of z == ``zq`` inside the octant whose bucket row and
    query-hash are given, or -1. Sum formulation: at most one slot
    matches (hash2 double collisions are the same ~1e-7/forward risk
    class as :func:`lookup`'s probabilistic mode; with ``okeys`` given,
    every matching slot's stored octant is verified exactly)."""
    j = zq & 7
    low = (1 << j) - 1
    found = jnp.zeros(qh2.shape, jnp.int32)
    for s in range(RUN_SLOTS):
        tag = rows[..., 3 * s]
        f = rows[..., 3 * s + 1]
        zm = rows[..., 3 * s + 2]
        match = (f >= 0) & (tag == qh2)
        if okeys is not None:
            stored = table.coords[jnp.clip(f, 0, table.coords.shape[0] - 1)]
            stored_ok = jnp.concatenate(
                [stored[..., :3], stored[..., 3:4] >> 3], axis=-1
            )
            match = match & jnp.all(stored_ok == okeys, axis=-1)
        present = ((zm >> j) & 1) == 1
        idx = f + _popcount8(zm & low)
        found = found + jnp.where(match & present, idx + 1, 0)
    return found - 1


def build_rulebook_runs(
    coords: jax.Array,
    valid: jax.Array,
    kernel_size: int = 3,
    verify_coords: bool = False,
    table: RunTable | None = None,
) -> jax.Array:
    """(M, K) rulebook via the octant-run table — output identical to
    :func:`build_rulebook` on lex-sorted duplicate-free voxel sets, at
    ~2.5x fewer row gathers for k=5 (2 per (dx, dy) column instead of
    k lookups; the dz span of one column crosses at most one octant
    boundary, so the low and high octant rows cover every dz)."""
    m = coords.shape[0]
    assert kernel_size % 2 == 1, "submanifold rulebooks need odd kernels"
    if table is None:
        table = build_run_table(coords, valid)
    r = (kernel_size - 1) // 2
    k = kernel_size**3
    arange_m = jnp.arange(m, dtype=jnp.int32)

    b = coords[:, 0]
    z = coords[:, 3]
    oct_lo = (z - r) >> 3
    oct_hi = (z + r) >> 3
    columns = []
    for dx in range(-r, r + 1):
        for dy in range(-r, r + 1):
            xy = coords[:, 1:3] + jnp.array([[dx, dy]], jnp.int32)
            ok_lo = jnp.stack([b, xy[:, 0], xy[:, 1], oct_lo], axis=1)
            ok_hi = jnp.stack([b, xy[:, 0], xy[:, 1], oct_hi], axis=1)
            rows_lo, qh2_lo = _run_rows(table, ok_lo)
            rows_hi, qh2_hi = _run_rows(table, ok_hi)
            xy_ok = valid & jnp.all(xy >= 0, axis=1)
            for dz in range(-r, r + 1):
                if dx == 0 and dy == 0 and dz == 0:
                    columns.append(jnp.where(valid, arange_m, m))
                    continue
                zq = z + dz
                use_lo = (zq >> 3) == oct_lo
                rows = jnp.where(use_lo[:, None], rows_lo, rows_hi)
                qh2 = jnp.where(use_lo, qh2_lo, qh2_hi)
                okq = None
                if verify_coords:
                    okq = jnp.where(
                        use_lo[:, None], ok_lo, ok_hi
                    )
                idx = _run_extract(table, rows, qh2, zq, okeys=okq)
                good = xy_ok & (zq >= 0) & (idx >= 0)
                columns.append(jnp.where(good, idx, m).astype(jnp.int32))
    return jnp.stack(columns, axis=1)  # (M, K)


def kernel_offsets(kernel_size: int = 3) -> jnp.ndarray:
    """(K, 3) integer offsets of a cubic kernel, centered for odd sizes."""
    r = range(kernel_size)
    shift = (kernel_size - 1) // 2
    offs = [
        (dx - shift, dy - shift, dz - shift)
        for dx in r
        for dy in r
        for dz in r
    ]
    return jnp.array(offs, jnp.int32)


@partial(jax.jit, static_argnames=("kernel_size", "verify_coords"))
def build_rulebook(
    coords: jax.Array,
    valid: jax.Array,
    kernel_size: int = 3,
    verify_coords: bool = False,
    table: VoxelTable | None = None,
) -> jax.Array:
    """(M, K) neighbor indices for a submanifold conv; M marks 'missing'.

    Shared by all convs at one resolution level (the reference's
    ``indice_key`` mechanism, TreeLearn/blocks.py:59-72).

    All K-1 non-center offsets are looked up directly; the center column
    is the identity. (An earlier variant looked up only half and filled
    the mirrored columns with one scatter each, exploiting
    ``offs[k] == -offs[K-1-k]`` — but on TPU those scatters cost ~1.5x a
    bucket-row lookup, 28 ms of the embedding rulebook alone at 131k
    voxels. The antisymmetry ``rulebook[j,k]==i <=> rulebook[i,K-1-k]==j``
    still holds exactly — direct lookups produce the identical table —
    which the conv VJP relies on.)
    """
    m = coords.shape[0]
    # kernel_offsets is centered only for odd sizes; the identity-center
    # substitution below (and the VJP's offs[k] == -offs[K-1-k] mirror)
    # would silently produce a wrong rulebook for even kernels
    assert kernel_size % 2 == 1, "submanifold rulebooks need odd kernels"
    if isinstance(table, RunTable):
        return build_rulebook_runs(
            coords, valid, kernel_size, verify_coords, table
        )
    if table is None:
        table = build_table(coords, valid)
    offs = kernel_offsets(kernel_size)  # (K, 3)
    k = offs.shape[0]
    half = k // 2
    arange_m = jnp.arange(m, dtype=jnp.int32)

    noncenter = jnp.concatenate([offs[:half], offs[half + 1 :]])
    q = jnp.broadcast_to(
        coords[None, :, :], (k - 1, m, 4)
    ).at[:, :, 1:].add(noncenter[:, None, :])
    idx = lookup(table, q, verify_coords=verify_coords)  # (K-1, M)
    idx = jnp.where(valid[None, :] & (idx >= 0), idx, m)

    center = jnp.where(valid, arange_m, m)[None]  # identity column
    columns = jnp.concatenate([idx[:half], center, idx[half:]])
    return columns.T.astype(jnp.int32)  # (M, K)


def subm_conv_apply(
    feats: jax.Array,  # (M, Cin)
    weights: jax.Array,  # (K, Cin, Cout)
    rulebook: jax.Array,  # (M, K) with M = missing
    valid: jax.Array,  # (M,)
    compute_dtype=None,
    needs_feats_grad: bool = True,
) -> jax.Array:
    """Submanifold conv: out[i] = sum_k W[k] @ feats[nbr_k(i)].

    Unrolled over kernel offsets: K gather+matmul pairs that XLA schedules
    back-to-back in one program (a lax.scan here serializes ~K steps per
    conv with loop bookkeeping and was ~20x slower end-to-end on TPU).
    Peak extra memory stays at one (M, Cin) gather.

    ``compute_dtype=jnp.bfloat16`` halves gather bytes and runs the
    matmuls at the MXU's native rate (measured 4.8x at 262k voxels, C=32);
    accumulation stays float32.

    The backward pass is a custom VJP built on the rulebook's offset
    antisymmetry (``rulebook[j, k] == i  <=>  rulebook[i, K-1-k] == j``):
    the gradient w.r.t. ``feats`` is K *gathers* through the mirrored
    columns instead of the K serialized scatter-adds XLA would emit for a
    gather transpose — scatters are the dominant train-step cost on TPU.

    ``rulebook`` may also be a :class:`ZPlan` (built by
    :func:`build_zplan`), selecting the z-pack formulation — same weights
    layout, ~3x fewer random HBM rows per conv.
    """
    dtype = jnp.dtype(compute_dtype or feats.dtype)
    if isinstance(rulebook, ZPlan):
        return subm_conv_zpack_apply(
            feats, weights, rulebook, valid, compute_dtype=dtype
        )
    from .bandconv import (
        BandPlan,
        ZBandPlan,
        band_subm_conv_apply,
        zband_subm_conv_apply,
    )

    if isinstance(rulebook, ZBandPlan):
        return zband_subm_conv_apply(
            feats, weights, rulebook, valid, compute_dtype=dtype
        )
    if isinstance(rulebook, BandPlan):
        return band_subm_conv_apply(
            feats, weights, rulebook, valid, compute_dtype=dtype,
            needs_feats_grad=needs_feats_grad,
        )
    return _subm_conv(dtype, feats, weights, rulebook, valid)


def _subm_conv_impl(dtype, feats, weights, rulebook, valid):
    m, cin = feats.shape
    k = weights.shape[0]
    cout = weights.shape[-1]
    feats_pad = jnp.concatenate(
        [
            (feats * valid[:, None]).astype(dtype),
            jnp.zeros((1, cin), dtype),
        ],
        axis=0,
    )
    w = weights.astype(dtype)
    out = jnp.zeros((m, cout), jnp.float32)
    for j in range(k):
        gathered = feats_pad[rulebook[:, j]]  # (M, Cin)
        out = out + jnp.dot(
            gathered, w[j], preferred_element_type=jnp.float32
        )
    return out * valid[:, None]


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _subm_conv(dtype, feats, weights, rulebook, valid):
    return _subm_conv_impl(dtype, feats, weights, rulebook, valid)


def _subm_conv_fwd(dtype, feats, weights, rulebook, valid):
    out = _subm_conv_impl(dtype, feats, weights, rulebook, valid)
    return out, (feats, weights, rulebook, valid)


def _subm_conv_bwd(dtype, res, g):
    feats, weights, rulebook, valid = res
    m, cin = feats.shape
    k = weights.shape[0]
    cout = weights.shape[-1]
    w = weights.astype(dtype)
    g_masked = (g * valid[:, None]).astype(dtype)  # (M, Cout)
    g_pad = jnp.concatenate(
        [g_masked, jnp.zeros((1, cout), dtype)], axis=0
    )
    feats_pad = jnp.concatenate(
        [
            (feats * valid[:, None]).astype(dtype),
            jnp.zeros((1, cin), dtype),
        ],
        axis=0,
    )
    d_feats = jnp.zeros((m, cin), jnp.float32)
    d_w = []
    for j in range(k):
        # d feats: gather the output grads through the MIRRORED column —
        # out[t] took feats[i] through offset j exactly when
        # rulebook[i, K-1-j] == t (rulebook antisymmetry), so this gather
        # is the exact transpose of the forward gather, with no scatter.
        rev = g_pad[rulebook[:, k - 1 - j]]  # (M, Cout)
        d_feats = d_feats + jnp.dot(
            rev, w[j].T, preferred_element_type=jnp.float32
        )
        # d weights: recompute the forward gather (cheaper than saving K
        # gathered activations) and contract over voxels.
        gathered = feats_pad[rulebook[:, j]]  # (M, Cin)
        d_w.append(
            jnp.dot(gathered.T, g_masked,
                    preferred_element_type=jnp.float32)
        )
    d_feats = (d_feats * valid[:, None]).astype(feats.dtype)
    d_weights = jnp.stack(d_w).astype(weights.dtype)
    return d_feats, d_weights, None, None


_subm_conv.defvjp(_subm_conv_fwd, _subm_conv_bwd)


class DedupMap(NamedTuple):
    """Point rows -> unique-voxel rows (stride-1 dedup).

    PTv3 tokens are POINTS, not voxels (reference ``Point.sparsify``,
    blocks.py:155-191, never dedups), so at 0.02 m voxels a dense TLS
    cloud carries several points per cell. spconv's submanifold conv
    gathers the hash-table winner row for every offset — duplicate rows
    therefore receive IDENTICAL conv outputs. This map lets the conv run
    once per unique voxel and broadcast: exact spconv semantics modulo
    which duplicate's features represent the cell (spconv: hash-insert
    winner, nondeterministic on GPU; here: lexicographically first row —
    deterministic).
    """

    rows: jax.Array  # (cap,) int32 representative point row per voxel
    coords: jax.Array  # (cap, 4) int32 unique (b, x, y, z), lex-sorted
    valid: jax.Array  # (cap,) bool
    v2u: jax.Array  # (P,) int32 unique id; cap = overflow/invalid dump
    num_unique: jax.Array  # () int32
    overflow: jax.Array  # () int32 points whose voxel exceeded cap


@partial(jax.jit, static_argnames=("cap",))
def build_dedup(
    coords: jax.Array, valid: jax.Array, cap: int | None = None
) -> DedupMap:
    """Group equal (b, x, y, z) rows; same machinery as
    :func:`build_downsample` at stride 1. Unique voxels come out
    lex-sorted; voxels beyond ``cap`` dump to row ``cap`` (counted)."""
    m = coords.shape[0]
    if cap is None:
        cap = m
    r = sorted_runs(coords, valid)
    num_unique = r.num

    v2u_full = jnp.zeros(m, jnp.int32).at[r.s_orig].set(r.s_id)
    v2u = jnp.where(valid, jnp.minimum(v2u_full, cap), cap)
    overflow = jnp.sum(valid & (v2u_full >= cap)).astype(jnp.int32)

    # valid runs sort first, so unique row r is valid iff r < num_unique
    u_valid = jnp.arange(cap) < num_unique
    rows = jnp.where(u_valid, first_rows_of_runs(r, cap), 0)
    u_coords = jnp.where(u_valid[:, None], coords[rows], 0).astype(
        jnp.int32
    )
    return DedupMap(
        rows=rows,
        coords=u_coords,
        valid=u_valid,
        v2u=v2u,
        num_unique=jnp.minimum(num_unique, cap),
        overflow=overflow,
    )


class DownsampleMap(NamedTuple):
    """Fine -> coarse (stride 2) structure."""

    coarse_coords: jax.Array  # (M, 4) int32, padded
    coarse_valid: jax.Array  # (M,) bool
    num_coarse: jax.Array  # () int32
    parent: jax.Array  # (M,) int32: fine voxel -> coarse index
    child_offset: jax.Array  # (M,) int32 in [0, 8): fine voxel's octant


@partial(jax.jit, static_argnames=("cap",))
def build_downsample(
    coords: jax.Array, valid: jax.Array, cap: int | None = None
) -> DownsampleMap:
    """Stride-2 coarsening of a voxel set (reference's SparseConv3d k=2 s=2
    downsample path, TreeLearn/blocks.py:101-112).

    ``cap`` bounds the static size of the coarse level (level compaction:
    real clouds coarsen >= 2x per stride-2 level, so carrying the full
    fine-level padding through every level wastes the dominant
    rulebook/gather cost). Coarse voxels beyond ``cap`` — possible only on
    adversarial inputs that barely coarsen — are dropped and masked
    (``parent == cap`` marks dropped children).
    """
    m = coords.shape[0]
    if cap is None:
        cap = m
    b = coords[:, 0]
    fine = coords[:, 1:]
    coarse = fine >> 1  # floor div 2 (coords are non-negative)
    octant = ((fine[:, 0] & 1) << 2) | ((fine[:, 1] & 1) << 1) | (
        fine[:, 2] & 1
    )

    # dedup sort of the coarse keys (see sorted_runs for the design)
    key4 = jnp.concatenate([b[:, None], coarse], axis=1)
    r = sorted_runs(key4, valid)
    num_coarse = r.num

    parent_full = jnp.zeros(m, jnp.int32).at[r.s_orig].set(r.s_id)
    parent = jnp.minimum(parent_full, cap)  # cap = dump row for overflow
    # run r of the sort IS coarse voxel r; gather one fine row per run
    # and re-halve its coords (cap-sized math, no 1M-row gathers)
    rows = first_rows_of_runs(r, cap)
    coarse_valid = jnp.arange(cap) < num_coarse
    rc = coords[rows]
    coarse_coords = jnp.where(
        coarse_valid[:, None],
        jnp.concatenate([rc[:, :1], rc[:, 1:] >> 1], axis=1),
        -1,
    ).astype(jnp.int32)
    return DownsampleMap(
        coarse_coords=coarse_coords,
        coarse_valid=coarse_valid,
        num_coarse=jnp.minimum(num_coarse, cap),
        parent=parent,
        child_offset=octant.astype(jnp.int32),
    )


def down_conv_apply(
    feats: jax.Array,  # (M, Cin) fine features
    weights: jax.Array,  # (8, Cin, Cout) one filter per octant
    ds: DownsampleMap,
    valid: jax.Array,  # (M,) fine validity
    compute_dtype=None,
) -> jax.Array:
    """Strided (k=2, s=2) conv: coarse[j] = sum_{i: parent(i)=j} W[oct(i)] @ fine[i].

    Implemented as 8 masked (M, Cin) x (Cin, Cout) matmuls — gathering a
    per-point (Cin, Cout) weight matrix would materialize an (M, Cin, Cout)
    tensor (tens of GB at 1M voxels).
    """
    m, cin = feats.shape
    cap = ds.coarse_coords.shape[0]
    cout = weights.shape[-1]
    dtype = compute_dtype or feats.dtype
    masked = (feats * valid[:, None]).astype(dtype)
    w = weights.astype(dtype)
    contrib = jnp.zeros((m, cout), jnp.float32)
    for k in range(8):
        sel = (ds.child_offset == k).astype(dtype)[:, None]
        contrib = contrib + jnp.dot(
            masked * sel, w[k], preferred_element_type=jnp.float32
        )
    out = jax.ops.segment_sum(contrib, ds.parent, num_segments=cap + 1)[:cap]
    return out * ds.coarse_valid[:, None]


def inverse_conv_apply(
    coarse_feats: jax.Array,  # (M, Cin)
    weights: jax.Array,  # (8, Cin, Cout)
    ds: DownsampleMap,
    fine_valid: jax.Array,  # (M,)
    compute_dtype=None,
) -> jax.Array:
    """Inverse of the stride-2 conv (reference SparseInverseConv3d): each
    fine voxel reads its parent's features through its octant filter.

    Same masked-matmul formulation as :func:`down_conv_apply` to avoid an
    (M, Cin, Cout) gathered-weights tensor.
    """
    m = ds.parent.shape[0]
    cap = ds.coarse_coords.shape[0]
    cout = weights.shape[-1]
    dtype = compute_dtype or coarse_feats.dtype
    parent_ok = ds.parent < cap
    gathered = coarse_feats.astype(dtype)[jnp.clip(ds.parent, 0, cap - 1)]
    gathered = gathered * parent_ok[:, None].astype(dtype)
    w = weights.astype(dtype)
    out = jnp.zeros((m, cout), jnp.float32)
    for k in range(8):
        sel = (ds.child_offset == k).astype(dtype)[:, None]
        out = out + jnp.dot(
            gathered * sel, w[k], preferred_element_type=jnp.float32
        )
    return out * fine_valid[:, None]


# ---------------------------------------------------------------------------
# z-pack submanifold conv: the lex-order formulation
# ---------------------------------------------------------------------------


def plane_offsets(kernel_size: int = 3) -> jnp.ndarray:
    """(K^2, 2) centered (dx, dy) offsets, enumerated so that
    ``plane_offsets(k)[o] == -plane_offsets(k)[k*k - 1 - o]`` (the mirror
    symmetry behind the z-pack conv's flipped-kernel backward) and the
    center sits at ``K^2 // 2``."""
    r = range(kernel_size)
    shift = (kernel_size - 1) // 2
    return jnp.array(
        [(dx - shift, dy - shift) for dx in r for dy in r], jnp.int32
    )


class ZPlan(NamedTuple):
    """Per-level structure for the z-pack conv engine.

    Exploits the lex (b, x, y, z) sort invariant every voxel level
    satisfies (:func:`dedup_sort_perm`): all voxels of one (b, x, y)
    column are CONTIGUOUS rows in z order, so every z-neighbor within
    reach 2r of row j sits at row j+s with abs(s) <= 2r, found by pure
    shifted-coordinate comparison — no hash lookup. A k^3 submanifold
    conv then collapses to K^2 = k^2 gathers of z-packed rows:

    - a band matrix q (M, (4r+1)C) is built from shifted SLICES of the
      feature array (q[j] band c = features of the voxel at z_j + c, or
      zero when absent);
    - the stacked array P = [p^-r; ..; p^+r; 0-row] holds the 2r+1
      alignment views p^a = q[:, (a+r)C : (a+3r+1)C], each (M, (2r+1)C);
    - ``ext[i, o]`` indexes P at row (a+r)*M + j', where j' is the row
      of the first existing voxel in column (xy_i + o) at z-offset a
      (preference 0, -1, +1, ..): p^a[j'] is then the f-window of that
      column centered at z_i REGARDLESS of which a hit, so any hit is
      exact; the pad row (2r+1)*M covers columns with nothing in reach
      (spconv's contribution is zero there too).

    On the measured TPU gather law (~flat cost per ROW up to ~512 B) a
    27-offset conv's per-conv random rows drop from 26 gathers of C-rows
    to 8 gathers of 3C-rows (3.2x fewer rows, equal bytes) at identical
    MXU FLOPs, identical weights layout, and exactly spconv's math
    (/root/reference/Modules/TreeLearn/blocks.py:44-81 semantics); the
    per-level build does (2r+1)(K^2-1) lookups vs K^3-1 — equal for k=3
    (24 vs 26) and half for k=5 (120 vs 124).
    """

    ext: jax.Array  # (M, K^2) int32 rows into P; (2r+1)*M = missing
    zshift: jax.Array  # (M, 4r) int32 row offset of the z+c voxel
    # (slots c = -2r..-1, +1..+2r), 0 = missing


def build_zplan(
    coords: jax.Array,
    valid: jax.Array,
    kernel_size: int = 3,
    verify_coords: bool = False,
    table: VoxelTable | None = None,
) -> ZPlan:
    """Build the z-pack conv structure (see :class:`ZPlan`).

    ``coords`` MUST be lex-sorted (b, x, y, z) with padding rows last —
    the invariant :func:`dedup_sort_perm` establishes for every voxel
    level (voxelize, build_downsample). The z-shift slots are exact pure
    coordinate comparisons; the in-plane lookups share
    :func:`build_rulebook`'s exactness story (``verify_coords``).
    """
    m = coords.shape[0]
    assert kernel_size % 2 == 1, "submanifold rulebooks need odd kernels"
    r = (kernel_size - 1) // 2
    if table is None:
        table = build_table(coords, valid)

    offs = plane_offsets(kernel_size)  # (K2, 2)
    k2 = offs.shape[0]
    half = k2 // 2
    arange_m = jnp.arange(m, dtype=jnp.int32)
    noncenter = jnp.concatenate([offs[:half], offs[half + 1 :]])

    # alignment preference: a = 0 first, then growing |a|
    aligns = [0]
    for a in range(1, r + 1):
        aligns += [-a, a]

    missing = (2 * r + 1) * m
    ext_nc = jnp.full((k2 - 1, m), missing, jnp.int32)
    for a in aligns:
        q = jnp.broadcast_to(coords[None, :, :], (k2 - 1, m, 4))
        q = q.at[:, :, 1:3].add(noncenter[:, None, :])
        q = q.at[:, :, 3].add(a)
        idx = lookup(table, q, verify_coords=verify_coords)  # (K2-1, M)
        hit = valid[None, :] & (idx >= 0)
        enc = (a + r) * m + jnp.where(hit, idx, 0)
        ext_nc = jnp.where(hit & (ext_nc == missing), enc, ext_nc)

    center = jnp.where(valid, r * m + arange_m, missing)[None]
    ext = jnp.concatenate(
        [ext_nc[:half], center, ext_nc[half:]]
    ).T.astype(jnp.int32)

    def shifted_rows(s):
        """coords/valid of row j+s (out-of-range rows invalid)."""
        c = jnp.concatenate([coords[s:], coords[:s]], axis=0)
        if s > 0:
            v = jnp.concatenate([valid[s:], jnp.zeros(s, bool)])
        else:
            v = jnp.concatenate([jnp.zeros(-s, bool), valid[:s]])
        return c, v

    slots = []
    for dz in [*range(-2 * r, 0), *range(1, 2 * r + 1)]:
        target = coords.at[:, 3].add(dz)
        res = jnp.zeros(m, jnp.int32)
        step = 1 if dz > 0 else -1
        for s in range(step, dz + step, step):
            sc, sv = shifted_rows(s)
            hit = valid & sv & jnp.all(sc == target, axis=1)
            res = jnp.where(hit & (res == 0), s, res)
        slots.append(res)
    return ZPlan(ext=ext, zshift=jnp.stack(slots, axis=1))


def _zbands(feats, zshift, valid, dtype):
    """(M, C) -> (M, (4r+1)C) band matrix q (band c ascending in
    [-2r, 2r]: the same-column voxel features at z+c, zero when absent).
    Pure shifted slices + selects — no gathers."""
    m, c = feats.shape
    f = jnp.where(valid[:, None], feats, 0).astype(dtype)
    r2 = zshift.shape[1] // 2  # = 2r

    def shifted(s):
        if s > 0:
            return jnp.concatenate(
                [f[s:], jnp.zeros((s, c), f.dtype)], axis=0
            )
        return jnp.concatenate(
            [jnp.zeros((-s, c), f.dtype), f[:s]], axis=0
        )

    bands = []
    for t, dz in enumerate([*range(-r2, 0), *range(1, r2 + 1)]):
        band = jnp.zeros_like(f)
        step = 1 if dz > 0 else -1
        for s in range(step, dz + step, step):
            band = jnp.where(
                (zshift[:, t] == s)[:, None], shifted(s), band
            )
        bands.append(band)
    return jnp.concatenate(bands[:r2] + [f] + bands[r2:], axis=1)


def _zconv_impl(dtype, feats, weights, ext, zshift, valid):
    """Forward z-pack conv; weights (k^3, Cin, Cout) in
    :func:`kernel_offsets` layout (identical to subm_conv_apply)."""
    m, cin = feats.shape
    k3, _, cout = weights.shape
    k = round(k3 ** (1 / 3))
    r = (k - 1) // 2
    k2 = k * k
    e = k * cin  # (2r+1) * cin
    q = _zbands(feats, zshift, valid, dtype)
    # alignment view a gathers at the voxel z' = z + a, so its window
    # must be the bands CENTERED AT -a relative to z' (f(z' + c) for
    # c in [-a-r, -a+r] == f(z + dz), dz in [-r, r])
    views = [q[:, (r - a) * cin : (r - a) * cin + e]
             for a in range(-r, r + 1)]
    p = jnp.concatenate(views + [jnp.zeros((1, e), q.dtype)], axis=0)
    # (k^3, Cin, Cout) -> (K^2, k*Cin, Cout): kernel_offsets enumerates
    # (dx, dy, dz) with dz fastest, matching q's ascending z bands
    w2 = weights.reshape(k, k, k, cin, cout).reshape(k2, e, cout)
    w2 = w2.astype(dtype)
    center = k2 // 2
    out = jnp.zeros((m, cout), jnp.float32)
    for o in range(k2):
        g = views[r] if o == center else p[ext[:, o]]
        out = out + jnp.dot(g, w2[o], preferred_element_type=jnp.float32)
    return out * valid[:, None]


@partial(jax.custom_vjp, nondiff_argnums=(0,))
def _zconv(dtype, feats, weights, ext, zshift, valid):
    return _zconv_impl(dtype, feats, weights, ext, zshift, valid)


def _zconv_fwd(dtype, feats, weights, ext, zshift, valid):
    out = _zconv_impl(dtype, feats, weights, ext, zshift, valid)
    return out, (feats, weights, ext, zshift, valid)


def _zconv_bwd(dtype, res, g):
    feats, weights, ext, zshift, valid = res
    m, cin = feats.shape
    k3, _, cout = weights.shape
    k = round(k3 ** (1 / 3))
    r = (k - 1) // 2
    k2 = k * k
    e = k * cin
    g_masked = (g * valid[:, None]).astype(dtype)

    # d_feats — exact submanifold conv-transpose identity: the adjoint
    # of conv(W) is conv of the output gradient with the offset-FLIPPED,
    # channel-transposed kernel, evaluated with the SAME plan (each
    # voxel's own alignment entries enumerate exactly the in-reach
    # column voxels, so the plan serves both directions; no scatters).
    w_bwd = weights[::-1].swapaxes(-1, -2)  # offs[k] == -offs[K-1-k]
    d_feats = _zconv_impl(dtype, g_masked, w_bwd, ext, zshift, valid)

    # d_weights: recompute the forward gathers and contract over voxels;
    # gathered window band c of column xy+o IS f(z_i + c) regardless of
    # the alignment that hit, so d_W2[o] bands are exactly d_w[(o, c)].
    q = _zbands(feats, zshift, valid, dtype)
    # alignment view a gathers at the voxel z' = z + a, so its window
    # must be the bands CENTERED AT -a relative to z' (f(z' + c) for
    # c in [-a-r, -a+r] == f(z + dz), dz in [-r, r])
    views = [q[:, (r - a) * cin : (r - a) * cin + e]
             for a in range(-r, r + 1)]
    p = jnp.concatenate(views + [jnp.zeros((1, e), q.dtype)], axis=0)
    center = k2 // 2
    d_w2 = []
    for o in range(k2):
        fwd_g = views[r] if o == center else p[ext[:, o]]
        d_w2.append(
            jnp.dot(fwd_g.T, g_masked, preferred_element_type=jnp.float32)
        )
    d_weights = (
        jnp.stack(d_w2)
        .reshape(k, k, k, cin, cout)
        .reshape(k3, cin, cout)
        .astype(weights.dtype)
    )
    return d_feats.astype(feats.dtype), d_weights, None, None, None


_zconv.defvjp(_zconv_fwd, _zconv_bwd)


def subm_conv_zpack_apply(
    feats: jax.Array,  # (M, Cin)
    weights: jax.Array,  # (k^3, Cin, Cout) — SAME layout as subm_conv_apply
    plan: ZPlan,
    valid: jax.Array,
    compute_dtype=None,
) -> jax.Array:
    """Submanifold conv via the z-pack formulation (see :class:`ZPlan`).

    Numerically matches :func:`subm_conv_apply` up to float accumulation
    order (K^2 packed dots instead of K^3) with the identical weights
    tensor, so the engines are checkpoint-interchangeable.
    """
    dtype = jnp.dtype(compute_dtype or feats.dtype)
    return _zconv(dtype, feats, weights, plan.ext, plan.zshift, valid)


def rulebook_subset_columns(k_from: int, k_to: int) -> np.ndarray:
    """Column indices of the ``k_to``-kernel rulebook inside a
    ``k_from``-kernel rulebook over the SAME voxel set (the smaller
    cube's offsets are a subset of the larger's): slicing these columns
    replaces an entire ``build_rulebook(k_to)`` — PTv3's level-0 k=3
    xCPE rulebook comes from the k=5 stem rulebook for free."""
    assert k_from % 2 == 1 and k_to % 2 == 1 and k_to <= k_from
    rf, rt = (k_from - 1) // 2, (k_to - 1) // 2
    cols = [
        ((dx + rf) * k_from + (dy + rf)) * k_from + (dz + rf)
        for dx in range(-rt, rt + 1)
        for dy in range(-rt, rt + 1)
        for dz in range(-rt, rt + 1)
    ]
    return np.asarray(cols, np.int32)
