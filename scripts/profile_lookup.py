#!/usr/bin/env python
"""A/B lookup/reduce formulations for build_rulebook's hot path.

The k=5 stem rulebook (124 offsets x 32k voxels = 4M bucket lookups)
costs ~13 ms on chip; the trace blames the (Q, 16) lane-sliver match +
reduce. Candidates: the current max-reduce, a sum formulation, and a
4-queries-per-row (Q/4, 128) full-lane layout.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(name, fn, *args, iters=10):
    import jax

    def sync(o):
        np.asarray(jax.tree_util.tree_leaves(o)[0]).ravel()[:1]

    out = fn(*args)
    sync(out)
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        sync(outs[-1])
        sync(outs[0])
        best = min(best, (time.perf_counter() - t0) / iters * 1e3)
    print(f"{name:46s} {best:8.2f} ms")
    return out


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_cache/tpu"
    )
    from treemorph_tpu.ops.sparse import (
        SLOTS_PER_BUCKET,
        _spatial_hash,
        _spatial_hash2,
        build_dedup,
        build_rulebook,
        build_table,
        kernel_offsets,
    )

    from treemorph_tpu.fixtures import synthetic_qsm, synthetic_tree_cloud

    n = 131072
    rng = np.random.default_rng(0)
    qsm = synthetic_qsm(rng=rng)
    pts, _ = synthetic_tree_cloud(
        qsm=qsm, points_per_m2=40000, noise_scale=0.004, rng=rng
    )
    reps = -(-n // len(pts))
    pts = np.tile(pts, (reps, 1))[:n] + rng.normal(0, 0.005, (n, 3)).astype(
        np.float32
    )
    g = np.floor((pts - pts.min(0)) / 0.02).astype(np.int32)
    coords = np.concatenate([np.zeros((n, 1), np.int32), g], 1)
    dd = build_dedup(jnp.asarray(coords), jnp.ones(n, bool), cap=32768)
    cj, vj = dd.coords, dd.valid
    m = cj.shape[0]

    table = build_table(cj, vj)

    rb5 = jax.jit(lambda c, v, t: build_rulebook(c, v, 5, table=t))
    timeit("build_rulebook k=5 (current)", rb5, cj, vj, table)

    offs = kernel_offsets(5)
    k = offs.shape[0]
    half = k // 2
    noncenter = jnp.concatenate([offs[:half], offs[half + 1:]])

    def queries():
        q = jnp.broadcast_to(cj[None, :, :], (k - 1, m, 4))
        return q.at[:, :, 1:].add(noncenter[:, None, :])

    def lookup_sum(t, q):
        qf = q.reshape(-1, 4)
        qh = _spatial_hash(qf)
        qh2 = _spatial_hash2(qf).astype(jnp.int32)
        bucket = (qh & jnp.uint32(t.mask)).astype(jnp.int32)
        data = t.rows[bucket]
        idx_l = data[:, :SLOTS_PER_BUCKET]
        h_l = data[:, SLOTS_PER_BUCKET:]
        match = (idx_l >= 0) & (h_l == qh2[:, None])
        found = jnp.sum(jnp.where(match, idx_l + 1, 0), axis=1) - 1
        ok = jnp.all(qf >= 0, axis=-1)
        return jnp.where(ok, found, -1).reshape(q.shape[:-1])

    def rb_sum(c, v, t):
        q = queries()
        idx = lookup_sum(t, q)
        return jnp.where(v[None, :] & (idx >= 0), idx, m).T

    timeit("rulebook k=5 (sum reduce)", jax.jit(rb_sum), cj, vj, table)

    def lookup_wide(t, q):
        qf = q.reshape(-1, 4)
        nq = qf.shape[0]
        qh = _spatial_hash(qf)
        qh2 = _spatial_hash2(qf).astype(jnp.int32)
        bucket = (qh & jnp.uint32(t.mask)).astype(jnp.int32)
        # 4 queries per 128-lane row
        data = t.rows[bucket.reshape(nq // 4, 4)]  # (Q/4, 4, 32)
        idx_l = data[..., :SLOTS_PER_BUCKET]  # (Q/4, 4, 16)
        h_l = data[..., SLOTS_PER_BUCKET:]
        q2 = qh2.reshape(nq // 4, 4, 1)
        match = (idx_l >= 0) & (h_l == q2)
        found = jnp.sum(jnp.where(match, idx_l + 1, 0), axis=-1) - 1
        found = found.reshape(nq)
        ok = jnp.all(qf >= 0, axis=-1)
        return jnp.where(ok, found, -1).reshape(q.shape[:-1])

    def rb_wide(c, v, t):
        q = queries()
        idx = lookup_wide(t, q)
        return jnp.where(v[None, :] & (idx >= 0), idx, m).T

    out_w = timeit("rulebook k=5 (4q/row)", jax.jit(rb_wide), cj, vj, table)
    out_c = rb5(cj, vj, table)
    # correctness: identical tables (sum==max when at most one match)
    print("wide == current:", bool(jnp.all(out_w == out_c)))


if __name__ == "__main__":
    main()
