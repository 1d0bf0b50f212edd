#!/usr/bin/env python
"""Segment-reduction strategies for SerializedPooling at bench shapes.

131k sorted points -> 32k clusters, C=64: scatter-based segment ops vs
sorted-input variants vs scan/cumsum formulations (real chip).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    np.asarray(out).ravel()[:1]
    best = 1e9
    for _ in range(3):
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(iters)]
        np.asarray(outs[-1]).ravel()[:1]
        np.asarray(outs[0]).ravel()[:1]
        best = min(best, (time.perf_counter() - t0) / iters)
    print(f"{name:52s} {best*1e3:8.2f} ms", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_cache/tpu"
    )

    p, c, s = 131072, 64, 32768
    rng = np.random.default_rng(0)
    # sorted cluster ids with ~p/s run length
    ids_sorted = np.sort(rng.integers(0, s, p)).astype(np.int32)
    order = rng.permutation(p)
    ids_orig = np.empty(p, np.int32)
    ids_orig[order] = ids_sorted  # cluster[orig_row]
    x_orig = rng.normal(size=(p, c)).astype(np.float32)
    x_sorted = x_orig[order]

    jx = jnp.asarray(x_orig)
    jxs = jnp.asarray(x_sorted)
    jid = jnp.asarray(ids_orig)
    jids = jnp.asarray(ids_sorted)
    jorder = jnp.asarray(order)

    f1 = jax.jit(
        lambda x, i: jax.ops.segment_max(x, i, num_segments=s + 1)[:s]
    )
    timeit("segment_max unsorted (current)", f1, jx, jid)

    f2 = jax.jit(
        lambda x, i: jax.ops.segment_max(
            x, i, num_segments=s + 1, indices_are_sorted=True
        )[:s]
    )
    timeit("segment_max sorted ids (presorted input)", f2, jxs, jids)

    def f3(x, i, o):
        return jax.ops.segment_max(
            x[o], i, num_segments=s + 1, indices_are_sorted=True
        )[:s]

    timeit("gather-to-sorted + segment_max sorted", jax.jit(f3), jx,
           jids, jorder)

    def scan_max(x, i):
        # segmented cummax over sorted runs, then gather run ends
        def comb(a, b):
            ia, va = a
            ib, vb = b
            keep = (ib == ia)[..., None] if va.ndim > ia.ndim else (ib == ia)
            v = jnp.where(keep, jnp.maximum(va, vb), vb)
            return ib, v

        ids2 = jnp.broadcast_to(i[:, None], x.shape)
        _, vm = jax.lax.associative_scan(comb, (ids2, x), axis=0)
        # run end for cluster j = searchsorted(i, j, 'right') - 1
        ends = jnp.searchsorted(i, jnp.arange(s), side="right") - 1
        return vm[jnp.maximum(ends, 0)]

    timeit("assoc-scan segmented max + ends gather", jax.jit(scan_max),
           jxs, jids)

    g1 = jax.jit(
        lambda x, i: jax.ops.segment_sum(x, i, num_segments=s + 1)[:s]
    )
    timeit("segment_sum unsorted (current)", g1, jx[:, :4], jid)

    def cumsum_diff(x, i):
        cs = jnp.cumsum(x, axis=0)
        ends = jnp.searchsorted(i, jnp.arange(s), side="right") - 1
        starts = jnp.searchsorted(i, jnp.arange(s), side="left") - 1
        top = cs[jnp.maximum(ends, 0)] * (ends >= 0)[:, None]
        bot = jnp.where(
            (starts >= 0)[:, None], cs[jnp.maximum(starts, 0)], 0.0
        )
        return top - bot

    out_cd = timeit(
        "cumsum-diff sums (sorted input)", jax.jit(cumsum_diff),
        jxs[:, :4], jids,
    )
    ref = np.asarray(g1(jxs[:, :4], jids))
    print("  cumsum-diff max err:",
          np.abs(np.asarray(out_cd) - ref).max())

    h1 = jax.jit(
        lambda i: jax.ops.segment_min(
            jnp.arange(p, dtype=jnp.int32), i, num_segments=s + 1
        )[:s]
    )
    timeit("segment_min first_pos (scatter)", h1, jids)

    h2 = jax.jit(
        lambda i: jnp.searchsorted(i, jnp.arange(s, dtype=jnp.int32))
    )
    timeit("searchsorted first_pos", h2, jids)


if __name__ == "__main__":
    main()
