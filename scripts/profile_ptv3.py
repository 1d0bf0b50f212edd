#!/usr/bin/env python
"""Component-level timing of the PTv3 forward at bench shapes.

Times each distinct op family jitted in isolation on the current backend
(the real chip under axon) to locate the 623 ms/131k-pt bottleneck.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(name, fn, *args, iters=5):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:45s} {dt:8.2f} ms")
    return out


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_cache/tpu"
    )

    from treemorph_tpu.models.ptv3 import make_pointset
    from treemorph_tpu.ops.attention import window_attention
    from treemorph_tpu.ops.serialization import encode
    from treemorph_tpu.ops.sparse import build_rulebook, subm_conv_apply

    p = 131072
    rng = np.random.default_rng(0)
    coord = jnp.asarray(
        rng.uniform(0, 20, (p, 3)).astype(np.float32)
    )
    feat = jnp.asarray(rng.normal(size=(p, 4)).astype(np.float32))
    batch = jnp.zeros(p, jnp.int32)
    valid = jnp.ones(p, bool)

    mk = jax.jit(
        lambda c, f, b, v: make_pointset(c, f, b, v, grid_size=0.02)
    )
    ps = timeit("make_pointset (4 curves, full cloud)", mk, coord, feat,
                batch, valid)

    grid = ps.grid_coord
    coords4 = jnp.concatenate([batch[:, None], grid], axis=1)

    enc = jax.jit(lambda g, b: encode(g, b, depth=16, order="hilbert"))
    timeit("encode hilbert (no sort)", enc, grid, batch)

    onesort = jax.jit(lambda h, lo, b: jnp.lexsort((lo, h, b)))
    _, hi0, lo0 = encode(grid, batch, depth=16, order="hilbert")
    timeit("single lexsort 131k", onesort, hi0, lo0, batch)

    rb3 = jax.jit(lambda c, v: build_rulebook(c, v, 3))
    rulebook3 = timeit("build_rulebook k=3 @131k", rb3, coords4, valid)
    rb5 = jax.jit(lambda c, v: build_rulebook(c, v, 5))
    rulebook5 = timeit("build_rulebook k=5 @131k", rb5, coords4, valid)

    for c, rb, label in (
        (32, rulebook3, "subm conv 27x C=32 @131k"),
        (64, rulebook3, "subm conv 27x C=64 @131k"),
    ):
        f = jnp.asarray(rng.normal(size=(p, c)).astype(np.float32))
        w = jnp.asarray(
            rng.normal(size=(27, c, c)).astype(np.float32) * 0.1
        )
        conv = jax.jit(
            lambda f, w, rb, v: subm_conv_apply(f, w, rb, v)
        )
        timeit(label, conv, f, w, rb, valid)

    f4 = jnp.asarray(rng.normal(size=(p, 4)).astype(np.float32))
    w125 = jnp.asarray(
        rng.normal(size=(125, 4, 32)).astype(np.float32) * 0.1
    )
    conv125 = jax.jit(lambda f, w, rb, v: subm_conv_apply(f, w, rb, v))
    timeit("embed conv 125x 4->32 @131k", conv125, f4, w125, rulebook5,
           valid)

    for c, h in ((32, 2), (64, 4)):
        kk = 1024
        w_cnt = p // kk
        d = c // h
        q = jnp.asarray(
            rng.normal(size=(w_cnt, h, kk, d)).astype(np.float32)
        )
        seg = jnp.zeros((w_cnt, kk), jnp.int32)
        attn = jax.jit(
            lambda q, k, v, s: window_attention(q, k, v, s)
        )
        timeit(f"window_attention C={c} h={h} @131k", attn, q, q, q, seg)


if __name__ == "__main__":
    main()
