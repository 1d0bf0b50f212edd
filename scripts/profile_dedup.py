"""Microbench: dedup sort-permutation variants at 1M rows on the real chip.

Round-3 diagnosis of the r02 bench regression (1.39M -> 0.956M pts/s after
the double-hash lexsort dedup fix). Candidates:
  a) round-1: argsort(single uint32 hash)                      [unsafe]
  b) round-2: jnp.lexsort((h2, h1, invalid))  = 3-key sort     [current]
  c) two-key lax.sort: (h1|validity-folded, h2) + iota         [safe-ish]
  d) exact packed two-key: (b<<wx|x, y<<wz|z) + iota           [exact]
  e) single fused key: validity-aware 32-bit, then in-segment repair
"""

import time

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax


def timeit(name, fn, *args, iters=20):
    out = fn(*args)
    jax.tree_util.tree_map(np.asarray, out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    leaf = jax.tree_util.tree_leaves(outs[-1])[0]
    float(np.asarray(leaf).ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:34s} {dt * 1e3:8.3f} ms")
    return dt


def _h1(c):
    c = c.astype(jnp.uint32)
    return (
        (c[..., 0] * jnp.uint32(2654435761))
        ^ (c[..., 1] * jnp.uint32(73856093))
        ^ (c[..., 2] * jnp.uint32(19349663))
        ^ (c[..., 3] * jnp.uint32(83492791))
    )


def _h2(c):
    c = c.astype(jnp.uint32)
    return (
        (c[..., 0] * jnp.uint32(40503))
        ^ (c[..., 1] * jnp.uint32(3267000013))
        ^ (c[..., 2] * jnp.uint32(2860486313))
        ^ (c[..., 3] * jnp.uint32(805459861))
    )


def main():
    n = 1 << 20
    rng = np.random.default_rng(0)
    # realistic voxel coords: batch 8, 1500 x 1500 x 2500 grid, with dups
    key4 = np.stack(
        [
            rng.integers(0, 8, n),
            rng.integers(0, 1500, n),
            rng.integers(0, 1500, n),
            rng.integers(0, 2500, n),
        ],
        axis=1,
    ).astype(np.int32)
    dup = rng.integers(0, n, n // 2)
    key4[dup] = key4[(dup * 7) % n]
    key4 = jnp.asarray(key4)
    valid = jnp.asarray(rng.random(n) < 0.97)

    @jax.jit
    def round1(key4, valid):
        sk = jnp.where(valid, _h1(key4), jnp.uint32(0xFFFFFFFF))
        return jnp.argsort(sk)

    @jax.jit
    def round2(key4, valid):
        h1 = _h1(key4)
        h2 = _h2(key4)
        invalid = (~valid).astype(jnp.uint32)
        return jnp.lexsort((h2, h1, invalid))

    @jax.jit
    def twokey(key4, valid):
        h1 = jnp.where(valid, _h1(key4), jnp.uint32(0xFFFFFFFF))
        h2 = jnp.where(valid, _h2(key4), jnp.uint32(0xFFFFFFFF))
        iota = lax.iota(jnp.int32, key4.shape[0])
        _, _, perm = lax.sort((h1, h2, iota), num_keys=2)
        return perm

    @jax.jit
    def packed(key4, valid):
        c = key4.astype(jnp.uint32)
        mx = jnp.max(jnp.where(valid[:, None], c, 0), axis=0)

        def width(v):
            k = jnp.arange(32, dtype=jnp.uint32)
            return jnp.sum((v >> k) > 0).astype(jnp.uint32)

        wx = width(mx[1])
        wz = width(mx[3])
        hi = (c[:, 0] << wx) | c[:, 1]
        lo = (c[:, 2] << wz) | c[:, 3]
        hi = jnp.where(valid, hi, jnp.uint32(0xFFFFFFFF))
        lo = jnp.where(valid, lo, jnp.uint32(0xFFFFFFFF))
        iota = lax.iota(jnp.int32, key4.shape[0])
        _, _, perm = lax.sort((hi, lo, iota), num_keys=2)
        return perm

    timeit("a) round-1 argsort(1 hash)", round1, key4, valid)
    timeit("b) round-2 lexsort(3 keys)", round2, key4, valid)
    timeit("c) lax.sort 2 hash keys", twokey, key4, valid)
    timeit("d) lax.sort 2 packed exact keys", packed, key4, valid)

    # sanity: same grouping from b and d
    pb = np.asarray(round2(key4, valid))
    pd = np.asarray(packed(key4, valid))
    kb = np.asarray(key4)[pb]
    kd = np.asarray(key4)[pd]
    vb = np.asarray(valid)
    nb = np.unique(kb[vb[pb]], axis=0).shape[0]
    nd = np.unique(kd[vb[pd]], axis=0).shape[0]
    print("unique groups b:", nb, "d:", nd)


if __name__ == "__main__":
    main()
