#!/usr/bin/env python
"""Fused gather+matmul rate law: the decision measurement for the
pencil-conv engine redesign.

Known: standalone gather ~31 ns/row flat in row size (<=2KB); the sparse
conv (27 gathers fused into matmuls) runs ~3.3 ns/row. Question: does the
fused fast path survive at 512B-2KB rows, and does it care about index
locality?
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp


def _sync_scalar(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf[(0,) * leaf.ndim].astype(jnp.float32))


def timeit(name, fn, *args, iters=10, rows=None):
    out = fn(*args)
    _sync_scalar(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    _sync_scalar(outs[-1])
    _sync_scalar(outs[0])
    dt = (time.perf_counter() - t0) / iters
    extra = f"  {dt * 1e9 / rows:7.2f} ns/row" if rows else ""
    print(f"{name:52s} {dt * 1e3:8.3f} ms{extra}", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache/tpu")

    n = 262144

    # pure matmul reference: 27 x (262k,32)@(32,32)
    x = jnp.asarray(rng.normal(size=(n, 32)).astype(np.float32))
    ws = jnp.asarray(rng.normal(size=(27, 32, 32)).astype(np.float32))

    @jax.jit
    def mm27(x, ws):
        out = jnp.zeros((n, 32), jnp.float32)
        for j in range(27):
            out = out + jnp.dot(x, ws[j], preferred_element_type=jnp.float32)
        return out

    timeit("27x matmul (262k,32)@(32,32) no gather", mm27, x, ws)

    # single fused gather+matmul at E=32
    idx_r = jnp.asarray(rng.integers(0, n, n).astype(np.int32))
    idx_l = jnp.asarray(
        np.minimum(np.arange(n) + rng.integers(0, 16, n), n - 1).astype(
            np.int32
        )
    )
    w32 = jnp.asarray(rng.normal(size=(32, 32)).astype(np.float32))

    @jax.jit
    def gmm(t, i, w):
        return jnp.dot(t[i], w, preferred_element_type=jnp.float32)

    timeit("fused gather+matmul (262k,32) random", gmm, x, idx_r, w32,
           rows=n)
    timeit("fused gather+matmul (262k,32) local", gmm, x, idx_l, w32,
           rows=n)

    # 27 fused gathers+matmuls (the real conv inner loop shape)
    rb = jnp.asarray(rng.integers(0, n, (n, 27)).astype(np.int32))

    @jax.jit
    def conv27(t, rb, ws):
        out = jnp.zeros((n, 32), jnp.float32)
        for j in range(27):
            out = out + jnp.dot(
                t[rb[:, j]], ws[j], preferred_element_type=jnp.float32
            )
        return out

    timeit("27x fused gather+matmul (262k,32) random", conv27, x, rb, ws,
           rows=27 * n)

    # fused gather+matmul at growing row size E (rows = n_e so total
    # elements stay ~constant at 16.8M)
    for e, m in ((64, 131072), (128, 65536), (256, 32768), (512, 16384),
                 (1024, 16384), (2048, 16384)):
        tbl = jnp.asarray(rng.normal(size=(m, e)).astype(np.float32))
        we = jnp.asarray(rng.normal(size=(e, 32)).astype(np.float32))
        ir = jnp.asarray(rng.integers(0, m, m).astype(np.int32))
        il = jnp.asarray(
            np.minimum(np.arange(m) + rng.integers(0, 8, m), m - 1).astype(
                np.int32
            )
        )
        timeit(f"fused g+mm ({m},{e}) random", gmm, tbl, ir, we, rows=m)
        timeit(f"fused g+mm ({m},{e}) local", gmm, tbl, il, we, rows=m)

    # 9 fused gathers of 2KB pencil-window rows + banded matmul
    # (the pencil16 conv shape at L0: 56830 groups, E=16*32=512)
    g, e = 57344, 512
    tbl = jnp.asarray(rng.normal(size=(g, e)).astype(np.float32))
    wband = jnp.asarray(rng.normal(size=(9, e, e)).astype(np.float32))
    rb9 = jnp.asarray(rng.integers(0, g, (g, 9)).astype(np.int32))

    @jax.jit
    def pencil9(t, rb, ws):
        out = jnp.zeros((g, e), jnp.float32)
        for j in range(9):
            out = out + jnp.dot(
                t[rb[:, j]], ws[j], preferred_element_type=jnp.float32
            )
        return out

    timeit("9x fused g+mm (57k,512)@(512,512) random", pencil9, tbl, rb9,
           wband, rows=9 * g)

    @jax.jit
    def pencil9_bf16(t, rb, ws):
        tb = t.astype(jnp.bfloat16)
        out = jnp.zeros((g, e), jnp.float32)
        for j in range(9):
            out = out + jnp.dot(
                tb[rb[:, j]], ws[j].astype(jnp.bfloat16),
                preferred_element_type=jnp.float32,
            )
        return out

    timeit("9x fused g+mm (57k,512) bf16 random", pencil9_bf16, tbl, rb9,
           wband, rows=9 * g)


if __name__ == "__main__":
    main()
