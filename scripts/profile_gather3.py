#!/usr/bin/env python
"""Gather law, round 2: loop INSIDE jit to subtract the ~5.4 ms per-call
dispatch floor of the axon tunnel."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

REPS = 20


def _sync_scalar(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf[(0,) * leaf.ndim].astype(jnp.float32))


def timeit(name, fn, *args, iters=3, rows=None):
    out = fn(*args)
    _sync_scalar(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    _sync_scalar(outs[-1])
    _sync_scalar(outs[0])
    dt = (time.perf_counter() - t0) / iters / REPS
    extra = f"  {dt * 1e9 / rows:7.2f} ns/row" if rows else ""
    print(f"{name:52s} {dt * 1e3:8.3f} ms/rep{extra}", flush=True)
    return dt


def main():
    rng = np.random.default_rng(0)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache/tpu")

    # dispatch floor reference: trivial op, looped
    x0 = jnp.asarray(rng.normal(size=(8, 128)).astype(np.float32))

    @jax.jit
    def tiny(x):
        return lax.fori_loop(0, REPS, lambda k, x: x * 1.0000001, x)

    timeit("tiny elementwise loop (floor check)", tiny, x0)

    # fused gather+matmul law vs row size, looped in-jit
    for e, m in (
        (32, 262144),
        (64, 131072),
        (128, 65536),
        (128, 262144),
        (256, 32768),
        (512, 57344),
        (512, 16384),
        (1024, 16384),
        (2048, 16384),
    ):
        tbl = jnp.asarray(rng.normal(size=(m, e)).astype(np.float32))
        we = jnp.asarray(
            rng.normal(size=(e, 32)).astype(np.float32) * 1e-6
        )
        ir = jnp.asarray(rng.integers(0, m, m).astype(np.int32))

        @jax.jit
        def gloop(t, i, w):
            def body(k, t):
                g = jnp.dot(t[i], w, preferred_element_type=jnp.float32)
                return t + jnp.sum(g) * 1e-30

            return lax.fori_loop(0, REPS, body, t)

        timeit(f"fused g+mm ({m},{e}) random looped", gloop, tbl, ir, we,
               rows=m)

    # standalone gather (no matmul consumer), looped
    for e, m in ((32, 262144), (512, 57344), (2048, 16384)):
        tbl = jnp.asarray(rng.normal(size=(m, e)).astype(np.float32))
        ir = jnp.asarray(rng.integers(0, m, m).astype(np.int32))

        @jax.jit
        def sloop(t, i):
            def body(k, t):
                g = t[i]
                return t + g * 1e-30

            return lax.fori_loop(0, REPS, body, t)

        timeit(f"standalone gather ({m},{e}) random looped", sloop, tbl,
               ir, rows=m)

    # the real conv shape: 27 gathers+matmuls at (262k,32), looped
    m, e = 262144, 32
    tbl = jnp.asarray(rng.normal(size=(m, e)).astype(np.float32))
    rb = jnp.asarray(rng.integers(0, m, (m, 27)).astype(np.int32))
    ws = jnp.asarray(rng.normal(size=(27, e, e)).astype(np.float32) * 1e-6)

    @jax.jit
    def convloop(t, rb, ws):
        def body(k, t):
            out = jnp.zeros((m, e), jnp.float32)
            for j in range(27):
                out = out + jnp.dot(
                    t[rb[:, j]], ws[j], preferred_element_type=jnp.float32
                )
            return t + out * 1e-30

        return lax.fori_loop(0, REPS, body, t)

    timeit("conv27 (262k,32) random looped", convloop, tbl, rb, ws,
           rows=27 * m)

    # pencil16 conv shape: 9 gathers of (57k,512) + banded matmul (512,512)
    g, e = 57344, 512
    tbl = jnp.asarray(rng.normal(size=(g, e)).astype(np.float32))
    rb9 = jnp.asarray(rng.integers(0, g, (g, 9)).astype(np.int32))
    wband = jnp.asarray(
        rng.normal(size=(9, e, e)).astype(np.float32) * 1e-6
    )

    @jax.jit
    def pencil9(t, rb, ws):
        def body(k, t):
            out = jnp.zeros((g, e), jnp.float32)
            for j in range(9):
                out = out + jnp.dot(
                    t[rb[:, j]], ws[j], preferred_element_type=jnp.float32
                )
            return t + out * 1e-30

        return lax.fori_loop(0, REPS, body, t)

    timeit("pencil9 (57k,512)@(512,512) f32 looped", pencil9, tbl, rb9,
           wband, rows=9 * g)

    @jax.jit
    def pencil9_bf16(t, rb, ws):
        wsb = ws.astype(jnp.bfloat16)

        def body(k, t):
            tb = t.astype(jnp.bfloat16)
            out = jnp.zeros((g, e), jnp.float32)
            for j in range(9):
                out = out + jnp.dot(
                    tb[rb[:, j]], wsb[j],
                    preferred_element_type=jnp.float32,
                )
            return t + out * 1e-30

        return lax.fori_loop(0, REPS, body, t)

    timeit("pencil9 (57k,512) bf16 looped", pencil9_bf16, tbl, rb9, wband,
           rows=9 * g)


if __name__ == "__main__":
    main()
