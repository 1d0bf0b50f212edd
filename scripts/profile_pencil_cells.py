#!/usr/bin/env python
"""Pencil conv cost vs CELLS at REALISTIC L0 row counts (bench workload:
187k voxels, C=32). Measures the fused gather+banded-matmul pattern of
ops/pencil.py with parametric cells.

rows: cells=2 -> 232k, 4 -> 184k, 8 -> 146k, 16 -> 112k (ghosts incl).
Baseline: gather-engine conv27 ~18.3 ms on the same level.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

REPS = 10
C = 32


def _sync(x):
    leaf = jax.tree_util.tree_leaves(x)[0]
    np.asarray(leaf).ravel()[:1]


def timeit(name, fn, *args, iters=3):
    out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    _sync(outs[-1])
    _sync(outs[0])
    dt = (time.perf_counter() - t0) / iters / REPS
    print(f"{name:40s} {dt*1e3:8.3f} ms/conv", flush=True)
    return dt


def make_conv(cells, p):
    e = cells * C
    block = min(4, cells)
    nblocks = cells // block

    def conv(core, banded, rb, hasp, hasn):
        ec = core.shape[1] // cells
        last = core[:, e - C:]
        first = core[:, :C]
        prev_last = jnp.concatenate(
            [jnp.zeros((1, C), core.dtype), last[:-1]], 0
        ) * hasp[:, None]
        next_first = jnp.concatenate(
            [first[1:], jnp.zeros((1, C), core.dtype)], 0
        ) * hasn[:, None]
        ext = jnp.concatenate([prev_last, core, next_first], 1)
        out = jnp.zeros((p + 1, e), jnp.float32)
        for j in range(9):
            win = ext[rb[:, j]]
            for k in range(nblocks):
                s = win[:, k * block * C: (k * block + block + 2) * C]
                out = out.at[:, k * block * C:(k + 1) * block * C].add(
                    jnp.dot(s, banded[j], preferred_element_type=jnp.float32)
                )
        return out

    return conv, block


def main():
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache/tpu")
    rng = np.random.default_rng(0)
    rows = {2: 232243, 4: 183696, 8: 146255, 16: 111872}
    for cells, p in rows.items():
        e = cells * C
        conv, block = make_conv(cells, p)
        core = jnp.asarray(rng.normal(size=(p + 1, e)).astype(np.float32))
        core = core.at[-1].set(0.0)
        banded = jnp.asarray(
            rng.normal(size=(9, (block + 2) * C, block * C)).astype(
                np.float32) * 0.05
        )
        rb = jnp.asarray(
            rng.integers(0, p + 1, (p + 1, 9)).astype(np.int32)
        )
        hasp = jnp.asarray((rng.random(p + 1) < 0.5).astype(np.float32))
        hasn = jnp.asarray((rng.random(p + 1) < 0.5).astype(np.float32))

        @jax.jit
        def run(core, banded, rb, hasp, hasn):
            def body(_, c):
                o = conv(c, banded, rb, hasp, hasn)
                return c + o * 1e-30
            return lax.fori_loop(0, REPS, body, core)

        gb = 9 * p * (cells + 2) * C * 4 / 1e9
        dt = timeit(f"cells={cells} rows={p} ({gb:.2f} GB/conv)", run,
                    core, banded, rb, hasp, hasn)
        print(f"   -> {gb/dt:.0f} GB/s, {dt/9/p*1e9:.1f} ns/row", flush=True)


if __name__ == "__main__":
    main()
