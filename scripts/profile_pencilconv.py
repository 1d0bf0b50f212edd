#!/usr/bin/env python
"""Prototype the pencil-conv inner loop at L0 bench shapes and compare
against the current gather-engine conv (18.3 ms/rep at 262k voxels).

Pencil layout: voxels grouped into dense 1x1x16 z-pencils; features
(Pcap, 16, C). Conv per (dx,dy) in 3x3: gather neighbor pencil rows for
t-1, t, t+1, then z-window slice-matmuls. 26 row-gathers + 27 matmuls
replace 26 per-voxel row-gathers.
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
P, CELLS, C = 57344, 16, 32


def _sync_scalar(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf[(0,) * leaf.ndim].astype(jnp.float32))


def timeit(name, fn, *args, iters=3):
    out = fn(*args)
    _sync_scalar(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    _sync_scalar(outs[-1])
    _sync_scalar(outs[0])
    dt = (time.perf_counter() - t0) / iters / REPS
    print(f"{name:52s} {dt * 1e3:8.3f} ms/rep", flush=True)
    return dt


def pencil_conv(feats, nbr, ws, dtype=jnp.float32):
    """feats (P+1, CELLS, C); nbr (P, 9, 3); ws (9, 3, C, Cout)."""
    cout = ws.shape[-1]
    f = feats.astype(dtype)
    w = ws.astype(dtype)
    out = jnp.zeros((P, CELLS, cout), jnp.float32)
    for j in range(9):
        g0 = f[nbr[:, j, 1]]  # (P, CELLS, C)
        # center contributions: out[:, u] += g0[:, u + dz - 1] @ w[j, dz]
        # dz = 1 (aligned):
        out = out + jnp.dot(
            g0.reshape(P * CELLS, C), w[j, 1],
            preferred_element_type=jnp.float32,
        ).reshape(P, CELLS, cout)
        # dz = 0: out[:, 1:] += g0[:, :-1] @ w[j, 0]
        out = out.at[:, 1:, :].add(
            jnp.dot(
                g0[:, :-1].reshape(P * (CELLS - 1), C), w[j, 0],
                preferred_element_type=jnp.float32,
            ).reshape(P, CELLS - 1, cout)
        )
        # dz = 2: out[:, :-1] += g0[:, 1:] @ w[j, 2]
        out = out.at[:, :-1, :].add(
            jnp.dot(
                g0[:, 1:].reshape(P * (CELLS - 1), C), w[j, 2],
                preferred_element_type=jnp.float32,
            ).reshape(P, CELLS - 1, cout)
        )
        # boundary cells from t-1 / t+1 pencils
        gm = f[nbr[:, j, 0], CELLS - 1]  # (P, C) last cell of t-1
        gp = f[nbr[:, j, 2], 0]  # (P, C) first cell of t+1
        out = out.at[:, 0, :].add(
            jnp.dot(gm, w[j, 0], preferred_element_type=jnp.float32)
        )
        out = out.at[:, CELLS - 1, :].add(
            jnp.dot(gp, w[j, 2], preferred_element_type=jnp.float32)
        )
    return out


def pencil_conv_cat(feats, nbr, ws, dtype=jnp.float32):
    """Variant: build the 18-cell window, one big K=3C matmul per j via
    three shifted slices fused as (P*CELLS, 3C) @ (3C, Cout)."""
    cout = ws.shape[-1]
    f = feats.astype(dtype)
    w = ws.astype(dtype)
    out = jnp.zeros((P, CELLS, cout), jnp.float32)
    for j in range(9):
        g0 = f[nbr[:, j, 1]]
        gm = f[nbr[:, j, 0], CELLS - 1 :]  # (P, 1, C)
        gp = f[nbr[:, j, 2], :1]  # (P, 1, C)
        win = jnp.concatenate([gm, g0, gp], axis=1)  # (P, 18, C)
        # im2col along z: X[p, u, dz*C + c] = win[p, u + dz, c]
        x = jnp.concatenate(
            [win[:, 0:CELLS], win[:, 1 : CELLS + 1], win[:, 2 : CELLS + 2]],
            axis=2,
        )  # (P, CELLS, 3C)
        out = out + jnp.dot(
            x.reshape(P * CELLS, 3 * C),
            w[j].reshape(3 * C, cout),
            preferred_element_type=jnp.float32,
        ).reshape(P, CELLS, cout)
    return out


def main():
    rng = np.random.default_rng(0)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache/tpu")

    feats = jnp.asarray(
        rng.normal(size=(P + 1, CELLS, C)).astype(np.float32)
    )
    nbr = jnp.asarray(rng.integers(0, P, (P, 9, 3)).astype(np.int32))
    ws = jnp.asarray(
        rng.normal(size=(9, 3, C, C)).astype(np.float32) * 1e-3
    )

    def looped(conv, dtype):
        @jax.jit
        def run(f, nbr, ws):
            def body(k, f):
                o = conv(f, nbr, ws, dtype)
                return f.at[:P].add(o * 1e-30)

            return lax.fori_loop(0, REPS, body, f)

        return run

    timeit("pencil conv window-im2col f32",
           looped(pencil_conv_cat, jnp.float32), feats, nbr, ws)
    timeit("pencil conv window-im2col bf16",
           looped(pencil_conv_cat, jnp.bfloat16), feats, nbr, ws)
    timeit("pencil conv slice-matmul f32", looped(pencil_conv, jnp.float32),
           feats, nbr, ws)

    # agreement check
    o1 = pencil_conv(feats, nbr, ws)
    o2 = pencil_conv_cat(feats, nbr, ws)
    err = float(jnp.abs(o1 - o2).max())
    print("variant agreement max err:", err, flush=True)


if __name__ == "__main__":
    main()
