#!/usr/bin/env python
"""Measure the gather-rate law on this chip.

Hypothesis from profile_treelearn: XLA gathers run at ~0.1 ns/element
(~40 GB/s f32) regardless of row size or index locality. If true, the
wins are (a) packing bf16 pairs into f32 containers (halves elements),
(b) Pallas per-row DMA gathers (bypass the gather unit entirely).
"""

import os
import sys
import time
from functools import partial

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _sync_scalar(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf[(0,) * leaf.ndim].astype(jnp.float32))


def timeit(name, fn, *args, iters=10, elems=None):
    out = fn(*args)
    _sync_scalar(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    _sync_scalar(outs[-1])
    _sync_scalar(outs[0])
    dt = (time.perf_counter() - t0) / iters
    extra = ""
    if elems:
        extra = f"  {dt * 1e9 / elems:6.3f} ns/elem {elems * 4 / dt / 1e9:7.1f} GB/s(f32)"
    print(f"{name:44s} {dt * 1e3:8.3f} ms{extra}", flush=True)
    return dt


def dma_gather(table, idx, window=16):
    """Gather rows of `table` (N, E) at `idx` (M,) via per-row async DMA."""
    m = idx.shape[0]
    n, e = table.shape
    tile = 512

    def kernel(idx_ref, table_ref, out_ref, sems):
        base = pl.program_id(0) * tile

        def get(j):
            return pltpu.make_async_copy(
                table_ref.at[idx_ref[base + j]],
                out_ref.at[j],
                sems.at[j % window],
            )

        for j in range(window):
            get(j).start()
        for j in range(tile):
            if j + window < tile:
                get(j + window).start()
            get(j).wait()

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(m // tile,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec(
            (tile, e), lambda i, idx_ref: (i, 0), memory_space=pltpu.VMEM
        ),
        scratch_shapes=[pltpu.SemaphoreType.DMA((window,))],
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((m, e), table.dtype),
    )(idx, table)


def main():
    rng = np.random.default_rng(0)
    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache/tpu")

    n = 262144
    for e in (32, 128, 512, 2048):
        table = jnp.asarray(rng.normal(size=(n, e)).astype(np.float32))
        idx_r = jnp.asarray(rng.integers(0, n, n).astype(np.int32))
        idx_s = jnp.sort(idx_r)
        g = jax.jit(lambda t, i: t[i])
        timeit(f"xla gather ({n},{e}) f32 random", g, table, idx_r,
               elems=n * e)
        gs = jax.jit(
            lambda t, i: jax.lax.gather(
                t,
                i[:, None],
                jax.lax.GatherDimensionNumbers(
                    offset_dims=(1,),
                    collapsed_slice_dims=(0,),
                    start_index_map=(0,),
                ),
                (1, e),
                indices_are_sorted=True,
                unique_indices=False,
                mode="clip",
            )
        )
        timeit(f"xla gather ({n},{e}) f32 sorted-flag", gs, table, idx_s,
               elems=n * e)

    # bf16 pair packing: (n, 32) bf16 == (n, 16) f32 containers
    tb = jnp.asarray(rng.normal(size=(n, 32)).astype(np.float32)).astype(
        jnp.bfloat16
    )
    packed = jax.lax.bitcast_convert_type(
        tb.reshape(n, 16, 2), jnp.float32
    )
    idx_r = jnp.asarray(rng.integers(0, n, n).astype(np.int32))

    @jax.jit
    def packed_gather(p, i):
        out = p[i]
        return jax.lax.bitcast_convert_type(out, jnp.bfloat16).reshape(
            n, 32
        )

    timeit("packed bf16x2-in-f32 gather (n,16)", packed_gather, packed,
           idx_r, elems=n * 16)

    bg = jax.jit(lambda t, i: t[i])
    timeit("bf16 gather (n,32)", bg, tb, idx_r, elems=n * 32)

    # pallas DMA gathers
    for e, m in ((512, 65536), (2048, 36864)):
        table = jnp.asarray(rng.normal(size=(n // 8, e)).astype(np.float32))
        for wname, idx in (
            ("rand", rng.integers(0, n // 8, m).astype(np.int32)),
            ("local", np.minimum(
                np.arange(m) // 2 + rng.integers(0, 64, m), n // 8 - 1
            ).astype(np.int32)),
        ):
            idxj = jnp.asarray(idx)
            f = jax.jit(partial(dma_gather, window=16))
            timeit(
                f"pallas DMA gather ({m}x{e * 4}B rows, {wname})",
                f, table, idxj, elems=m * e,
            )

    # correctness spot-check of the DMA gather
    small_t = jnp.asarray(rng.normal(size=(1024, 512)).astype(np.float32))
    small_i = jnp.asarray(rng.integers(0, 1024, 2048).astype(np.int32))
    got = np.asarray(dma_gather(small_t, small_i))
    want = np.asarray(small_t)[np.asarray(small_i)]
    print("dma gather max err:", np.abs(got - want).max(), flush=True)


if __name__ == "__main__":
    main()
