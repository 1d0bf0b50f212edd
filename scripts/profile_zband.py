#!/usr/bin/env python
"""A/B the z-packed band engine vs plain band vs gather on the real
bench voxel sets (PTv3 L0 dedup'd + TreeLearn L0), on the current
backend. Also times plan builds."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(name, fn, *args, iters=10):
    """Async-pipelined timing (one sync at the end — a per-iteration
    block_until_ready costs a ~25 ms axon host-tunnel round trip)."""
    import jax

    def sync(o):
        # axon's block_until_ready is unreliable; fetch one element
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
    print(f"{name:52s} {best:8.2f} ms")
    return out


def bench_coords():
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
    return np.concatenate([np.zeros((n, 1), np.int32), g], 1)


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update(
        "jax_compilation_cache_dir", "/root/repo/.jax_cache/tpu"
    )
    from treemorph_tpu.ops.bandconv import (
        band_subm_conv_apply,
        build_band_plan,
        build_zband_plan,
        zband_subm_conv_apply,
    )
    from treemorph_tpu.ops.sparse import build_dedup, build_rulebook, \
        subm_conv_apply

    coords = bench_coords()
    n = len(coords)
    dd = build_dedup(jnp.asarray(coords), jnp.ones(n, bool), cap=32768)
    cj, vj = dd.coords, dd.valid
    m = cj.shape[0]
    rng = np.random.default_rng(1)

    for k, cin, cout, label in (
        (5, 4, 32, "stem k=5 4->32"),
        (3, 32, 32, "xcpe k=3 32->32"),
        (3, 64, 64, "k=3 64->64"),
    ):
        feats = jnp.asarray(rng.normal(size=(m, cin)).astype(np.float32))
        w = jnp.asarray(
            rng.normal(size=(k**3, cin, cout)).astype(np.float32) * 0.1
        )
        rbf = jax.jit(lambda c, v: build_rulebook(c, v, k))
        rb = timeit(f"[{label}] build_rulebook", rbf, cj, vj)
        bpf = jax.jit(lambda rb, v: build_band_plan(rb, v))
        plan_b = timeit(f"[{label}] build_band_plan", bpf, rb, vj)
        zpf = jax.jit(lambda rb, v: build_zband_plan(rb, v, res_divisor=2))
        plan_z = timeit(f"[{label}] build_zband_plan", zpf, rb, vj)
        print(f"  zband ok={bool(plan_z.ok)} residual rows="
              f"{int(jnp.sum(plan_z.res_valid))} / {m}")
        for dt_name, dt in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
            g1 = jax.jit(
                lambda f, w, rb, v: subm_conv_apply(
                    f, w, rb, v, compute_dtype=dt))
            timeit(f"[{label}] gather {dt_name}", g1, feats, w, rb, vj)
            b1 = jax.jit(
                lambda f, w, p, v: band_subm_conv_apply(
                    f, w, p, v, compute_dtype=dt))
            timeit(f"[{label}] band {dt_name}", b1, feats, w, plan_b, vj)
            z1 = jax.jit(
                lambda f, w, p, v: zband_subm_conv_apply(
                    f, w, p, v, compute_dtype=dt))
            o_z = timeit(f"[{label}] zband {dt_name}", z1, feats, w,
                         plan_z, vj)
            o_g = g1(feats, w, rb, vj)
            err = float(jnp.abs(o_z - o_g).max())
            sc = float(jnp.abs(o_g).max())
            print(f"  zband vs gather max|diff| = {err:.2e} (scale {sc:.2f})")


if __name__ == "__main__":
    main()
