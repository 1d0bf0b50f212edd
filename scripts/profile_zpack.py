#!/usr/bin/env python
"""zpack vs gather conv engine microbench at bench L0 shapes (real chip)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    leaf = None
    import jax

    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf[(0,) * leaf.ndim])
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    leaf = jax.tree_util.tree_leaves(outs[-1])[0]
    float(leaf[(0,) * leaf.ndim])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:46s} {dt:8.2f} ms", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache/tpu")

    from treemorph_tpu.fixtures import synthetic_qsm, synthetic_tree_cloud
    from treemorph_tpu.ops.sparse import (
        build_rulebook,
        build_table,
        build_zplan,
        subm_conv_apply,
        subm_conv_zpack_apply,
    )
    from treemorph_tpu.ops.voxelize import voxelize

    b, n = 8, 131072
    rng = np.random.default_rng(0)
    clouds = []
    for i in range(b):
        qsm = synthetic_qsm(rng=rng)
        pts, _ = synthetic_tree_cloud(
            qsm=qsm, points_per_m2=40000, noise_scale=0.004, rng=rng
        )
        reps = -(-n // len(pts))
        pts = np.tile(pts, (reps, 1))[:n]
        clouds.append(pts)
    coords = jnp.asarray(np.concatenate(clouds))
    feats = jnp.asarray(rng.normal(size=(b * n, 4)).astype(np.float32))
    batch_ids = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
    valid = jnp.ones(b * n, bool)

    cap = b * n // 5
    vox = voxelize(coords, feats, batch_ids, valid, 0.02, b, capacity=cap)
    vc, vv = vox.voxel_coords, vox.voxel_valid
    print("voxels:", int(jnp.sum(vv)), "/", cap, flush=True)

    tbl = timeit("build_table", jax.jit(build_table), vc, vv)
    rb = timeit(
        "build_rulebook k=3",
        jax.jit(lambda c, v: build_rulebook(c, v, 3, table=tbl)), vc, vv,
    )
    zp = timeit(
        "build_zplan k=3",
        jax.jit(lambda c, v: build_zplan(c, v, 3, table=tbl)), vc, vv,
    )
    rb5 = timeit(
        "build_rulebook k=5",
        jax.jit(lambda c, v: build_rulebook(c, v, 5, table=tbl)), vc, vv,
    )
    zp5 = timeit(
        "build_zplan k=5",
        jax.jit(lambda c, v: build_zplan(c, v, 5, table=tbl)), vc, vv,
    )

    for c in (32, 64, 96):
        f = jnp.asarray(rng.normal(size=(cap, c)).astype(np.float32))
        w = jnp.asarray(
            rng.normal(size=(27, c, c)).astype(np.float32) * 0.1
        )
        conv_g = jax.jit(lambda f, w: subm_conv_apply(f, w, rb, vv))
        conv_z = jax.jit(lambda f, w: subm_conv_zpack_apply(f, w, zp, vv))
        a = timeit(f"gather conv C={c}", conv_g, f, w)
        bz = timeit(f"zpack  conv C={c}", conv_z, f, w)
        err = float(jnp.max(jnp.abs(a - bz)))
        print(f"  max|diff| {err:.2e}", flush=True)

        gr_g = jax.jit(jax.grad(
            lambda f, w: jnp.sum(subm_conv_apply(f, w, rb, vv) ** 2),
            argnums=(0, 1)))
        gr_z = jax.jit(jax.grad(
            lambda f, w: jnp.sum(
                subm_conv_zpack_apply(f, w, zp, vv) ** 2),
            argnums=(0, 1)))
        timeit(f"gather conv+grad C={c}", gr_g, f, w)
        timeit(f"zpack  conv+grad C={c}", gr_z, f, w)

    # k=5 stem shape: Cin=4 -> 32
    f4 = jnp.asarray(rng.normal(size=(cap, 4)).astype(np.float32))
    w125 = jnp.asarray(
        rng.normal(size=(125, 4, 32)).astype(np.float32) * 0.1
    )
    conv_g5 = jax.jit(lambda f, w: subm_conv_apply(f, w, rb5, vv))
    conv_z5 = jax.jit(
        lambda f, w: subm_conv_zpack_apply(f, w, zp5, vv)
    )
    a = timeit("gather stem k=5 4->32", conv_g5, f4, w125)
    bz = timeit("zpack  stem k=5 4->32", conv_z5, f4, w125)
    print(f"  max|diff| {float(jnp.max(jnp.abs(a - bz))):.2e}",
          flush=True)


if __name__ == "__main__":
    main()
