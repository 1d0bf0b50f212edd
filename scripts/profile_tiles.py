#!/usr/bin/env python
"""Tile engine vs gather conv microbench at bench L0/L1 shapes (real chip)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def timeit(name, fn, *args, iters=10):
    import jax

    out = fn(*args)
    leaf = jax.tree_util.tree_leaves(out)[0]
    float(leaf[(0,) * leaf.ndim].astype("float32"))
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    leaf = jax.tree_util.tree_leaves(outs[-1])[0]
    float(leaf[(0,) * leaf.ndim].astype("float32"))
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:52s} {dt:8.2f} ms", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir",
                      "/root/repo/.jax_cache/tpu")

    from treemorph_tpu.fixtures import synthetic_qsm, synthetic_tree_cloud
    from treemorph_tpu.ops.sparse import (
        build_downsample,
        build_rulebook,
        subm_conv_apply,
    )
    from treemorph_tpu.ops.tiles import (
        build_tiles,
        from_dense,
        tile_subm_conv,
        to_dense,
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
    levels = [(vox.voxel_coords, vox.voxel_valid)]
    for _ in range(2):
        vc, vv = levels[-1]
        ds = build_downsample(vc, vv, max(vc.shape[0] // 2, 256))
        levels.append((ds.coarse_coords, ds.coarse_valid))

    tile_caps = {4: 6, 8: 45, 16: 300}  # cap = M // this (fill-informed)
    for lvl, (vc, vv) in enumerate(levels):
        m = vc.shape[0]
        nreal = int(jnp.sum(vv))
        print(f"--- L{lvl}: {nreal}/{m} voxels", flush=True)
        c = 32
        f = jnp.asarray(rng.normal(size=(m, c)).astype(np.float32))
        f = f * vv[:, None]
        w = jnp.asarray(
            rng.normal(size=(27, c, c)).astype(np.float32) * 0.1
        )
        rb = timeit(
            f"L{lvl} build_rulebook", jax.jit(
                lambda c_, v_: build_rulebook(c_, v_, 3)), vc, vv)
        conv_g = jax.jit(lambda f, w: subm_conv_apply(f, w, rb, vv))
        ref = timeit(f"L{lvl} gather conv C={c}", conv_g, f, w)

        for tile in (4, 8, 16):
            tcap = max(m // tile_caps[tile] * 2, 64)
            ts = jax.jit(
                lambda c_, v_: build_tiles(c_, v_, cap=tcap, tile=tile)
            )(vc, vv)
            ov = int(ts.overflow)
            ntiles = int(ts.num_tiles)
            print(f"  tile{tile}: T={ntiles}/{tcap} overflow={ov}",
                  flush=True)
            if ov:
                continue
            timeit(
                f"L{lvl} build_tiles t{tile}",
                jax.jit(lambda c_, v_: build_tiles(
                    c_, v_, cap=tcap, tile=tile)), vc, vv)
            dense = jax.jit(
                lambda f: to_dense(f, ts, tile))(f)
            timeit(f"L{lvl} to_dense t{tile}",
                   jax.jit(lambda f: to_dense(f, ts, tile)), f)
            timeit(f"L{lvl} from_dense t{tile}",
                   jax.jit(lambda d: from_dense(d, ts, vv)), dense)
            for impl in ("conv", "slice"):
                conv_t = jax.jit(
                    lambda d, w: tile_subm_conv(d, w, ts, impl=impl)
                )
                out = timeit(
                    f"L{lvl} tile conv t{tile} {impl} C={c}", conv_t,
                    dense, w)
            got = jax.jit(lambda d: from_dense(d, ts, vv))(out)
            err = float(jnp.max(jnp.abs(got - ref)))
            print(f"    max|diff| vs gather = {err:.2e}", flush=True)
            # bf16 variant
            conv_tb = jax.jit(
                lambda d, w: tile_subm_conv(
                    d, w, ts, compute_dtype=jnp.bfloat16))
            timeit(f"L{lvl} tile conv t{tile} conv bf16", conv_tb,
                   dense, w)


if __name__ == "__main__":
    main()
