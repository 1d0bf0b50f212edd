#!/usr/bin/env python
"""Component-level timing of the TreeLearn forward at bench shapes.

Reproduces the bench.py workload (8 x 131072 points, voxel 0.02,
capacity_divisor 4) and times each stage jitted in isolation, async-
dispatch style (block_until_ready under-reports on axon).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax


def _sync_scalar(out):
    """Fetch ONE element (4 bytes over the tunnel, not the whole array)."""
    leaf = jax.tree_util.tree_leaves(out)[0]
    return float(leaf[(0,) * leaf.ndim])


def timeit(name, fn, *args, iters=10):
    out = fn(*args)
    _sync_scalar(out)
    t0 = time.perf_counter()
    outs = [fn(*args) for _ in range(iters)]
    _sync_scalar(outs[-1])
    _sync_scalar(outs[0])
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:48s} {dt:8.2f} ms", flush=True)
    return out


def main():
    import jax
    import jax.numpy as jnp

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache/tpu")

    from treemorph_tpu.fixtures import synthetic_qsm, synthetic_tree_cloud
    from treemorph_tpu.models import TreeLearn
    from treemorph_tpu.ops.sparse import (
        build_downsample,
        build_rulebook,
        build_table,
        subm_conv_apply,
    )
    from treemorph_tpu.ops.voxelize import voxelize_treelearn_features

    b, n = 8, 131072
    rng = np.random.default_rng(0)
    clouds = []
    for i in range(b):
        qsm = synthetic_qsm(rng=rng)
        pts, _ = synthetic_tree_cloud(
            qsm=qsm, points_per_m2=40000, noise_scale=0.004, rng=rng
        )
        if len(pts) >= n:
            pts = pts[:n]
        else:
            reps = -(-n // len(pts))
            pts = np.tile(pts, (reps, 1))[:n] + rng.normal(
                0, 0.005, (n, 3)
            ).astype(np.float32)
        clouds.append(pts)
    coords = jnp.asarray(np.concatenate(clouds))
    feats = jnp.asarray(rng.normal(size=(b * n, 4)).astype(np.float32))
    batch_ids = jnp.repeat(jnp.arange(b, dtype=jnp.int32), n)
    valid = jnp.ones(b * n, bool)
    print("data ready", flush=True)

    cap = b * n // 4  # 262144, matches bench voxel_capacity_divisor=4

    vox_fn = jax.jit(
        lambda c, f, bi, v: voxelize_treelearn_features(
            c, f, bi, v, 0.02, b, capacity=cap
        )
    )
    vox = timeit("voxelize 1.05M -> cap 262k", vox_fn, coords, feats,
                 batch_ids, valid)
    v_coords, v_valid = vox.voxel_coords, vox.voxel_valid
    print("num_voxels:", int(vox.num_voxels), flush=True)

    tbl = timeit("build_table @262k", jax.jit(build_table), v_coords, v_valid)
    rb_fn = jax.jit(lambda c, v: build_rulebook(c, v, 3))
    rb = timeit("build_rulebook k=3 @262k", rb_fn, v_coords, v_valid)

    for c in (32, 64, 96):
        f = jnp.asarray(
            rng.normal(size=(v_coords.shape[0], c)).astype(np.float32)
        )
        w = jnp.asarray(rng.normal(size=(27, c, c)).astype(np.float32) * 0.1)
        conv = jax.jit(lambda f, w, rb, v: subm_conv_apply(f, w, rb, v))
        timeit(f"subm conv 27x C={c} @262k", conv, f, w, rb, v_valid)

    ds_fn = jax.jit(lambda c, v: build_downsample(c, v, cap // 2))
    ds = timeit("build_downsample @262k -> 131k", ds_fn, v_coords, v_valid)

    # full model forward for reference
    model = TreeLearn(
        channels=32, num_blocks=3, dim_feat=4, voxel_size=0.02,
        batch_size=b, voxel_capacity_divisor=4, engine="gather",
    )
    init = jax.jit(
        lambda r, c, f, bi, v: model.init(r, c, f, bi, v, train=False)
    )
    variables = init(jax.random.key(0), coords, feats, batch_ids, valid)

    @jax.jit
    def forward(variables, coords, feats, batch_ids, valid):
        out = model.apply(variables, coords, feats, batch_ids, valid,
                          train=False)
        return out["offset_predictions"], out["semantic_prediction_logits"]

    timeit("FULL forward (bench workload)", forward, variables, coords,
           feats, batch_ids, valid, iters=5)


if __name__ == "__main__":
    main()
